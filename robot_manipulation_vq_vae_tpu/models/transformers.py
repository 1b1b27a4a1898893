"""GPT backbone (pre-LN minGPT style) in Flax.

Mirrors the behavior of the reference transformer stack
(``robomimic/models/transformers.py:80-440``): multi-head self-attention
with an optional causal mask (a tril that is *disabled* when
``causal=False`` - the shipped ICL config runs non-causal over the 3T
interleaved sequence), GELU/GEGLU 4x MLP, pre-LN residual blocks, final
LayerNorm, and N(0, 0.02) weight init.

TPU notes: attention is expressed as batched einsums (MXU); at the
reference's 48-token context XLA fuses the whole block - no custom kernel
is warranted here (the FLOPs live in the obs encoder ResNets).
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.utils.initializers import gpt_init


def sinusoidal_positional_encoding(positions, embed_dim):
    """Classic sin/cos positional encoding (reference ``PositionalEncoding``
    :35-77). positions: [B, T] float -> [B, T, embed_dim]."""
    half_ids = jnp.arange(0, embed_dim, 2, dtype=jnp.float32)
    div_term = jnp.exp(half_ids * (-math.log(10000.0) / embed_dim))
    ang = positions[..., None] * div_term  # [B, T, D/2]
    pe = jnp.zeros(positions.shape + (embed_dim,), jnp.float32)
    pe = pe.at[..., 0::2].set(jnp.sin(ang))
    pe = pe.at[..., 1::2].set(jnp.cos(ang))
    return jax.lax.stop_gradient(pe)


class GEGLU(nn.Module):
    """GLU-variant activation (reference ``transformers.py:18-32``)."""

    @nn.compact
    def __call__(self, x):
        a, b = jnp.split(x, 2, axis=-1)
        return a * jax.nn.gelu(b, approximate=False)


class SelfAttention(nn.Module):
    """Multi-head self-attention with optional causal tril mask
    (reference ``SelfAttention`` :80-206)."""

    embed_dim: int
    num_heads: int
    context_length: int
    causal: bool = True
    attn_dropout: float = 0.1
    output_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        b, t, d = x.shape
        assert d == self.embed_dim
        nh = self.num_heads
        dh = d // nh

        qkv = nn.Dense(
            3 * d, use_bias=False, kernel_init=gpt_init, name="qkv"
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)

        att = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(dh)
        if self.causal:
            mask = jnp.tril(jnp.ones((t, t), bool))
            att = jnp.where(mask[None, None], att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.attn_dropout)(att, deterministic=deterministic)

        y = jnp.einsum("bhqk,bhkd->bhqd", att, v, preferred_element_type=jnp.float32)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, d)
        y = nn.Dense(
            d, kernel_init=gpt_init, bias_init=nn.initializers.zeros, name="output"
        )(y)
        return nn.Dropout(self.output_dropout)(y, deterministic=deterministic)


class SelfAttentionBlock(nn.Module):
    """Pre-LN residual block: x + attn(ln1(x)); x + mlp(ln2(x))
    (reference ``SelfAttentionBlock`` :225-302)."""

    embed_dim: int
    num_heads: int
    context_length: int
    causal: bool = True
    attn_dropout: float = 0.1
    output_dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = x + SelfAttention(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            context_length=self.context_length,
            causal=self.causal,
            attn_dropout=self.attn_dropout,
            output_dropout=self.output_dropout,
            name="attention",
        )(nn.LayerNorm(name="ln1")(x), deterministic=deterministic)

        mult = 2 if self.activation == "geglu" else 1
        h = nn.Dense(
            4 * self.embed_dim * mult,
            kernel_init=gpt_init,
            bias_init=nn.initializers.zeros,
            name="mlp_fc",
        )(nn.LayerNorm(name="ln2")(x))
        if self.activation == "geglu":
            h = GEGLU()(h)
        else:
            h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(
            self.embed_dim,
            kernel_init=gpt_init,
            bias_init=nn.initializers.zeros,
            name="mlp_proj",
        )(h)
        h = nn.Dropout(self.output_dropout)(h, deterministic=deterministic)
        return x + h


class GPT_Backbone(nn.Module):
    """Stack of SelfAttentionBlocks + output LayerNorm
    (reference ``GPT_Backbone`` :321-440)."""

    embed_dim: int
    context_length: int
    causal: bool = True
    attn_dropout: float = 0.1
    block_output_dropout: float = 0.1
    num_layers: int = 6
    num_heads: int = 8
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, deterministic=True):
        assert x.shape[1] <= self.context_length, (
            f"sequence length {x.shape[1]} exceeds context {self.context_length}"
        )
        for i in range(self.num_layers):
            x = SelfAttentionBlock(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                context_length=self.context_length,
                causal=self.causal,
                attn_dropout=self.attn_dropout,
                output_dropout=self.block_output_dropout,
                activation=self.activation,
                name=f"block{i}",
            )(x, deterministic=deterministic)
        return nn.LayerNorm(name="output_ln")(x)
