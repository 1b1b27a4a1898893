"""Default action encoder (all tokenizer-modality flags off):
spectral-norm MLP (A -> 64 -> 128 -> feat) + 4-layer post-LN transformer
encoder + Linear (reference ``robomimic/models/obs_nets.py:1246-1262``).

Notes on fidelity:
  * torch ``spectral_norm`` runs one power-iteration per training forward;
    here the u-vector lives in a ``spectral`` variable collection and is
    updated when that collection is mutable.
  * the reference feeds the *flattened* [B*T, A] prompt actions straight
    into ``nn.TransformerEncoder`` (batch_first=False), which treats the
    whole flat batch as one unbatched sequence of B*T tokens - attention
    mixes across the batch. We reproduce that exact behavior (attention over
    axis 0) since it is what the trained reference computes.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.utils.initializers import (
    torch_linear_kernel_init,
)


class SNDense(nn.Module):
    """Dense layer with spectral normalization (1-step power iteration,
    matching torch.nn.utils.spectral_norm defaults)."""

    features: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x, update_stats=False):
        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (in_dim, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(
                self.make_rng("params") if self.is_initializing()
                else jax.random.PRNGKey(0),
                (self.features,),
            ),
        )

        def normalize(v):
            return v / (jnp.linalg.norm(v) + self.eps)

        u = normalize(u_var.value)
        # torch parametrization: W [out, in]; here kernel is [in, out]
        v = normalize(kernel @ u)          # [in]
        u_new = normalize(kernel.T @ v)    # [out]
        if update_stats and not self.is_initializing():
            u_var.value = u_new
        sigma = jnp.dot(v, kernel @ u_new)
        w_sn = kernel / sigma
        return jnp.dot(x, w_sn) + bias


class TorchTransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer matching torch defaults
    (d_ff, gelu, dropout=0.1, batch_first=False semantics handled upstream)."""

    d_model: int
    nhead: int = 8
    dim_feedforward: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        # x: [S, D] unbatched sequence (matching the reference's usage)
        s, d = x.shape
        # NOTE: the reference instantiates nn.TransformerEncoderLayer with
        # nhead=8 regardless of d_model (obs_nets.py:1247-1252), which torch
        # rejects whenever the obs-feature dim is not divisible by 8 - the
        # default modality is unreachable in the shipped configs. We fall
        # back to single-head attention in that case instead of crashing.
        nh = self.nhead if d % self.nhead == 0 else 1
        dh = d // nh
        qkv_q = nn.Dense(d, name="q")(x)
        qkv_k = nn.Dense(d, name="k")(x)
        qkv_v = nn.Dense(d, name="v")(x)
        q = qkv_q.reshape(s, nh, dh).transpose(1, 0, 2)
        k = qkv_k.reshape(s, nh, dh).transpose(1, 0, 2)
        v = qkv_v.reshape(s, nh, dh).transpose(1, 0, 2)
        att = jnp.einsum("hqd,hkd->hqk", q, k) / jnp.sqrt(dh).astype(x.dtype)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("hqk,hkd->hqd", att, v).transpose(1, 0, 2).reshape(s, d)
        y = nn.Dense(d, name="attn_out")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = nn.LayerNorm(name="ln1")(x + y)
        h = nn.Dense(self.dim_feedforward, name="ff1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(d, name="ff2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(name="ln2")(x + h)


class DefaultActionEncoder(nn.Module):
    """spectral_norm MLP + transformer encoder + output Linear."""

    action_dim: int
    output_dim: int
    num_layers: int = 4

    @nn.compact
    def __call__(self, actions_flat, deterministic=True, update_stats=False):
        h = SNDense(64, name="sn1")(actions_flat, update_stats=update_stats)
        h = jax.nn.gelu(h, approximate=False)
        h = SNDense(128, name="sn2")(h, update_stats=update_stats)
        h = jax.nn.gelu(h, approximate=False)
        h = SNDense(self.output_dim, name="sn3")(h, update_stats=update_stats)
        for i in range(self.num_layers):
            h = TorchTransformerEncoderLayer(
                d_model=self.output_dim, name=f"enc{i}"
            )(h, deterministic=deterministic)
        return nn.Dense(
            self.output_dim, kernel_init=torch_linear_kernel_init, name="out"
        )(h)
