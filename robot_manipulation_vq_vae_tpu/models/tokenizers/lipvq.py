"""LipVQ-VAE action tokenizer - the paper's main contribution.

TPU-native re-implementation of the reference ``LLFQVAE_V4``
(``robomimic/models/vq_vae/backbone_lfqvae_v5.py:51-84``):

    x --enc(12->64->GELU->128->GELU)--> h
      --LipschitzMLP (L-inf row-normalized, sigmoid)--> z_e
      --nearest-code lookup--> z_q
      --dec(latent->64->GELU->128->GELU)--> --Linear--> x_recon

    loss = MSE(x_recon, x) + 0.25*MSE(sg(z_q), z_e) + 0.25*MSE(z_q, sg(z_e))

Faithfully-reproduced behavioral details (established by parity tests):
  * the "sign mask" in the reference quantizer is a mathematical no-op
    (mask entries are +/-1 inside an L2 norm) -> plain L2 nearest-neighbor;
  * there is NO straight-through estimator on the decoder path: the decoder
    input is the raw gathered code, so the encoder only learns through the
    commitment term (reference ``backbone_lfqvae_v5.py:73-75``);
  * GELU is the exact (erf) variant, matching torch's default;
  * returned latent is the *detached* quantized code
    (``z_latent = z_q.clone().detach()``, reference line 74).

The nearest-code search runs through the fused Pallas kernel on TPU
(``ops/pallas/lipvq_kernel.py``) and the XLA matmul form elsewhere.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.ops import quantize as Q
from robot_manipulation_vq_vae_tpu.ops.pallas.lipvq_kernel import l2_nearest_pallas
from robot_manipulation_vq_vae_tpu.utils import initializers as init


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _dense(features, name=None):
    return nn.Dense(
        features,
        name=name,
        kernel_init=init.torch_linear_kernel_init,
        bias_init=nn.initializers.zeros,
    )


class LipschitzDense(nn.Module):
    """L-inf row-normalized linear layer + sigmoid.

    Mirrors reference ``LipschitzMLP`` (``backbone_lfqvae_v5.py:6-24``):
    each row of W is scaled by min(1, softplus(ci) / sum|row|), capping the
    layer's L-inf Lipschitz constant by a learnable softplus bound.
    Parameters keep the torch layout (W: [out, in]) for checkpoint interop.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        W = self.param("W", init.normal_init(1.0), (self.features, in_dim))
        b = self.param("b", nn.initializers.zeros, (self.features,))
        ci = self.param("ci", nn.initializers.ones, (self.features,))
        absrowsum = jnp.sum(jnp.abs(W), axis=1, keepdims=True)       # [out, 1]
        scale = jnp.minimum(1.0, jax.nn.softplus(ci)[:, None] / absrowsum)
        W_norm = W * scale
        return jax.nn.sigmoid(
            jnp.dot(x, W_norm.T, preferred_element_type=jnp.float32) + b
        )


class LFQQuantizer(nn.Module):
    """Learnable-codebook nearest-neighbor quantizer.

    Reference ``LFQQuantizer`` (``backbone_lfqvae_v5.py:27-48``); see module
    docstring for the sign-mask reduction. ``use_pallas=None`` auto-selects
    the Pallas kernel on TPU backends.
    """

    num_codes: int
    code_dim: int
    use_pallas: Optional[bool] = None

    def setup(self):
        self.codebook = self.param(
            "codebook", init.kaiming_uniform_init, (self.num_codes, self.code_dim)
        )

    def __call__(self, z_e):
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            idx, z_q = l2_nearest_pallas(z_e, self.codebook)
        else:
            idx, z_q = Q.l2_nearest(z_e, self.codebook)
        return z_q, idx

    def lookup(self, idx):
        return jnp.take(self.codebook, idx, axis=0)


class LipVQVAE(nn.Module):
    """The LipVQ-VAE tokenizer (reference ``LLFQVAE_V4``).

    Call modes (all shapes [..., feature_dim] flattened to 2-D internally):
      __call__(x)      -> (z_latent, loss)           [training forward]
      encode(x)        -> (z_e, idx)                 [tokenize]
      decode_codes(idx)-> x_recon                    [detokenize]
    """

    feature_dim: int
    latent_dim: int
    num_codes: int = 1024
    hidden_dim: int = 128
    use_pallas: Optional[bool] = None

    def setup(self):
        self.enc1 = _dense(64)
        self.enc2 = _dense(self.hidden_dim)
        self.to_latent = LipschitzDense(self.latent_dim)
        self.quantizer = LFQQuantizer(
            num_codes=self.num_codes,
            code_dim=self.latent_dim,
            use_pallas=self.use_pallas,
        )
        self.dec1 = _dense(64)
        self.dec2 = _dense(self.hidden_dim)
        self.to_output = _dense(self.feature_dim)

    def _encode(self, x):
        h = _gelu(self.enc1(x))
        h = _gelu(self.enc2(h))
        return self.to_latent(h)

    def _decode(self, z_q):
        h = _gelu(self.dec1(z_q))
        h = _gelu(self.dec2(h))
        return self.to_output(h)

    def __call__(self, x):
        """Training forward: returns (z_latent, loss) like the reference."""
        lead = x.shape[:-1]
        flat = x.reshape((-1, x.shape[-1]))
        z_e = self._encode(flat)
        z_q, idx = self.quantizer(z_e)
        z_latent = jax.lax.stop_gradient(z_q)
        # NOTE: decoder consumes raw z_q (codebook rows) - no STE, matching
        # the reference exactly (backbone_lfqvae_v5.py:73-75).
        x_recon = self._decode(z_q)

        recon_loss = jnp.mean((x_recon - flat) ** 2)
        commitment = jnp.mean((jax.lax.stop_gradient(z_q) - z_e) ** 2)
        codebook_l = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2)
        loss = recon_loss + 0.25 * commitment + 0.25 * codebook_l

        z_latent = z_latent.reshape(lead + (self.latent_dim,))
        return z_latent, loss

    def encode(self, x):
        """Tokenize: x [..., feature_dim] -> (z_e latents, code indices)."""
        lead = x.shape[:-1]
        flat = x.reshape((-1, x.shape[-1]))
        z_e = self._encode(flat)
        _, idx = self.quantizer(z_e)
        return z_e.reshape(lead + (self.latent_dim,)), idx.reshape(lead)

    def decode_codes(self, idx):
        """Detokenize: code indices [...] -> reconstructed actions."""
        z_q = self.quantizer.lookup(idx.reshape((-1,)))
        x = self._decode(z_q)
        return x.reshape(idx.shape + (self.feature_dim,))

    def roundtrip(self, x):
        """Tokenize + detokenize in one jitted pass (benchmark path)."""
        lead = x.shape[:-1]
        flat = x.reshape((-1, x.shape[-1]))
        z_e = self._encode(flat)
        z_q, idx = self.quantizer(z_e)
        x_recon = self._decode(z_q)
        return x_recon.reshape(lead + (self.feature_dim,)), idx.reshape(lead)

    def roundtrip_fused(self, x):
        """Tokenize + detokenize as ONE Pallas megakernel: the encoder MLP,
        Lipschitz latent, nearest-code search, gather, and decoder MLP run
        VMEM-resident per tile with all weights (incl. codebook) pinned in
        VMEM - the speed-of-light serving path."""
        from robot_manipulation_vq_vae_tpu.ops.pallas.lipvq_kernel import (
            lipvq_roundtrip_pallas,
        )

        lead = x.shape[:-1]
        flat = x.reshape((-1, x.shape[-1]))
        p = self.variables["params"]
        # pre-normalize the Lipschitz weight (tiny; done once per call)
        W = p["to_latent"]["W"]
        ci = p["to_latent"]["ci"]
        absrowsum = jnp.sum(jnp.abs(W), axis=1, keepdims=True)
        scale = jnp.minimum(1.0, jax.nn.softplus(ci)[:, None] / absrowsum)
        wl = (W * scale).T  # [hidden, latent]
        recon, idx = lipvq_roundtrip_pallas(
            flat,
            enc_w=((p["enc1"]["kernel"], p["enc1"]["bias"]),
                   (p["enc2"]["kernel"], p["enc2"]["bias"])),
            lip_w=(wl, p["to_latent"]["b"]),
            codebook=p["quantizer"]["codebook"],
            dec_w=((p["dec1"]["kernel"], p["dec1"]["bias"]),
                   (p["dec2"]["kernel"], p["dec2"]["bias"]),
                   (p["to_output"]["kernel"], p["to_output"]["bias"])),
        )
        return recon.reshape(lead + (self.feature_dim,)), idx.reshape(lead)


# Alias matching the reference class name for discoverability.
LLFQVAE_V4 = LipVQVAE
