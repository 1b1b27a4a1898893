"""Classic VQ-VAE tokenizer backbones.

These correspond to the earlier tokenizer iterations the paper kept in-tree
(SURVEY.md section 2.1 - all shadowed/dead in the reference, preserved here
for capability parity):

  VQVAE            - plain VQ-VAE: ReLU MLP enc/dec, L2 argmin, STE,
                     commitment 0.25 (reference
                     ``robomimic/models/vq_vae/backbone.py:6-76``);
  LFQVAE           - spectral-norm encoder whose "quantizer" is a plain
                     L2-normalize onto the unit sphere
                     (``backbone_lfqvae_lipschitz.py:7-53`` /
                     ``backbone_lfqvae.py``);
  LSTMVQVAE        - 3-layer LSTM enc/dec with SOFT (softmax over negative
                     distances) quantization (``backbone_lstm.py:6-95``;
                     generalizes the reference's hardcoded [8, 10] reshape
                     to any [B, T]).
"""


import flax.linen as nn
import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.ops import quantize as Q
from robot_manipulation_vq_vae_tpu.utils import initializers as init
from robot_manipulation_vq_vae_tpu.models.tokenizers.default_encoder import SNDense


def _dense(features, name=None):
    return nn.Dense(
        features, name=name, kernel_init=init.torch_linear_kernel_init,
        bias_init=nn.initializers.zeros,
    )


def _uniform_codebook(num, dim):
    def f(rng):
        return jax.random.uniform(rng, (num, dim), jnp.float32, -1.0 / num, 1.0 / num)

    return f


class VQVAE(nn.Module):
    """Plain VQ-VAE (reference backbone.py)."""

    feature_dim: int
    latent_dim: int
    num_embeddings: int = 128
    commitment_cost: float = 0.25

    def setup(self):
        self.enc1, self.enc2, self.enc3 = _dense(64), _dense(128), _dense(self.latent_dim)
        self.dec1, self.dec2, self.dec3 = _dense(128), _dense(64), _dense(self.feature_dim)
        self.codebook = self.param(
            "codebook", _uniform_codebook(self.num_embeddings, self.latent_dim)
        )

    def quantize(self, z_e):
        idx, z_q = Q.l2_nearest(z_e, self.codebook)
        commitment = self.commitment_cost * jnp.mean(
            (jax.lax.stop_gradient(z_q) - z_e) ** 2
        )
        embedding = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2)
        z_q = Q.straight_through(z_e, z_q)
        return z_q, embedding + commitment, idx

    def __call__(self, x):
        h = nn.relu(self.enc1(x))
        h = nn.relu(self.enc2(h))
        z_e = nn.relu(self.enc3(h))
        z_q, q_loss, _ = self.quantize(z_e)
        z_latent = jax.lax.stop_gradient(z_q)
        h = nn.relu(self.dec1(z_q))
        h = nn.relu(self.dec2(h))
        x_recon = nn.relu(self.dec3(h))
        loss = jnp.mean((x_recon - x) ** 2) + q_loss
        return z_latent, loss


class LFQVAE(nn.Module):
    """Spectral-norm encoder + unit-sphere 'quantization' (reference
    backbone_lfqvae_lipschitz.py). Recon loss only."""

    feature_dim: int
    latent_dim: int

    def setup(self):
        self.enc1, self.enc2, self.enc3 = (
            SNDense(64), SNDense(128), SNDense(self.latent_dim),
        )
        self.dec1, self.dec2, self.dec3 = _dense(128), _dense(64), _dense(self.feature_dim)

    def __call__(self, x, update_stats=False):
        h = nn.relu(self.enc1(x, update_stats=update_stats))
        h = nn.relu(self.enc2(h, update_stats=update_stats))
        z_e = nn.relu(self.enc3(h, update_stats=update_stats))
        z_q = Q.l2_normalize(z_e)
        z_latent = jax.lax.stop_gradient(z_q)
        h = nn.relu(self.dec1(z_q))
        h = nn.relu(self.dec2(h))
        x_recon = nn.relu(self.dec3(h))
        return z_latent, jnp.mean((x_recon - x) ** 2)


class LSTMVQVAE(nn.Module):
    """LSTM enc/dec + soft (softmax) quantization (reference backbone_lstm.py)."""

    feature_dim: int
    latent_dim: int
    num_embeddings: int = 128
    commitment_cost: float = 0.25
    num_layers: int = 3

    def setup(self):
        self.in_proj = _dense(self.latent_dim)
        self.enc_rnns = [
            nn.RNN(nn.OptimizedLSTMCell(self.latent_dim), name=f"enc{i}")
            for i in range(self.num_layers)
        ]
        self.out_proj = _dense(self.feature_dim)
        self.dec_rnns = [
            nn.RNN(nn.OptimizedLSTMCell(self.feature_dim), name=f"dec{i}")
            for i in range(self.num_layers)
        ]
        self.codebook = self.param(
            "codebook", _uniform_codebook(self.num_embeddings, self.latent_dim)
        )

    def soft_quantize(self, z_e):
        """softmax(-d^2) mixture over codes (reference :71-95)."""
        flat = z_e.reshape(-1, z_e.shape[-1])
        d = Q.l2_distance_sq(flat, self.codebook)
        q = jax.nn.softmax(-d, axis=-1)
        z_q = jnp.dot(q, self.codebook).reshape(z_e.shape)
        commitment = self.commitment_cost * jnp.mean(
            (jax.lax.stop_gradient(z_q) - z_e) ** 2
        )
        embedding = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2)
        return Q.straight_through(z_e, z_q), embedding + commitment

    def __call__(self, x_btd):
        """x_btd [B, T, feature_dim] -> (z_latent [B*T, latent], loss)."""
        b, t, _ = x_btd.shape
        h = jax.nn.gelu(self.in_proj(x_btd), approximate=False)
        for rnn in self.enc_rnns:
            h = rnn(h)
        z_q, q_loss = self.soft_quantize(h)
        z_latent = jax.lax.stop_gradient(z_q).reshape(b * t, -1)
        d = jax.nn.gelu(self.out_proj(z_q), approximate=False)
        for rnn in self.dec_rnns:
            d = rnn(d)
        recon = d.reshape(b * t, self.feature_dim)
        loss = jnp.mean((recon - x_btd.reshape(b * t, -1)) ** 2) + q_loss
        return z_latent, loss
