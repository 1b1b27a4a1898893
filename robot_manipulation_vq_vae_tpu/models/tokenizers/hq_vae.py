"""LFQ EMA/KMeans quantizer zoo (reference
``robomimic/models/vq_vae/hq_vae.py:19-415`` - dead in the reference but
documents the EMA/KMeans mechanics the paper iterated on; preserved for
capability parity).

Functional state: the EMA buffers and usage telemetry live in a ``vq``
variable collection; updates happen when the collection is mutable.
"""


import flax.linen as nn
import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.ops import quantize as Q
from robot_manipulation_vq_vae_tpu.utils import initializers as init


class LFQQuantizerEMA(nn.Module):
    """Nearest-code quantizer with EMA codebook updates
    (reference hq_vae.py:224-281). The LFQ sign mask is a no-op in the L2
    norm (see tokenizers/lipvq.py docstring) -> plain L2 nearest."""

    num_codes: int
    code_dim: int
    decay: float = 0.99
    epsilon: float = 1e-5

    def setup(self):
        self.codebook = self.variable(
            "vq", "codebook",
            lambda: init.kaiming_uniform_init(
                jax.random.PRNGKey(0), (self.num_codes, self.code_dim)
            ),
        )
        self.ema_cluster_size = self.variable(
            "vq", "ema_cluster_size", jnp.zeros, (self.num_codes,)
        )
        self.ema_codebook = self.variable(
            "vq", "ema_codebook", lambda: self.codebook.value.copy()
        )

    def __call__(self, z_e, training=False):
        idx, z_q = Q.l2_nearest(z_e, self.codebook.value)
        if training and not self.is_initializing():
            counts, sums = Q.assignment_stats(z_e, idx, self.num_codes)
            new_size = self.decay * self.ema_cluster_size.value + (
                1 - self.decay
            ) * counts
            new_avg = self.decay * self.ema_codebook.value + (
                1 - self.decay
            ) * sums
            self.ema_cluster_size.value = new_size
            self.ema_codebook.value = new_avg
            self.codebook.value = new_avg / (new_size + self.epsilon)[:, None]
        return z_q, idx


class LFQQuantizerEMA_KMeans(nn.Module):
    """EMA quantizer with in-graph kmeans first-batch init, usage/entropy
    telemetry, and dead-code replacement (reference hq_vae.py:19-154).

    Divergence: the reference's "nearest" replace strategy loops over dead
    codes on the host; here dead codes are replaced by random batch samples
    (its "random" strategy) branch-free via jnp.where."""

    num_codes: int
    code_dim: int
    decay: float = 0.99
    epsilon: float = 1e-5
    dead_threshold: float = 5.0
    kmeans_iters: int = 25

    def setup(self):
        self.codebook = self.variable(
            "vq", "codebook",
            lambda: init.kaiming_uniform_init(
                jax.random.PRNGKey(0), (self.num_codes, self.code_dim)
            ),
        )
        self.ema_cluster_size = self.variable(
            "vq", "ema_cluster_size", jnp.zeros, (self.num_codes,)
        )
        self.ema_codebook = self.variable(
            "vq", "ema_codebook", lambda: self.codebook.value.copy()
        )
        self.usage_counts = self.variable(
            "vq", "usage_counts", jnp.zeros, (self.num_codes,)
        )
        self.usage_ma = self.variable(
            "vq", "usage_ma", jnp.zeros, (self.num_codes,)
        )
        self.entropy_ma = self.variable(
            "vq", "entropy_ma", lambda: jnp.zeros(())
        )
        self.initialized = self.variable(
            "vq", "initialized", lambda: jnp.zeros((), jnp.bool_)
        )

    def __call__(self, z_e, training=False):
        if training and not self.is_initializing():
            rng = self.make_rng("vq")
            flat = jax.lax.stop_gradient(z_e)

            def do_init(_):
                centers, _ = Q.kmeans(
                    rng, flat, self.num_codes, self.kmeans_iters
                )
                return centers

            def keep(_):
                return self.codebook.value

            cb = jax.lax.cond(self.initialized.value, keep, do_init, None)
            self.codebook.value = cb
            self.ema_codebook.value = jnp.where(
                self.initialized.value, self.ema_codebook.value, cb
            )
            self.initialized.value = jnp.ones((), jnp.bool_)

        idx, z_q = Q.l2_nearest(z_e, self.codebook.value)

        if training and not self.is_initializing():
            counts, sums = Q.assignment_stats(
                jax.lax.stop_gradient(z_e), idx, self.num_codes
            )
            new_size = self.decay * self.ema_cluster_size.value + (
                1 - self.decay
            ) * counts
            new_avg = self.decay * self.ema_codebook.value + (
                1 - self.decay
            ) * sums
            n = jnp.sum(new_size)
            norm = (new_size + self.epsilon) / (
                n + self.num_codes * self.epsilon
            )
            cb = new_avg / norm[:, None]

            # telemetry (reference :120-139)
            self.usage_counts.value = self.usage_counts.value + counts
            self.usage_ma.value = 0.99 * self.usage_ma.value + 0.01 * (
                counts > 0
            ).astype(jnp.float32)
            p = counts / (jnp.sum(counts) + 1e-8)
            entropy = -jnp.sum(p * jnp.log(p + 1e-8))
            self.entropy_ma.value = 0.99 * self.entropy_ma.value + 0.01 * entropy

            # dead-code replacement from batch samples (:143-154)
            rng2 = self.make_rng("vq")
            cb, new_avg, new_size = Q.replace_dead_codes(
                rng2, cb, new_avg, new_size,
                jax.lax.stop_gradient(z_e),
                self.dead_threshold, normalize=False,
            )
            self.ema_cluster_size.value = new_size
            self.ema_codebook.value = new_avg
            self.codebook.value = cb
        return z_q, idx


class HierarchicalLFQHVQVAE(nn.Module):
    """Flat hierarchical LFQ VAE (reference hq_vae.py:289-415): LipVQ-style
    encoder -> Z-level EMA quantizer -> Lipschitz projection -> Q-level EMA
    quantizer -> decoder."""

    feature_dim: int
    z_dim: int
    q_dim: int
    num_z_codes: int = 1024
    num_q_codes: int = 512
    hidden_dim: int = 128

    def setup(self):
        from robot_manipulation_vq_vae_tpu.models.tokenizers.lipvq import (
            LipschitzDense,
        )

        def dense(f):
            return nn.Dense(f, kernel_init=init.torch_linear_kernel_init)

        self.enc1, self.enc2 = dense(64), dense(self.hidden_dim)
        self.to_z = LipschitzDense(self.z_dim)
        self.z_quantizer = LFQQuantizerEMA_KMeans(
            num_codes=self.num_z_codes, code_dim=self.z_dim, dead_threshold=3
        )
        self.q_encoder = LipschitzDense(self.q_dim)
        self.q_quantizer = LFQQuantizerEMA_KMeans(
            num_codes=self.num_q_codes, code_dim=self.q_dim, dead_threshold=1
        )
        self.dec1, self.dec2 = dense(64), dense(self.hidden_dim)
        self.to_output = dense(self.feature_dim)

    def __call__(self, x, training=False):
        h = jax.nn.gelu(self.enc1(x), approximate=False)
        h = jax.nn.gelu(self.enc2(h), approximate=False)
        z_e = self.to_z(h)
        z_q, z_idx = self.z_quantizer(z_e, training=training)
        q_e = self.q_encoder(jax.lax.stop_gradient(z_q))
        q_q, q_idx = self.q_quantizer(q_e, training=training)
        d = jax.nn.gelu(self.dec1(q_q), approximate=False)
        d = jax.nn.gelu(self.dec2(d), approximate=False)
        x_recon = self.to_output(d)
        recon_loss = jnp.mean((x_recon - x) ** 2)
        commit = jnp.mean((jax.lax.stop_gradient(z_q) - z_e) ** 2) + jnp.mean(
            (jax.lax.stop_gradient(q_q) - q_e) ** 2
        )
        loss = recon_loss + 0.25 * commit
        return jax.lax.stop_gradient(q_q), loss

    def codebook_usage(self, vq_state):
        z_size = vq_state["z_quantizer"]["ema_cluster_size"]
        q_size = vq_state["q_quantizer"]["ema_cluster_size"]
        return {
            "z_used": int(jnp.sum(z_size > 0)),
            "q_used": int(jnp.sum(q_size > 0)),
            "z_utilization": float(jnp.mean(z_size > 0)),
            "q_utilization": float(jnp.mean(q_size > 0)),
        }
