"""Adaptive-bin action tokenizer (``bin_enabled`` modality).

Re-implementation of the reference ``AdaptiveBinActionEmbedding``
(``robomimic/models/bin_action/backbone.py:5-89``): per-dimension running
min/max stats (updates stop after ``num_step_stop`` forwards), uniform
binning into ``num_bins`` buckets, one embedding table per action dimension,
concat + MLP projection.

Functional state: the running min/max and step counter live in a
``bin_stats`` variable collection (mutable during training forwards). The
per-dim embedding tables are fused into a single [A, num_bins, E] tensor so
the lookup is one gather instead of A small ones.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.utils.initializers import (
    normal_init,
    torch_linear_kernel_init,
)


class AdaptiveBinActionEmbedding(nn.Module):
    action_dim: int
    output_dim: int
    num_bins: int = 20
    embedding_dim: int = 64
    num_step_stop: int = 10000

    @nn.compact
    def __call__(self, actions, update_stats=True):
        """actions: [N, action_dim] -> embeddings [N, output_dim].

        When ``update_stats`` the ``bin_stats`` collection must be mutable.
        """
        running_min = self.variable(
            "bin_stats", "running_min",
            lambda: jnp.full((self.action_dim,), jnp.inf),
        )
        running_max = self.variable(
            "bin_stats", "running_max",
            lambda: jnp.full((self.action_dim,), -jnp.inf),
        )
        num_step = self.variable(
            "bin_stats", "num_step", lambda: jnp.zeros((), jnp.int32)
        )

        if update_stats and not self.is_initializing():
            # stop updating after num_step_stop forwards (reference :71-75),
            # branch-free via where on the step counter
            enabled = num_step.value < self.num_step_stop
            new_min = jnp.minimum(running_min.value, jnp.min(actions, axis=0))
            new_max = jnp.maximum(running_max.value, jnp.max(actions, axis=0))
            running_min.value = jnp.where(enabled, new_min, running_min.value)
            running_max.value = jnp.where(enabled, new_max, running_max.value)
            num_step.value = num_step.value + jnp.asarray(enabled, jnp.int32)

        # bin boundaries: linspace(min, max, num_bins+1) per dim (:42-52)
        lo, hi = running_min.value, running_max.value
        steps = jnp.linspace(0.0, 1.0, self.num_bins + 1)[None, :]  # [1, nb+1]
        boundaries = lo[:, None] + (hi - lo)[:, None] * steps       # [A, nb+1]

        # torch.bucketize(right=False) == searchsorted side='left' (:63),
        # then clamp(idx-1, 0, num_bins-1) (:65)
        idx = jax.vmap(
            lambda col, b: jnp.searchsorted(b, col, side="left"),
            in_axes=(1, 0),
        )(actions, boundaries)                                       # [A, N]
        idx = jnp.clip(idx - 1, 0, self.num_bins - 1).T              # [N, A]

        table = self.param(
            "embedding", normal_init(1.0),
            (self.action_dim, self.num_bins, self.embedding_dim),
        )
        # one fused gather: flat index = dim * num_bins + bin
        dims = jnp.arange(self.action_dim)[None, :]
        flat_idx = dims * self.num_bins + idx                        # [N, A]
        flat_table = table.reshape(-1, self.embedding_dim)
        emb = jnp.take(flat_table, flat_idx.reshape(-1), axis=0)
        emb = emb.reshape(actions.shape[0], self.action_dim * self.embedding_dim)

        h = nn.Dense(
            self.action_dim * self.embedding_dim // 2,
            kernel_init=torch_linear_kernel_init, name="out_fc1",
        )(emb)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(
            self.output_dim, kernel_init=torch_linear_kernel_init, name="out_fc2",
        )(h)
        return jax.nn.gelu(h, approximate=False)
