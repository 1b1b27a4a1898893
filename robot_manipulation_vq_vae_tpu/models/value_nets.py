"""Value networks (reference ``robomimic/models/value_nets.py:20,129,203``):
state value V(s), action value Q(s, a), and distributional Q with a fixed
categorical atom grid (C51-style)."""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.models import base_nets as BaseNets
from robot_manipulation_vq_vae_tpu.models.obs_nets import (
    ObservationGroupEncoder,
    group_shapes_spec,
)


class ValueNetwork(nn.Module):
    """V(s) with optional output clamping (reference value_nets.py:20)."""

    obs_shapes: Any
    mlp_layer_dims: Tuple[int, ...] = (300, 400)
    value_bounds: Optional[Tuple[float, float]] = None
    goal_shapes: Any = None
    encoder_kwargs: Any = None

    def setup(self):
        groups = {"obs": self.obs_shapes}
        if self.goal_shapes:
            groups["goal"] = self.goal_shapes
        self.encoder = ObservationGroupEncoder(
            observation_group_shapes=group_shapes_spec(
                {k: dict(v) for k, v in groups.items()}
            ),
            encoder_kwargs=self.encoder_kwargs,
        )
        self.mlp = BaseNets.MLP(
            output_dim=self._output_dim(), layer_dims=self.mlp_layer_dims
        )

    def _output_dim(self):
        return 1

    def _feat(self, obs_dict, actions, goal_dict, train):
        kwargs = {"obs": obs_dict}
        if self.goal_shapes:
            kwargs["goal"] = goal_dict
        feat = self.encoder(train=train, **kwargs)
        if actions is not None:
            feat = jnp.concatenate([feat, actions], axis=-1)
        return feat

    def _squash(self, v):
        if self.value_bounds is not None:
            lo, hi = self.value_bounds
            # tanh squash into (lo, hi) (reference :96-104)
            return lo + (hi - lo) * 0.5 * (jnp.tanh(v) + 1.0)
        return v

    def __call__(self, obs_dict, goal_dict=None, train=False):
        v = self.mlp(self._feat(obs_dict, None, goal_dict, train))
        return self._squash(v)


class ActionValueNetwork(ValueNetwork):
    """Q(s, a) (reference value_nets.py:129)."""

    ac_dim: int = 7

    def __call__(self, obs_dict, acts, goal_dict=None, train=False):
        v = self.mlp(self._feat(obs_dict, acts, goal_dict, train))
        return self._squash(v)


class DistributionalActionValueNetwork(ActionValueNetwork):
    """Categorical distributional Q over @num_atoms fixed value atoms
    (reference value_nets.py:203)."""

    num_atoms: int = 51

    def _output_dim(self):
        return self.num_atoms

    def atoms(self):
        assert self.value_bounds is not None
        return jnp.linspace(
            self.value_bounds[0], self.value_bounds[1], self.num_atoms
        )

    def forward_train(self, obs_dict, acts, goal_dict=None, train=False):
        """Returns (log_probs [B, num_atoms], atoms [num_atoms])."""
        logits = self.mlp(self._feat(obs_dict, acts, goal_dict, train))
        return jax.nn.log_softmax(logits, axis=-1), self.atoms()

    def __call__(self, obs_dict, acts, goal_dict=None, train=False):
        log_probs, atoms = self.forward_train(obs_dict, acts, goal_dict, train)
        return jnp.sum(jnp.exp(log_probs) * atoms, axis=-1, keepdims=True)
