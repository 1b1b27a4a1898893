"""Actor networks.

Re-design of ``robomimic/models/policy_nets.py``: every network is a Flax
module returning either action tensors or GMM parameter structs
(``models/distributions.py``). Behavioral notes carried over from the
reference:

  * ``TransformerActorNetwork.forward`` ACCEPTS an ``actions`` argument and
    IGNORES it (``policy_nets.py:1196-1222``) - in the shipped HVQVAE config
    the quantized actions therefore never reach the policy; the HVQVAE is a
    co-trained auxiliary loss. We reproduce that exactly (and expose the
    prompt-conditioned ICL networks for the paper's GMM path).
  * GMM eval uses low-noise sigma 1e-4 (``policy_nets.py:2560-2565``).
"""

from typing import Any, Tuple

import flax.linen as nn
import numpy as np
import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.models import base_nets as BaseNets
from robot_manipulation_vq_vae_tpu.models.distributions import (
    DiagGaussian,
    GMMActionDistribution,
    TanhWrappedGaussian,
    TanhWrappedGMM,
)
from robot_manipulation_vq_vae_tpu.models.obs_nets import (
    ICL_MIMO_Transformer,
    MIMO_MLP,
    MIMO_Transformer,
    ObservationGroupEncoder,
    group_shapes_spec,
)
from robot_manipulation_vq_vae_tpu.utils import tensor_utils as TensorUtils

_STD_ACTIVATIONS = {
    "softplus": jax.nn.softplus,
    "exp": jnp.exp,
}


def _obs_group_spec(obs_shapes, goal_shapes=None):
    groups = {"obs": obs_shapes}
    if goal_shapes:
        groups["goal"] = goal_shapes
    return group_shapes_spec(groups)


# ---------------------------------------------------------------------------
# MLP actors (reference ActorNetwork:34, GaussianActorNetwork:207,
# GMMActorNetwork:429)
# ---------------------------------------------------------------------------

class ActorNetwork(nn.Module):
    """Deterministic MLP actor with tanh squash."""

    obs_shapes: Any
    ac_dim: int
    mlp_layer_dims: Tuple[int, ...] = (1024, 1024)
    goal_shapes: Any = None
    encoder_kwargs: Any = None

    def setup(self):
        self.net = MIMO_MLP(
            input_obs_group_shapes=_obs_group_spec(
                self.obs_shapes, self.goal_shapes
            ),
            output_shapes=(("action", (self.ac_dim,)),),
            layer_dims=tuple(self.mlp_layer_dims),
            encoder_kwargs=self.encoder_kwargs,
        )

    def __call__(self, obs_dict, goal_dict=None, train=False):
        kwargs = {"obs": obs_dict}
        if self.goal_shapes:
            kwargs["goal"] = goal_dict
        out = self.net(train=train, **kwargs)
        return jnp.tanh(out["action"])


class GMMActorNetwork(nn.Module):
    """MLP actor emitting GMM parameters."""

    obs_shapes: Any
    ac_dim: int
    mlp_layer_dims: Tuple[int, ...] = (1024, 1024)
    num_modes: int = 5
    min_std: float = 0.01
    std_activation: str = "softplus"
    low_noise_eval: bool = True
    goal_shapes: Any = None
    encoder_kwargs: Any = None

    def setup(self):
        m, a = self.num_modes, self.ac_dim
        self.net = MIMO_MLP(
            input_obs_group_shapes=_obs_group_spec(
                self.obs_shapes, self.goal_shapes
            ),
            output_shapes=(
                ("mean", (m, a)), ("scale", (m, a)), ("logits", (m,)),
            ),
            layer_dims=tuple(self.mlp_layer_dims),
            encoder_kwargs=self.encoder_kwargs,
        )

    def __call__(self, obs_dict, goal_dict=None, train=False):
        kwargs = {"obs": obs_dict}
        if self.goal_shapes:
            kwargs["goal"] = goal_dict
        out = self.net(train=train, **kwargs)
        means = jnp.tanh(out["mean"])
        if self.low_noise_eval and not train:
            scales = jnp.ones_like(means) * 1e-4
        else:
            scales = _STD_ACTIVATIONS[self.std_activation](out["scale"]) + self.min_std
        return GMMActionDistribution(
            means=means, scales=scales, logits=out["logits"]
        )


class GaussianActorNetwork(nn.Module):
    """MLP actor emitting a diagonal Gaussian, with the reference's exact
    output transforms (reference ``GaussianActorNetwork``
    policy_nets.py:207-426): mean clamped to ``mean_limits`` then tanh'd
    (unless ``use_tanh`` wraps the whole distribution instead); scale =
    ``softplus(x) * init_std / softplus(0)`` (or exp / identity) clamped to
    ``std_limits``; low-noise eval overrides scale with 1e-4. ``min_std``
    is the reference BC/ICL calling convention ``std_limits=(min_std, 7.5)``
    (bc.py:277, icl.py:333). The scale head exists even with
    ``fixed_std`` (the reference decoder always has both heads)."""

    obs_shapes: Any
    ac_dim: int
    mlp_layer_dims: Tuple[int, ...] = (1024, 1024)
    fixed_std: bool = False
    init_std: float = 0.3
    min_std: Any = None  # lower std clamp override (reference min_std)
    mean_limits: Tuple[float, float] = (-9.0, 9.0)
    std_limits: Tuple[float, float] = (0.007, 7.5)
    std_activation: str = "softplus"
    low_noise_eval: bool = True
    use_tanh: bool = False
    init_last_fc_weight: Any = None
    goal_shapes: Any = None
    encoder_kwargs: Any = None

    def setup(self):
        self.net = MIMO_MLP(
            input_obs_group_shapes=_obs_group_spec(
                self.obs_shapes, self.goal_shapes
            ),
            output_shapes=(
                ("mean", (self.ac_dim,)), ("scale", (self.ac_dim,)),
            ),
            layer_dims=tuple(self.mlp_layer_dims),
            encoder_kwargs=self.encoder_kwargs,
            decoder_init_scale=self.init_last_fc_weight,
        )

    def __call__(self, obs_dict, goal_dict=None, train=False):
        kwargs = {"obs": obs_dict}
        if self.goal_shapes:
            kwargs["goal"] = goal_dict
        out = self.net(train=train, **kwargs)
        mean = jnp.clip(out["mean"], self.mean_limits[0], self.mean_limits[1])
        if not self.use_tanh:
            mean = jnp.tanh(mean)
        if self.low_noise_eval and not train:
            scale = jnp.ones_like(mean) * 1e-4
        else:
            if self.fixed_std:
                # fixed std skips the activation (std_activation -> None)
                scale = jnp.ones_like(mean) * self.init_std
            elif self.std_activation == "softplus":
                # softplus scaled so that scale(0) == init_std
                scale = jax.nn.softplus(out["scale"]) * (
                    self.init_std / float(np.log(2.0))
                )
            elif self.std_activation == "exp":
                scale = jnp.exp(out["scale"])
            else:
                scale = out["scale"]
            lo = self.std_limits[0] if self.min_std is None else self.min_std
            scale = jnp.clip(scale, lo, self.std_limits[1])
        dist = DiagGaussian(mean=mean, scale=scale)
        if self.use_tanh:
            dist = TanhWrappedGaussian(base=dist, scale=1.0)
        return dist


# ---------------------------------------------------------------------------
# RNN actors (reference RNNActorNetwork:604, RNNGMMActorNetwork:783)
# ---------------------------------------------------------------------------

class RNNActorNetwork(nn.Module):
    """LSTM/GRU over encoded obs sequence -> per-step action (tanh)."""

    obs_shapes: Any
    ac_dim: int
    mlp_layer_dims: Tuple[int, ...] = ()
    rnn_hidden_dim: int = 400
    rnn_num_layers: int = 2
    rnn_type: str = "LSTM"
    goal_shapes: Any = None
    encoder_kwargs: Any = None

    def setup(self):
        self.encoder = ObservationGroupEncoder(
            observation_group_shapes=_obs_group_spec(
                self.obs_shapes, self.goal_shapes
            ),
            encoder_kwargs=self.encoder_kwargs,
        )
        self.rnn = BaseNets.RNNBase(
            hidden_dim=self.rnn_hidden_dim,
            num_layers=self.rnn_num_layers,
            rnn_type=self.rnn_type,
        )
        self.head = BaseNets.MLP(
            output_dim=self.ac_dim, layer_dims=tuple(self.mlp_layer_dims)
        )

    def _fold_inputs(self, obs_dict, goal_dict):
        kwargs = {"obs": obs_dict}
        if self.goal_shapes:
            assert goal_dict is not None
            # tile per-episode goals over the time axis before folding
            mod = next(iter(obs_dict))
            goal_dict = TensorUtils.unsqueeze_expand_at(
                goal_dict, size=obs_dict[mod].shape[1], dim=1
            )
            kwargs["goal"] = goal_dict
        return TensorUtils.fold_time(kwargs)

    def __call__(self, obs_dict, goal_dict=None, train=False,
                 initial_state=None, return_state=False):
        folded, b, t = self._fold_inputs(obs_dict, goal_dict)
        flat = self.encoder(train=train, **folded)
        seq = flat.reshape(b, t, -1)
        hidden, state = self.rnn(seq, initial_state=initial_state)
        actions = jnp.tanh(self.head(hidden))
        if return_state:
            return actions, state
        return actions


class RNNGMMActorNetwork(RNNActorNetwork):
    """RNN actor emitting per-step GMM params."""

    num_modes: int = 5
    min_std: float = 0.01
    std_activation: str = "softplus"
    low_noise_eval: bool = True

    def setup(self):
        self.encoder = ObservationGroupEncoder(
            observation_group_shapes=_obs_group_spec(
                self.obs_shapes, self.goal_shapes
            ),
            encoder_kwargs=self.encoder_kwargs,
        )
        self.rnn = BaseNets.RNNBase(
            hidden_dim=self.rnn_hidden_dim,
            num_layers=self.rnn_num_layers,
            rnn_type=self.rnn_type,
        )
        m, a = self.num_modes, self.ac_dim
        self.mean_head = BaseNets.MLP(output_dim=m * a, layer_dims=())
        self.scale_head = BaseNets.MLP(output_dim=m * a, layer_dims=())
        self.logit_head = BaseNets.MLP(output_dim=m, layer_dims=())

    def __call__(self, obs_dict, goal_dict=None, train=False,
                 initial_state=None, return_state=False):
        folded, b, t = self._fold_inputs(obs_dict, goal_dict)
        flat = self.encoder(train=train, **folded)
        seq = flat.reshape(b, t, -1)
        hidden, state = self.rnn(seq, initial_state=initial_state)
        m, a = self.num_modes, self.ac_dim
        means = jnp.tanh(self.mean_head(hidden).reshape(b, t, m, a))
        raw_scales = self.scale_head(hidden).reshape(b, t, m, a)
        if self.low_noise_eval and not train:
            scales = jnp.ones_like(means) * 1e-4
        else:
            scales = _STD_ACTIVATIONS[self.std_activation](raw_scales) + self.min_std
        logits = self.logit_head(hidden)
        dist = GMMActionDistribution(means=means, scales=scales, logits=logits)
        if return_state:
            return dist, state
        return dist


# ---------------------------------------------------------------------------
# Transformer actors
# ---------------------------------------------------------------------------

class TransformerActorNetwork(nn.Module):
    """MIMO_Transformer actor with tanh squash (reference :1064-1226).

    NOTE: ``actions`` is accepted and ignored, faithfully reproducing the
    reference forward signature used by ICLTransformerHVQVAE.
    """

    obs_shapes: Any
    ac_dim: int
    transformer_embed_dim: int
    transformer_num_layers: int
    transformer_num_heads: int
    transformer_context_length: int
    transformer_causal: bool = True
    transformer_emb_dropout: float = 0.1
    transformer_attn_dropout: float = 0.1
    transformer_block_output_dropout: float = 0.1
    transformer_sinusoidal_embedding: bool = False
    transformer_activation: str = "gelu"
    transformer_nn_parameter_for_timesteps: bool = False
    goal_shapes: Any = None
    encoder_kwargs: Any = None

    def _output_shapes(self):
        return (("action", (self.ac_dim,)),)

    def setup(self):
        self.net = MIMO_Transformer(
            input_obs_group_shapes=_obs_group_spec(
                self.obs_shapes, self.goal_shapes
            ),
            output_shapes=self._output_shapes(),
            transformer_embed_dim=self.transformer_embed_dim,
            transformer_num_layers=self.transformer_num_layers,
            transformer_num_heads=self.transformer_num_heads,
            transformer_context_length=self.transformer_context_length,
            transformer_causal=self.transformer_causal,
            transformer_emb_dropout=self.transformer_emb_dropout,
            transformer_attn_dropout=self.transformer_attn_dropout,
            transformer_block_output_dropout=self.transformer_block_output_dropout,
            transformer_sinusoidal_embedding=self.transformer_sinusoidal_embedding,
            transformer_activation=self.transformer_activation,
            transformer_nn_parameter_for_timesteps=self.transformer_nn_parameter_for_timesteps,
            encoder_kwargs=self.encoder_kwargs,
        )

    def _forward_raw(self, obs_dict, goal_dict=None, train=False):
        kwargs = {"obs": obs_dict}
        if self.goal_shapes:
            assert goal_dict is not None
            mod = next(iter(obs_dict))
            goal_dict = TensorUtils.unsqueeze_expand_at(
                goal_dict, size=obs_dict[mod].shape[1], dim=1
            )
            kwargs["goal"] = goal_dict
        return self.net(train=train, **kwargs)

    def __call__(self, obs_dict, actions=None, goal_dict=None, train=False):
        out = self._forward_raw(obs_dict, goal_dict, train=train)
        return jnp.tanh(out["action"])


class TransformerGMMActorNetwork(TransformerActorNetwork):
    """Transformer actor emitting per-step GMM params (reference :1912)."""

    num_modes: int = 5
    min_std: float = 0.01
    std_activation: str = "softplus"
    low_noise_eval: bool = True

    def _output_shapes(self):
        m, a = self.num_modes, self.ac_dim
        return (("mean", (m, a)), ("scale", (m, a)), ("logits", (m,)))

    def __call__(self, obs_dict, actions=None, goal_dict=None, train=False,
                 low_noise_eval=None):
        out = self._forward_raw(obs_dict, goal_dict, train=train)
        means = jnp.tanh(out["mean"])
        lne = self.low_noise_eval if low_noise_eval is None else low_noise_eval
        if lne and not train:
            scales = jnp.ones_like(means) * 1e-4
        else:
            scales = _STD_ACTIVATIONS[self.std_activation](out["scale"]) + self.min_std
        return GMMActionDistribution(
            means=means, scales=scales, logits=out["logits"]
        )


class ICLTransformerActorNetwork(nn.Module):
    """ICL_MIMO_Transformer actor: prompt-conditioned, tanh-squashed
    (reference :1562-1735 behavior)."""

    obs_shapes: Any
    ac_dim: int
    transformer_embed_dim: int
    transformer_num_layers: int
    transformer_num_heads: int
    transformer_context_length: int
    transformer_causal: bool = True
    transformer_emb_dropout: float = 0.1
    transformer_attn_dropout: float = 0.1
    transformer_block_output_dropout: float = 0.1
    transformer_sinusoidal_embedding: bool = False
    transformer_activation: str = "gelu"
    transformer_nn_parameter_for_timesteps: bool = False
    transformer_fast_enabled: bool = False
    transformer_bin_enabled: bool = False
    transformer_vq_vae_enabled: bool = False
    transformer_ln_act_enabled: bool = False
    action_input_shape: int = 12
    backbone_type: str = "gpt"
    goal_shapes: Any = None
    encoder_kwargs: Any = None

    def _output_shapes(self):
        return (("action", (self.ac_dim,)),)

    def setup(self):
        self.net = ICL_MIMO_Transformer(
            input_obs_group_shapes=_obs_group_spec(
                self.obs_shapes, self.goal_shapes
            ),
            output_shapes=self._output_shapes(),
            transformer_embed_dim=self.transformer_embed_dim,
            transformer_num_layers=self.transformer_num_layers,
            transformer_num_heads=self.transformer_num_heads,
            transformer_context_length=self.transformer_context_length,
            transformer_causal=self.transformer_causal,
            transformer_emb_dropout=self.transformer_emb_dropout,
            transformer_attn_dropout=self.transformer_attn_dropout,
            transformer_block_output_dropout=self.transformer_block_output_dropout,
            transformer_sinusoidal_embedding=self.transformer_sinusoidal_embedding,
            transformer_activation=self.transformer_activation,
            transformer_nn_parameter_for_timesteps=self.transformer_nn_parameter_for_timesteps,
            transformer_fast_enabled=self.transformer_fast_enabled,
            transformer_bin_enabled=self.transformer_bin_enabled,
            transformer_vq_vae_enabled=self.transformer_vq_vae_enabled,
            transformer_ln_act_enabled=self.transformer_ln_act_enabled,
            action_input_shape=self.action_input_shape,
            backbone_type=self.backbone_type,
            encoder_kwargs=self.encoder_kwargs,
        )

    def _forward_raw(self, obs_dict, context_obs, actions, goal_dict=None,
                     train=False):
        kwargs = {"obs": obs_dict}
        if self.goal_shapes:
            assert goal_dict is not None
            mod = next(iter(obs_dict))
            goal_dict = TensorUtils.unsqueeze_expand_at(
                goal_dict, size=obs_dict[mod].shape[1], dim=1
            )
            kwargs["goal"] = goal_dict
        kwargs["prompt"] = {"obs": context_obs, "action": actions}
        return self.net(train=train, **kwargs)

    def __call__(self, obs_dict, context_obs, actions=None, goal_dict=None,
                 train=False):
        out = self._forward_raw(obs_dict, context_obs, actions, goal_dict, train)
        return jnp.tanh(out["action"]), out["vq_vae_loss"]


class ICLTransformerGMMActorNetwork(ICLTransformerActorNetwork):
    """Prompt-conditioned GMM actor - the paper's LipVQ path
    (reference ``ICLTransformerGMMActorNetwork`` policy_nets.py:2375-2612)."""

    num_modes: int = 5
    min_std: float = 0.01
    std_activation: str = "softplus"
    low_noise_eval: bool = True
    use_tanh: bool = False

    def _output_shapes(self):
        m, a = self.num_modes, self.ac_dim
        return (("mean", (m, a)), ("scale", (m, a)), ("logits", (m,)))

    def forward_train(self, obs_dict, context_obs, actions=None, goal_dict=None,
                      low_noise_eval=None, train=False):
        """Returns (GMM distribution over [B, T], vq_vae_loss)."""
        out = self._forward_raw(obs_dict, context_obs, actions, goal_dict, train)
        means = out["mean"]
        if not self.use_tanh:
            means = jnp.tanh(means)
        lne = self.low_noise_eval if low_noise_eval is None else low_noise_eval
        if lne and not train:
            scales = jnp.ones_like(means) * 1e-4
        else:
            scales = _STD_ACTIVATIONS[self.std_activation](out["scale"]) + self.min_std
        dist = GMMActionDistribution(
            means=means, scales=scales, logits=out["logits"]
        )
        if self.use_tanh:
            dist = TanhWrappedGMM(base=dist, scale=1.0)
        return dist, out["vq_vae_loss"]

    def __call__(self, obs_dict, context_obs, actions=None, goal_dict=None,
                 train=False, rng=None):
        dist, vq_loss = self.forward_train(
            obs_dict, context_obs, actions, goal_dict, train=train
        )
        assert rng is not None, "sampling requires an rng"
        return dist.sample(rng), vq_loss
