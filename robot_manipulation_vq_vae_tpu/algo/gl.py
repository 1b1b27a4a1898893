"""Goal learning: subgoal prediction networks + value-guided planner
(reference ``robomimic/algo/gl.py:37-775``).

  GL           - deterministic subgoal predictor: MIMO_MLP from (obs, goal)
                 to the subgoal observation dict, MSE loss (:37-256).
  GL_VAE       - conditional VAE over subgoals (:257-499).
  ValuePlanner - composite of a GL planner and a ValueAlgo (BCQ by default):
                 sample N candidate subgoals, rank by the value network,
                 return the best (:500-775).
"""

from collections import OrderedDict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from robot_manipulation_vq_vae_tpu.algo.algo import (
    AlgoState,
    PlannerAlgo,
    ValueAlgo,
    device_process_obs,
    register_algo_factory_func,
)
from robot_manipulation_vq_vae_tpu.algo.icl import (
    _device_batch,
    _encoder_kwargs,
    _goal_of,
)
from robot_manipulation_vq_vae_tpu.models import base_nets as BaseNets
from robot_manipulation_vq_vae_tpu.models.obs_nets import (
    MIMO_MLP,
    ObservationDecoder,
    ObservationGroupEncoder,
    group_shapes_spec,
)


@register_algo_factory_func("gl")
def algo_config_to_class(algo_config):
    """Reference gl.py:21-34."""
    if algo_config.vae.enabled:
        return GL_VAE, {}
    return GL, {}


class GL(PlannerAlgo):
    """Deterministic subgoal prediction (reference gl.py:37-256)."""

    def __init__(self, algo_config, obs_config, global_config, obs_key_shapes,
                 ac_dim, device=None):
        self._subgoal_horizon = algo_config.subgoal_horizon
        super().__init__(
            algo_config, obs_config, global_config, obs_key_shapes, ac_dim,
            device,
        )
        assert len(self.subgoal_shapes) > 0, (
            "GL requires at least one subgoal modality — set "
            "observation.modalities.subgoal (otherwise the goal network has "
            "no outputs and the loss degenerates)"
        )

    def _create_networks(self):
        self.nets["goal_network"] = GoalNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            subgoal_shapes=tuple(self.subgoal_shapes.items()),
            layer_dims=tuple(self.algo_config.ae.planner_layer_dims),
            encoder_kwargs=_encoder_kwargs(self.obs_config),
        )

    def process_batch_for_training(self, batch):
        """obs at t=0, subgoal = next_obs at t=subgoal_horizon-1
        (reference gl.py:98-123)."""
        sh = self._subgoal_horizon
        return {
            "obs": {k: np.asarray(v)[:, 0] for k, v in batch["obs"].items()},
            "subgoals": {
                k: np.asarray(v)[:, sh - 1]
                for k, v in batch["next_obs"].items()
                if k in self.subgoal_shapes
            },
            "goal_obs": batch.get("goal_obs", None),
            "actions": np.asarray(batch["actions"])[:, 0],
        }

    def get_actor_goal_for_training_from_processed_batch(self, processed_batch,
                                                         **kwargs):
        """Ground-truth subgoals supervise the actor (reference gl.py:124-136)."""
        return processed_batch["subgoals"]

    def _init_variables(self, rng, batch):
        obs = device_process_obs(
            {k: jnp.asarray(v) for k, v in batch["obs"].items()}
        )
        return {
            "goal_network": self.nets["goal_network"].init(
                {"params": rng}, obs, goal_dict=_goal_of(batch)
            )
        }

    def _build_train_step(self):
        net = self.nets["goal_network"]
        opt = self.optimizers["goal_network"]
        import optax

        def step(state, batch, validate):
            rng, r1 = jax.random.split(state.rng)

            def loss_fn(params):
                obs = device_process_obs(batch["obs"])
                subgoals = device_process_obs(batch["subgoals"])
                pred = net.apply(
                    {"params": params["goal_network"],
                     **state.aux["goal_network"]},
                    obs, goal_dict=_goal_of(batch),
                )
                per_key = OrderedDict(
                    (f"goal_{k}_loss", jnp.mean((pred[k] - subgoals[k]) ** 2))
                    for k in pred
                )
                loss = sum(per_key.values())
                per_key["goal_loss"] = loss
                return loss, per_key

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            metrics = dict(losses)

            def do_update(_):
                updates, o = opt.update(
                    grads["goal_network"], state.opt_states["goal_network"],
                    state.params["goal_network"],
                )
                return (
                    optax.apply_updates(state.params["goal_network"], updates),
                    o,
                )

            def no_update(_):
                return (
                    state.params["goal_network"],
                    state.opt_states["goal_network"],
                )

            new_p, new_o = jax.lax.cond(validate, no_update, do_update, None)
            return (
                AlgoState(
                    params={**state.params, "goal_network": new_p},
                    aux=state.aux,
                    opt_states={**state.opt_states, "goal_network": new_o},
                    step=state.step + 1, rng=rng,
                ),
                metrics,
            )

        return jax.jit(step, static_argnums=2)

    def train_on_batch(self, batch, epoch, validate=False):
        jbatch = _device_batch(batch)
        jbatch["subgoals"] = {
            k: jnp.asarray(v) for k, v in batch["subgoals"].items()
        }
        self.ensure_state(jbatch)
        if self._train_step_jit is None:
            self._train_step_jit = self._build_train_step()
        self.state, metrics = self._train_step_jit(
            self.state, jbatch, validate, *self._extra_step_args(epoch)
        )
        return {"losses": metrics}

    def _extra_step_args(self, epoch):
        """Plain GL's step is fully deterministic; GL_VAE appends its
        injected-noise seam here."""
        return ()

    def log_info(self, info):
        log = OrderedDict((k, float(v)) for k, v in info["losses"].items())
        log["Loss"] = log.get("goal_loss", 0.0)
        return log

    def get_subgoal_predictions(self, obs_dict, goal_dict=None):
        net = self.nets["goal_network"]

        def infer(params, aux, obs, goal):
            return net.apply(
                {"params": params, **aux}, device_process_obs(obs),
                goal_dict=goal,
            )

        return self._cached_jit("get_subgoal_predictions", infer)(
            self.state.params["goal_network"], self.state.aux["goal_network"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()}, goal_dict,
        )

    def sample_subgoals(self, obs_dict, goal_dict=None, num_samples=1):
        """Deterministic predictor: tile the single prediction
        (reference gl.py:218-242)."""
        preds = self.get_subgoal_predictions(obs_dict, goal_dict)
        return {k: jnp.repeat(v, num_samples, axis=0) for k, v in preds.items()}

    def get_action(self, obs_dict, goal_dict=None):
        raise RuntimeError("GL is a planner, not a policy (reference gl.py:243)")


class GoalNetwork(nn.Module):
    """(obs, goal) -> subgoal obs dict via MIMO_MLP heads."""

    obs_shapes: tuple
    subgoal_shapes: tuple
    layer_dims: tuple = (300, 400)
    goal_shapes: tuple = None
    encoder_kwargs: dict = None

    def setup(self):
        groups = {"obs": dict(self.obs_shapes)}
        if self.goal_shapes:
            groups["goal"] = dict(self.goal_shapes)
        self.net = MIMO_MLP(
            input_obs_group_shapes=group_shapes_spec(groups),
            output_shapes=tuple(self.subgoal_shapes),
            layer_dims=tuple(self.layer_dims),
            encoder_kwargs=self.encoder_kwargs,
        )

    def __call__(self, obs_dict, goal_dict=None, train=False):
        kwargs = {"obs": obs_dict}
        if self.goal_shapes:
            kwargs["goal"] = goal_dict
        return self.net(train=train, **kwargs)


class SubgoalVAE(nn.Module):
    """Conditional VAE over flattened subgoal observations."""

    obs_shapes: tuple
    subgoal_shapes: tuple
    latent_dim: int = 16
    kl_weight: float = 1.0
    encoder_layer_dims: tuple = (300, 400)
    decoder_layer_dims: tuple = (300, 400)
    goal_shapes: tuple = None
    encoder_kwargs: dict = None

    def setup(self):
        groups = {"obs": dict(self.obs_shapes)}
        if self.goal_shapes:
            groups["goal"] = dict(self.goal_shapes)
        self.cond_encoder = ObservationGroupEncoder(
            observation_group_shapes=group_shapes_spec(groups),
            encoder_kwargs=self.encoder_kwargs,
        )
        self.q_net = BaseNets.MLP(
            output_dim=2 * self.latent_dim, layer_dims=self.encoder_layer_dims
        )
        self.dec_mlp = BaseNets.MLP(
            output_dim=self.decoder_layer_dims[-1],
            layer_dims=self.decoder_layer_dims[:-1],
            output_activation=nn.relu,
        )
        self.dec_heads = ObservationDecoder(
            decode_shapes=tuple(self.subgoal_shapes)
        )

    def _cond(self, obs_dict, goal_dict, train):
        kwargs = {"obs": obs_dict}
        if self.goal_shapes:
            kwargs["goal"] = goal_dict
        return self.cond_encoder(train=train, **kwargs)

    def _flatten_subgoals(self, subgoal_dict):
        parts = [
            subgoal_dict[k].reshape(subgoal_dict[k].shape[0], -1)
            for k, _ in self.subgoal_shapes
        ]
        return jnp.concatenate(parts, axis=-1)

    def decode(self, z, cond):
        h = self.dec_mlp(jnp.concatenate([cond, z], axis=-1))
        return self.dec_heads(h)

    def forward_train(self, subgoal_dict, obs_dict, goal_dict=None, train=False,
                      eps=None):
        """``eps`` optionally injects the standard-normal encoder draw —
        the determinism seam the GL_VAE/IRIS parity harnesses use
        (tests/test_iris_parity.py)."""
        rng = self.make_rng("latent")
        cond = self._cond(obs_dict, goal_dict, train)
        flat_sg = self._flatten_subgoals(subgoal_dict)
        out = self.q_net(jnp.concatenate([cond, flat_sg], axis=-1))
        mu, logvar = jnp.split(out, 2, axis=-1)
        if eps is None:
            eps = jax.random.normal(rng, mu.shape)
        z = mu + jnp.exp(0.5 * logvar) * eps
        recons = self.decode(z, cond)
        recon_loss = sum(
            jnp.mean((recons[k] - subgoal_dict[k]) ** 2) for k, _ in
            self.subgoal_shapes
        )
        from robot_manipulation_vq_vae_tpu.utils import loss_utils as LossUtils

        kl = LossUtils.kld_0_1_loss(mu, logvar)
        return {
            "reconstructions": recons,
            "reconstruction_loss": recon_loss,
            "kl_loss": kl,
            "encoder_z": z,
        }

    def __call__(self, obs_dict, goal_dict=None, train=False):
        """Sample subgoals from the prior."""
        rng = self.make_rng("latent")
        cond = self._cond(obs_dict, goal_dict, train)
        z = jax.random.normal(rng, (cond.shape[0], self.latent_dim))
        return self.decode(z, cond)


class GL_VAE(GL):
    """VAE subgoal planner (reference gl.py:257-499)."""

    # Optional determinism seam for the parity harness: a zero-arg callable
    # returning the encoder's standard-normal eps (tests/test_iris_parity.py)
    _noise_hook = None

    def _extra_step_args(self, epoch):
        return (self._noise_hook() if self._noise_hook is not None else None,)

    def _create_networks(self):
        self.nets["goal_network"] = SubgoalVAE(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            subgoal_shapes=tuple(self.subgoal_shapes.items()),
            latent_dim=self.algo_config.vae.latent_dim,
            kl_weight=self.algo_config.vae.kl_weight,
            encoder_layer_dims=tuple(self.algo_config.vae.encoder_layer_dims),
            decoder_layer_dims=tuple(self.algo_config.vae.decoder_layer_dims),
            encoder_kwargs=_encoder_kwargs(self.obs_config),
        )

    def _init_variables(self, rng, batch):
        r1, r2 = jax.random.split(rng)
        obs = device_process_obs(
            {k: jnp.asarray(v) for k, v in batch["obs"].items()}
        )
        subgoals = device_process_obs(
            {k: jnp.asarray(v) for k, v in batch["subgoals"].items()}
        )
        return {
            "goal_network": self.nets["goal_network"].init(
                {"params": r1, "latent": r2}, subgoals, obs,
                goal_dict=_goal_of(batch),
                method=self.nets["goal_network"].forward_train,
            )
        }

    def _build_train_step(self):
        net = self.nets["goal_network"]
        opt = self.optimizers["goal_network"]
        kl_weight = float(self.algo_config.vae.kl_weight)
        import optax

        def step(state, batch, validate, eps):
            rng, r1 = jax.random.split(state.rng)

            def loss_fn(params):
                obs = device_process_obs(batch["obs"])
                subgoals = device_process_obs(batch["subgoals"])
                out = net.apply(
                    {"params": params["goal_network"],
                     **state.aux["goal_network"]},
                    subgoals, obs, goal_dict=_goal_of(batch),
                    rngs={"latent": r1},
                    method=net.forward_train, eps=eps,
                )
                loss = out["reconstruction_loss"] + kl_weight * out["kl_loss"]
                return loss, OrderedDict(
                    goal_loss=loss,
                    recons_loss=out["reconstruction_loss"],
                    kl_loss=out["kl_loss"],
                )

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            metrics = dict(losses)

            def do_update(_):
                updates, o = opt.update(
                    grads["goal_network"], state.opt_states["goal_network"],
                    state.params["goal_network"],
                )
                return (
                    optax.apply_updates(state.params["goal_network"], updates),
                    o,
                )

            def no_update(_):
                return (
                    state.params["goal_network"],
                    state.opt_states["goal_network"],
                )

            new_p, new_o = jax.lax.cond(validate, no_update, do_update, None)
            return (
                AlgoState(
                    params={**state.params, "goal_network": new_p},
                    aux=state.aux,
                    opt_states={**state.opt_states, "goal_network": new_o},
                    step=state.step + 1, rng=rng,
                ),
                metrics,
            )

        return jax.jit(step, static_argnums=2)

    def get_subgoal_predictions(self, obs_dict, goal_dict=None):
        net = self.nets["goal_network"]

        def infer(params, aux, obs, goal, key):
            return net.apply(
                {"params": params, **aux}, device_process_obs(obs),
                goal_dict=goal, rngs={"latent": key},
            )

        self._init_rng, key = jax.random.split(self._init_rng)
        return self._cached_jit("get_subgoal_predictions", infer)(
            self.state.params["goal_network"], self.state.aux["goal_network"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()}, goal_dict, key,
        )

    def sample_subgoals(self, obs_dict, goal_dict=None, num_samples=1):
        obs = {
            k: jnp.repeat(jnp.asarray(v), num_samples, axis=0)
            for k, v in obs_dict.items()
        }
        return self.get_subgoal_predictions(obs, goal_dict)


class ValuePlanner(PlannerAlgo, ValueAlgo):
    """GL planner + value network ranking (reference gl.py:500-775)."""

    def __init__(self, planner_algo_class, value_algo_class, algo_config,
                 obs_config, global_config, obs_key_shapes, ac_dim, device=None):
        self.algo_config = algo_config
        self.obs_config = obs_config
        self.global_config = global_config
        self.ac_dim = ac_dim
        self.device = device

        self.planner = planner_algo_class(
            algo_config=algo_config.planner,
            obs_config=obs_config.planner,
            global_config=global_config,
            obs_key_shapes=obs_key_shapes,
            ac_dim=ac_dim,
            device=device,
        )
        self.value_net = value_algo_class(
            algo_config=algo_config.value,
            obs_config=obs_config.value,
            global_config=global_config,
            obs_key_shapes=obs_key_shapes,
            ac_dim=ac_dim,
            device=device,
        )
        self.subgoal_shapes = self.planner.subgoal_shapes
        self.obs_shapes = self.planner.obs_shapes
        self.goal_shapes = self.planner.goal_shapes
        self.num_samples = algo_config.num_samples

    def __repr__(self):
        return "{} (\n  planner: {!r}\n  value_net: {!r}\n)".format(
            self.__class__.__name__, self.planner, self.value_net
        )

    def process_batch_for_training(self, batch):
        return {
            "planner": self.planner.process_batch_for_training(batch),
            "value_net": self.value_net.process_batch_for_training(batch),
        }

    def train_on_batch(self, batch, epoch, validate=False):
        info = {
            "planner": self.planner.train_on_batch(
                batch["planner"], epoch, validate=validate
            ),
            "value_net": self.value_net.train_on_batch(
                batch["value_net"], epoch, validate=validate
            ),
        }
        return info

    def log_info(self, info):
        log = OrderedDict()
        for k, v in self.planner.log_info(info["planner"]).items():
            log[f"Planner/{k}"] = v
        for k, v in self.value_net.log_info(info["value_net"]).items():
            log[f"ValueNetwork/{k}"] = v
        log["Loss"] = log.get("Planner/Loss", 0.0) + log.get(
            "ValueNetwork/Loss", 0.0
        )
        return log

    def get_subgoal_predictions(self, obs_dict, goal_dict=None):
        """Sample candidates, rank by state value, pick best
        (reference gl.py:702-736)."""
        n = self.num_samples
        samples = self.planner.sample_subgoals(
            obs_dict, goal_dict=goal_dict, num_samples=n
        )
        values = self.value_net.get_state_value(samples).reshape(-1, n)
        best = jnp.argmax(values, axis=1)
        out = {}
        b = best.shape[0]
        for k, v in samples.items():
            v = v.reshape((b, n) + v.shape[1:])
            idx = best.reshape((b,) + (1,) * (v.ndim - 1))
            out[k] = jnp.take_along_axis(v, idx, axis=1)[:, 0]
        return out

    def sample_subgoals(self, obs_dict, goal_dict=None, num_samples=1):
        return self.planner.sample_subgoals(obs_dict, goal_dict, num_samples)

    def get_state_value(self, obs_dict, goal_dict=None):
        return self.value_net.get_state_value(obs_dict, goal_dict)

    def get_state_action_value(self, obs_dict, actions, goal_dict=None):
        return self.value_net.get_state_action_value(obs_dict, actions, goal_dict)

    def serialize(self, include_optimizer=False):
        return {
            "planner": self.planner.serialize(include_optimizer),
            "value_net": self.value_net.serialize(include_optimizer),
        }

    def deserialize(self, model_dict):
        self.planner.deserialize(model_dict["planner"])
        self.value_net.deserialize(model_dict["value_net"])

    def set_eval(self):
        self.planner.set_eval()
        self.value_net.set_eval()

    def set_train(self):
        self.planner.set_train()
        self.value_net.set_train()

    def on_epoch_end(self, epoch):
        self.planner.on_epoch_end(epoch)
        self.value_net.on_epoch_end(epoch)

    def reset(self):
        self.planner.reset()
        self.value_net.reset()

    def get_actor_goal_for_training_from_processed_batch(self, processed_batch,
                                                         **kwargs):
        return self.planner.get_actor_goal_for_training_from_processed_batch(
            processed_batch["planner"], **kwargs
        )
