"""Batch-Constrained Q-learning (reference ``robomimic/algo/bcq.py:51-1022``).

Components: a cVAE action sampler (trained like BC_VAE), twin critics with
targets (weighted min/max ensemble combine), and an optional perturbation
actor. Targets: sample N candidate actions from the sampler at s', optionally
perturb, take the per-sample ensemble-combined Q, then max over samples.
Action selection at rollout samples ``num_action_samples_rollout`` candidates
and picks the argmax-Q one.
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from robot_manipulation_vq_vae_tpu.algo.algo import (
    AlgoState,
    PolicyAlgo,
    device_process_obs,
    register_algo_factory_func,
)
from robot_manipulation_vq_vae_tpu.algo.icl import _encoder_kwargs
from robot_manipulation_vq_vae_tpu.algo.iql import polyak
from robot_manipulation_vq_vae_tpu.models import base_nets as BaseNets
from robot_manipulation_vq_vae_tpu.models import vae_nets as VAENets
from robot_manipulation_vq_vae_tpu.models import value_nets as ValueNets
from robot_manipulation_vq_vae_tpu.utils import loss_utils as LossUtils


@register_algo_factory_func("bcq")
def algo_config_to_class(algo_config):
    return BCQ, {}


class BCQ(PolicyAlgo):
    def _create_networks(self):
        cfg = self.algo_config
        obs_spec = tuple(self.obs_shapes.items())
        goal_spec = tuple(self.goal_shapes.items()) or None
        enc = _encoder_kwargs(self.obs_config)
        self.n_critics = cfg.critic.ensemble.n
        vb = cfg.critic.value_bounds
        for i in range(self.n_critics):
            self.nets[f"critic{i}"] = ValueNets.ActionValueNetwork(
                obs_shapes=obs_spec, goal_shapes=goal_spec,
                ac_dim=self.ac_dim,
                mlp_layer_dims=tuple(cfg.critic.layer_dims),
                value_bounds=tuple(vb) if vb else None,
                encoder_kwargs=enc,
            )
        self.nets["action_sampler"] = VAENets.VAEActor(
            obs_shapes=obs_spec, goal_shapes=goal_spec,
            ac_dim=self.ac_dim,
            encoder_kwargs=enc,
            **VAENets.vae_args_from_config(cfg.action_sampler.vae),
        )
        self.actor_enabled = cfg.actor.enabled
        if self.actor_enabled:
            self.nets["actor"] = BaseNets.MLP(
                output_dim=self.ac_dim,
                layer_dims=tuple(cfg.actor.layer_dims),
            )

    def _create_optimizers(self):
        from robot_manipulation_vq_vae_tpu.utils import optim_utils as OptimUtils

        mg = self.global_config.train.get("max_grad_norm", None)
        t_critic = OptimUtils.optimizer_from_optim_params(
            self.optim_params["critic"], max_grad_norm=mg
        )
        for i in range(self.n_critics):
            self.optimizers[f"critic{i}"] = t_critic
        self.optimizers["action_sampler"] = OptimUtils.optimizer_from_optim_params(
            self.optim_params["action_sampler"], max_grad_norm=mg
        )
        if self.algo_config.actor.enabled:
            self.optimizers["actor"] = OptimUtils.optimizer_from_optim_params(
                self.optim_params["actor"], max_grad_norm=mg
            )

    # batch prep identical to TD3-BC (n-step)
    def process_batch_for_training(self, batch):
        from robot_manipulation_vq_vae_tpu.algo.td3_bc import TD3_BC

        return TD3_BC.process_batch_for_training(self, batch)

    def _init_variables(self, rng, batch):
        rngs = jax.random.split(rng, self.n_critics + 2)
        obs = device_process_obs(
            {k: jnp.asarray(v) for k, v in batch["obs"].items()}
        )
        acts = jnp.asarray(batch["actions"])
        out = {}
        for i in range(self.n_critics):
            v = self.nets[f"critic{i}"].init({"params": rngs[i]}, obs, acts)
            out[f"critic{i}"] = v
            out[f"critic{i}_target"] = jax.tree_util.tree_map(jnp.array, v)
        out["action_sampler"] = self.nets["action_sampler"].init(
            {"params": rngs[-2], "latent": rngs[-1]}, acts, obs,
            method=self.nets["action_sampler"].forward_train,
        )
        if self.actor_enabled:
            feat = jnp.zeros((1, 1))
            raise NotImplementedError(
                "BCQ perturbation actor is disabled by default in the "
                "reference config; enable-path lands in a later round"
            )
        return out

    def _sample_actions(self, params, aux, obs, rng, num_samples):
        """Tile obs x num_samples, decode prior samples from the cVAE."""
        sampler = self.nets["action_sampler"]
        tiled = {
            k: jnp.repeat(v, num_samples, axis=0) for k, v in obs.items()
        }
        acts = sampler.apply(
            {"params": params, **aux}, tiled, rngs={"latent": rng}
        )
        return tiled, acts

    def _build_train_step(self):
        cfg = self.algo_config
        n = self.n_critics
        critics = [self.nets[f"critic{i}"] for i in range(n)]
        sampler = self.nets["action_sampler"]
        opts = self.optimizers
        discount = float(cfg.discount) ** int(cfg.n_step)
        tau = float(cfg.target_tau)
        ens_w = float(cfg.critic.ensemble.weight)
        n_samples = int(cfg.critic.num_action_samples)
        use_huber = cfg.critic.use_huber
        kl_weight = float(cfg.action_sampler.vae.kl_weight)
        import optax

        def apply_net(net, params, aux, *args, **kwargs):
            return net.apply({"params": params, **aux}, *args, **kwargs)

        def step(state, batch, validate):
            rng, r_lat, r_samp = jax.random.split(state.rng, 3)
            obs = device_process_obs(batch["obs"])
            next_obs = device_process_obs(batch["next_obs"])
            acts, rewards, dones = (
                batch["actions"], batch["rewards"], batch["dones"],
            )
            b = acts.shape[0]
            metrics = OrderedDict()
            new_params = dict(state.params)
            new_opts = dict(state.opt_states)

            # ---- action sampler (cVAE) update
            def s_loss(p):
                out = apply_net(
                    sampler, p, state.aux["action_sampler"], acts, obs,
                    rngs={"latent": r_lat},
                    method=sampler.forward_train,
                )
                return (
                    out["reconstruction_loss"] + kl_weight * out["kl_loss"],
                    out,
                )

            (sampler_loss, s_out), g_s = jax.value_and_grad(
                s_loss, has_aux=True
            )(state.params["action_sampler"])
            metrics["action_sampler/loss"] = sampler_loss
            metrics["action_sampler/kl_loss"] = s_out["kl_loss"]
            updates, o = opts["action_sampler"].update(
                g_s, state.opt_states["action_sampler"],
                state.params["action_sampler"],
            )
            new_params["action_sampler"] = optax.apply_updates(
                state.params["action_sampler"], updates
            )
            new_opts["action_sampler"] = o

            # ---- critic targets: sample candidates at s', max over samples
            tiled_next, cand = self._sample_actions(
                new_params["action_sampler"], state.aux["action_sampler"],
                next_obs, r_samp, n_samples,
            )
            q_next_all = jnp.stack(
                [
                    apply_net(
                        critics[i], state.params[f"critic{i}_target"],
                        state.aux[f"critic{i}"], tiled_next, cand,
                    )
                    for i in range(n)
                ]
            )  # [n, B*S, 1]
            q_comb = ens_w * jnp.min(q_next_all, axis=0) + (1 - ens_w) * jnp.max(
                q_next_all, axis=0
            )
            q_max = jnp.max(q_comb.reshape(b, n_samples), axis=1, keepdims=True)
            q_target = jax.lax.stop_gradient(
                rewards + (1.0 - dones) * discount * q_max
            )

            for i in range(n):
                def c_loss(p):
                    q = apply_net(
                        critics[i], p, state.aux[f"critic{i}"], obs, acts
                    )
                    if use_huber:
                        return LossUtils.smooth_l1_loss(q, q_target)
                    return jnp.mean((q - q_target) ** 2)

                loss_i, g = jax.value_and_grad(c_loss)(state.params[f"critic{i}"])
                metrics[f"critic/critic{i+1}_loss"] = loss_i
                updates, o = opts[f"critic{i}"].update(
                    g, state.opt_states[f"critic{i}"],
                    state.params[f"critic{i}"],
                )
                new_params[f"critic{i}"] = optax.apply_updates(
                    state.params[f"critic{i}"], updates
                )
                new_opts[f"critic{i}"] = o
                new_params[f"critic{i}_target"] = polyak(
                    state.params[f"critic{i}_target"],
                    new_params[f"critic{i}"], tau,
                )

            def choose(new, old):
                return jax.tree_util.tree_map(
                    lambda a, c: jnp.where(validate, c, a), new, old
                )

            new_params = choose(new_params, state.params)
            new_opts = choose(new_opts, state.opt_states)
            return (
                AlgoState(
                    params=new_params, aux=state.aux, opt_states=new_opts,
                    step=state.step + 1, rng=rng,
                ),
                metrics,
            )

        return jax.jit(step, static_argnums=2)

    def train_on_batch(self, batch, epoch, validate=False):
        from robot_manipulation_vq_vae_tpu.algo.td3_bc import TD3_BC

        return TD3_BC.train_on_batch(self, batch, epoch, validate)

    def log_info(self, info):
        log = OrderedDict((k, float(v)) for k, v in info["losses"].items())
        log["Loss"] = log.get("action_sampler/loss", 0.0)
        return log

    def get_state_value(self, obs_dict, goal_dict=None):
        """V(s) estimated as the best Q over sampled candidate actions
        (reference bcq.py get_state_value)."""
        cfg = self.algo_config
        n_samples = int(cfg.critic.num_action_samples_rollout)
        obs = device_process_obs({k: jnp.asarray(v) for k, v in obs_dict.items()})
        b = next(iter(obs.values())).shape[0]
        self._init_rng, key = jax.random.split(self._init_rng)
        tiled, cand = self._sample_actions(
            self.state.params["action_sampler"],
            self.state.aux["action_sampler"], obs, key, n_samples,
        )
        q = self.nets["critic0"].apply(
            {"params": self.state.params["critic0"], **self.state.aux["critic0"]},
            tiled, cand,
        ).reshape(b, n_samples)
        return jnp.max(q, axis=1, keepdims=True)

    def get_state_action_value(self, obs_dict, actions, goal_dict=None):
        obs = device_process_obs({k: jnp.asarray(v) for k, v in obs_dict.items()})
        return self.nets["critic0"].apply(
            {"params": self.state.params["critic0"], **self.state.aux["critic0"]},
            obs, jnp.asarray(actions),
        )

    def get_action(self, obs_dict, goal_dict=None):
        """Sample candidates, pick argmax-Q (reference bcq.py get_action)."""
        cfg = self.algo_config
        n_samples = int(cfg.critic.num_action_samples_rollout)
        obs = device_process_obs({k: jnp.asarray(v) for k, v in obs_dict.items()})
        b = next(iter(obs.values())).shape[0]
        self._init_rng, key = jax.random.split(self._init_rng)
        tiled, cand = self._sample_actions(
            self.state.params["action_sampler"],
            self.state.aux["action_sampler"], obs, key, n_samples,
        )
        q = self.nets["critic0"].apply(
            {"params": self.state.params["critic0"], **self.state.aux["critic0"]},
            tiled, cand,
        ).reshape(b, n_samples)
        best = jnp.argmax(q, axis=1)
        cand = cand.reshape(b, n_samples, -1)
        return jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0]
