"""Implicit Q-Learning (reference ``robomimic/algo/iql.py:37-427``).

Functional design: one jitted step updating critic ensemble (TD against
r + gamma * V(s')), value function (expectile regression against min-Q,
reference iql.py:224-237), and advantage-weighted actor (exp(adv/beta)
weights, :330-356). Target critics live as extra (optimizer-less) param
entries and are EMA-polyak'd inside the step.
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
from robot_manipulation_vq_vae_tpu.models import policy_nets as PolicyNets
from robot_manipulation_vq_vae_tpu.models import value_nets as ValueNets
from robot_manipulation_vq_vae_tpu.utils import loss_utils as LossUtils


@register_algo_factory_func("iql")
def algo_config_to_class(algo_config):
    return IQL, {}


def polyak(target, online, tau):
    return jax.tree_util.tree_map(
        lambda t, o: (1.0 - tau) * t + tau * o, target, online
    )


class IQL(PolicyAlgo):
    def _create_networks(self):
        cfg = self.algo_config
        obs_spec = tuple(self.obs_shapes.items())
        goal_spec = tuple(self.goal_shapes.items()) or None
        enc = _encoder_kwargs(self.obs_config)

        self.n_critics = cfg.critic.ensemble.n
        for i in range(self.n_critics):
            self.nets[f"critic{i}"] = ValueNets.ActionValueNetwork(
                obs_shapes=obs_spec, goal_shapes=goal_spec,
                ac_dim=self.ac_dim,
                mlp_layer_dims=tuple(cfg.critic.layer_dims),
                encoder_kwargs=enc,
            )
        self.nets["vf"] = ValueNets.ValueNetwork(
            obs_shapes=obs_spec, goal_shapes=goal_spec,
            mlp_layer_dims=tuple(cfg.critic.layer_dims),
            encoder_kwargs=enc,
        )
        actor_type = cfg.actor.net.type
        if actor_type == "gaussian":
            self.nets["actor"] = PolicyNets.GaussianActorNetwork(
                obs_shapes=obs_spec, goal_shapes=goal_spec,
                ac_dim=self.ac_dim,
                mlp_layer_dims=tuple(cfg.actor.layer_dims),
                fixed_std=cfg.actor.net.gaussian.fixed_std,
                init_std=cfg.actor.net.gaussian.init_std,
                init_last_fc_weight=cfg.actor.net.gaussian.get(
                    "init_last_fc_weight", None
                ),
                std_activation=cfg.actor.net.common.std_activation,
                low_noise_eval=cfg.actor.net.common.low_noise_eval,
                use_tanh=cfg.actor.net.common.get("use_tanh", False),
                encoder_kwargs=enc,
            )
        elif actor_type == "gmm":
            self.nets["actor"] = PolicyNets.GMMActorNetwork(
                obs_shapes=obs_spec, goal_shapes=goal_spec,
                ac_dim=self.ac_dim,
                mlp_layer_dims=tuple(cfg.actor.layer_dims),
                num_modes=cfg.actor.net.gmm.num_modes,
                min_std=cfg.actor.net.gmm.min_std,
                std_activation=cfg.actor.net.common.std_activation,
                low_noise_eval=cfg.actor.net.common.low_noise_eval,
                encoder_kwargs=enc,
            )
        else:
            raise ValueError(f"unknown actor type {actor_type}")

    def _create_optimizers(self):
        """critic/vf/actor optim param groups; the critic transform is shared
        across ensemble members (separate states per member)."""
        from robot_manipulation_vq_vae_tpu.utils import optim_utils as OptimUtils

        mg = self.global_config.train.get("max_grad_norm", None)
        t_critic = OptimUtils.optimizer_from_optim_params(
            self.optim_params["critic"],
            max_grad_norm=self.algo_config.critic.get("max_gradient_norm", None) or mg,
        )
        for i in range(self.n_critics):
            self.optimizers[f"critic{i}"] = t_critic
        self.optimizers["vf"] = OptimUtils.optimizer_from_optim_params(
            self.optim_params["vf"], max_grad_norm=mg
        )
        self.optimizers["actor"] = OptimUtils.optimizer_from_optim_params(
            self.optim_params["actor"],
            max_grad_norm=self.algo_config.actor.get("max_gradient_norm", None) or mg,
        )

    def process_batch_for_training(self, batch):
        """(s, a, r, s', done) at t=0 (reference iql.py:106-130)."""
        return {
            "obs": {k: np.asarray(v)[:, 0] for k, v in batch["obs"].items()},
            "next_obs": {
                k: np.asarray(v)[:, 0] for k, v in batch["next_obs"].items()
            },
            "goal_obs": batch.get("goal_obs", None),
            "actions": np.asarray(batch["actions"])[:, 0],
            "rewards": np.asarray(batch["rewards"])[:, 0].reshape(-1, 1),
            "dones": np.asarray(batch["dones"])[:, 0].reshape(-1, 1),
        }

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
        out["vf"] = self.nets["vf"].init({"params": rngs[-2]}, obs)
        out["actor"] = self.nets["actor"].init({"params": rngs[-1]}, obs)
        return out

    def _build_train_step(self):
        cfg = self.algo_config
        n = self.n_critics
        critics = [self.nets[f"critic{i}"] for i in range(n)]
        vf, actor = self.nets["vf"], self.nets["actor"]
        opts = self.optimizers
        discount = float(cfg.discount)
        tau = float(cfg.target_tau)
        expectile = float(cfg.vf_quantile)
        beta = float(cfg.adv.beta)
        clip_adv = cfg.adv.clip_adv_value
        use_final_clip = cfg.adv.use_final_clip
        use_huber = cfg.critic.use_huber
        import optax

        def apply_net(net, params, aux, *args, **kwargs):
            return net.apply({"params": params, **aux}, *args, **kwargs)

        def step(state, batch, validate):
            rng, r_new = jax.random.split(state.rng)
            obs = device_process_obs(batch["obs"])
            next_obs = device_process_obs(batch["next_obs"])
            acts = batch["actions"]
            rewards, dones = batch["rewards"], batch["dones"]

            # --- targets ---
            v_next = apply_net(vf, state.params["vf"], state.aux["vf"], next_obs)
            q_target = rewards + (1.0 - dones) * discount * v_next
            q_target = jax.lax.stop_gradient(q_target)

            # --- critic losses (TD) ---
            def critic_loss(params_i, i):
                q = apply_net(critics[i], params_i, state.aux[f"critic{i}"],
                              obs, acts)
                if use_huber:
                    return LossUtils.smooth_l1_loss(q, q_target)
                return jnp.mean((q - q_target) ** 2)

            new_params = dict(state.params)
            new_opts = dict(state.opt_states)
            metrics = OrderedDict()
            for i in range(n):
                loss_i, g_i = jax.value_and_grad(critic_loss)(
                    state.params[f"critic{i}"], i
                )
                metrics[f"critic/critic{i+1}_loss"] = loss_i
                updates, o = opts[f"critic{i}"].update(
                    g_i, state.opt_states[f"critic{i}"],
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

            # --- value expectile regression against min target-Q ---
            q_tgt_pred = jnp.min(
                jnp.stack(
                    [
                        apply_net(
                            critics[i], state.params[f"critic{i}_target"],
                            state.aux[f"critic{i}"], obs, acts,
                        )
                        for i in range(n)
                    ]
                ),
                axis=0,
            )
            q_tgt_pred = jax.lax.stop_gradient(q_tgt_pred)

            def vf_loss_fn(vf_params):
                v = apply_net(vf, vf_params, state.aux["vf"], obs)
                err = q_tgt_pred - v
                weight = jnp.where(err > 0, expectile, 1.0 - expectile)
                return jnp.mean(weight * err**2), v

            (vf_loss, v_pred), g_vf = jax.value_and_grad(
                vf_loss_fn, has_aux=True
            )(state.params["vf"])
            metrics["vf_loss"] = vf_loss
            updates, o = opts["vf"].update(
                g_vf, state.opt_states["vf"], state.params["vf"]
            )
            new_params["vf"] = optax.apply_updates(state.params["vf"], updates)
            new_opts["vf"] = o

            # --- advantage-weighted actor ---
            adv = q_tgt_pred - v_pred
            if clip_adv is not None:
                # reference clamps the MAX only (iql.py:348)
                adv = jnp.minimum(adv, clip_adv)
            weights = jnp.exp(adv / beta)
            if use_final_clip:
                weights = jnp.clip(weights, None, 100.0)
            weights = jax.lax.stop_gradient(weights[:, 0])

            def actor_loss_fn(actor_params):
                dist = apply_net(
                    actor, actor_params, state.aux["actor"], obs, train=True
                )
                lp = dist.log_prob(acts)
                return jnp.mean(-lp * weights), jnp.mean(lp)

            (actor_loss, lp_mean), g_a = jax.value_and_grad(
                actor_loss_fn, has_aux=True
            )(state.params["actor"])
            metrics["actor/loss"] = actor_loss
            metrics["actor/log_prob"] = lp_mean
            metrics["adv/adv_mean"] = jnp.mean(adv)
            metrics["adv/weight_mean"] = jnp.mean(weights)
            updates, o = opts["actor"].update(
                g_a, state.opt_states["actor"], state.params["actor"]
            )
            new_params["actor"] = optax.apply_updates(
                state.params["actor"], updates
            )
            new_opts["actor"] = o

            def choose(new, old):
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(validate, b, a), new, old
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
        batch = {
            "obs": {k: jnp.asarray(v) for k, v in batch["obs"].items()},
            "next_obs": {
                k: jnp.asarray(v) for k, v in batch["next_obs"].items()
            },
            "actions": jnp.asarray(batch["actions"]),
            "rewards": jnp.asarray(batch["rewards"]),
            "dones": jnp.asarray(batch["dones"]),
        }
        self.ensure_state(batch)
        if self._train_step_jit is None:
            self._train_step_jit = self._build_train_step()
        self.state, metrics = self._train_step_jit(self.state, batch, validate)
        return {"losses": metrics}

    def log_info(self, info):
        log = OrderedDict()
        for k, v in info["losses"].items():
            log[k] = float(v)
        if "actor/loss" in log:
            log["Loss"] = log["actor/loss"]
        return log

    def get_action(self, obs_dict, goal_dict=None):
        actor = self.nets["actor"]

        def infer(params, aux, obs, key):
            dist = actor.apply(
                {"params": params, **aux}, device_process_obs(obs),
                train=False,
            )
            return dist.sample(key)

        self._init_rng, key = jax.random.split(self._init_rng)
        return self._cached_jit("get_action", infer)(
            self.state.params["actor"], self.state.aux["actor"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()}, key,
        )
