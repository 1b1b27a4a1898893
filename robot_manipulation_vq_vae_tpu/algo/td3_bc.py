"""TD3-BC (reference ``robomimic/algo/td3_bc.py:51-567``).

Twin critics with target-policy smoothing (clipped gaussian noise on target
actions, :304-339), weighted min/max ensemble targets, and a BC-regularized
deterministic actor: loss = -lam * Q + MSE(pi(s), a) with
lam = alpha / mean|Q| (:287-291). Actor/target updates are delayed by
``actor.update_freq`` via a branch-free where on the step counter.
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
from robot_manipulation_vq_vae_tpu.models import policy_nets as PolicyNets
from robot_manipulation_vq_vae_tpu.models import value_nets as ValueNets
from robot_manipulation_vq_vae_tpu.utils import loss_utils as LossUtils


@register_algo_factory_func("td3_bc")
def algo_config_to_class(algo_config):
    return TD3_BC, {}


class TD3_BC(PolicyAlgo):
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
        self.nets["actor"] = PolicyNets.ActorNetwork(
            obs_shapes=obs_spec, goal_shapes=goal_spec,
            ac_dim=self.ac_dim,
            mlp_layer_dims=tuple(cfg.actor.layer_dims),
            encoder_kwargs=enc,
        )

    def _create_optimizers(self):
        from robot_manipulation_vq_vae_tpu.utils import optim_utils as OptimUtils

        mg = self.global_config.train.get("max_grad_norm", None)
        t_critic = OptimUtils.optimizer_from_optim_params(
            self.optim_params["critic"], max_grad_norm=mg
        )
        for i in range(self.n_critics):
            self.optimizers[f"critic{i}"] = t_critic
        self.optimizers["actor"] = OptimUtils.optimizer_from_optim_params(
            self.optim_params["actor"], max_grad_norm=mg
        )

    def process_batch_for_training(self, batch):
        """n-step returns (reference td3_bc.py:144-195, n_step=1 default)."""
        n_step = int(self.algo_config.n_step)
        gamma = float(self.algo_config.discount)
        rewards = np.asarray(batch["rewards"])[:, :n_step]
        discounts = gamma ** np.arange(n_step)
        r = (rewards * discounts[None]).sum(axis=1).reshape(-1, 1)
        dones = np.asarray(batch["dones"])[:, :n_step].any(axis=1)
        dones = dones.astype(np.float32).reshape(-1, 1)
        if self.algo_config.infinite_horizon:
            # reference td3_bc.py:186-190: terminal rows' summed reward is
            # SCALED by 1 / (1 - gamma^n) (self.discount is gamma^n there)
            r = np.where(dones > 0, r / (1.0 - gamma**n_step), r)
        return {
            "obs": {k: np.asarray(v)[:, 0] for k, v in batch["obs"].items()},
            "next_obs": {
                k: np.asarray(v)[:, n_step - 1]
                for k, v in batch["next_obs"].items()
            },
            "goal_obs": batch.get("goal_obs", None),
            "actions": np.asarray(batch["actions"])[:, 0],
            "rewards": r,
            "dones": dones,
        }

    def _init_variables(self, rng, batch):
        rngs = jax.random.split(rng, self.n_critics + 1)
        obs = device_process_obs(
            {k: jnp.asarray(v) for k, v in batch["obs"].items()}
        )
        acts = jnp.asarray(batch["actions"])
        out = {}
        for i in range(self.n_critics):
            v = self.nets[f"critic{i}"].init({"params": rngs[i]}, obs, acts)
            out[f"critic{i}"] = v
            out[f"critic{i}_target"] = jax.tree_util.tree_map(jnp.array, v)
        v = self.nets["actor"].init({"params": rngs[-1]}, obs)
        out["actor"] = v
        out["actor_target"] = jax.tree_util.tree_map(jnp.array, v)
        return out

    def _build_train_step(self):
        cfg = self.algo_config
        n = self.n_critics
        critics = [self.nets[f"critic{i}"] for i in range(n)]
        actor = self.nets["actor"]
        opts = self.optimizers
        discount = float(cfg.discount) ** int(cfg.n_step)
        tau = float(cfg.target_tau)
        alpha = float(cfg.alpha)
        noise_std = float(cfg.actor.noise_std)
        noise_clip = float(cfg.actor.noise_clip)
        ens_w = float(cfg.critic.ensemble.weight)
        update_freq = int(cfg.actor.update_freq)
        use_huber = cfg.critic.use_huber
        import optax

        def apply_net(net, params, aux, *args, **kwargs):
            return net.apply({"params": params, **aux}, *args, **kwargs)

        def step(state, batch, gates, validate):
            rng, r_noise = jax.random.split(state.rng)
            obs = device_process_obs(batch["obs"])
            next_obs = device_process_obs(batch["next_obs"])
            acts, rewards, dones = (
                batch["actions"], batch["rewards"], batch["dones"],
            )
            metrics = OrderedDict()

            # ---- target actions with clipped smoothing noise (:304-324)
            next_a = apply_net(
                actor, state.params["actor_target"], state.aux["actor"], next_obs
            )
            noise = jnp.clip(
                noise_std * jax.random.normal(r_noise, next_a.shape),
                -noise_clip, noise_clip,
            )
            next_a = jnp.clip(next_a + noise, -1.0, 1.0)
            q_nexts = jnp.stack(
                [
                    apply_net(
                        critics[i], state.params[f"critic{i}_target"],
                        state.aux[f"critic{i}"], next_obs, next_a,
                    )
                    for i in range(n)
                ]
            )
            q_next = ens_w * jnp.min(q_nexts, axis=0) + (1 - ens_w) * jnp.max(
                q_nexts, axis=0
            )
            q_target = jax.lax.stop_gradient(
                rewards + (1.0 - dones) * discount * q_next
            )

            new_params = dict(state.params)
            new_opts = dict(state.opt_states)

            # ---- critic updates (epoch-gated per optim_params, branch-free)
            def gate_c(a, b):
                return jax.tree_util.tree_map(
                    lambda x, y: jnp.where(gates["critic"], x, y), a, b
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
                    g, state.opt_states[f"critic{i}"], state.params[f"critic{i}"]
                )
                new_params[f"critic{i}"] = gate_c(
                    optax.apply_updates(state.params[f"critic{i}"], updates),
                    state.params[f"critic{i}"],
                )
                new_opts[f"critic{i}"] = gate_c(o, state.opt_states[f"critic{i}"])

            # ---- delayed actor update (branch-free via where on mask)
            # the reference computes the actor's Q through critic0 AFTER its
            # gradient step (train_on_batch ordering) — but in validate mode
            # no critic step happened, so the pristine critic0 is used
            c0_for_actor = (
                state.params["critic0"] if validate else new_params["critic0"]
            )

            def a_loss(p):
                pi = apply_net(actor, p, state.aux["actor"], obs, train=True)
                q_pi = apply_net(
                    critics[0], c0_for_actor, state.aux["critic0"], obs, pi,
                )
                lam = alpha / jax.lax.stop_gradient(jnp.mean(jnp.abs(q_pi)))
                return -lam * jnp.mean(q_pi) + jnp.mean((pi - acts) ** 2)

            actor_loss, g_a = jax.value_and_grad(a_loss)(state.params["actor"])
            metrics["actor/loss"] = actor_loss
            updates, o = opts["actor"].update(
                g_a, state.opt_states["actor"], state.params["actor"]
            )
            cand_actor = optax.apply_updates(state.params["actor"], updates)
            # the actor-update counter only advances on critic gradient steps
            # (reference td3_bc.py:393-396), and the actor itself is further
            # gated by its own optim_params epoch window
            counter = state.step + jnp.where(
                jnp.logical_and(gates["critic"], not validate), 1, 0
            )
            do_actor = jnp.logical_and(
                (counter % update_freq) == 0, gates["actor"]
            )

            def select(a, b):
                return jax.tree_util.tree_map(
                    lambda x, y: jnp.where(do_actor, x, y), a, b
                )

            new_params["actor"] = select(cand_actor, state.params["actor"])
            new_opts["actor"] = select(o, state.opt_states["actor"])
            new_params["actor_target"] = select(
                polyak(state.params["actor_target"], new_params["actor"], tau),
                state.params["actor_target"],
            )
            for i in range(n):
                new_params[f"critic{i}_target"] = select(
                    polyak(
                        state.params[f"critic{i}_target"],
                        new_params[f"critic{i}"], tau,
                    ),
                    state.params[f"critic{i}_target"],
                )

            def choose(new, old):
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(validate, b, a), new, old
                )

            new_params = choose(new_params, state.params)
            new_opts = choose(new_opts, state.opt_states)
            return (
                AlgoState(
                    params=new_params, aux=state.aux, opt_states=new_opts,
                    step=counter, rng=rng,
                ),
                metrics,
            )

        return jax.jit(step, static_argnums=3)

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
        self.state, metrics = self._train_step_jit(
            self.state, batch, *self._extra_step_args(epoch), validate
        )
        return {"losses": metrics}

    def log_info(self, info):
        log = OrderedDict((k, float(v)) for k, v in info["losses"].items())
        log["Loss"] = log.get("actor/loss", 0.0)
        return log

    def get_action(self, obs_dict, goal_dict=None):
        actor = self.nets["actor"]

        def infer(params, aux, obs):
            return actor.apply(
                {"params": params, **aux}, device_process_obs(obs),
                train=False,
            )

        return self._cached_jit("get_action", infer)(
            self.state.params["actor"], self.state.aux["actor"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()},
        )

    def get_state_action_value(self, obs_dict, actions, goal_dict=None):
        obs = device_process_obs({k: jnp.asarray(v) for k, v in obs_dict.items()})
        variables = {"params": self.state.params["critic0"],
                     **self.state.aux["critic0"]}
        return self.nets["critic0"].apply(variables, obs, jnp.asarray(actions))
