"""Conservative Q-Learning (reference ``robomimic/algo/cql.py:55-668``).

SAC-style tanh-Gaussian actor with automatic entropy tuning (learned
log_alpha against a target entropy), twin critics, and the CQL conservative
penalty: logsumexp over {uniform-random, pi(s), pi(s')} candidate actions
minus the dataset Q, optionally with a Lagrange multiplier (log_alpha_prime)
against ``target_q_gap``.
"""

import math
from collections import OrderedDict

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.algo.algo import (
    AlgoState,
    PolicyAlgo,
    device_process_obs,
    register_algo_factory_func,
)
from robot_manipulation_vq_vae_tpu.algo.icl import _encoder_kwargs
from robot_manipulation_vq_vae_tpu.algo.iql import polyak
from robot_manipulation_vq_vae_tpu.models import value_nets as ValueNets
from robot_manipulation_vq_vae_tpu.models.obs_nets import (
    MIMO_MLP,
    group_shapes_spec,
)

import flax.linen as nn


@register_algo_factory_func("cql")
def algo_config_to_class(algo_config):
    return CQL, {}


class TanhGaussianActor(nn.Module):
    """Tanh-squashed Gaussian actor with reparametrized sampling and exact
    log-prob (the SAC actor the reference builds from its GaussianActorNetwork
    with use_tanh=True)."""

    obs_shapes: tuple
    ac_dim: int
    layer_dims: tuple = (300, 400)
    goal_shapes: tuple = None
    encoder_kwargs: dict = None
    std_activation: str = "exp"
    init_std: float = 0.3

    def setup(self):
        groups = {"obs": dict(self.obs_shapes)}
        if self.goal_shapes:
            groups["goal"] = dict(self.goal_shapes)
        self.net = MIMO_MLP(
            input_obs_group_shapes=group_shapes_spec(groups),
            output_shapes=(("mean", (self.ac_dim,)), ("log_std", (self.ac_dim,))),
            layer_dims=tuple(self.layer_dims),
            encoder_kwargs=self.encoder_kwargs,
        )

    def dist_params(self, obs_dict, goal_dict=None, train=False):
        kwargs = {"obs": obs_dict}
        if self.goal_shapes:
            kwargs["goal"] = goal_dict
        out = self.net(train=train, **kwargs)
        log_std = jnp.clip(out["log_std"], -20.0, 2.0)
        return out["mean"], log_std

    def sample(self, obs_dict, rng, goal_dict=None, train=False):
        """Returns (tanh-squashed action, log_prob)."""
        mean, log_std = self.dist_params(obs_dict, goal_dict, train)
        std = jnp.exp(log_std)
        eps = jax.random.normal(rng, mean.shape)
        pre_tanh = mean + std * eps
        action = jnp.tanh(pre_tanh)
        log_prob = jnp.sum(
            -0.5 * (eps**2) - log_std - 0.5 * math.log(2 * math.pi), axis=-1
        )
        # tanh log-det correction (numerically stable form)
        log_prob = log_prob - jnp.sum(
            2.0 * (math.log(2.0) - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh)),
            axis=-1,
        )
        return action, log_prob

    def log_prob_of(self, obs_dict, actions, goal_dict=None, train=False,
                    eps=1e-6):
        mean, log_std = self.dist_params(obs_dict, goal_dict, train)
        std = jnp.exp(log_std)
        pre_tanh = jnp.arctanh(jnp.clip(actions, -1 + eps, 1 - eps))
        z = (pre_tanh - mean) / std
        log_prob = jnp.sum(
            -0.5 * z**2 - log_std - 0.5 * math.log(2 * math.pi), axis=-1
        )
        log_prob = log_prob - jnp.sum(
            jnp.log(jnp.clip(1 - actions**2, eps, None)), axis=-1
        )
        return log_prob

    def __call__(self, obs_dict, goal_dict=None, train=False):
        mean, _ = self.dist_params(obs_dict, goal_dict, train)
        return jnp.tanh(mean)  # deterministic eval action


class CQL(PolicyAlgo):
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
        self.nets["actor"] = TanhGaussianActor(
            obs_shapes=obs_spec, goal_shapes=goal_spec,
            ac_dim=self.ac_dim,
            layer_dims=tuple(cfg.actor.layer_dims),
            encoder_kwargs=enc,
        )
        te = cfg.actor.target_entropy
        self.target_entropy = (
            -float(self.ac_dim) if te == "default" else float(te)
        )
        self.use_lagrange = float(cfg.critic.target_q_gap or 0) > 0

    def _create_optimizers(self):
        from robot_manipulation_vq_vae_tpu.utils import optim_utils as OptimUtils
        import optax

        mg = self.global_config.train.get("max_grad_norm", None)
        t_critic = OptimUtils.optimizer_from_optim_params(
            self.optim_params["critic"], max_grad_norm=mg
        )
        for i in range(self.n_critics):
            self.optimizers[f"critic{i}"] = t_critic
        self.optimizers["actor"] = OptimUtils.optimizer_from_optim_params(
            self.optim_params["actor"], max_grad_norm=mg
        )
        self.optimizers["log_alpha"] = optax.adam(
            float(self.optim_params["actor"]["learning_rate"]["initial"])
        )
        if self.use_lagrange:
            self.optimizers["log_alpha_prime"] = optax.adam(
                float(self.optim_params["critic"]["learning_rate"]["initial"])
            )

    def process_batch_for_training(self, batch):
        from robot_manipulation_vq_vae_tpu.algo.td3_bc import TD3_BC

        return TD3_BC.process_batch_for_training(self, batch)

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
        out["actor"] = self.nets["actor"].init({"params": rngs[-1]}, obs)
        out["log_alpha"] = {"params": {"value": jnp.zeros(())}}
        if self.use_lagrange:
            out["log_alpha_prime"] = {"params": {"value": jnp.zeros(())}}
        return out

    def _build_train_step(self):
        cfg = self.algo_config
        n = self.n_critics
        critics = [self.nets[f"critic{i}"] for i in range(n)]
        actor = self.nets["actor"]
        opts = self.optimizers
        discount = float(cfg.discount) ** int(cfg.n_step)
        tau = float(cfg.target_tau)
        n_rand = int(cfg.critic.num_random_actions)
        min_q_weight = float(cfg.critic.min_q_weight)
        cql_weight = float(cfg.critic.cql_weight)
        target_q_gap = float(cfg.critic.target_q_gap or 0.0)
        deterministic_backup = cfg.critic.deterministic_backup
        use_lagrange = self.use_lagrange
        target_entropy = self.target_entropy
        ac_dim = self.ac_dim
        import optax

        def apply_net(net, params, aux, *args, **kwargs):
            return net.apply({"params": params, **aux}, *args, **kwargs)

        def tile(obs, k):
            return {key: jnp.repeat(v, k, axis=0) for key, v in obs.items()}

        def step(state, batch, validate):
            rng, r1, r2, r3, r4 = jax.random.split(state.rng, 5)
            obs = device_process_obs(batch["obs"])
            next_obs = device_process_obs(batch["next_obs"])
            acts, rewards, dones = (
                batch["actions"], batch["rewards"], batch["dones"],
            )
            b = acts.shape[0]
            metrics = OrderedDict()
            new_params = dict(state.params)
            new_opts = dict(state.opt_states)
            alpha = jnp.exp(state.params["log_alpha"]["value"])

            # ---------------- actor + alpha ----------------
            def actor_loss_fn(a_params):
                pi, logp = apply_net(
                    actor, a_params, state.aux["actor"], obs, r1,
                    method=actor.sample,
                )
                q_pi = jnp.min(
                    jnp.stack(
                        [
                            apply_net(
                                critics[i], state.params[f"critic{i}"],
                                state.aux[f"critic{i}"], obs, pi,
                            )[:, 0]
                            for i in range(n)
                        ]
                    ),
                    axis=0,
                )
                loss = jnp.mean(
                    jax.lax.stop_gradient(alpha) * logp - q_pi
                )
                return loss, jnp.mean(logp)

            (actor_loss, logp_mean), g_a = jax.value_and_grad(
                actor_loss_fn, has_aux=True
            )(state.params["actor"])
            metrics["actor/loss"] = actor_loss
            metrics["actor/log_prob"] = logp_mean
            updates, o = opts["actor"].update(
                g_a, state.opt_states["actor"], state.params["actor"]
            )
            new_params["actor"] = optax.apply_updates(
                state.params["actor"], updates
            )
            new_opts["actor"] = o

            def alpha_loss_fn(la):
                return -jnp.mean(
                    la["value"]
                    * jax.lax.stop_gradient(logp_mean + target_entropy)
                )

            alpha_loss, g_la = jax.value_and_grad(alpha_loss_fn)(
                state.params["log_alpha"]
            )
            metrics["actor/alpha_loss"] = alpha_loss
            metrics["actor/alpha"] = alpha
            updates, o = opts["log_alpha"].update(
                g_la, state.opt_states["log_alpha"], state.params["log_alpha"]
            )
            new_params["log_alpha"] = optax.apply_updates(
                state.params["log_alpha"], updates
            )
            new_opts["log_alpha"] = o

            # ---------------- critic targets ----------------
            next_pi, next_logp = apply_net(
                actor, new_params["actor"], state.aux["actor"], next_obs, r2,
                method=actor.sample,
            )
            q_next = jnp.min(
                jnp.stack(
                    [
                        apply_net(
                            critics[i], state.params[f"critic{i}_target"],
                            state.aux[f"critic{i}"], next_obs, next_pi,
                        )[:, 0]
                        for i in range(n)
                    ]
                ),
                axis=0,
            )
            if not deterministic_backup:
                q_next = q_next - alpha * next_logp
            q_target = jax.lax.stop_gradient(
                rewards[:, 0] + (1.0 - dones[:, 0]) * discount * q_next
            )

            # candidate actions for the conservative penalty
            rand_acts = jax.random.uniform(
                r3, (b * n_rand, ac_dim), minval=-1.0, maxval=1.0
            )
            tiled_obs = tile(obs, n_rand)
            tiled_next = tile(next_obs, n_rand)
            pi_curr, logp_curr = apply_net(
                actor, new_params["actor"], state.aux["actor"], tiled_obs, r4,
                method=actor.sample,
            )
            pi_next, logp_next = apply_net(
                actor, new_params["actor"], state.aux["actor"], tiled_next,
                jax.random.fold_in(r4, 1), method=actor.sample,
            )
            rand_density = ac_dim * math.log(0.5)
            alpha_prime = (
                jnp.clip(
                    jnp.exp(state.params["log_alpha_prime"]["value"]),
                    0.0, 1e6,
                )
                if use_lagrange
                else 1.0
            )

            cql_terms = []
            for i in range(n):
                def c_loss(p, i=i):
                    q_data = apply_net(
                        critics[i], p, state.aux[f"critic{i}"], obs, acts
                    )[:, 0]
                    td = jnp.mean((q_data - q_target) ** 2)
                    q_rand = apply_net(
                        critics[i], p, state.aux[f"critic{i}"], tiled_obs,
                        rand_acts,
                    )[:, 0].reshape(b, n_rand)
                    q_curr = apply_net(
                        critics[i], p, state.aux[f"critic{i}"], tiled_obs,
                        pi_curr,
                    )[:, 0].reshape(b, n_rand)
                    q_next_pi = apply_net(
                        critics[i], p, state.aux[f"critic{i}"], tiled_obs,
                        pi_next,
                    )[:, 0].reshape(b, n_rand)
                    cat = jnp.concatenate(
                        [
                            q_rand - rand_density,
                            q_curr - jax.lax.stop_gradient(
                                logp_curr.reshape(b, n_rand)
                            ),
                            q_next_pi - jax.lax.stop_gradient(
                                logp_next.reshape(b, n_rand)
                            ),
                        ],
                        axis=1,
                    )
                    logsumexp = jax.scipy.special.logsumexp(cat, axis=1)
                    gap = jnp.mean(logsumexp - q_data) * min_q_weight * cql_weight
                    penalty = (
                        alpha_prime * (gap - target_q_gap)
                        if use_lagrange
                        else gap
                    )
                    return td + penalty, (td, gap)

                (loss_i, (td_i, gap_i)), g = jax.value_and_grad(
                    c_loss, has_aux=True
                )(state.params[f"critic{i}"])
                metrics[f"critic/critic{i+1}_loss"] = loss_i
                metrics[f"critic/critic{i+1}_td"] = td_i
                metrics[f"critic/critic{i+1}_gap"] = gap_i
                cql_terms.append(gap_i)
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

            if use_lagrange:
                def ap_loss_fn(lap):
                    ap = jnp.exp(lap["value"])
                    gaps = jax.lax.stop_gradient(
                        sum(cql_terms) / len(cql_terms)
                    )
                    return -ap * (gaps - target_q_gap)

                ap_loss, g_ap = jax.value_and_grad(ap_loss_fn)(
                    state.params["log_alpha_prime"]
                )
                metrics["critic/alpha_prime_loss"] = ap_loss
                updates, o = opts["log_alpha_prime"].update(
                    g_ap, state.opt_states["log_alpha_prime"],
                    state.params["log_alpha_prime"],
                )
                new_params["log_alpha_prime"] = optax.apply_updates(
                    state.params["log_alpha_prime"], updates
                )
                new_opts["log_alpha_prime"] = o

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

    def _extra_step_args(self, epoch):
        # reference cql.py has no per-net epoch windows
        return ()

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
