"""Conservative Q-Learning (reference ``robomimic/algo/cql.py:38-668``).

SAC-style policy over the reference's tanh-wrapped ``GaussianActorNetwork``
(mean clamp, exp/softplus std with ``std_limits``, TanhWrappedDistribution
log-probs), twin critics, and the CQL conservative penalty:

    cql_loss_i = W * (min_q_weight * (mean logsumexp{q_rand - logU,
                 q_pi(s) - logp, q_pi(s') - logp} - mean Q_i(s,a))
                 - target_q_gap)

where ``W`` is the learned ``exp(log_cql_weight)`` (clamped to [0, 1e6])
when ``target_q_gap >= 0`` (automatic cql tuning, the config default) and
the static ``critic.cql_weight`` otherwise — the reference's two-mode
``log_cql_weight`` property (cql.py:75-78). Entropy weight is learned
against ``target_entropy`` unless the config sets it to None (then fixed
at exp(0) = 1, reference cql.py:70-73). The actor supports the
``bc_start_steps`` warmup where the Q baseline is replaced by the dataset
log-likelihood (cql.py:300-305).

Only ``use_tanh=True`` actors are supported: with use_tanh=False the
reference's per-sample log-prob is shape (B,) against a (B,1) baseline,
so ``entropy_weight * log_prob - baseline`` silently broadcasts to (B,B)
— a latent upstream bug on a non-default path we refuse instead of
reproducing.
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
from robot_manipulation_vq_vae_tpu.models import policy_nets as PolicyNets
from robot_manipulation_vq_vae_tpu.models import value_nets as ValueNets
from robot_manipulation_vq_vae_tpu.utils import loss_utils as LossUtils


@register_algo_factory_func("cql")
def algo_config_to_class(algo_config):
    return CQL, {}


class CQL(PolicyAlgo):
    # Optional determinism seam for the parity harness: a zero-arg callable
    # returning {"actor", "backup", "rand", "curr", "next"} noise arrays
    # (standard-normal eps for the rsample sites, uniform(-1,1) values for
    # "rand"), threaded into the jitted step as a traced argument so both
    # frameworks can consume identical draws (tests/test_cql_parity.py).
    _noise_hook = None

    def _create_networks(self):
        cfg = self.algo_config
        obs_spec = tuple(self.obs_shapes.items())
        goal_spec = tuple(self.goal_shapes.items()) or None
        enc = _encoder_kwargs(self.obs_config)

        assert cfg.actor.net.type == "gaussian"
        assert cfg.actor.net.common.get("use_tanh", True), (
            "use_tanh=False hits the reference's (B,)-vs-(B,1) broadcast "
            "bug in the policy loss; unsupported here (see module docstring)"
        )
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
            use_tanh=True,
            encoder_kwargs=enc,
        )
        self.n_critics = cfg.critic.ensemble.n
        vb = cfg.critic.get("value_bounds", None)
        for i in range(self.n_critics):
            self.nets[f"critic{i}"] = ValueNets.ActionValueNetwork(
                obs_shapes=obs_spec, goal_shapes=goal_spec,
                ac_dim=self.ac_dim,
                mlp_layer_dims=tuple(cfg.critic.layer_dims),
                value_bounds=tuple(vb) if vb else None,
                encoder_kwargs=enc,
            )

        # reference cql.py:44-48
        self.automatic_entropy_tuning = cfg.actor.target_entropy is not None
        tq = cfg.critic.target_q_gap
        self.automatic_cql_tuning = tq is not None and tq >= 0.0
        te = cfg.actor.target_entropy
        self.target_entropy = (
            -float(self.ac_dim) if te in (None, "default") else float(te)
        )
        self.target_q_gap = float(tq) if self.automatic_cql_tuning else 0.0
        self.bc_start_steps = int(cfg.actor.get("bc_start_steps", 0))

    def _create_optimizers(self):
        from robot_manipulation_vq_vae_tpu.utils import optim_utils as OptimUtils
        import optax

        mg = self.global_config.train.get("max_grad_norm", None)
        t_critic = OptimUtils.optimizer_from_optim_params(
            self.optim_params["critic"],
            max_grad_norm=self.algo_config.critic.get("max_gradient_norm", None) or mg,
        )
        for i in range(self.n_critics):
            self.optimizers[f"critic{i}"] = t_critic
        self.optimizers["actor"] = OptimUtils.optimizer_from_optim_params(
            self.optim_params["actor"],
            max_grad_norm=self.algo_config.actor.get("max_gradient_norm", None) or mg,
        )
        # dedicated plain-Adam optimizers, reference cql.py:146-186
        if self.automatic_entropy_tuning:
            self.optimizers["log_entropy_weight"] = optax.adam(
                float(self.optim_params["actor"]["learning_rate"]["initial"])
            )
        if self.automatic_cql_tuning:
            self.optimizers["log_cql_weight"] = optax.adam(
                float(self.optim_params["critic"]["learning_rate"]["initial"])
            )

    def process_batch_for_training(self, batch):
        """Same n-step folding as BCQ/TD3-BC minus the infinite-horizon
        branch (reference cql.py:188-214)."""
        import numpy as np

        n_step = int(self.algo_config.n_step)
        gamma = float(self.algo_config.discount)
        rewards = np.asarray(batch["rewards"])[:, :n_step]
        discounts = gamma ** np.arange(n_step)
        r = (rewards * discounts[None]).sum(axis=1).reshape(-1, 1)
        dones = np.asarray(batch["dones"])[:, :n_step].any(axis=1)
        return {
            "obs": {k: np.asarray(v)[:, 0] for k, v in batch["obs"].items()},
            "next_obs": {
                k: np.asarray(v)[:, n_step - 1]
                for k, v in batch["next_obs"].items()
            },
            "goal_obs": batch.get("goal_obs", None),
            "actions": np.asarray(batch["actions"])[:, 0],
            "rewards": r,
            "dones": dones.astype(np.float32).reshape(-1, 1),
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
        out["actor"] = self.nets["actor"].init({"params": rngs[-1]}, obs)
        if self.automatic_entropy_tuning:
            out["log_entropy_weight"] = {"params": {"value": jnp.zeros(())}}
        if self.automatic_cql_tuning:
            out["log_cql_weight"] = {"params": {"value": jnp.zeros(())}}
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
        n_action_samples = int(cfg.critic.get("num_action_samples", 1))
        min_q_weight = float(cfg.critic.min_q_weight)
        static_cql_weight = float(cfg.critic.cql_weight)
        target_q_gap = self.target_q_gap
        deterministic_backup = cfg.critic.deterministic_backup
        auto_cql = self.automatic_cql_tuning
        auto_ent = self.automatic_entropy_tuning
        target_entropy = self.target_entropy
        bc_start_steps = self.bc_start_steps
        use_huber = cfg.critic.use_huber
        ac_dim = self.ac_dim
        import optax

        def apply_net(net, params, aux, *args, **kwargs):
            return net.apply({"params": params, **aux}, *args, **kwargs)

        def tile(obs, k):
            return {key: jnp.repeat(v, k, axis=0) for key, v in obs.items()}

        def dist_of(a_params, obs):
            return apply_net(actor, a_params, state_aux_actor, obs, train=True)

        def td_fn(q, q_target):
            if use_huber:
                return LossUtils.smooth_l1_loss(q, q_target)
            return jnp.mean((q - q_target) ** 2)

        state_aux_actor = None  # bound per-trace below

        def step(state, batch, validate, eps):
            nonlocal state_aux_actor
            state_aux_actor = state.aux["actor"]
            rng, r1, r2, r3, r4, r5 = jax.random.split(state.rng, 6)

            def _eps(key):
                return None if eps is None else eps[key]
            obs = device_process_obs(batch["obs"])
            next_obs = device_process_obs(batch["next_obs"])
            acts, rewards, dones = (
                batch["actions"], batch["rewards"], batch["dones"],
            )
            b = acts.shape[0]
            metrics = OrderedDict()
            new_params = dict(state.params)
            new_opts = dict(state.opt_states)
            if auto_ent:
                log_ent = state.params["log_entropy_weight"]["value"]
            else:
                log_ent = jnp.zeros(())
            entropy_weight = jnp.exp(log_ent)

            # ---------------- policy + entropy weight (cql.py:250-333) ----
            def actor_loss_fn(a_params):
                dist = dist_of(a_params, obs)
                pi, pre_tanh = dist.rsample_with_pretanh(r1, eps=_eps("actor"))
                logp = dist.log_prob(pi, pre_tanh)[:, None]  # (B, 1)
                q_pi = jnp.min(
                    jnp.stack(
                        [
                            apply_net(
                                critics[i], state.params[f"critic{i}"],
                                state.aux[f"critic{i}"], obs, pi,
                            )
                            for i in range(n)
                        ],
                        axis=0,
                    ),
                    axis=0,
                )  # (B, 1)
                # bc_start_steps warmup: dataset log-likelihood baseline
                if bc_start_steps > 0:
                    bc_baseline = dist.log_prob(acts)[:, None]
                    baseline = jnp.where(
                        state.step < bc_start_steps, bc_baseline, q_pi
                    )
                else:
                    baseline = q_pi
                loss = jnp.mean(entropy_weight * logp - baseline)
                return loss, jnp.mean(logp)

            (actor_loss, logp_mean), g_a = jax.value_and_grad(
                actor_loss_fn, has_aux=True
            )(state.params["actor"])
            metrics["actor/loss"] = actor_loss
            metrics["actor/log_prob"] = logp_mean
            metrics["entropy_weight"] = entropy_weight
            updates, o = opts["actor"].update(
                g_a, state.opt_states["actor"], state.params["actor"]
            )
            new_params["actor"] = optax.apply_updates(
                state.params["actor"], updates
            )
            new_opts["actor"] = o

            if auto_ent:
                def ent_loss_fn(p):
                    return -p["value"] * jax.lax.stop_gradient(
                        logp_mean + target_entropy
                    )

                ent_loss, g_e = jax.value_and_grad(ent_loss_fn)(
                    state.params["log_entropy_weight"]
                )
                metrics["entropy_weight_loss"] = ent_loss
                updates, o = opts["log_entropy_weight"].update(
                    g_e, state.opt_states["log_entropy_weight"],
                    state.params["log_entropy_weight"],
                )
                new_params["log_entropy_weight"] = optax.apply_updates(
                    state.params["log_entropy_weight"], updates
                )
                new_opts["log_entropy_weight"] = o
                # the critic backup runs AFTER the entropy step (reference
                # train ordering), so it sees the updated weight — except in
                # validate mode, where no step happened
                entropy_weight_for_backup = entropy_weight if validate else (
                    jnp.exp(new_params["log_entropy_weight"]["value"])
                )
            else:
                entropy_weight_for_backup = entropy_weight

            # the critic phase sees the actor AFTER its gradient step
            # (reference train ordering: policy first, critic second);
            # in validate mode neither stepped
            actor_for_critic = (
                state.params["actor"] if validate else new_params["actor"]
            )

            # ---------------- critic targets (cql.py:396-422) -------------
            next_dist = dist_of(actor_for_critic, next_obs)
            if n_action_samples > 1:
                # per-critic max over sampled candidates, then ensemble min;
                # no entropy subtraction on this path
                cand, _ = next_dist.rsample_with_pretanh(
                    r2, sample_shape=(n_action_samples,), eps=_eps("backup")
                )  # (S, B, A)
                flat_cand = cand.transpose(1, 0, 2).reshape(
                    b * n_action_samples, ac_dim
                )
                tiled_next_s = tile(next_obs, n_action_samples)
                target_qs = jnp.min(
                    jnp.stack(
                        [
                            apply_net(
                                critics[i], state.params[f"critic{i}_target"],
                                state.aux[f"critic{i}"], tiled_next_s,
                                flat_cand,
                            ).reshape(b, n_action_samples).max(
                                axis=1, keepdims=True
                            )
                            for i in range(n)
                        ],
                        axis=0,
                    ),
                    axis=0,
                )
            else:
                next_a, next_pre = next_dist.rsample_with_pretanh(
                    r2, eps=_eps("backup")
                )
                next_logp = next_dist.log_prob(next_a, next_pre)[:, None]
                target_qs = jnp.min(
                    jnp.stack(
                        [
                            apply_net(
                                critics[i], state.params[f"critic{i}_target"],
                                state.aux[f"critic{i}"], next_obs, next_a,
                            )
                            for i in range(n)
                        ],
                        axis=0,
                    ),
                    axis=0,
                )
                if not deterministic_backup:
                    target_qs = target_qs - entropy_weight_for_backup * next_logp
            q_target = jax.lax.stop_gradient(
                rewards + (1.0 - dones) * discount * target_qs
            )

            # ------------- conservative candidates (cql.py:424-441) -------
            if eps is None:
                rand_acts = jax.random.uniform(
                    r3, (b * n_rand, ac_dim), minval=-1.0, maxval=1.0
                )
            else:
                rand_acts = eps["rand"]
            rand_log_prob = float(ac_dim) * math.log(0.5)
            tiled_obs = tile(obs, n_rand)
            tiled_next = tile(next_obs, n_rand)
            curr_dist_t = dist_of(actor_for_critic, tiled_obs)
            next_dist_t = dist_of(actor_for_critic, tiled_next)
            cql_curr, curr_pre = curr_dist_t.rsample_with_pretanh(
                r4, eps=_eps("curr")
            )
            cql_next, next_pre2 = next_dist_t.rsample_with_pretanh(
                r5, eps=_eps("next")
            )
            cql_curr_logp = jax.lax.stop_gradient(
                curr_dist_t.log_prob(cql_curr, curr_pre)
            ).reshape(b, n_rand)
            cql_next_logp = jax.lax.stop_gradient(
                next_dist_t.log_prob(cql_next, next_pre2)
            ).reshape(b, n_rand)

            if auto_cql:
                log_cql = state.params["log_cql_weight"]["value"]
            else:
                log_cql = jnp.log(jnp.asarray(static_cql_weight))
            cql_weight = jnp.clip(jnp.exp(log_cql), 0.0, 1e6)
            metrics["critic/cql_weight"] = cql_weight

            # ------------- per-critic losses (cql.py:443-470) -------------
            raw_gaps = []
            for i in range(n):
                def c_loss(p, i=i):
                    q_data = apply_net(
                        critics[i], p, state.aux[f"critic{i}"], obs, acts
                    )
                    td = td_fn(q_data, q_target)
                    q_rand = apply_net(
                        critics[i], p, state.aux[f"critic{i}"], tiled_obs,
                        rand_acts,
                    ).reshape(b, n_rand)
                    q_curr = apply_net(
                        critics[i], p, state.aux[f"critic{i}"], tiled_obs,
                        jax.lax.stop_gradient(cql_curr),
                    ).reshape(b, n_rand)
                    q_next = apply_net(
                        critics[i], p, state.aux[f"critic{i}"], tiled_obs,
                        jax.lax.stop_gradient(cql_next),
                    ).reshape(b, n_rand)
                    cat = jnp.concatenate(
                        [
                            q_rand - rand_log_prob,
                            q_next - cql_next_logp,
                            q_curr - cql_curr_logp,
                        ],
                        axis=1,
                    )
                    lse = jax.scipy.special.logsumexp(cat, axis=1)
                    raw = min_q_weight * (
                        jnp.mean(lse) - jnp.mean(q_data)
                    ) - target_q_gap
                    cql_loss = cql_weight * raw
                    return td + cql_loss, (td, raw)

                (loss_i, (td_i, raw_i)), g = jax.value_and_grad(
                    c_loss, has_aux=True
                )(state.params[f"critic{i}"])
                metrics[f"critic/critic{i+1}_loss"] = loss_i
                metrics[f"critic/critic{i+1}_td"] = td_i
                raw_gaps.append(raw_i)
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

            # ------------- cql weight Lagrange step (cql.py:473-482) ------
            if auto_cql:
                mean_raw = jax.lax.stop_gradient(
                    sum(raw_gaps) / len(raw_gaps)
                )

                def cql_loss_fn(p):
                    w = jnp.clip(jnp.exp(p["value"]), 0.0, 1e6)
                    return -w * mean_raw

                cql_w_loss, g_w = jax.value_and_grad(cql_loss_fn)(
                    state.params["log_cql_weight"]
                )
                metrics["critic/cql_weight_loss"] = cql_w_loss
                updates, o = opts["log_cql_weight"].update(
                    g_w, state.opt_states["log_cql_weight"],
                    state.params["log_cql_weight"],
                )
                new_params["log_cql_weight"] = optax.apply_updates(
                    state.params["log_cql_weight"], updates
                )
                new_opts["log_cql_weight"] = o

            def choose(new, old):
                return jax.tree_util.tree_map(
                    lambda a, c: jnp.where(validate, c, a), new, old
                )

            new_params = choose(new_params, state.params)
            new_opts = choose(new_opts, state.opt_states)
            # _num_batch_steps only advances on real training steps
            # (reference cql.py:318-320)
            new_step = state.step if validate else state.step + 1
            return (
                AlgoState(
                    params=new_params, aux=state.aux, opt_states=new_opts,
                    step=new_step, rng=rng,
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
        eps = self._noise_hook() if self._noise_hook is not None else None
        self.state, metrics = self._train_step_jit(
            self.state, batch, validate, eps
        )
        return {"losses": metrics}

    def log_info(self, info):
        log = OrderedDict((k, float(v)) for k, v in info["losses"].items())
        log["Loss"] = log.get("actor/loss", 0.0)
        return log

    def get_action(self, obs_dict, goal_dict=None):
        """Deterministic eval action: tanh of the base-Gaussian mean
        (reference GaussianActorNetwork.forward with use_tanh + low-noise
        eval, policy_nets.py:406-413)."""
        actor = self.nets["actor"]

        def infer(params, aux, obs):
            dist = actor.apply(
                {"params": params, **aux}, device_process_obs(obs),
                train=False,
            )
            return jnp.tanh(dist.mean)

        return self._cached_jit("get_action", infer)(
            self.state.params["actor"], self.state.aux["actor"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()},
        )

    def get_state_action_value(self, obs_dict, actions, goal_dict=None):
        """critic0 Q(s, a) (reference cql.py:654-668)."""
        obs = device_process_obs(
            {k: jnp.asarray(v) for k, v in obs_dict.items()}
        )
        variables = {"params": self.state.params["critic0"],
                     **self.state.aux["critic0"]}
        return self.nets["critic0"].apply(variables, obs, jnp.asarray(actions))
