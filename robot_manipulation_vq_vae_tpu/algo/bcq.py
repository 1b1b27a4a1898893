"""Batch-Constrained Q-learning (reference ``robomimic/algo/bcq.py:51-1022``).

Components: a cVAE action sampler (trained like BC_VAE), twin critics with
targets (weighted min/max ensemble combine), and an optional perturbation
actor. Targets: sample N candidate actions from the sampler at s', optionally
perturb, take the per-sample ensemble-combined Q, then max over samples.
Action selection at rollout samples ``num_action_samples_rollout`` candidates
and picks the argmax-Q one.
"""

from collections import OrderedDict

import flax.linen as nn
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
from robot_manipulation_vq_vae_tpu.models import base_nets as BaseNets
from robot_manipulation_vq_vae_tpu.models import vae_nets as VAENets
from robot_manipulation_vq_vae_tpu.models import value_nets as ValueNets
from robot_manipulation_vq_vae_tpu.utils import loss_utils as LossUtils


@register_algo_factory_func("bcq")
def algo_config_to_class(algo_config):
    """Reference bcq.py factory: distributional critic -> BCQ_Distributional,
    GMM sampler -> BCQ_GMM, else plain BCQ."""
    if algo_config.critic.distributional.enabled:
        return BCQ_Distributional, {}
    if (
        "gmm" in algo_config.action_sampler
        and algo_config.action_sampler.get("gmm", {}).get("enabled", False)
    ):
        return BCQ_GMM, {}
    return BCQ, {}


class PerturbationActor(nn.Module):
    """BCQ perturbation network (reference bcq.py actor): maps (obs, sampled
    action) to a bounded correction delta = scale * tanh(mlp([feat, a]))."""

    obs_shapes: tuple
    ac_dim: int
    layer_dims: tuple = (300, 400)
    perturbation_scale: float = 0.05
    goal_shapes: tuple = None
    encoder_kwargs: dict = None

    def setup(self):
        from robot_manipulation_vq_vae_tpu.models.obs_nets import (
            ObservationGroupEncoder,
            group_shapes_spec,
        )

        groups = {"obs": dict(self.obs_shapes)}
        if self.goal_shapes:
            groups["goal"] = dict(self.goal_shapes)
        self.encoder = ObservationGroupEncoder(
            observation_group_shapes=group_shapes_spec(groups),
            encoder_kwargs=self.encoder_kwargs,
        )
        self.mlp = BaseNets.MLP(
            output_dim=self.ac_dim, layer_dims=tuple(self.layer_dims)
        )

    def __call__(self, obs_dict, acts, goal_dict=None, train=False):
        kwargs = {"obs": obs_dict}
        if self.goal_shapes:
            kwargs["goal"] = goal_dict
        feat = self.encoder(train=train, **kwargs)
        delta = self.perturbation_scale * jnp.tanh(
            self.mlp(jnp.concatenate([feat, acts], axis=-1))
        )
        return jnp.clip(acts + delta, -1.0, 1.0)


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
            self.nets["actor"] = PerturbationActor(
                obs_shapes=obs_spec, goal_shapes=goal_spec,
                ac_dim=self.ac_dim,
                layer_dims=tuple(cfg.actor.layer_dims),
                perturbation_scale=cfg.actor.perturbation_scale,
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
            r_extra = jax.random.fold_in(rng, 99)
            v = self.nets["actor"].init({"params": r_extra}, obs, acts)
            out["actor"] = v
            out["actor_target"] = jax.tree_util.tree_map(jnp.array, v)
        return out

    # Optional determinism seam for the parity harness: a zero-arg callable
    # returning {"enc", "backup", "actor"} noise arrays (standard-normal eps
    # for the cVAE encoder rsample, prior z draws for the backup-candidate
    # and actor-phase decodes), threaded into the jitted step as a traced
    # argument so both frameworks consume identical draws
    # (tests/test_bcq_parity.py).
    _noise_hook = None

    def _extra_step_args(self, epoch):
        eps = self._noise_hook() if self._noise_hook is not None else None
        return (self._epoch_gates(epoch), eps)

    def _sample_actions(self, params, aux, obs, rng, num_samples, z=None):
        """Tile obs x num_samples, decode prior samples from the cVAE."""
        sampler = self.nets["action_sampler"]
        tiled = {
            k: jnp.repeat(v, num_samples, axis=0) for k, v in obs.items()
        }
        acts = sampler.apply(
            {"params": params, **aux}, tiled, rngs={"latent": rng}, z=z
        )
        return tiled, acts

    def _sampler_loss(self, p, state, obs, acts, r_lat, eps=None):
        """cVAE ELBO for the action sampler (reference bcq.py
        ``_train_action_sampler_on_batch``). Returns (loss, metrics)."""
        sampler = self.nets["action_sampler"]
        kl_weight = float(self.algo_config.action_sampler.vae.kl_weight)
        out = sampler.apply(
            {"params": p, **state.aux["action_sampler"]}, acts, obs,
            rngs={"latent": r_lat},
            method=sampler.forward_train, eps=eps,
        )
        loss = out["reconstruction_loss"] + kl_weight * out["kl_loss"]
        return loss, OrderedDict(
            [
                ("action_sampler/loss", loss),
                ("action_sampler/kl_loss", out["kl_loss"]),
            ]
        )

    def _actor_phase(self, state, gates, metrics, new_params, new_opts,
                     sampler_for_critic, obs, rng, z, q_fn, tau):
        """Shared perturbation-actor update for the standard and
        distributional step builders (reference bcq.py:340-388 + 600-620):
        sample 1 candidate per obs from the post-step sampler, perturb
        with the LIVE actor, maximize critic0's (expected) Q via ``q_fn``,
        gate on the actor epoch window, and polyak the target actor.
        Mutates metrics/new_params/new_opts in place."""
        import optax

        actor_net = self.nets["actor"]
        r_a = jax.random.fold_in(rng, 7)
        tiled_obs, cand_obs = self._sample_actions(
            sampler_for_critic, state.aux["action_sampler"], obs, r_a, 1, z=z
        )

        def gate(flag, a, old):
            return jax.tree_util.tree_map(
                lambda x, y: jnp.where(flag, x, y), a, old
            )

        def a_loss(p):
            perturbed = actor_net.apply(
                {"params": p, **state.aux["actor"]},
                tiled_obs, jax.lax.stop_gradient(cand_obs), train=True,
            )
            return -jnp.mean(q_fn(tiled_obs, perturbed))

        actor_loss, g_a = jax.value_and_grad(a_loss)(state.params["actor"])
        metrics["actor/loss"] = actor_loss
        updates, o = self.optimizers["actor"].update(
            g_a, state.opt_states["actor"], state.params["actor"]
        )
        new_params["actor"] = gate(
            gates["actor"],
            optax.apply_updates(state.params["actor"], updates),
            state.params["actor"],
        )
        new_opts["actor"] = gate(gates["actor"], o, state.opt_states["actor"])
        new_params["actor_target"] = gate(
            gates["actor"],
            polyak(state.params["actor_target"], new_params["actor"], tau),
            state.params["actor_target"],
        )

    def _build_train_step(self):
        cfg = self.algo_config
        n = self.n_critics
        critics = [self.nets[f"critic{i}"] for i in range(n)]
        opts = self.optimizers
        discount = float(cfg.discount) ** int(cfg.n_step)
        tau = float(cfg.target_tau)
        ens_w = float(cfg.critic.ensemble.weight)
        n_samples = int(cfg.critic.num_action_samples)
        use_huber = cfg.critic.use_huber
        import optax

        def apply_net(net, params, aux, *args, **kwargs):
            return net.apply({"params": params, **aux}, *args, **kwargs)

        def step(state, batch, gates, eps, validate):
            rng, r_lat, r_samp = jax.random.split(state.rng, 3)

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

            def gate(flag, a, old):
                return jax.tree_util.tree_map(
                    lambda x, y: jnp.where(flag, x, y), a, old
                )

            # ---- action sampler update (cVAE here, NLL in BCQ_GMM)
            (sampler_loss, s_metrics), g_s = jax.value_and_grad(
                self._sampler_loss, has_aux=True
            )(state.params["action_sampler"], state, obs, acts, r_lat,
              _eps("enc"))
            metrics.update(s_metrics)
            updates, o = opts["action_sampler"].update(
                g_s, state.opt_states["action_sampler"],
                state.params["action_sampler"],
            )
            new_params["action_sampler"] = gate(
                gates["action_sampler"],
                optax.apply_updates(state.params["action_sampler"], updates),
                state.params["action_sampler"],
            )
            new_opts["action_sampler"] = gate(
                gates["action_sampler"], o, state.opt_states["action_sampler"]
            )

            # the critic phase uses the sampler AFTER its gradient step
            # (reference ordering); in validate mode nothing stepped
            sampler_for_critic = (
                state.params["action_sampler"] if validate
                else new_params["action_sampler"]
            )

            # ---- critic targets: sample candidates at s', max over samples
            tiled_next, cand = self._sample_actions(
                sampler_for_critic, state.aux["action_sampler"],
                next_obs, r_samp, n_samples, z=_eps("backup"),
            )
            if self.actor_enabled:
                # perturb candidates with the TARGET actor (reference bcq.py)
                cand = self.nets["actor"].apply(
                    {"params": state.params["actor_target"],
                     **state.aux["actor"]},
                    tiled_next, cand,
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
                new_params[f"critic{i}"] = gate(
                    gates["critic"],
                    optax.apply_updates(state.params[f"critic{i}"], updates),
                    state.params[f"critic{i}"],
                )
                new_opts[f"critic{i}"] = gate(
                    gates["critic"], o, state.opt_states[f"critic{i}"]
                )
                # targets move only on critic gradient steps (reference
                # bcq.py:600-608)
                new_params[f"critic{i}_target"] = gate(
                    gates["critic"],
                    polyak(
                        state.params[f"critic{i}_target"],
                        new_params[f"critic{i}"], tau,
                    ),
                    state.params[f"critic{i}_target"],
                )

            # ---- perturbation actor update: maximize Q(s, a + delta(a))
            if self.actor_enabled:
                c0_for_actor = (
                    state.params["critic0"] if validate
                    else new_params["critic0"]
                )
                self._actor_phase(
                    state, gates, metrics, new_params, new_opts,
                    sampler_for_critic, obs, rng, _eps("actor"),
                    q_fn=lambda t_obs, acts: apply_net(
                        critics[0], c0_for_actor, state.aux["critic0"],
                        t_obs, acts,
                    ),
                    tau=tau,
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

        return jax.jit(step, static_argnums=4)

    def train_on_batch(self, batch, epoch, validate=False):
        from robot_manipulation_vq_vae_tpu.algo.td3_bc import TD3_BC

        return TD3_BC.train_on_batch(self, batch, epoch, validate)

    def log_info(self, info):
        log = OrderedDict((k, float(v)) for k, v in info["losses"].items())
        log["Loss"] = log.get("action_sampler/loss", 0.0)
        return log

    def get_state_value(self, obs_dict, goal_dict=None):
        """V(s) estimated as the best Q over sampled candidate actions
        (reference bcq.py get_state_value). One jitted device call."""
        n_samples = int(self.algo_config.critic.num_action_samples_rollout)
        actor_enabled = self.actor_enabled
        actor = self.nets.get("actor")
        critic = self.nets["critic0"]

        def infer(params, aux, obs, key):
            obs = device_process_obs(obs)
            b = next(iter(obs.values())).shape[0]
            tiled, cand = self._sample_actions(
                params["action_sampler"], aux["action_sampler"], obs, key,
                n_samples,
            )
            if actor_enabled:
                cand = actor.apply(
                    {"params": params["actor"], **aux["actor"]}, tiled, cand
                )
            q = critic.apply(
                {"params": params["critic0"], **aux["critic0"]}, tiled, cand
            ).reshape(b, n_samples)
            return jnp.max(q, axis=1, keepdims=True)

        self._init_rng, key = jax.random.split(self._init_rng)
        return self._cached_jit("get_state_value", infer)(
            self.state.params, self.state.aux,
            {k: jnp.asarray(v) for k, v in obs_dict.items()}, key,
        )

    def get_state_action_value(self, obs_dict, actions, goal_dict=None):
        obs = device_process_obs({k: jnp.asarray(v) for k, v in obs_dict.items()})
        return self.nets["critic0"].apply(
            {"params": self.state.params["critic0"], **self.state.aux["critic0"]},
            obs, jnp.asarray(actions),
        )

    def get_action(self, obs_dict, goal_dict=None):
        """Sample candidates, pick argmax-Q (reference bcq.py get_action).
        The whole sample->perturb->argmax-Q pipeline is one jitted call."""
        n_samples = int(self.algo_config.critic.num_action_samples_rollout)
        actor_enabled = self.actor_enabled
        actor = self.nets.get("actor")
        critic = self.nets["critic0"]

        def infer(params, aux, obs, key):
            obs = device_process_obs(obs)
            b = next(iter(obs.values())).shape[0]
            tiled, cand = self._sample_actions(
                params["action_sampler"], aux["action_sampler"], obs, key,
                n_samples,
            )
            if actor_enabled:
                cand = actor.apply(
                    {"params": params["actor"], **aux["actor"]}, tiled, cand
                )
            q = critic.apply(
                {"params": params["critic0"], **aux["critic0"]}, tiled, cand
            ).reshape(b, n_samples)
            best = jnp.argmax(q, axis=1)
            cand = cand.reshape(b, n_samples, -1)
            return jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0]

        self._init_rng, key = jax.random.split(self._init_rng)
        return self._cached_jit("get_action", infer)(
            self.state.params, self.state.aux,
            {k: jnp.asarray(v) for k, v in obs_dict.items()}, key,
        )


class BCQ_GMM(BCQ):
    """BCQ with a GMM action sampler instead of the cVAE
    (reference ``BCQ_GMM``): the sampler trains with NLL and candidate
    actions are GMM samples."""

    def _create_networks(self):
        super()._create_networks()
        from robot_manipulation_vq_vae_tpu.models import policy_nets as PolicyNets

        gmm_cfg = self.algo_config.action_sampler.get("gmm", {})
        self.nets["action_sampler"] = PolicyNets.GMMActorNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            mlp_layer_dims=tuple(
                self.algo_config.action_sampler.get("actor_layer_dims", (300, 400))
            ),
            num_modes=gmm_cfg.get("num_modes", 5),
            min_std=gmm_cfg.get("min_std", 0.0001),
            std_activation=gmm_cfg.get("std_activation", "softplus"),
            low_noise_eval=gmm_cfg.get("low_noise_eval", True),
            encoder_kwargs=_encoder_kwargs(self.obs_config),
        )

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
        out["action_sampler"] = self.nets["action_sampler"].init(
            {"params": rngs[-1]}, obs
        )
        if self.actor_enabled:
            r_extra = jax.random.fold_in(rng, 99)
            v = self.nets["actor"].init({"params": r_extra}, obs, acts)
            out["actor"] = v
            out["actor_target"] = jax.tree_util.tree_map(jnp.array, v)
        return out

    def _sample_actions(self, params, aux, obs, rng, num_samples, z=None):
        """``z``, when injected by the parity harness, is a (mode, eps)
        pair for the GMM sample (see GMMActionDistribution.sample)."""
        sampler = self.nets["action_sampler"]
        tiled = {k: jnp.repeat(v, num_samples, axis=0) for k, v in obs.items()}
        dist = sampler.apply({"params": params, **aux}, tiled, train=False)
        mode, eps = z if z is not None else (None, None)
        return tiled, dist.sample(rng, mode=mode, eps=eps)

    def _sampler_loss(self, p, state, obs, acts, r_lat, eps=None):
        """GMM sampler trains with NLL instead of the cVAE ELBO (reference
        ``BCQ_GMM._train_action_sampler_on_batch``); NLL has no sample
        site, so ``eps`` is accepted for signature parity and unused."""
        sampler = self.nets["action_sampler"]
        dist = sampler.apply(
            {"params": p, **state.aux["action_sampler"]}, obs, train=True
        )
        loss = -jnp.mean(dist.log_prob(acts))
        return loss, OrderedDict([("action_sampler/loss", loss)])


class BCQ_Distributional(BCQ):
    """BCQ with a categorical distributional critic (C51-style;
    reference ``BCQ_Distributional``). Requires value_bounds."""

    def _create_networks(self):
        super()._create_networks()
        cfg = self.algo_config
        assert cfg.critic.value_bounds is not None, (
            "distributional critic requires critic.value_bounds"
        )
        from robot_manipulation_vq_vae_tpu.models import value_nets as ValueNets
        from robot_manipulation_vq_vae_tpu.algo.icl import _encoder_kwargs as enc

        self.n_critics = 1  # reference uses a single distributional critic
        self.nets["critic0"] = ValueNets.DistributionalActionValueNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            mlp_layer_dims=tuple(cfg.critic.layer_dims),
            value_bounds=tuple(cfg.critic.value_bounds),
            num_atoms=cfg.critic.distributional.num_atoms,
            encoder_kwargs=enc(self.obs_config),
        )
        for k in list(self.nets):
            if k.startswith("critic") and k != "critic0":
                del self.nets[k]

    def _build_train_step(self):
        cfg = self.algo_config
        critic = self.nets["critic0"]
        opts = self.optimizers
        discount = float(cfg.discount) ** int(cfg.n_step)
        tau = float(cfg.target_tau)
        n_samples = int(cfg.critic.num_action_samples)
        import optax

        def step(state, batch, gates, eps, validate):
            rng, r_lat, r_samp = jax.random.split(state.rng, 3)

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

            def gate(flag, a, old):
                return jax.tree_util.tree_map(
                    lambda x, y: jnp.where(flag, x, y), a, old
                )

            # --- sampler (cVAE) update, as in BCQ
            (s_l, s_metrics), g_s = jax.value_and_grad(
                self._sampler_loss, has_aux=True
            )(state.params["action_sampler"], state, obs, acts, r_lat,
              _eps("enc"))
            metrics.update(s_metrics)
            updates, o = opts["action_sampler"].update(
                g_s, state.opt_states["action_sampler"],
                state.params["action_sampler"],
            )
            new_params["action_sampler"] = gate(
                gates["action_sampler"],
                optax.apply_updates(state.params["action_sampler"], updates),
                state.params["action_sampler"],
            )
            new_opts["action_sampler"] = gate(
                gates["action_sampler"], o, state.opt_states["action_sampler"]
            )

            # --- target value distribution over sampled candidates
            # (post-step sampler on real updates, pristine in validate)
            sampler_for_critic = (
                state.params["action_sampler"] if validate
                else new_params["action_sampler"]
            )
            tiled_next, cand = self._sample_actions(
                sampler_for_critic,
                state.aux["action_sampler"],
                next_obs, r_samp, n_samples, z=_eps("backup"),
            )
            if self.actor_enabled:
                # perturb candidates with the TARGET actor (inherited
                # reference behavior, bcq.py:452-461)
                cand = self.nets["actor"].apply(
                    {"params": state.params["actor_target"],
                     **state.aux["actor"]},
                    tiled_next, cand,
                )
            log_probs_t, atoms = critic.apply(
                {"params": state.params["critic0_target"],
                 **state.aux["critic0"]},
                tiled_next, cand, method=critic.forward_train,
            )
            probs_t = jnp.exp(log_probs_t).reshape(b, n_samples, -1)
            q_means = jnp.sum(probs_t * atoms, axis=-1)          # [B, S]
            best = jnp.argmax(q_means, axis=1)                   # [B]
            best_probs = jnp.take_along_axis(
                probs_t, best[:, None, None], axis=1
            )[:, 0]                                               # [B, A]
            target_values = rewards + (1.0 - dones) * discount * atoms[None]
            proj = LossUtils.project_values_onto_atoms(
                target_values, best_probs, atoms
            )
            proj = jax.lax.stop_gradient(proj)

            def c_loss(p):
                log_probs, _ = critic.apply(
                    {"params": p, **state.aux["critic0"]}, obs, acts,
                    method=critic.forward_train,
                )
                # reference bcq.py:1019-1022 uses KLDivLoss(batchmean):
                # mean_b sum_atoms q * (log q - log p), with 0*log 0 := 0 —
                # the target-entropy term is constant in the gradient but
                # part of the logged loss value
                safe = jnp.where(proj > 0, proj, 1.0)
                ent = jnp.sum(proj * jnp.log(safe), axis=-1)
                return jnp.mean(ent - jnp.sum(proj * log_probs, axis=-1))

            loss_c, g_c = jax.value_and_grad(c_loss)(state.params["critic0"])
            metrics["critic/critic1_loss"] = loss_c
            updates, o = opts["critic0"].update(
                g_c, state.opt_states["critic0"], state.params["critic0"]
            )
            new_params["critic0"] = gate(
                gates["critic"],
                optax.apply_updates(state.params["critic0"], updates),
                state.params["critic0"],
            )
            new_opts["critic0"] = gate(
                gates["critic"], o, state.opt_states["critic0"]
            )
            new_params["critic0_target"] = gate(
                gates["critic"],
                polyak(
                    state.params["critic0_target"], new_params["critic0"], tau
                ),
                state.params["critic0_target"],
            )

            # --- perturbation actor: maximize expected Q(s, a + delta(a))
            # (inherited reference behavior — _train_actor_on_batch runs
            # for the distributional variant too when actor.enabled; the
            # C51 critic's __call__ already returns the expected value)
            if self.actor_enabled:
                c0_for_actor = (
                    state.params["critic0"] if validate
                    else new_params["critic0"]
                )
                self._actor_phase(
                    state, gates, metrics, new_params, new_opts,
                    sampler_for_critic, obs, rng, _eps("actor"),
                    q_fn=lambda t_obs, a: critic.apply(
                        {"params": c0_for_actor, **state.aux["critic0"]},
                        t_obs, a,
                    ),
                    tau=tau,
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

        return jax.jit(step, static_argnums=4)
