"""Behavioral Cloning algorithm family (reference ``robomimic/algo/bc.py``).

The BC variants are structurally the context-free versions of the ICL
family, so they share the jitted step builders from ``algo/icl.py``:
  BC              - MLP actor, l2/l1/cos losses         (reference bc.py:78)
  BC_Gaussian     - Gaussian head, NLL                  (:259)
  BC_GMM          - GMM head, NLL                       (:352)
  BC_VAE          - CVAE actor, recon + KL              (:378)
  BC_RNN          - LSTM actor                          (:488)
  BC_RNN_GMM      - LSTM GMM actor, NLL                 (:583)
  BC_Transformer  - transformer actor                   (:682)
  BC_Transformer_GMM - transformer GMM actor, NLL       (:799)
with the factory routing at reference bc.py:25-77.
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.algo.algo import (
    AlgoState,
    device_process_obs,
    register_algo_factory_func,
)
from robot_manipulation_vq_vae_tpu.algo.icl import (
    ICL,
    ICLGaussian,
    ICLGMM,
    ICLRNN,
    ICLRNN_GMM,
    ICLTransformer,
    _encoder_kwargs,
)
from robot_manipulation_vq_vae_tpu.models import policy_nets as PolicyNets
from robot_manipulation_vq_vae_tpu.models import vae_nets as VAENets


@register_algo_factory_func("bc")
def algo_config_to_class(algo_config):
    """Reference bc.py:25-77 routing."""
    gaussian_enabled = "gaussian" in algo_config and algo_config.gaussian.enabled
    gmm_enabled = "gmm" in algo_config and algo_config.gmm.enabled
    vae_enabled = "vae" in algo_config and algo_config.vae.enabled
    rnn_enabled = algo_config.rnn.enabled
    transformer_enabled = algo_config.transformer.enabled

    if gaussian_enabled:
        if rnn_enabled or transformer_enabled:
            raise NotImplementedError
        return BC_Gaussian, {}
    if gmm_enabled:
        if rnn_enabled:
            return BC_RNN_GMM, {}
        if transformer_enabled:
            return BC_Transformer_GMM, {}
        return BC_GMM, {}
    if vae_enabled:
        if rnn_enabled or transformer_enabled:
            raise NotImplementedError
        return BC_VAE, {}
    if rnn_enabled:
        return BC_RNN, {}
    if transformer_enabled:
        return BC_Transformer, {}
    return BC, {}


class BC(ICL):
    """Vanilla BC (the ICL MLP step without context conditioning)."""


class BC_Gaussian(ICLGaussian):
    pass


class BC_GMM(ICLGMM):
    pass


class BC_RNN(ICLRNN):
    pass


class BC_RNN_GMM(ICLRNN_GMM):
    pass


class BC_VAE(ICL):
    """CVAE BC (reference bc.py:378-487): loss = recon + kl_weight * KL,
    with categorical-prior temperature annealing per epoch."""

    def _create_networks(self):
        self.nets["policy"] = VAENets.VAEActor(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            encoder_kwargs=_encoder_kwargs(self.obs_config),
            **VAENets.vae_args_from_config(self.algo_config.vae),
        )

    def _init_variables(self, rng, batch):
        r1, r2 = jax.random.split(rng)
        obs = device_process_obs(
            {k: jnp.asarray(v) for k, v in batch["obs"].items()}
        )
        variables = self.nets["policy"].init(
            {"params": r1, "latent": r2},
            jnp.asarray(batch["actions"]), obs, train=False,
            method=self.nets["policy"].forward_train,
        )
        return {"policy": variables}

    def _temperature(self, epoch):
        vae_cfg = self.algo_config.vae
        if not vae_cfg.prior.use_categorical:
            return 1.0
        t = (
            vae_cfg.prior.categorical_init_temp
            - epoch * vae_cfg.prior.categorical_temp_anneal_step
        )
        return max(t, vae_cfg.prior.categorical_min_temp)

    # Optional determinism seam for the parity harness: a zero-arg callable
    # returning the cVAE encoder's standard-normal eps
    # (tests/test_bc_parity.py).
    _noise_hook = None

    def _build_train_step(self):
        policy = self.nets["policy"]
        opt = self.optimizers["policy"]
        kl_weight = float(self.algo_config.vae.kl_weight)
        import optax

        def step(state, batch, validate, temperature, eps):
            rng, r1, r2, r3 = jax.random.split(state.rng, 4)

            def loss_fn(params):
                obs = device_process_obs(batch["obs"])
                variables = {"params": params["policy"], **state.aux["policy"]}
                mutable = list(state.aux["policy"].keys())
                out, muts = policy.apply(
                    variables, batch["actions"], obs, train=not validate,
                    temperature=temperature,
                    mutable=mutable,
                    rngs={"latent": r1, "dropout": r2, "randomizer": r3},
                    method=policy.forward_train, eps=eps,
                )
                losses = OrderedDict(
                    recons_loss=out["reconstruction_loss"],
                    kl_loss=out["kl_loss"],
                )
                losses["action_loss"] = (
                    losses["recons_loss"] + kl_weight * losses["kl_loss"]
                )
                return losses["action_loss"], (losses, muts)

            (_, (losses, muts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            metrics = dict(losses)
            metrics["policy_grad_norms"] = optax.global_norm(grads["policy"])

            def do_update(_):
                updates, new_opt = opt.update(
                    grads["policy"], state.opt_states["policy"],
                    state.params["policy"],
                )
                return optax.apply_updates(state.params["policy"], updates), new_opt

            def no_update(_):
                return state.params["policy"], state.opt_states["policy"]

            new_p, new_opt = jax.lax.cond(validate, no_update, do_update, None)
            new_aux = dict(state.aux)
            new_aux["policy"] = {**state.aux["policy"], **muts}
            return (
                AlgoState(
                    params={**state.params, "policy": new_p},
                    aux=new_aux,
                    opt_states={**state.opt_states, "policy": new_opt},
                    step=state.step + 1,
                    rng=rng,
                ),
                metrics,
            )

        return jax.jit(step, static_argnums=2)

    def train_on_batch(self, batch, epoch, validate=False):
        batch = {
            "obs": {k: jnp.asarray(v) for k, v in batch["obs"].items()},
            "actions": jnp.asarray(batch["actions"]),
        }
        self.ensure_state(batch)
        if self._train_step_jit is None:
            self._train_step_jit = self._build_train_step()
        # getattr: ICLVAE delegates here without subclassing BC_VAE
        hook = getattr(self, "_noise_hook", None)
        eps = hook() if hook is not None else None
        self.state, metrics = self._train_step_jit(
            self.state, batch, validate, self._temperature(epoch), eps
        )
        return {"losses": metrics}

    def log_info(self, info):
        log = OrderedDict()
        log["Loss"] = float(info["losses"]["action_loss"])
        log["KL_Loss"] = float(info["losses"]["kl_loss"])
        log["Reconstruction_Loss"] = float(info["losses"]["recons_loss"])
        return log

    def get_action(self, obs_dict, goal_dict=None):
        policy = self.nets["policy"]

        def infer(params, aux, obs, key):
            return policy.apply(
                {"params": params, **aux}, device_process_obs(obs),
                train=False, rngs={"latent": key},
            )

        self._init_rng, key = jax.random.split(self._init_rng)
        return self._cached_jit("get_action", infer)(
            self.state.params["policy"], self.state.aux["policy"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()}, key,
        )


class BC_Transformer(ICLTransformer):
    """Transformer BC (reference bc.py:682-797): no context batch at
    rollout, output selected by pred_future_acs rule."""

    def get_action(self, obs_dict, goal_dict=None):
        policy = self.nets["policy"]

        def infer(params, aux, obs):
            out = policy.apply(
                {"params": params, **aux}, device_process_obs(obs),
                train=False,
            )
            return self._select_output(out)

        return self._cached_jit("get_action", infer)(
            self.state.params["policy"], self.state.aux["policy"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()},
        )


class BC_Transformer_GMM(BC_Transformer):
    """Transformer-GMM BC with NLL loss (reference bc.py:799-900)."""

    def _create_networks(self):
        assert self.algo_config.gmm.enabled
        assert self.algo_config.transformer.enabled
        self.nets["policy"] = PolicyNets.TransformerGMMActorNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            num_modes=self.algo_config.gmm.num_modes,
            min_std=self.algo_config.gmm.min_std,
            std_activation=self.algo_config.gmm.std_activation,
            low_noise_eval=self.algo_config.gmm.low_noise_eval,
            encoder_kwargs=_encoder_kwargs(self.obs_config),
            **self._policy_transformer_args(),
        )
        self._set_params_from_config()

    def _build_train_step(self):
        policy = self.nets["policy"]
        opt = self.optimizers["policy"]
        supervise_all = self.supervise_all_steps
        import optax

        def step(state, batch, validate):
            rng, r1, r2 = jax.random.split(state.rng, 3)

            def loss_fn(params):
                obs = device_process_obs(batch["obs"])
                variables = {"params": params["policy"], **state.aux["policy"]}
                mutable = list(state.aux["policy"].keys())
                dist, muts = policy.apply(
                    variables, obs, low_noise_eval=False, train=not validate,
                    mutable=mutable,
                    rngs={"dropout": r1, "randomizer": r2},
                )
                target = batch["actions"]
                if not supervise_all:
                    dist = dist.index_time(-1)
                lp = dist.log_prob(target)
                losses = OrderedDict(
                    log_probs=jnp.mean(lp), action_loss=-jnp.mean(lp)
                )
                return losses["action_loss"], (losses, muts)

            (_, (losses, muts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            metrics = dict(losses)
            metrics["policy_grad_norms"] = optax.global_norm(grads["policy"])

            def do_update(_):
                updates, new_opt = opt.update(
                    grads["policy"], state.opt_states["policy"],
                    state.params["policy"],
                )
                return optax.apply_updates(state.params["policy"], updates), new_opt

            def no_update(_):
                return state.params["policy"], state.opt_states["policy"]

            new_p, new_opt = jax.lax.cond(validate, no_update, do_update, None)
            new_aux = dict(state.aux)
            new_aux["policy"] = {**state.aux["policy"], **muts}
            return (
                AlgoState(
                    params={**state.params, "policy": new_p},
                    aux=new_aux,
                    opt_states={**state.opt_states, "policy": new_opt},
                    step=state.step + 1,
                    rng=rng,
                ),
                metrics,
            )

        return jax.jit(step, static_argnums=2)

    def log_info(self, info):
        log = OrderedDict()
        log["Loss"] = float(info["losses"]["action_loss"])
        log["Log_Likelihood"] = float(info["losses"]["log_probs"])
        return log

    def get_action(self, obs_dict, goal_dict=None):
        policy = self.nets["policy"]

        def infer(params, aux, obs, key):
            dist = policy.apply(
                {"params": params, **aux}, device_process_obs(obs),
                train=False,
            )
            return self._select_output(dist.sample(key))

        self._init_rng, key = jax.random.split(self._init_rng)
        return self._cached_jit("get_action", infer)(
            self.state.params["policy"], self.state.aux["policy"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()}, key,
        )
