"""In-Context imitation Learning (ICL) algorithm family.

Functional re-design of ``robomimic/algo/icl.py``. Each algorithm compiles
ONE jitted train step ``(AlgoState, batch) -> (AlgoState, metrics)``; all
codebook/EMA/batch-norm mutation flows through variable collections inside
that step.

Reference behaviors reproduced exactly (with citations):
  * factory routing: every transformer-enabled branch maps to
    ``ICLTransformerHVQVAE`` (reference icl.py:77-103) - including
    gmm+transformer, which makes ``ICLTransformer_GMM`` unreachable from the
    factory in the reference fork. We keep that routing for parity and
    expose ``ICLTransformer_GMM`` directly (and via the ``icl_gmm_paper``
    algo name) since it is the paper's LipVQ path.
  * ICLTransformerHVQVAE trains policy and HVQVAE with a combined loss
    0.1*vqvae + 1.0*action, ONE backward, two optimizers (icl.py:1157-1213);
    the quantized actions are passed to - and ignored by - the policy
    (TransformerActorNetwork drops ``actions``; policy_nets.py:1196-1222).
  * inference feeds HVQVAE-*reconstructed* context actions to the policy
    (icl.py:1302-1354).
  * ICLTransformer_GMM splits each batch into context/train halves
    (icl.py:1456-1463), tokenizes raw context actions inside the encoder,
    and takes TWO backward passes: the LipVQ loss steps its own AdamW
    (lr 1e-3, wd 1e-4; icl.py:1437-1441,1520-1522) while the NLL steps the
    policy optimizer over all policy params (tokenizer included).
  * transformer batches slice obs[:, :context_length] and actions
    [h-1 : h-1+h] when pred_future_acs (icl.py:806-845).
"""

import os
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
from robot_manipulation_vq_vae_tpu.models import base_nets as BaseNets
from robot_manipulation_vq_vae_tpu.models import policy_nets as PolicyNets
from robot_manipulation_vq_vae_tpu.models.tokenizers.hvqvae import (
    HierarchicalVQVAE,
    compute_vqvae_loss,
    get_codebook_usage,
)
from robot_manipulation_vq_vae_tpu.utils import loss_utils as LossUtils
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.utils import optim_utils as OptimUtils


@register_algo_factory_func("icl_hvqvae")
def algo_config_to_class_hvqvae(algo_config):
    """Reference icl.py:30-43."""
    return ICLTransformerHVQVAE, {}


@register_algo_factory_func("icl")
def algo_config_to_class(algo_config):
    """Reference icl.py:46-105 (including the transformer->HVQVAE routing)."""
    gaussian_enabled = "gaussian" in algo_config and algo_config.gaussian.enabled
    gmm_enabled = "gmm" in algo_config and algo_config.gmm.enabled
    vae_enabled = "vae" in algo_config and algo_config.vae.enabled
    rnn_enabled = algo_config.rnn.enabled
    transformer_enabled = algo_config.transformer.enabled

    if gaussian_enabled:
        if rnn_enabled or transformer_enabled:
            raise NotImplementedError
        return ICLGaussian, {}
    if gmm_enabled:
        if rnn_enabled:
            return ICLRNN_GMM, {}
        if transformer_enabled:
            # NOTE: reference routes gmm+transformer to the HVQVAE class
            # (icl.py:77-83); ICLTransformer_GMM is the paper path but is
            # unreachable from this factory. Kept for parity.
            return ICLTransformerHVQVAE, {}
        return ICLGMM, {}
    if vae_enabled:
        if rnn_enabled or transformer_enabled:
            if transformer_enabled:
                return ICLTransformerHVQVAE, {}
            raise NotImplementedError
        return ICLTransformerHVQVAE, {}
    if rnn_enabled:
        return ICLRNN, {}
    if transformer_enabled:
        return ICLTransformerHVQVAE, {}
    return ICL, {}


@register_algo_factory_func("icl_gmm_paper")
def algo_config_to_class_gmm_paper(algo_config):
    """Direct route to the paper's LipVQ GMM path (not in the reference
    factory - see routing note above)."""
    return ICLTransformer_GMM, {}



def _cast_half(tree):
    """float32 -> bfloat16 over a pytree (mixed-precision forward)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def _cast_full(tree):
    """bfloat16 -> float32 over a pytree."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x,
        tree,
    )


def _device_batch(batch):
    """Convert a processed numpy batch to device arrays (obs/goal/actions)."""
    out = {
        "obs": {k: jnp.asarray(v) for k, v in batch["obs"].items()},
        "actions": jnp.asarray(batch["actions"]),
    }
    if batch.get("goal_obs"):
        out["goal_obs"] = {
            k: jnp.asarray(v) for k, v in batch["goal_obs"].items()
        }
    return out


def _goal_of(batch):
    if "goal_obs" in batch and batch["goal_obs"]:
        return device_process_obs(batch["goal_obs"])
    return None

def _encoder_kwargs(obs_config):
    return ObsUtils.obs_encoder_kwargs_from_config(obs_config.encoder)


# ---------------------------------------------------------------------------
# plain ICL (MLP actor)
# ---------------------------------------------------------------------------

class ICL(PolicyAlgo):
    """MLP-actor ICL (reference ``ICL`` icl.py:108-243)."""

    def _create_networks(self):
        self.nets["policy"] = PolicyNets.ActorNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            mlp_layer_dims=tuple(self.algo_config.actor_layer_dims),
            encoder_kwargs=_encoder_kwargs(self.obs_config),
        )

    def process_batch_for_training(self, batch):
        """Take the t=0 slice (reference icl.py:129-150)."""
        out = {
            "obs": {k: np.asarray(batch["obs"][k])[:, 0] for k in batch["obs"]},
            "goal_obs": batch.get("goal_obs", None),
            "actions": np.asarray(batch["actions"])[:, 0],
        }
        return out

    def _init_variables(self, rng, batch):
        obs = device_process_obs(
            {k: jnp.asarray(v) for k, v in batch["obs"].items()}
        )
        return {
            "policy": self.nets["policy"].init(
                {"params": rng}, obs, goal_dict=_goal_of(batch), train=False
            )
        }

    def _loss_weights(self):
        loss_cfg = self.algo_config.get("loss", {})
        return (
            float(loss_cfg.get("l2_weight", 1.0)),
            float(loss_cfg.get("l1_weight", 0.0)),
            float(loss_cfg.get("cos_weight", 0.0)),
        )

    def _action_losses(self, acts, target):
        l2w, l1w, cw = self._loss_weights()
        losses = OrderedDict()
        losses["l2_loss"] = jnp.mean((acts - target) ** 2)
        losses["l1_loss"] = LossUtils.smooth_l1_loss(acts, target)
        if acts.shape[-1] >= 3:
            losses["cos_loss"] = LossUtils.cosine_loss(
                acts[..., :3], target[..., :3]
            )
        else:
            losses["cos_loss"] = jnp.zeros(())
        losses["action_loss"] = (
            l2w * losses["l2_loss"] + l1w * losses["l1_loss"]
            + cw * losses["cos_loss"]
        )
        return losses

    def _build_train_step(self):
        policy = self.nets["policy"]
        opt = self.optimizers["policy"]

        def step(state, batch, validate):
            rng, r1, r2, r3 = jax.random.split(state.rng, 4)

            def loss_fn(params):
                obs = device_process_obs(batch["obs"])
                variables = {"params": params["policy"], **state.aux["policy"]}
                mutable = list(state.aux["policy"].keys())
                acts, muts = policy.apply(
                    variables, obs, goal_dict=_goal_of(batch),
                    train=not validate,
                    mutable=mutable,
                    rngs={"dropout": r1, "randomizer": r2},
                )
                losses = self._action_losses(acts, batch["actions"])
                return losses["action_loss"], (losses, muts)

            (loss, (losses, muts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            import optax

            metrics = dict(losses)
            metrics["policy_grad_norms"] = optax.global_norm(grads["policy"])

            def do_update(_):
                updates, new_opt = opt.update(
                    grads["policy"], state.opt_states["policy"],
                    state.params["policy"],
                )
                new_p = optax.apply_updates(state.params["policy"], updates)
                return new_p, new_opt

            def no_update(_):
                return state.params["policy"], state.opt_states["policy"]

            new_p, new_opt = jax.lax.cond(validate, no_update, do_update, None)
            new_aux = dict(state.aux)
            new_aux["policy"] = {**state.aux["policy"], **muts}
            new_state = AlgoState(
                params={**state.params, "policy": new_p},
                aux=new_aux,
                opt_states={**state.opt_states, "policy": new_opt},
                step=state.step + 1,
                rng=rng,
            )
            return new_state, metrics

        return jax.jit(step, static_argnums=2)

    def train_on_batch(self, batch, epoch, validate=False):
        batch = _device_batch(batch)
        self.ensure_state(batch)
        if self._train_step_jit is None:
            self._train_step_jit = self._build_train_step()
        self.state, metrics = self._train_step_jit(self.state, batch, validate)
        return {"losses": {k: v for k, v in metrics.items()}}

    def log_info(self, info):
        log = super().log_info(info)
        if "action_loss" in info["losses"]:
            log["Loss"] = float(info["losses"]["action_loss"])
        return log

    def get_action(self, obs_dict, goal_dict=None):
        assert self.state is not None
        policy = self.nets["policy"]

        def infer(params, aux, obs, goal):
            obs = device_process_obs(obs)
            if goal is not None:
                goal = device_process_obs(goal)
            return policy.apply(
                {"params": params, **aux}, obs, goal_dict=goal, train=False
            )

        return self._cached_jit("get_action", infer)(
            self.state.params["policy"], self.state.aux["policy"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()},
            None if goal_dict is None else {
                k: jnp.asarray(v) for k, v in goal_dict.items()
            },
        )


class ICLGaussian(ICL):
    """Gaussian-head ICL (reference icl.py:314)."""

    def _create_networks(self):
        self.nets["policy"] = PolicyNets.GaussianActorNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            mlp_layer_dims=tuple(self.algo_config.actor_layer_dims),
            fixed_std=self.algo_config.gaussian.fixed_std,
            init_std=self.algo_config.gaussian.init_std,
            min_std=self.algo_config.gaussian.min_std,
            std_activation=self.algo_config.gaussian.std_activation,
            low_noise_eval=self.algo_config.gaussian.low_noise_eval,
            encoder_kwargs=_encoder_kwargs(self.obs_config),
        )

    def _build_train_step(self):
        policy = self.nets["policy"]
        opt = self.optimizers["policy"]
        import optax

        def step(state, batch, validate):
            rng, r1, r2 = jax.random.split(state.rng, 3)

            def loss_fn(params):
                obs = device_process_obs(batch["obs"])
                variables = {"params": params["policy"], **state.aux["policy"]}
                mutable = list(state.aux["policy"].keys())
                dist, muts = policy.apply(
                    variables, obs, goal_dict=_goal_of(batch),
                    train=not validate, mutable=mutable,
                    rngs={"dropout": r1, "randomizer": r2},
                )
                lp = dist.log_prob(batch["actions"])
                losses = OrderedDict(
                    log_probs=jnp.mean(lp), action_loss=-jnp.mean(lp)
                )
                return losses["action_loss"], (losses, muts)

            (loss, (losses, muts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            metrics = dict(losses)
            metrics["policy_grad_norms"] = optax.global_norm(grads["policy"])

            def do_update(_):
                updates, new_opt = opt.update(
                    grads["policy"], state.opt_states["policy"],
                    state.params["policy"],
                )
                return (
                    optax.apply_updates(state.params["policy"], updates),
                    new_opt,
                )

            def no_update(_):
                return state.params["policy"], state.opt_states["policy"]

            new_p, new_opt = jax.lax.cond(validate, no_update, do_update, None)
            new_aux = dict(state.aux)
            new_aux["policy"] = {**state.aux["policy"], **muts}
            new_state = AlgoState(
                params={**state.params, "policy": new_p},
                aux=new_aux,
                opt_states={**state.opt_states, "policy": new_opt},
                step=state.step + 1,
                rng=rng,
            )
            return new_state, metrics

        return jax.jit(step, static_argnums=2)

    def get_action(self, obs_dict, goal_dict=None):
        policy = self.nets["policy"]

        def infer(params, aux, obs):
            dist = policy.apply(
                {"params": params, **aux}, device_process_obs(obs),
                train=False,
            )
            return dist.mean  # low-noise eval

        return self._cached_jit("get_action", infer)(
            self.state.params["policy"], self.state.aux["policy"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()},
        )


class ICLGMM(ICLGaussian):
    """GMM-head ICL (reference icl.py:410)."""

    def _create_networks(self):
        self.nets["policy"] = PolicyNets.GMMActorNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            mlp_layer_dims=tuple(self.algo_config.actor_layer_dims),
            num_modes=self.algo_config.gmm.num_modes,
            min_std=self.algo_config.gmm.min_std,
            std_activation=self.algo_config.gmm.std_activation,
            low_noise_eval=self.algo_config.gmm.low_noise_eval,
            encoder_kwargs=_encoder_kwargs(self.obs_config),
        )

    def get_action(self, obs_dict, goal_dict=None):
        policy = self.nets["policy"]

        def infer(params, aux, obs, key):
            dist = policy.apply(
                {"params": params, **aux}, device_process_obs(obs),
                train=False,
            )
            return dist.sample(key)

        self._init_rng, key = jax.random.split(self._init_rng)
        return self._cached_jit("get_action", infer)(
            self.state.params["policy"], self.state.aux["policy"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()}, key,
        )


class ICLRNN(ICL):
    """RNN ICL (reference icl.py:559). Rollout inference is stepwise: a
    persistent RNN hidden state is carried across ``get_action`` calls and
    re-initialized every ``rnn.horizon`` steps (reference bc.py:506-580,
    same semantics for the BC_RNN subclasses)."""

    def _create_networks(self):
        self.nets["policy"] = PolicyNets.RNNActorNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            mlp_layer_dims=tuple(self.algo_config.actor_layer_dims),
            rnn_hidden_dim=self.algo_config.rnn.hidden_dim,
            rnn_num_layers=self.algo_config.rnn.num_layers,
            rnn_type=self.algo_config.rnn.rnn_type,
            encoder_kwargs=_encoder_kwargs(self.obs_config),
        )
        self._setup_rnn_rollout()

    def _setup_rnn_rollout(self):
        self._rnn_hidden_state = None
        self._rnn_horizon = self.algo_config.rnn.horizon
        self._rnn_counter = 0
        self._rnn_is_open_loop = self.algo_config.rnn.get("open_loop", False)
        self._open_loop_obs = None

    def process_batch_for_training(self, batch):
        obs = {k: np.asarray(v) for k, v in batch["obs"].items()}
        if self._rnn_is_open_loop:
            # predict the whole sequence open-loop from the first obs
            # (reference bc.py:531-537)
            n_steps = np.asarray(batch["actions"]).shape[1]
            obs = {
                k: np.repeat(v[:, :1], n_steps, axis=1)
                for k, v in obs.items()
            }
        return {
            "obs": obs,
            "goal_obs": batch.get("goal_obs", None),
            "actions": np.asarray(batch["actions"]),
        }

    def reset(self):
        """Reset per-episode rollout state (reference bc.py:576-580)."""
        self._rnn_hidden_state = None
        self._rnn_counter = 0
        self._open_loop_obs = None

    def _rnn_step(self, obs_dict, goal_dict, sample_key=None):
        """One closed-loop RNN step: [B, D] obs -> [B, 1, D] -> action at
        t=0, carrying the hidden state across calls."""
        policy = self.nets["policy"]
        if (
            self._rnn_hidden_state is None
            or self._rnn_counter % self._rnn_horizon == 0
        ):
            self._rnn_hidden_state = None  # fresh zero carry inside the net
            if self._rnn_is_open_loop:
                self._open_loop_obs = {
                    k: np.array(v) for k, v in obs_dict.items()
                }
        if self._rnn_is_open_loop:
            obs_dict = self._open_loop_obs
        self._rnn_counter += 1

        def infer(params, aux, obs, goal, key, state):
            obs = device_process_obs(obs)
            obs = {k: v[:, None] for k, v in obs.items()}  # add T=1
            if goal is not None:
                goal = device_process_obs(goal)
            out = policy.apply(
                {"params": params, **aux}, obs, goal_dict=goal,
                train=False, initial_state=state, return_state=True,
            )
            acts, new_state = out
            if key is not None:
                acts = acts.sample(key)
            return acts[:, 0], new_state

        name = "get_action_step" + ("_init" if self._rnn_hidden_state is None
                                    else "")
        ac, self._rnn_hidden_state = self._cached_jit(name, infer)(
            self.state.params["policy"], self.state.aux["policy"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()},
            None if goal_dict is None else {
                k: jnp.asarray(v) for k, v in goal_dict.items()
            },
            sample_key, self._rnn_hidden_state,
        )
        return ac

    def get_action(self, obs_dict, goal_dict=None):
        assert self.state is not None
        return self._rnn_step(obs_dict, goal_dict)


class ICLRNN_GMM(ICLRNN):
    """RNN-GMM ICL (reference icl.py:664). Stepwise rollout inference with
    a carried RNN hidden state, sampling the per-step GMM."""

    def get_action(self, obs_dict, goal_dict=None):
        assert self.state is not None
        self._init_rng, key = jax.random.split(self._init_rng)
        return self._rnn_step(obs_dict, goal_dict, sample_key=key)

    def _create_networks(self):
        self.nets["policy"] = PolicyNets.RNNGMMActorNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            rnn_hidden_dim=self.algo_config.rnn.hidden_dim,
            rnn_num_layers=self.algo_config.rnn.num_layers,
            rnn_type=self.algo_config.rnn.rnn_type,
            num_modes=self.algo_config.gmm.num_modes,
            min_std=self.algo_config.gmm.min_std,
            std_activation=self.algo_config.gmm.std_activation,
            low_noise_eval=self.algo_config.gmm.low_noise_eval,
            encoder_kwargs=_encoder_kwargs(self.obs_config),
        )
        self._setup_rnn_rollout()

    def _build_train_step(self):
        policy = self.nets["policy"]
        opt = self.optimizers["policy"]
        import optax

        def step(state, batch, validate):
            rng, r1, r2 = jax.random.split(state.rng, 3)

            def loss_fn(params):
                obs = device_process_obs(batch["obs"])
                variables = {"params": params["policy"], **state.aux["policy"]}
                mutable = list(state.aux["policy"].keys())
                dist, muts = policy.apply(
                    variables, obs, goal_dict=_goal_of(batch),
                    train=not validate, mutable=mutable,
                    rngs={"dropout": r1, "randomizer": r2},
                )
                lp = dist.log_prob(batch["actions"])
                losses = OrderedDict(
                    log_probs=jnp.mean(lp), action_loss=-jnp.mean(lp)
                )
                return losses["action_loss"], (losses, muts)

            (loss, (losses, muts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            metrics = dict(losses)
            metrics["policy_grad_norms"] = optax.global_norm(grads["policy"])

            def do_update(_):
                updates, new_opt = opt.update(
                    grads["policy"], state.opt_states["policy"],
                    state.params["policy"],
                )
                return (
                    optax.apply_updates(state.params["policy"], updates),
                    new_opt,
                )

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


class ICLVAE(ICL):
    """CVAE ICL (reference ``ICLVAE`` icl.py:439-556): the BC_VAE training
    scheme with the ICL t=0 batch slicing. Note the reference factory never
    routes here (vae+transformer goes to HVQVAE, icl.py:83-94); exposed for
    API parity."""

    def _create_networks(self):
        from robot_manipulation_vq_vae_tpu.models import vae_nets as VAENets

        self.nets["policy"] = VAENets.VAEActor(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            encoder_kwargs=_encoder_kwargs(self.obs_config),
            **VAENets.vae_args_from_config(self.algo_config.vae),
        )

    def _init_variables(self, rng, batch):
        from robot_manipulation_vq_vae_tpu.algo.bc import BC_VAE

        return BC_VAE._init_variables(self, rng, batch)

    def _build_train_step(self):
        from robot_manipulation_vq_vae_tpu.algo.bc import BC_VAE

        return BC_VAE._build_train_step(self)

    def train_on_batch(self, batch, epoch, validate=False):
        from robot_manipulation_vq_vae_tpu.algo.bc import BC_VAE

        return BC_VAE.train_on_batch(self, batch, epoch, validate)

    def _temperature(self, epoch):
        from robot_manipulation_vq_vae_tpu.algo.bc import BC_VAE

        return BC_VAE._temperature(self, epoch)

    def log_info(self, info):
        from robot_manipulation_vq_vae_tpu.algo.bc import BC_VAE

        return BC_VAE.log_info(self, info)

    def get_action(self, obs_dict, goal_dict=None):
        from robot_manipulation_vq_vae_tpu.algo.bc import BC_VAE

        return BC_VAE.get_action(self, obs_dict, goal_dict)


# ---------------------------------------------------------------------------
# transformer ICL
# ---------------------------------------------------------------------------

class ICLTransformer(ICL):
    """Transformer-policy ICL (reference ``ICLTransformer`` icl.py:766-906)."""

    def _policy_transformer_args(self):
        args = BaseNets.transformer_args_from_config(self.algo_config.transformer)
        # TransformerActorNetwork takes no tokenizer flags (reference
        # icl.py:925-937 pops them)
        for k in (
            "transformer_fast_enabled", "transformer_bin_enabled",
            "transformer_vq_vae_enabled", "transformer_ln_act_enabled",
        ):
            args.pop(k, None)
        return args

    def _create_networks(self):
        assert self.algo_config.transformer.enabled
        self.nets["policy"] = PolicyNets.TransformerActorNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            encoder_kwargs=_encoder_kwargs(self.obs_config),
            **self._policy_transformer_args(),
        )
        self._set_params_from_config()

    def _set_params_from_config(self):
        """Reference icl.py:790-804."""
        tc = self.algo_config.transformer
        self.context_length = tc.context_length
        self.supervise_all_steps = tc.supervise_all_steps
        self.pred_future_acs = tc.pred_future_acs
        self.fast_enabled = tc.fast_enabled
        self.bin_enabled = tc.bin_enabled
        self.vq_vae_enabled = tc.get("vq_vae_enabled", False)
        self.ln_act_enabled = tc.ln_act_enabled
        if self.pred_future_acs:
            assert self.supervise_all_steps is True

    def process_batch_for_training(self, batch):
        """Slice obs[:, :h] and the action window (reference icl.py:806-845)."""
        h = self.context_length
        out = {}
        out["obs"] = {k: np.asarray(batch["obs"][k])[:, :h] for k in batch["obs"]}
        out["goal_obs"] = batch.get("goal_obs", None)
        actions = np.asarray(batch["actions"])
        if self.supervise_all_steps:
            ac_start = h - 1 if self.pred_future_acs else 0
            out["actions"] = actions[:, ac_start : ac_start + h]
        else:
            out["actions"] = actions[:, h - 1]
        if self.pred_future_acs:
            assert out["actions"].shape[1] == h
        return out

    def _select_output(self, output):
        """Pick the rollout action from the predicted sequence
        (reference icl.py:898-906)."""
        if self.supervise_all_steps and self.pred_future_acs:
            return output[:, 0]
        return output[:, -1]

    def get_action(self, obs_dict, context_batch, goal_dict=None):
        policy = self.nets["policy"]

        def infer(params, aux, obs, ctx_actions):
            out = policy.apply(
                {"params": params, **aux}, device_process_obs(obs),
                actions=ctx_actions, train=False,
            )
            return self._select_output(out)

        return self._cached_jit("get_action", infer)(
            self.state.params["policy"], self.state.aux["policy"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()},
            jnp.asarray(context_batch["actions"]),
        )

    def _init_variables(self, rng, batch):
        r1, r2 = jax.random.split(rng)
        obs = device_process_obs(
            {k: jnp.asarray(v) for k, v in batch["obs"].items()}
        )
        out = {
            "policy": self.nets["policy"].init({"params": r1}, obs, train=False)
        }
        if "vqvae" in self.nets:
            out["vqvae"] = self.nets["vqvae"].init(
                {"params": r2}, jnp.asarray(batch["actions"]), training=False
            )
        return out

    def _build_train_step(self):
        """Shared transformer BC/ICL step: sequence prediction losses, with
        the HVQVAE combined-loss path when a vqvae net exists
        (reference icl.py:1047-1213)."""
        policy = self.nets["policy"]
        vqvae = self.nets.get("vqvae")
        pol_opt = self.optimizers["policy"]
        vq_opt = self.optimizers.get("vqvae")
        vq_enabled = self.vq_vae_enabled and vqvae is not None
        lambda_rec = getattr(self, "vqvae_lambda_rec", 1.0)
        # TPU mixed precision: the policy forward/backward (convs +
        # transformer, where the FLOPs are) runs in bfloat16; the f32 master
        # params are cast inside loss_fn so gradients come back f32 through
        # the cast's VJP, and the HVQVAE (EMA codebooks) stays f32.
        bf16 = bool(
            self.global_config.train.get("mixed_precision", False)
        )
        import optax

        _half, _full = _cast_half, _cast_full

        def step(state, batch, validate):
            rng, rd, rr, rv, rd2 = jax.random.split(state.rng, 5)

            def loss_fn(params):
                losses = OrderedDict()
                muts = {}
                action_inputs = None
                if vq_enabled:
                    vq_vars = {"params": params["vqvae"], **state.aux["vqvae"]}
                    vq_out, vq_mut = vqvae.apply(
                        vq_vars, batch["actions"], training=not validate,
                        mutable=["vq"],
                        rngs={"dropout": rd, "vq": rv},
                    )
                    muts["vqvae"] = vq_mut
                    vq_losses = compute_vqvae_loss(
                        vq_out, batch["actions"],
                        commitment_cost=1.0, lambda_rec=lambda_rec,
                    )
                    losses.update(vq_losses)
                    action_inputs = vq_out["quantized_q"]

                obs = device_process_obs(batch["obs"])
                pol_params = params["policy"]
                pol_aux = state.aux["policy"]
                if bf16:
                    pol_params = _half(pol_params)
                    pol_aux = _half(pol_aux)
                    obs = _half(obs)
                    if action_inputs is not None:
                        action_inputs = _half(action_inputs)
                pol_vars = {"params": pol_params, **pol_aux}
                mutable = list(state.aux["policy"].keys())
                acts, pol_mut = policy.apply(
                    pol_vars, obs, actions=action_inputs,
                    train=not validate, mutable=mutable,
                    rngs={"dropout": rd2, "randomizer": rr},
                )
                muts["policy"] = _full(pol_mut) if bf16 else pol_mut
                if bf16:
                    acts = acts.astype(jnp.float32)  # losses in f32
                if not self.supervise_all_steps:
                    acts = acts[:, -1]
                losses.update(self._action_losses(acts, batch["actions"]))
                # combined loss, one backward (reference icl.py:1171-1175)
                if vq_enabled:
                    combined = 0.1 * losses["vqvae_loss"] + 1.0 * losses["action_loss"]
                else:
                    combined = losses["action_loss"]
                return combined, (losses, muts)

            (_, (losses, muts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)

            metrics = dict(losses)
            metrics["policy_grad_norms"] = optax.global_norm(grads["policy"])
            if vq_enabled:
                metrics["vqvae_grad_norms"] = optax.global_norm(grads["vqvae"])

            new_params = dict(state.params)
            new_opts = dict(state.opt_states)

            def apply_net(name, opt):
                updates, new_opt = opt.update(
                    grads[name], state.opt_states[name], state.params[name]
                )
                return optax.apply_updates(state.params[name], updates), new_opt

            def do_update(_):
                p_pol, o_pol = apply_net("policy", pol_opt)
                if vq_enabled:
                    p_vq, o_vq = apply_net("vqvae", vq_opt)
                    return p_pol, o_pol, p_vq, o_vq
                return (p_pol, o_pol, state.params.get("vqvae"),
                        state.opt_states.get("vqvae"))

            def no_update(_):
                return (
                    state.params["policy"], state.opt_states["policy"],
                    state.params.get("vqvae"), state.opt_states.get("vqvae"),
                )

            p_pol, o_pol, p_vq, o_vq = jax.lax.cond(
                validate, no_update, do_update, None
            )
            new_params["policy"] = p_pol
            new_opts["policy"] = o_pol
            if vq_enabled:
                new_params["vqvae"] = p_vq
                new_opts["vqvae"] = o_vq

            new_aux = dict(state.aux)
            for name, m in muts.items():
                new_aux[name] = {**state.aux[name], **m}
            return (
                AlgoState(
                    params=new_params, aux=new_aux, opt_states=new_opts,
                    step=state.step + 1, rng=rng,
                ),
                metrics,
            )

        # RMVQ_DONATE=1 lets XLA alias the old state's buffers into the new
        # state (halves param+opt HBM residency). Production-safe - the old
        # AlgoState is dropped each step; off by default so callers may keep
        # references to previous states (tests do).
        donate = (0,) if os.environ.get("RMVQ_DONATE") == "1" else ()
        return jax.jit(step, static_argnums=2, donate_argnums=donate)


class ICLTransformerHVQVAE(ICLTransformer):
    """ICL transformer + hierarchical VQ-VAE co-training - the shipped
    ``train_config.json`` path (reference icl.py:909-1405)."""

    def _create_networks(self):
        assert self.algo_config.transformer.enabled
        self.nets["policy"] = PolicyNets.TransformerActorNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            encoder_kwargs=_encoder_kwargs(self.obs_config),
            **self._policy_transformer_args(),
        )
        self._set_params_from_config()
        if self.vq_vae_enabled:
            vq_cfg = self.algo_config.transformer.vqvae
            self.nets["vqvae"] = HierarchicalVQVAE(
                action_dim=self.ac_dim,
                num_subclusters=vq_cfg.get("num_subclusters", 128),
                num_clusters=vq_cfg.get("num_clusters", 32),
                embed_dim=vq_cfg.get(
                    "embed_dim", self.algo_config.transformer.embed_dim
                ),
                num_stages=vq_cfg.get("num_stages", 2),
                num_layers_per_stage=vq_cfg.get("num_layers_per_stage", 10),
                beta=vq_cfg.get("beta_ema", 0.8),
                dropout=vq_cfg.get("dropout", 0.1),
                kmeans_init=True,
            )
            self.vqvae_lambda_rec = vq_cfg.get("lambda_rec", 1.0)
            self.vqvae_pretrain_epochs = vq_cfg.get("pretrain_epochs", 0)

    def _create_optimizers(self):
        """Policy + (fallback-aware) VQ-VAE optimizer (reference
        icl.py:1005-1045)."""
        super()._create_optimizers()
        if self.vq_vae_enabled and "vqvae" in self.nets and "vqvae" not in self.optimizers:
            self.optimizers["vqvae"] = OptimUtils.optimizer_from_optim_params(
                self.optim_params.get("vqvae", self.optim_params["policy"]),
                max_grad_norm=self.global_config.train.get("max_grad_norm", None),
            )

    def train_on_batch(self, batch, epoch, validate=False):
        batch = _device_batch(batch)
        self.ensure_state(batch)
        if self._train_step_jit is None:
            self._train_step_jit = self._build_train_step()
        self.state, metrics = self._train_step_jit(self.state, batch, validate)
        return {"losses": metrics}

    def log_info(self, info):
        """Reference icl.py:1256-1300 (incl. codebook telemetry)."""
        log = OrderedDict()
        losses = info["losses"]
        log["Loss"] = float(losses["action_loss"])
        for src, dst in (
            ("l2_loss", "L2_Loss"), ("l1_loss", "L1_Loss"),
            ("cos_loss", "Cosine_Loss"),
            ("policy_grad_norms", "Policy_Grad_Norms"),
        ):
            if src in losses:
                log[dst] = float(losses[src])
        if self.vq_vae_enabled and "vqvae_loss" in losses:
            log["VQ-VAE/Total_Loss"] = float(losses["vqvae_loss"])
            log["VQ-VAE/Reconstruction_Loss"] = float(losses["L_rec"])
            log["VQ-VAE/Commitment_Z_Loss"] = float(losses["L_commit_z"])
            log["VQ-VAE/Commitment_Q_Loss"] = float(losses["L_commit_q"])
            if "vqvae_grad_norms" in losses:
                log["VQ-VAE/Grad_Norms"] = float(losses["vqvae_grad_norms"])
            usage = get_codebook_usage(self.state.aux["vqvae"]["vq"])
            log["VQ-VAE/Z_Utilization_pct"] = usage["z_usage_pct"]
            log["VQ-VAE/Q_Utilization_pct"] = usage["q_usage_pct"]
            log["VQ-VAE/Z_Utilization"] = usage["z_used"]
            log["VQ-VAE/Q_Utilization"] = usage["q_used"]
            log["VQ-VAE/Z_Dead_Codes"] = usage["z_dead"]
            log["VQ-VAE/Q_Dead_Codes"] = usage["q_dead"]
        return log

    def get_action(self, obs_dict, context_batch, goal_dict=None):
        """VQ-VAE-reconstruct context actions, feed to policy
        (reference icl.py:1302-1354). One jitted device call."""
        policy = self.nets["policy"]
        vqvae = self.nets.get("vqvae")
        vq_enabled = self.vq_vae_enabled and vqvae is not None

        def infer(params, aux, obs, ctx_actions):
            if vq_enabled:
                vq_out = vqvae.apply(
                    {"params": params["vqvae"], **aux["vqvae"]},
                    ctx_actions, training=False,
                )
                action_inputs = vq_out["reconstructed_actions"]
            else:
                action_inputs = ctx_actions
            out = policy.apply(
                {"params": params["policy"], **aux["policy"]},
                device_process_obs(obs), actions=action_inputs, train=False,
            )
            return self._select_output(out)

        return self._cached_jit("get_action", infer)(
            self.state.params, self.state.aux,
            {k: jnp.asarray(v) for k, v in obs_dict.items()},
            jnp.asarray(context_batch["actions"]),
        )

    def on_epoch_end(self, epoch):
        pass


class ICLTransformer_GMM(ICLTransformer):
    """The paper's LipVQ path: prompt-conditioned GMM transformer with the
    in-encoder action tokenizer (reference icl.py:1408-1542)."""

    def _create_networks(self):
        assert self.algo_config.gmm.enabled
        assert self.algo_config.transformer.enabled
        self.nets["policy"] = PolicyNets.ICLTransformerGMMActorNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            num_modes=self.algo_config.gmm.num_modes,
            min_std=self.algo_config.gmm.min_std,
            std_activation=self.algo_config.gmm.std_activation,
            low_noise_eval=self.algo_config.gmm.low_noise_eval,
            encoder_kwargs=_encoder_kwargs(self.obs_config),
            action_input_shape=self.ac_dim,
            **BaseNets.transformer_args_from_config(self.algo_config.transformer),
        )
        self._set_params_from_config()

    def _create_optimizers(self):
        super()._create_optimizers()
        if self.vq_vae_enabled:
            # dedicated AdamW for the in-encoder LipVQ (icl.py:1437-1441)
            import optax

            self.optimizers["vq_tokenizer"] = optax.adamw(
                1e-3, weight_decay=1e-4
            )

    # --- FAST modality host stage ---------------------------------------
    # Reference runs FAST-tokenize -> CLIP-text-encode inline in the encoder
    # forward (obs_nets.py:1308-1336). On TPU the frozen host stage bridges
    # into the jitted step via io_callback; the device sees [B, T, 512]
    # latents and only the FastProjection MLP trains.

    _fast_tokenizer = None

    def set_fast_tokenizer(self, tokenizer):
        """Inject a :class:`FastActionTokenizer` (tests inject stubs here)."""
        self._fast_tokenizer = tokenizer

    def _get_fast_tokenizer(self):
        if self._fast_tokenizer is None:
            from robot_manipulation_vq_vae_tpu.models.tokenizers.fast import (
                FastActionTokenizer,
            )

            proc_dir = os.environ.get("RMVQ_FAST_PROCESSOR_DIR")
            if not proc_dir:
                raise RuntimeError(
                    "fast_enabled=True requires a FAST processor: set "
                    "RMVQ_FAST_PROCESSOR_DIR (and RMVQ_CLIP_DIR) or call "
                    "set_fast_tokenizer()"
                )
            self._fast_tokenizer = FastActionTokenizer(
                output_dim=0,  # projection lives inside the policy encoder
                fast_processor_dir=proc_dir,
                clip_model_dir=os.environ.get("RMVQ_CLIP_DIR"),
                seq_len=self.context_length,
            )
        return self._fast_tokenizer

    def _maybe_fast_latents(self, ctx_act):
        """[B, T, A] raw context actions -> [B, T, 512] CLIP latents when
        fast_enabled; identity otherwise. Safe under jit (io_callback)."""
        if not self.fast_enabled:
            return ctx_act
        return self._get_fast_tokenizer().clip_latents_io_callback(ctx_act)

    _VQ_PATH = ("net", "encoder", "action_network")

    def _vq_subtree(self, policy_params):
        node = policy_params
        for k in self._VQ_PATH:
            node = node[k]
        return node

    def _with_vq_subtree(self, policy_params, subtree):
        def assign(node, path):
            if not path:
                return subtree
            out = dict(node)
            out[path[0]] = assign(node[path[0]], path[1:])
            return out

        return assign(policy_params, list(self._VQ_PATH))

    def _init_variables(self, rng, batch):
        obs = device_process_obs(
            {k: jnp.asarray(v) for k, v in batch["obs"].items()}
        )
        h = self.context_length
        mid = next(iter(obs.values())).shape[0] // 2
        ctx_obs = {k: v[:mid] for k, v in obs.items()}
        tr_obs = {k: v[mid:] for k, v in obs.items()}
        ctx_act = self._maybe_fast_latents(jnp.asarray(batch["actions"])[:mid])
        variables = self.nets["policy"].init(
            {"params": rng}, tr_obs, ctx_obs, ctx_act, train=False,
            method=self.nets["policy"].forward_train,
        )
        return {"policy": variables}

    def ensure_state(self, batch):
        super().ensure_state(batch)
        if self.vq_vae_enabled and "vq_tokenizer" not in self.state.opt_states:
            vq_params = self._vq_subtree(self.state.params["policy"])
            self.state = self.state.replace(
                opt_states={
                    **self.state.opt_states,
                    "vq_tokenizer": self.optimizers["vq_tokenizer"].init(vq_params),
                }
            )

    def _build_train_step(self):
        policy = self.nets["policy"]
        pol_opt = self.optimizers["policy"]
        vq_opt = self.optimizers.get("vq_tokenizer")
        vq_enabled = self.vq_vae_enabled
        supervise_all = self.supervise_all_steps
        bf16 = bool(self.global_config.train.get("mixed_precision", False))
        import optax

        def forward(params, state, batch, train, rngs):
            obs = device_process_obs(batch["obs"])
            mid = next(iter(obs.values())).shape[0] // 2
            ctx_obs = {k: v[:mid] for k, v in obs.items()}
            tr_obs = {k: v[mid:] for k, v in obs.items()}
            ctx_act, tr_act = batch["actions"][:mid], batch["actions"][mid:]
            ctx_act = self._maybe_fast_latents(ctx_act)
            pol_params = params["policy"]
            pol_aux = state.aux["policy"]
            if bf16:
                # forward/backward in bf16; the GMM log-prob, losses, and
                # optimizer math stay f32 (grads return f32 via the cast VJP)
                pol_params = _cast_half(pol_params)
                pol_aux = _cast_half(pol_aux)
                ctx_obs = _cast_half(ctx_obs)
                tr_obs = _cast_half(tr_obs)
                ctx_act = _cast_half(ctx_act)
            variables = {"params": pol_params, **pol_aux}
            mutable = list(state.aux["policy"].keys())
            (dist, vq_loss), muts = policy.apply(
                variables, tr_obs, ctx_obs, ctx_act,
                low_noise_eval=False, train=train,
                mutable=mutable, rngs=rngs,
                method=policy.forward_train,
            )
            if bf16:
                dist = _cast_full(dist)
                vq_loss = jnp.asarray(vq_loss, jnp.float32)
                muts = _cast_full(muts)
            if not supervise_all:
                dist = dist.index_time(-1)
                tr_act = tr_act[:, -1]
            lp = dist.log_prob(tr_act)
            return lp, vq_loss, muts

        def step(state, batch, validate):
            rng, r1, r2, r3 = jax.random.split(state.rng, 4)
            rngs = {"dropout": r1, "randomizer": r2}

            def nll_fn(params):
                lp, vq_loss, muts = forward(
                    params, state, batch, not validate, rngs
                )
                action_loss = -jnp.mean(lp)
                return action_loss, (jnp.mean(lp), vq_loss, muts)

            (action_loss, (log_probs, vq_loss, muts)), grads = (
                jax.value_and_grad(nll_fn, has_aux=True)(state.params)
            )
            metrics = OrderedDict(
                log_probs=log_probs, action_loss=action_loss,
                policy_grad_norms=optax.global_norm(grads["policy"]),
            )
            if vq_enabled:
                metrics["vq_vae_loss"] = vq_loss

            def do_update(_):
                # (1) second backward: LipVQ loss -> dedicated AdamW over the
                # tokenizer subtree (reference icl.py:1520-1522)
                new_params = state.params["policy"]
                vq_opt_state = state.opt_states.get("vq_tokenizer")
                if vq_enabled:
                    def vq_fn(params):
                        _, vq_l, _ = forward(params, state, batch, not validate, rngs)
                        return vq_l

                    vq_grads = jax.grad(vq_fn)(state.params)
                    vq_sub_grads = self._vq_subtree(vq_grads["policy"])
                    vq_sub_params = self._vq_subtree(new_params)
                    vq_updates, vq_opt_state = vq_opt.update(
                        vq_sub_grads, vq_opt_state, vq_sub_params
                    )
                    new_params = self._with_vq_subtree(
                        new_params,
                        optax.apply_updates(vq_sub_params, vq_updates),
                    )
                # (2) policy optimizer over all policy params (NLL grads)
                updates, pol_opt_state = pol_opt.update(
                    grads["policy"], state.opt_states["policy"], new_params
                )
                new_params = optax.apply_updates(new_params, updates)
                return new_params, pol_opt_state, vq_opt_state

            def no_update(_):
                return (
                    state.params["policy"], state.opt_states["policy"],
                    state.opt_states.get("vq_tokenizer"),
                )

            new_pol, pol_opt_state, vq_opt_state = jax.lax.cond(
                validate, no_update, do_update, None
            )
            new_opts = {**state.opt_states, "policy": pol_opt_state}
            if vq_enabled:
                new_opts["vq_tokenizer"] = vq_opt_state
            new_aux = dict(state.aux)
            new_aux["policy"] = {**state.aux["policy"], **muts}
            return (
                AlgoState(
                    params={**state.params, "policy": new_pol},
                    aux=new_aux, opt_states=new_opts,
                    step=state.step + 1, rng=rng,
                ),
                metrics,
            )

        return jax.jit(step, static_argnums=2)

    def train_on_batch(self, batch, epoch, validate=False):
        batch = _device_batch(batch)
        self.ensure_state(batch)
        if self._train_step_jit is None:
            self._train_step_jit = self._build_train_step()
        self.state, metrics = self._train_step_jit(self.state, batch, validate)
        return {"losses": metrics}

    def log_info(self, info):
        log = OrderedDict()
        log["Loss"] = float(info["losses"]["action_loss"])
        log["Log_Likelihood"] = float(info["losses"]["log_probs"])
        if "policy_grad_norms" in info["losses"]:
            log["Policy_Grad_Norms"] = float(info["losses"]["policy_grad_norms"])
        return log

    def get_action(self, obs_dict, context_batch, goal_dict=None):
        policy = self.nets["policy"]

        def infer(params, aux, obs, ctx_obs, ctx_actions, key):
            dist, _ = policy.apply(
                {"params": params, **aux}, device_process_obs(obs),
                device_process_obs(ctx_obs),
                self._maybe_fast_latents(ctx_actions),
                train=False, method=policy.forward_train,
            )
            return self._select_output(dist.sample(key))

        self._init_rng, key = jax.random.split(self._init_rng)
        return self._cached_jit("get_action", infer)(
            self.state.params["policy"], self.state.aux["policy"],
            {k: jnp.asarray(v) for k, v in obs_dict.items()},
            {k: jnp.asarray(v) for k, v in context_batch["obs"].items()},
            jnp.asarray(context_batch["actions"]), key,
        )
