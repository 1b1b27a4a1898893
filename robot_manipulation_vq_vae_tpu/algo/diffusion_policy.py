"""Diffusion Policy (UNet) - reference ``robomimic/algo/diffusion_policy.py``.

DDPM/DDIM diffusion over action-sequence chunks, conditioned on the last
``observation_horizon`` encoded observations; receding-horizon execution
(predict Tp steps, execute Ta). The denoiser is a FiLM-conditioned 1-D UNet
(``models/diffusion_nets.py``); EMA weights are kept in the state with the
diffusers warmup decay ``min((1+step)/(10+step), 0.9999)`` and the denoiser's
EMA shadow is used for inference (the obs encoder deliberately is not — a
reference quirk, see ``get_action``). The obs encoder's conv trunks use
GroupNorm(C//16) instead of BatchNorm, the reference's ``replace_bn_with_gn``
pass (diffusion_policy.py:64-67).
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
from robot_manipulation_vq_vae_tpu.models.diffusion_nets import (
    ConditionalUnet1D,
    DiffusionSchedule,
)
from robot_manipulation_vq_vae_tpu.models.obs_nets import (
    ObservationGroupEncoder,
    group_encoder_output_dim,
    group_shapes_spec,
)


@register_algo_factory_func("diffusion_policy")
def algo_config_to_class(algo_config):
    assert algo_config.unet.enabled
    return DiffusionPolicyUNet, {}


class DiffusionPolicyUNet(PolicyAlgo):
    def _create_networks(self):
        cfg = self.algo_config
        self.To = cfg.horizon.observation_horizon
        self.Ta = cfg.horizon.action_horizon
        self.Tp = cfg.horizon.prediction_horizon

        groups = {"obs": dict(self.obs_shapes)}
        self._group_spec = group_shapes_spec(groups)
        enc_kwargs = self._gn_encoder_kwargs()
        self.nets["obs_encoder"] = ObservationGroupEncoder(
            observation_group_shapes=self._group_spec,
            encoder_kwargs=enc_kwargs,
        )
        self.obs_feat_dim = group_encoder_output_dim(
            self._group_spec, enc_kwargs
        )
        self.nets["policy"] = ConditionalUnet1D(
            action_dim=self.ac_dim,
            down_dims=tuple(cfg.unet.down_dims),
            diffusion_step_embed_dim=cfg.unet.diffusion_step_embed_dim,
            kernel_size=cfg.unet.kernel_size,
            n_groups=cfg.unet.n_groups,
        )
        if cfg.ddpm.enabled:
            assert cfg.ddpm.get("prediction_type", "epsilon") == "epsilon"
            self.schedule = DiffusionSchedule(
                cfg.ddpm.num_train_timesteps,
                beta_schedule=cfg.ddpm.get("beta_schedule", "squaredcos_cap_v2"),
                clip_sample=cfg.ddpm.get("clip_sample", True),
            )
            self.num_inference_steps = cfg.ddpm.num_inference_timesteps
            self.use_ddim = False
        else:
            assert cfg.ddim.enabled
            assert cfg.ddim.get("prediction_type", "epsilon") == "epsilon"
            self.schedule = DiffusionSchedule(
                cfg.ddim.num_train_timesteps,
                beta_schedule=cfg.ddim.get("beta_schedule", "squaredcos_cap_v2"),
                clip_sample=cfg.ddim.get("clip_sample", True),
                set_alpha_to_one=cfg.ddim.get("set_alpha_to_one", True),
                steps_offset=cfg.ddim.get("steps_offset", 0),
            )
            self.num_inference_steps = cfg.ddim.num_inference_timesteps
            self.use_ddim = True
        self.ema_enabled = cfg.ema.enabled
        self.ema_power = float(cfg.ema.get("power", 0.75))
        self._action_check_done = False

    def _gn_encoder_kwargs(self):
        """Encoder kwargs with every torchvision-style trunk switched from
        BatchNorm to GroupNorm(C//16) — the reference's ``replace_bn_with_gn``
        pass over the whole obs encoder (diffusion_policy.py:64-67: "replace
        all BatchNorm with GroupNorm to work with EMA; performance will tank
        if you forget"). Backbones without a ``norm`` knob (R3M/MVP/Shallow)
        are untouched, exactly like the reference's BatchNorm2d predicate."""
        kwargs = _encoder_kwargs(self.obs_config)
        for mod_cfg in kwargs.values():
            core_kwargs = dict(mod_cfg.get("core_kwargs") or {})
            bkw = dict(core_kwargs.get("backbone_kwargs") or {})
            bkw["norm"] = "group"
            core_kwargs["backbone_kwargs"] = bkw
            mod_cfg["core_kwargs"] = core_kwargs
        return kwargs

    def _create_optimizers(self):
        from robot_manipulation_vq_vae_tpu.utils import optim_utils as OptimUtils

        mg = self.global_config.train.get("max_grad_norm", None)
        opt = OptimUtils.optimizer_from_optim_params(
            self.optim_params["policy"], max_grad_norm=mg
        )
        self.optimizers["policy"] = opt
        self.optimizers["obs_encoder"] = opt

    def process_batch_for_training(self, batch):
        """obs[:, :To], actions[:, :Tp] (reference diffusion_policy.py:139-178)."""
        actions = np.asarray(batch["actions"])[:, : self.Tp]
        # one-time [-1, 1] range check (reference diffusion_policy.py:151-159)
        if not self._action_check_done:
            if not bool(np.all((actions >= -1) & (actions <= 1))):
                raise ValueError(
                    '"actions" must be in range [-1,1] for Diffusion Policy! '
                    "Check if hdf5_normalize_action is enabled."
                )
            self._action_check_done = True
        return {
            "obs": {
                k: np.asarray(v)[:, : self.To]
                for k, v in batch["obs"].items()
            },
            "goal_obs": batch.get("goal_obs", None),
            "actions": actions,
        }

    def _init_variables(self, rng, batch):
        r1, r2 = jax.random.split(rng)
        obs = device_process_obs(
            {k: jnp.asarray(v) for k, v in batch["obs"].items()}
        )
        flat = {k: v.reshape((-1,) + v.shape[2:]) for k, v in obs.items()}
        enc_vars = self.nets["obs_encoder"].init({"params": r1}, obs=flat)
        b = jnp.asarray(batch["actions"]).shape[0]
        cond = jnp.zeros((b, self.To * self.obs_feat_dim))
        pol_vars = self.nets["policy"].init(
            {"params": r2}, jnp.asarray(batch["actions"]),
            jnp.zeros((b,), jnp.int32), cond,
        )
        out = {"obs_encoder": enc_vars, "policy": pol_vars}
        if self.ema_enabled:
            out["policy_ema"] = jax.tree_util.tree_map(jnp.array, pol_vars)
            out["obs_encoder_ema"] = jax.tree_util.tree_map(jnp.array, enc_vars)
        return out

    def _encode_cond(self, params, aux, obs, train, rngs=None):
        b, to = next(iter(obs.values())).shape[:2]
        flat = {k: v.reshape((-1,) + v.shape[2:]) for k, v in obs.items()}
        feats = self.nets["obs_encoder"].apply(
            {"params": params, **aux}, obs=flat, train=train,
            rngs=rngs or {},
        )
        return feats.reshape(b, -1)  # [B, To*D]

    def _build_train_step(self):
        policy = self.nets["policy"]
        opts = self.optimizers
        schedule = self.schedule
        num_t = schedule.num_train_timesteps
        ema_enabled = self.ema_enabled
        # bf16 master-cast (same pattern as the transformer step): encoder +
        # UNet forward/backward in bf16, loss/optimizer/EMA/schedule in f32
        bf16 = bool(self.global_config.train.get("mixed_precision", False))
        import optax

        def _half(tree):
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                tree,
            )

        def step(state, batch, validate):
            rng, r_t, r_n, r_d, r_r = jax.random.split(state.rng, 5)
            actions = batch["actions"]
            b = actions.shape[0]

            def loss_fn(params):
                obs = device_process_obs(batch["obs"])
                enc_params = params["obs_encoder"]
                enc_aux = state.aux["obs_encoder"]
                pol_params = params["policy"]
                pol_aux = state.aux["policy"]
                noisy_in = schedule.add_noise(
                    actions, noise := jax.random.normal(r_n, actions.shape),
                    t := jax.random.randint(r_t, (b,), 0, num_t),
                )
                if bf16:
                    enc_params, enc_aux = _half(enc_params), _half(enc_aux)
                    pol_params, pol_aux = _half(pol_params), _half(pol_aux)
                    obs = _half(obs)
                    noisy_in = noisy_in.astype(jnp.bfloat16)
                cond = self._encode_cond(
                    enc_params, enc_aux, obs,
                    train=not validate,
                    rngs={"dropout": r_d, "randomizer": r_r},
                )
                eps = policy.apply(
                    {"params": pol_params, **pol_aux}, noisy_in, t, cond
                ).astype(jnp.float32)
                return jnp.mean((eps - noise) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            metrics = OrderedDict(l2_loss=loss)
            new_params = dict(state.params)
            new_opts = dict(state.opt_states)
            for name in ("policy", "obs_encoder"):
                updates, o = opts[name].update(
                    grads[name], state.opt_states[name], state.params[name]
                )
                new_params[name] = optax.apply_updates(
                    state.params[name], updates
                )
                new_opts[name] = o
            if ema_enabled:
                decay = jnp.minimum(
                    (1.0 + state.step) / (10.0 + state.step), 0.9999
                )
                for name in ("policy", "obs_encoder"):
                    new_params[f"{name}_ema"] = jax.tree_util.tree_map(
                        lambda e, p: decay * e + (1 - decay) * p,
                        state.params[f"{name}_ema"], new_params[name],
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
        batch = {
            "obs": {k: jnp.asarray(v) for k, v in batch["obs"].items()},
            "actions": jnp.asarray(batch["actions"]),
        }
        self.ensure_state(batch)
        if self._train_step_jit is None:
            self._train_step_jit = self._build_train_step()
        self.state, metrics = self._train_step_jit(self.state, batch, validate)
        return {"losses": metrics}

    def log_info(self, info):
        return OrderedDict(Loss=float(info["losses"]["l2_loss"]))

    def _sample(self, rng, cond, pol_params=None, pol_aux=None):
        """Iterative denoising from pure noise (DDPM or DDIM)."""
        policy = self.nets["policy"]
        if pol_params is None:
            name = "policy_ema" if self.ema_enabled else "policy"
            pol_params = self.state.params[name]
        if pol_aux is None:
            pol_aux = self.state.aux["policy"]
        b = cond.shape[0]
        x = jax.random.normal(rng, (b, self.Tp, self.ac_dim))
        sched = self.schedule
        # diffusers set_timesteps grid + prev_t = t - stride, for BOTH
        # schedulers (the reference calls set_timesteps(num_inference) on
        # DDPM too, diffusion_policy.py:360)
        ts = sched.inference_timesteps(self.num_inference_steps,
                                       ddim=self.use_ddim)
        stride = sched.num_train_timesteps // min(
            self.num_inference_steps, sched.num_train_timesteps
        )
        for t in ts:
            t = int(t)
            eps = policy.apply(
                {"params": pol_params, **pol_aux},
                x, jnp.full((b,), t), cond,
            )
            if self.use_ddim:
                x = sched.ddim_step(x, eps, t, t - stride)
            else:
                rng, sub = jax.random.split(rng)
                x = sched.ddpm_step(sub, x, eps, t, t_prev=t - stride)
        return x

    def get_action(self, obs_dict, goal_dict=None):
        """Whole pipeline (cond encode + full denoising loop) is ONE jitted
        device call - the reference dispatches every denoise step.

        Reference quirk reproduced: at inference the obs encoder runs with
        the LIVE (non-EMA) weights while the denoiser uses the EMA shadow —
        ``_get_action_trajectory`` encodes through ``self.nets`` but
        denoises through the ``copy_to``'d shadow nets
        (diffusion_policy.py:336-376)."""
        enc_name = "obs_encoder"
        pol_name = "policy_ema" if self.ema_enabled else "policy"

        def infer(params, aux, obs, key):
            obs = device_process_obs(obs)
            cond = self._encode_cond(
                params[enc_name], aux["obs_encoder"], obs, train=False
            )
            seq = self._sample(
                key, cond, pol_params=params[pol_name], pol_aux=aux["policy"]
            )
            # receding horizon: first action after the obs window
            return seq[:, self.To - 1]

        self._init_rng, key = jax.random.split(self._init_rng)
        return self._cached_jit("get_action", infer)(
            self.state.params, self.state.aux,
            {k: jnp.asarray(v)[:, -self.To:] for k, v in obs_dict.items()},
            key,
        )
