"""Diffusion policy + ACT smoke tests (tiny dims)."""

import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

B, A = 2, 5
OBS_KEYS = {"robot0_eef_pos": (7,)}


def make_batch(rng, T):
    return {
        "obs": {k: rng.randn(B, T, *s).astype(np.float32)
                for k, s in OBS_KEYS.items()},
        "actions": rng.uniform(-1, 1, (B, T, A)).astype(np.float32),
    }


@pytest.mark.slow
def test_diffusion_policy():
    config = config_factory("diffusion_policy")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.algo.unet.down_dims = [16, 32]
        config.algo.unet.diffusion_step_embed_dim = 16
        config.algo.ddpm.enabled = False
        config.algo.ddim.enabled = True
        config.algo.ddim.num_train_timesteps = 10
        config.algo.ddim.num_inference_timesteps = 3
        config.algo.horizon.observation_horizon = 2
        config.algo.horizon.prediction_horizon = 8
        config.train.seq_length = 8
        config.train.frame_stack = 2
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.algo_factory(
        "diffusion_policy", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    assert isinstance(algo, AlgoReg.DiffusionPolicyUNet)
    rng = np.random.RandomState(0)
    for _ in range(2):
        batch = algo.process_batch_for_training(make_batch(rng, 9))
        assert batch["actions"].shape == (B, 8, A)
        info = algo.train_on_batch(batch, epoch=1)
        log = algo.log_info(info)
        assert np.isfinite(log["Loss"])
    # EMA params tracked
    assert "policy_ema" in algo.state.params
    obs = {k: rng.randn(1, 2, *s).astype(np.float32) for k, s in OBS_KEYS.items()}
    ac = np.asarray(algo.get_action(obs))
    assert ac.shape == (1, A)
    assert np.all(np.isfinite(ac))


@pytest.mark.slow
def test_act():
    config = config_factory("act")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.algo.act.hidden_dim = 32
        config.algo.act.dim_feedforward = 64
        config.algo.act.enc_layers = 1
        config.algo.act.dec_layers = 1
        config.algo.act.nheads = 4
        config.algo.act.latent_dim = 4
        config.train.seq_length = 6
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.algo_factory(
        "act", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    assert isinstance(algo, AlgoReg.ACT)
    rng = np.random.RandomState(1)
    for _ in range(2):
        batch = algo.process_batch_for_training(make_batch(rng, 6))
        info = algo.train_on_batch(batch, epoch=1)
        log = algo.log_info(info)
        assert np.isfinite(log["Loss"])
        assert np.isfinite(log["KL_Loss"])
    # action chunking queue
    algo.reset()
    obs = {k: rng.randn(1, *s).astype(np.float32) for k, s in OBS_KEYS.items()}
    a1 = np.asarray(algo.get_action(obs))
    a2 = np.asarray(algo.get_action(obs))
    assert a1.shape == (1, A)
    assert len(algo._ac_queue) == 4  # popped 2 of 6
    assert not np.allclose(a1, a2)


def test_diffusion_mixed_precision():
    """train.mixed_precision runs the UNet in bf16 with f32 masters."""
    import jax
    import jax.numpy as jnp

    config = config_factory("diffusion_policy")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.algo.unet.down_dims = [16, 32]
        config.algo.unet.diffusion_step_embed_dim = 16
        config.algo.ddpm.enabled = False
        config.algo.ddim.enabled = True
        config.algo.ddim.num_train_timesteps = 10
        config.algo.ddim.num_inference_timesteps = 3
        config.algo.horizon.observation_horizon = 2
        config.algo.horizon.prediction_horizon = 8
        config.train.seq_length = 8
        config.train.frame_stack = 2
        config.train.mixed_precision = True
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.algo_factory(
        "diffusion_policy", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    rng = np.random.RandomState(0)
    for _ in range(2):
        batch = algo.process_batch_for_training(make_batch(rng, 9))
        log = algo.log_info(algo.train_on_batch(batch, epoch=0))
        assert np.isfinite(log["Loss"])
    for leaf in jax.tree_util.tree_leaves(algo.state.params):
        assert leaf.dtype != jnp.bfloat16


def test_schedule_diffusers_semantics():
    """DiffusionSchedule reproduces the diffusers schedulers' set_timesteps
    grid and step math (independent numpy re-derivation, fixed_small
    variance, clip_sample, set_alpha_to_one)."""
    import jax
    import jax.numpy as jnp

    from robot_manipulation_vq_vae_tpu.models.diffusion_nets import (
        DiffusionSchedule, cosine_beta_schedule,
    )

    sched = DiffusionSchedule(100)
    # set_timesteps: (arange(n_inf) * (n_train // n_inf)).round()[::-1]
    np.testing.assert_array_equal(
        sched.inference_timesteps(10, ddim=True),
        np.arange(90, -1, -10),
    )
    np.testing.assert_array_equal(
        sched.inference_timesteps(100, ddim=False),
        np.arange(99, -1, -1),
    )
    off = DiffusionSchedule(100, steps_offset=1)
    np.testing.assert_array_equal(
        off.inference_timesteps(10, ddim=True), np.arange(91, 0, -10)
    )
    # ddim grid with offset is shifted; ddpm grid is not
    np.testing.assert_array_equal(
        off.inference_timesteps(10, ddim=False), np.arange(90, -1, -10)
    )

    betas = cosine_beta_schedule(100).astype(np.float64)
    ab = np.cumprod(1.0 - betas)

    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 3).astype(np.float32) * 0.3
    eps = rng.randn(2, 4, 3).astype(np.float32) * 0.3

    # --- DDPM strided step (t=90, stride 10) vs the diffusers formula ---
    t, tp = 90, 80
    ab_t, ab_prev = ab[t], ab[tp]
    cur_beta = 1 - ab_t / ab_prev
    x0 = (x - np.sqrt(1 - ab_t) * eps) / np.sqrt(ab_t)
    x0 = np.clip(x0, -1, 1)  # clip_sample=True default
    mean = (np.sqrt(ab_prev) * cur_beta / (1 - ab_t)) * x0 + (
        np.sqrt(ab_t / ab_prev) * (1 - ab_prev) / (1 - ab_t)
    ) * x
    var = max((1 - ab_prev) / (1 - ab_t) * cur_beta, 1e-20)
    key = jax.random.PRNGKey(7)
    noise = np.asarray(jax.random.normal(key, x.shape))
    got = np.asarray(sched.ddpm_step(key, jnp.asarray(x), jnp.asarray(eps),
                                     t, t_prev=tp))
    np.testing.assert_allclose(got, mean + np.sqrt(var) * noise,
                               atol=1e-5, rtol=0)

    # --- final DDPM step adds no noise and uses ab_prev = 1 ---
    t = 0
    ab_t = ab[0]
    x0 = np.clip((x - np.sqrt(1 - ab_t) * eps) / np.sqrt(ab_t), -1, 1)
    cur_beta = 1 - ab_t  # ab_prev = 1
    mean = cur_beta / (1 - ab_t) * x0  # coef_xt term is 0 when ab_prev=1... 
    mean = (1.0 * cur_beta / (1 - ab_t)) * x0 + (
        np.sqrt(ab_t) * 0.0 / (1 - ab_t)
    ) * x
    got = np.asarray(sched.ddpm_step(key, jnp.asarray(x), jnp.asarray(eps),
                                     t, t_prev=-10))
    np.testing.assert_allclose(got, mean, atol=1e-5, rtol=0)

    # --- DDIM step vs formula (eta=0, unclipped eps for the direction) ---
    t, tp = 90, 80
    ab_t, ab_prev = ab[t], ab[tp]
    x0 = np.clip((x - np.sqrt(1 - ab_t) * eps) / np.sqrt(ab_t), -1, 1)
    want = np.sqrt(ab_prev) * x0 + np.sqrt(1 - ab_prev) * eps
    got = np.asarray(sched.ddim_step(jnp.asarray(x), jnp.asarray(eps), t, tp))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)

    # --- DDIM final step: set_alpha_to_one=True -> returns clipped x0 ---
    big = (x * 0 + 10.0).astype(np.float32)  # forces x0 out of range
    got = np.asarray(sched.ddim_step(jnp.asarray(big), jnp.asarray(0 * eps),
                                     0, -10))
    np.testing.assert_allclose(got, np.ones_like(big), atol=1e-6, rtol=0)
    # set_alpha_to_one=False -> final ab_prev = alphas_bar[0]
    keep = DiffusionSchedule(100, set_alpha_to_one=False, clip_sample=False)
    ab0 = ab[0]
    x0 = (x - np.sqrt(1 - ab[90]) * eps) / np.sqrt(ab[90])
    want = np.sqrt(ab0) * x0 + np.sqrt(1 - ab0) * eps
    got = np.asarray(keep.ddim_step(jnp.asarray(x), jnp.asarray(eps), 90, -10))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)


def test_diffusion_action_range_check():
    """Out-of-[-1,1] actions raise the reference's ValueError once
    (diffusion_policy.py:151-159)."""
    config = config_factory("diffusion_policy")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.algo.unet.down_dims = [16, 32]
        config.algo.unet.diffusion_step_embed_dim = 16
        config.algo.horizon.observation_horizon = 2
        config.algo.horizon.prediction_horizon = 8
        config.train.seq_length = 8
        config.train.frame_stack = 2
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.algo_factory(
        "diffusion_policy", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    rng = np.random.RandomState(0)
    bad = make_batch(rng, 9)
    bad["actions"] = bad["actions"] * 3.0
    with pytest.raises(ValueError, match="hdf5_normalize_action"):
        algo.process_batch_for_training(bad)
    # in-range batch passes and latches the check off
    algo.process_batch_for_training(make_batch(rng, 9))
    assert algo._action_check_done


@pytest.mark.slow
def test_diffusion_gn_encoder_and_ddpm():
    """The rgb obs-encoder trunk uses GroupNorm(C//16) instead of BatchNorm
    (the reference's replace_bn_with_gn pass): no batch_stats collection
    anywhere, GN params under the old bn names; DDPM inference path runs."""
    import jax

    obs_keys = {"agentview_image": (24, 24, 3), "robot0_eef_pos": (7,)}
    config = config_factory("diffusion_policy")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = ["robot0_eef_pos"]
        config.observation.modalities.obs.rgb = ["agentview_image"]
        config.observation.encoder.rgb.obs_randomizer_class = None
        config.algo.unet.down_dims = [16, 32]
        config.algo.unet.diffusion_step_embed_dim = 16
        config.algo.ddpm.num_train_timesteps = 10
        config.algo.ddpm.num_inference_timesteps = 5
        config.algo.horizon.observation_horizon = 2
        config.algo.horizon.prediction_horizon = 8
        config.train.seq_length = 8
        config.train.frame_stack = 2
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.algo_factory(
        "diffusion_policy", config, obs_key_shapes=dict(obs_keys), ac_dim=A
    )
    rng = np.random.RandomState(0)
    batch = {
        "obs": {k: rng.rand(B, 9, *s).astype(np.float32)
                for k, s in obs_keys.items()},
        "actions": rng.uniform(-1, 1, (B, 9, A)).astype(np.float32),
    }
    info = algo.train_on_batch(algo.process_batch_for_training(batch), epoch=1)
    assert np.isfinite(algo.log_info(info)["Loss"])

    enc_vars = algo.state.aux["obs_encoder"]
    assert "batch_stats" not in enc_vars, list(enc_vars)
    flat = jax.tree_util.tree_leaves_with_path(
        algo.state.params["obs_encoder"]
    )
    gn_paths = [jax.tree_util.keystr(p) for p, _ in flat if "'bn1'" in
                jax.tree_util.keystr(p) and "'scale'" in jax.tree_util.keystr(p)]
    assert gn_paths, "expected GroupNorm scale params under the bn names"

    obs = {k: rng.rand(1, 2, *s).astype(np.float32) for k, s in obs_keys.items()}
    ac = np.asarray(algo.get_action(obs))
    assert ac.shape == (1, A) and np.all(np.isfinite(ac))


@pytest.mark.slow
def test_act_pad_mask_l1():
    """pad_mask keeps its time axis through process_batch (reference
    act.py:91-94) and gates the L1: with every step padded the masked L1 is
    exactly 0 while the KL is untouched (reference ``(all_l1 *
    ~is_pad).mean()``, act.py:140-143)."""
    config = config_factory("act")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.algo.act.hidden_dim = 32
        config.algo.act.dim_feedforward = 64
        config.algo.act.enc_layers = 1
        config.algo.act.dec_layers = 1
        config.algo.act.nheads = 4
        config.algo.act.latent_dim = 4
        config.train.seq_length = 6
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.algo_factory(
        "act", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    rng = np.random.RandomState(5)
    raw = make_batch(rng, 6)
    raw["obs"]["pad_mask"] = np.ones((B, 6, 1), np.float32)

    batch = algo.process_batch_for_training(raw)
    assert batch["obs"]["pad_mask"].shape == (B, 6, 1)  # time axis kept
    assert batch["obs"][next(iter(OBS_KEYS))].shape == (B, *OBS_KEYS["robot0_eef_pos"])

    log1 = algo.log_info(algo.train_on_batch(batch, epoch=1, validate=True))
    assert log1["L1_Loss"] > 0

    raw["obs"]["pad_mask"] = np.zeros((B, 6, 1), np.float32)
    log0 = algo.log_info(
        algo.train_on_batch(algo.process_batch_for_training(raw), epoch=1,
                            validate=True)
    )
    assert log0["L1_Loss"] == 0.0
    assert np.isfinite(log0["KL_Loss"]) and log0["KL_Loss"] != 0.0
