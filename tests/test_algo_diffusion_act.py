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
