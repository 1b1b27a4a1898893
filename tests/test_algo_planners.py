"""Planner / hierarchical algo smoke tests: GL, GL_VAE, HBC, IRIS."""

import numpy as np
import pytest

import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

B, A = 4, 5
OBS_KEYS = {
    "robot0_eef_pos": (3,),
    "robot0_eef_quat": (4,),
    "robot0_gripper_qpos": (2,),
    "object": (6,),
}
SH = 3  # subgoal horizon for the test


def _small_dims(node):
    node.ae.planner_layer_dims = (32,)
    node.vae.encoder_layer_dims = (32,)
    node.vae.decoder_layer_dims = (32,)
    node.vae.prior_layer_dims = (32,)
    node.vae.latent_dim = 4
    node.subgoal_horizon = SH


def make_batch(rng, T=SH):
    return {
        "obs": {k: rng.randn(B, T, *s).astype(np.float32)
                for k, s in OBS_KEYS.items()},
        "next_obs": {k: rng.randn(B, T, *s).astype(np.float32)
                     for k, s in OBS_KEYS.items()},
        "actions": rng.uniform(-1, 1, (B, T, A)).astype(np.float32),
        "rewards": rng.rand(B, T).astype(np.float32),
        "dones": np.zeros((B, T), np.float32),
    }


@pytest.mark.parametrize("vae", [False, True])
def test_gl(vae):
    config = config_factory("gl")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.algo.vae.enabled = vae
        _small_dims(config.algo)
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.algo_factory(
        "gl", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    assert isinstance(algo, AlgoReg.GL_VAE if vae else AlgoReg.GL)
    rng = np.random.RandomState(0)
    for _ in range(2):
        batch = algo.process_batch_for_training(make_batch(rng))
        assert set(batch["subgoals"]) == set(OBS_KEYS)
        info = algo.train_on_batch(batch, epoch=1)
        log = algo.log_info(info)
        assert np.isfinite(log["Loss"])
    obs = {k: rng.randn(2, *s).astype(np.float32) for k, s in OBS_KEYS.items()}
    preds = algo.get_subgoal_predictions(obs)
    assert preds["object"].shape == (2, 6)
    samples = algo.sample_subgoals(obs, num_samples=3)
    assert samples["object"].shape == (6, 6)


def test_hbc():
    config = config_factory("hbc")
    with config.values_unlocked():
        for section in (config.observation.planner, config.observation.actor):
            section.modalities.obs.low_dim = list(OBS_KEYS)
        config.observation.planner.modalities.subgoal.low_dim = list(OBS_KEYS)
        _small_dims(config.algo.planner)
        config.algo.actor.rnn.hidden_dim = 32
        config.algo.actor.rnn.num_layers = 1
        config.algo.actor.actor_layer_dims = (32,)
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.algo_factory(
        "hbc", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    assert isinstance(algo, AlgoReg.HBC)
    rng = np.random.RandomState(1)
    for _ in range(2):
        batch = algo.process_batch_for_training(make_batch(rng))
        assert "goal_obs" in batch["actor"]  # separate mode: GT subgoals
        info = algo.train_on_batch(batch, epoch=1)
        log = algo.log_info(info)
        assert np.isfinite(log["Loss"])
    # rollout: subgoal refresh + goal-conditioned action
    # single-step rollout obs: the RNN actor steps with carried hidden state
    obs = {k: rng.randn(1, *s).astype(np.float32) for k, s in OBS_KEYS.items()}
    algo.reset()
    ac = np.asarray(algo.get_action(obs))
    assert ac.shape[-1] == A
    assert algo.current_subgoal is not None


@pytest.mark.slow
def test_iris():
    config = config_factory("iris")
    with config.values_unlocked():
        for section in (
            config.observation.value_planner.planner,
            config.observation.value_planner.value,
            config.observation.actor,
        ):
            section.modalities.obs.low_dim = list(OBS_KEYS)
        config.observation.value_planner.planner.modalities.subgoal.low_dim = (
            list(OBS_KEYS)
        )
        _small_dims(config.algo.value_planner.planner)
        config.algo.value_planner.num_samples = 3
        config.algo.value_planner.value.critic.layer_dims = (32,)
        config.algo.value_planner.value.critic.num_action_samples = 2
        config.algo.value_planner.value.critic.num_action_samples_rollout = 3
        config.algo.value_planner.value.action_sampler.vae.encoder_layer_dims = (32,)
        config.algo.value_planner.value.action_sampler.vae.decoder_layer_dims = (32,)
        config.algo.actor.rnn.hidden_dim = 32
        config.algo.actor.rnn.num_layers = 1
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.algo_factory(
        "iris", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    assert isinstance(algo, AlgoReg.IRIS)
    rng = np.random.RandomState(2)
    batch = algo.process_batch_for_training(make_batch(rng))
    info = algo.train_on_batch(batch, epoch=1)
    log = algo.log_info(info)
    assert np.isfinite(log["Loss"])
    # single-step rollout obs: the RNN actor steps with carried hidden state
    obs = {k: rng.randn(1, *s).astype(np.float32) for k, s in OBS_KEYS.items()}
    algo.reset()
    ac = np.asarray(algo.get_action(obs))
    assert ac.shape[-1] == A
