"""Offline-RL algo smoke tests (IQL / TD3-BC / BCQ / CQL): two jitted steps
on synthetic (s, a, r, s', d) batches, target-network updates, actions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

B, A = 6, 4
OBS_KEYS = {"flat": (9,)}


def make_algo(name, **overrides):
    config = config_factory(name)
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.observation.modalities.obs.rgb = []
        config.algo.critic.layer_dims = (32, 32)
        config.algo.actor.layer_dims = (32, 32)
        for k, v in overrides.items():
            node = config.algo
            parts = k.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = v
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    return AlgoReg.algo_factory(
        name, config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )


def make_batch(rng, T=2):
    return {
        "obs": {"flat": rng.randn(B, T, 9).astype(np.float32)},
        "next_obs": {"flat": rng.randn(B, T, 9).astype(np.float32)},
        "actions": rng.uniform(-1, 1, (B, T, A)).astype(np.float32),
        "rewards": rng.rand(B, T).astype(np.float32),
        "dones": np.zeros((B, T), np.float32),
    }


def _run_two_steps(algo):
    rng = np.random.RandomState(0)
    logs = []
    for _ in range(2):
        batch = algo.process_batch_for_training(make_batch(rng))
        info = algo.train_on_batch(batch, epoch=1)
        log = algo.log_info(info)
        logs.append(log)
        for k, v in log.items():
            assert np.isfinite(v), (k, v)
    obs = {"flat": rng.randn(1, 9).astype(np.float32)}
    ac = np.asarray(algo.get_action(obs))
    assert ac.shape == (1, A)
    assert np.all(np.isfinite(ac))
    return logs


def test_iql():
    algo = make_algo("iql")
    assert isinstance(algo, AlgoReg.IQL)
    logs = _run_two_steps(algo)
    assert "vf_loss" in logs[0]
    # target critics must differ from online after updates (polyak moved them)
    t = jax.tree_util.tree_leaves(algo.state.params["critic0_target"])
    o = jax.tree_util.tree_leaves(algo.state.params["critic0"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(t, o)
    )


def test_td3_bc():
    algo = make_algo("td3_bc")
    assert isinstance(algo, AlgoReg.TD3_BC)
    logs = _run_two_steps(algo)
    assert "critic/critic1_loss" in logs[0]
    # Q-value API
    rng = np.random.RandomState(1)
    obs = {"flat": rng.randn(2, 9).astype(np.float32)}
    acts = rng.uniform(-1, 1, (2, A)).astype(np.float32)
    q = np.asarray(algo.get_state_action_value(obs, acts))
    assert q.shape == (2, 1)


def test_bcq():
    algo = make_algo(
        "bcq",
        **{"critic.num_action_samples": 3,
           "critic.num_action_samples_rollout": 5,
           "action_sampler.vae.encoder_layer_dims": (32,),
           "action_sampler.vae.decoder_layer_dims": (32,),
           "action_sampler.vae.prior_layer_dims": (32,)},
    )
    assert isinstance(algo, AlgoReg.BCQ)
    logs = _run_two_steps(algo)
    assert "action_sampler/loss" in logs[0]


def test_cql():
    algo = make_algo("cql", **{"critic.num_random_actions": 4})
    assert isinstance(algo, AlgoReg.CQL)
    logs = _run_two_steps(algo)
    assert "entropy_weight" in logs[0]
    assert "critic/cql_weight" in logs[0]
    # cql Lagrange weight is learned (target_q_gap default 5.0 >= 0,
    # reference automatic_cql_tuning) and entropy weight is learned
    # (target_entropy "default")
    assert "log_cql_weight" in algo.state.params
    assert "log_entropy_weight" in algo.state.params
    # ValueAlgo surface
    rng = np.random.RandomState(1)
    obs = {"flat": rng.randn(2, 9).astype(np.float32)}
    acts = rng.uniform(-1, 1, (2, A)).astype(np.float32)
    q = np.asarray(algo.get_state_action_value(obs, acts))
    assert q.shape == (2, 1)


def test_bcq_distributional():
    algo = make_algo(
        "bcq",
        **{"critic.distributional.enabled": True,
           "critic.distributional.num_atoms": 11,
           "critic.value_bounds": [-10.0, 10.0],
           "critic.num_action_samples": 3,
           "critic.num_action_samples_rollout": 5,
           "action_sampler.vae.encoder_layer_dims": (32,),
           "action_sampler.vae.decoder_layer_dims": (32,)},
    )
    from robot_manipulation_vq_vae_tpu.algo.bcq import BCQ_Distributional

    assert isinstance(algo, BCQ_Distributional)
    logs = _run_two_steps(algo)
    assert "critic/critic1_loss" in logs[0]


def test_c51_projection_math():
    """Categorical projection must preserve probability mass and the mean
    for in-range targets."""
    import jax.numpy as jnp
    from robot_manipulation_vq_vae_tpu.utils import loss_utils as LossUtils

    atoms = jnp.linspace(-1.0, 1.0, 11)
    rng = np.random.RandomState(0)
    probs = rng.rand(4, 11)
    probs = probs / probs.sum(axis=1, keepdims=True)
    values = np.clip(rng.randn(4, 11) * 0.3, -1, 1).astype(np.float32)
    proj = np.asarray(
        LossUtils.project_values_onto_atoms(
            jnp.asarray(values), jnp.asarray(probs), atoms
        )
    )
    np.testing.assert_allclose(proj.sum(axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        (proj * np.asarray(atoms)).sum(axis=1),
        (probs * values).sum(axis=1), atol=1e-5,
    )


def test_bcq_perturbation_actor():
    algo = make_algo(
        "bcq",
        **{"actor.enabled": True,
           "critic.num_action_samples": 3,
           "critic.num_action_samples_rollout": 4,
           "action_sampler.vae.encoder_layer_dims": (32,),
           "action_sampler.vae.decoder_layer_dims": (32,)},
    )
    logs = _run_two_steps(algo)
    assert "actor/loss" in logs[0]
    assert "actor_target" in algo.state.params


def test_bcq_gmm():
    """GMM action sampler trains with NLL (reference BCQ_GMM)."""
    config = config_factory("bcq")
    with config.unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.observation.modalities.obs.rgb = []
        config.algo.critic.layer_dims = (32, 32)
        config.algo.actor.layer_dims = (32, 32)
        config.algo.critic.num_action_samples = 3
        config.algo.critic.num_action_samples_rollout = 5
        # the BCQ config drops the gmm block (as the reference does);
        # re-adding it with enabled=True routes the factory to BCQ_GMM
        config.algo.action_sampler.gmm.enabled = True
        config.algo.action_sampler.gmm.num_modes = 3
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.algo_factory(
        "bcq", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    assert isinstance(algo, AlgoReg.BCQ_GMM)
    logs = _run_two_steps(algo)
    assert "action_sampler/loss" in logs[0]


def _tree_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        )
    )


def test_epoch_window_gating():
    """optim_params start/end_epoch gate per-net backprop (reference
    td3_bc.py:126-136, bcq.py:140-150)."""
    algo = make_algo("td3_bc", **{"actor.update_freq": 1})
    with algo.global_config.values_unlocked():
        algo.optim_params["actor"]["start_epoch"] = 5
        algo.optim_params["critic"]["end_epoch"] = 3
    rng = np.random.RandomState(0)

    # epoch 1: critic window open, actor window not yet
    batch = algo.process_batch_for_training(make_batch(rng))
    algo.train_on_batch(batch, epoch=1)
    p1 = algo.state.params
    batch = algo.process_batch_for_training(make_batch(rng))
    algo.train_on_batch(batch, epoch=1)
    p2 = algo.state.params
    assert not _tree_equal(p1["critic0"], p2["critic0"])
    assert _tree_equal(p1["actor"], p2["actor"])
    assert _tree_equal(p1["actor_target"], p2["actor_target"])

    # epoch 7: actor open, critic window closed (epoch >= end_epoch)
    batch = algo.process_batch_for_training(make_batch(rng))
    algo.train_on_batch(batch, epoch=7)
    p3 = algo.state.params
    assert _tree_equal(p2["critic0"], p3["critic0"])
    assert not _tree_equal(p2["actor"], p3["actor"])
