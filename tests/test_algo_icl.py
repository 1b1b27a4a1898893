"""ICL algorithm-layer tests: factory routing, jitted train steps (HVQVAE
combined loss + EMA state, GMM two-optimizer path), and rollout actions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.models import obs_core  # register cores
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

B, H, A = 4, 4, 12
WINDOW = 2 * H - 1
OBS_KEYS = {"robot0_eef_pos": (5,), "robot0_gripper_qpos": (2,)}


def tiny_config(gmm=False):
    config = config_factory("icl")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.observation.modalities.obs.rgb = []
        config.algo.transformer.enabled = True
        config.algo.transformer.context_length = H
        config.algo.transformer.embed_dim = 32
        config.algo.transformer.num_layers = 1
        config.algo.transformer.num_heads = 4
        config.algo.transformer.supervise_all_steps = True
        config.algo.transformer.pred_future_acs = True
        config.algo.transformer.causal = False
        config.algo.transformer.vq_vae_enabled = not gmm
        config.algo.transformer.ln_act_enabled = False
        config.algo.transformer.vqvae.num_subclusters = 16
        config.algo.transformer.vqvae.num_clusters = 8
        config.algo.transformer.vqvae.embed_dim = 32
        config.algo.transformer.vqvae.num_stages = 1
        config.algo.transformer.vqvae.num_layers_per_stage = 2
        config.algo.transformer.vqvae.lambda_rec = 1.0
        config.algo.gmm.enabled = gmm
        if gmm:
            config.algo.transformer.vq_vae_enabled = True
        config.train.max_grad_norm = 100.0
        config.train.seed = 0
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    return config


def make_batch(rng):
    return {
        "obs": {
            k: rng.randn(B, WINDOW, *s).astype(np.float32)
            for k, s in OBS_KEYS.items()
        },
        "actions": rng.randn(B, WINDOW, A).astype(np.float32),
    }


def test_factory_routing():
    config = tiny_config()
    algo = AlgoReg.algo_factory(
        "icl", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    assert isinstance(algo, AlgoReg.ICLTransformerHVQVAE)

    config2 = tiny_config(gmm=True)
    algo2 = AlgoReg.algo_factory(
        "icl", config2, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    # reference quirk: gmm+transformer ALSO routes to HVQVAE (icl.py:77-83)
    assert isinstance(algo2, AlgoReg.ICLTransformerHVQVAE)


@pytest.mark.slow
def test_hvqvae_train_steps_and_state():
    config = tiny_config()
    algo = AlgoReg.algo_factory(
        "icl", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    rng = np.random.RandomState(0)
    losses = []
    for i in range(3):
        batch = algo.process_batch_for_training(make_batch(rng))
        assert batch["obs"]["robot0_eef_pos"].shape[1] == H
        assert batch["actions"].shape[1] == H  # pred_future_acs window
        info = algo.train_on_batch(batch, epoch=0)
        log = algo.log_info(info)
        losses.append(log["Loss"])
        assert np.isfinite(log["Loss"])
        assert np.isfinite(log["VQ-VAE/Total_Loss"])
    # vq state must have been initialized + EMA-updated
    vq = algo.state.aux["vqvae"]["vq"]
    assert bool(vq["initialized"])
    assert float(jnp.sum(vq["cluster_size_z"])) > 0
    assert int(algo.state.step) == 3

    # validate mode must not change params
    p_before = jax.tree_util.tree_leaves(algo.state.params)
    batch = algo.process_batch_for_training(make_batch(rng))
    algo.train_on_batch(batch, epoch=0, validate=True)
    p_after = jax.tree_util.tree_leaves(algo.state.params)
    for a, b in zip(p_before, p_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hvqvae_get_action():
    config = tiny_config()
    algo = AlgoReg.algo_factory(
        "icl", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    rng = np.random.RandomState(1)
    batch = algo.process_batch_for_training(make_batch(rng))
    algo.train_on_batch(batch, epoch=0)

    obs = {k: rng.randn(1, H, *s).astype(np.float32) for k, s in OBS_KEYS.items()}
    ctx = {"actions": rng.randn(1, H, A).astype(np.float32)}
    ac = algo.get_action(obs, context_batch=ctx)
    assert ac.shape == (1, A)
    assert np.all(np.abs(np.asarray(ac)) <= 1.0)

    # ICLRolloutPolicy end to end
    policy = AlgoReg.ICLRolloutPolicy(algo)
    ob = {k: rng.randn(H, *s).astype(np.float32) for k, s in OBS_KEYS.items()}
    ac = policy(ob, context_batch=ctx)
    assert ac.shape == (A,)


@pytest.mark.slow
def test_gmm_paper_path():
    config = tiny_config(gmm=True)
    algo = AlgoReg.algo_factory(
        "icl_gmm_paper", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    assert isinstance(algo, AlgoReg.ICLTransformer_GMM)
    rng = np.random.RandomState(2)
    for _ in range(2):
        batch = algo.process_batch_for_training(make_batch(rng))
        info = algo.train_on_batch(batch, epoch=0)
        log = algo.log_info(info)
        assert np.isfinite(log["Loss"])
        assert np.isfinite(log["Log_Likelihood"])
    assert "vq_tokenizer" in algo.state.opt_states

    # LipVQ tokenizer params must have moved (dedicated optimizer)
    obs = {k: rng.randn(1, H, *s).astype(np.float32) for k, s in OBS_KEYS.items()}
    ctx = {
        "obs": {k: rng.randn(1, H, *s).astype(np.float32) for k, s in OBS_KEYS.items()},
        "actions": rng.randn(1, H, A).astype(np.float32),
    }
    ac = algo.get_action(obs, context_batch=ctx)
    assert ac.shape == (1, A)


def test_serialize_roundtrip():
    config = tiny_config()
    algo = AlgoReg.algo_factory(
        "icl", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    rng = np.random.RandomState(3)
    batch = algo.process_batch_for_training(make_batch(rng))
    algo.train_on_batch(batch, epoch=0)
    blob = algo.serialize()

    algo2 = AlgoReg.algo_factory(
        "icl", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    algo2.deserialize(blob)  # deferred until first batch
    batch2 = algo.process_batch_for_training(make_batch(rng))
    obs = {k: v[:, :H] for k, v in batch2["obs"].items()}
    ctx = {"actions": batch2["actions"]}
    algo2.ensure_state(
        {"obs": {k: jnp.asarray(v) for k, v in obs.items()},
         "actions": jnp.asarray(batch2["actions"])}
    )
    a1 = np.asarray(algo.get_action(obs, context_batch=ctx))
    a2 = np.asarray(algo2.get_action(obs, context_batch=ctx))
    np.testing.assert_allclose(a1, a2, atol=1e-6)


def test_mixed_precision_train_step():
    """train.mixed_precision=True runs the policy in bfloat16: params stay
    f32 masters, losses stay finite and close to the f32 run."""
    def run(mp):
        config = tiny_config()
        with config.values_unlocked():
            config.train.mixed_precision = mp
        algo = AlgoReg.algo_factory(
            "icl", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
        )
        rng = np.random.RandomState(0)
        logs = []
        for _ in range(2):
            batch = algo.process_batch_for_training(make_batch(rng))
            logs.append(algo.log_info(algo.train_on_batch(batch, epoch=0)))
        return algo, logs

    algo_f32, logs_f32 = run(False)
    algo_bf16, logs_bf16 = run(True)

    for leaf in jax.tree_util.tree_leaves(algo_bf16.state.params):
        assert leaf.dtype != jnp.bfloat16
    for leaf in jax.tree_util.tree_leaves(algo_bf16.state.aux):
        assert leaf.dtype != jnp.bfloat16
    for log in logs_bf16:
        assert np.isfinite(log["Loss"])
    # bf16 forward should track the f32 loss closely on step 1
    rel = abs(logs_bf16[0]["Loss"] - logs_f32[0]["Loss"]) / (
        abs(logs_f32[0]["Loss"]) + 1e-8
    )
    assert rel < 0.05, (logs_bf16[0]["Loss"], logs_f32[0]["Loss"])


def test_mixed_precision_gmm_paper_path():
    """bf16 forward on the LipVQ GMM path: finite NLL/VQ losses, f32
    masters, tokenizer optimizer still applies."""
    config = tiny_config(gmm=True)
    with config.values_unlocked():
        config.train.mixed_precision = True
    algo = AlgoReg.algo_factory(
        "icl_gmm_paper", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    rng = np.random.RandomState(2)
    for _ in range(2):
        batch = algo.process_batch_for_training(make_batch(rng))
        log = algo.log_info(algo.train_on_batch(batch, epoch=0))
        assert np.isfinite(log["Loss"])
        assert np.isfinite(log["Log_Likelihood"])
    for leaf in jax.tree_util.tree_leaves(algo.state.params):
        assert leaf.dtype != jnp.bfloat16


def test_iclvae_direct_instantiation_trains():
    """ICLVAE is factory-unreachable (the reference's vae branch routes to
    HVQVAE — reproduced quirk) but exposed for API parity; it delegates
    its training loop to BC_VAE WITHOUT subclassing it, so attribute
    lookups in the delegated path must use getattr (regression: the
    BC_VAE._noise_hook seam briefly broke this)."""
    import numpy as np

    config = config_factory("icl")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = ["flat"]
        config.observation.modalities.obs.rgb = []
        config.algo.transformer.enabled = False
        config.algo.transformer.ln_act_enabled = False
        config.algo.vae.enabled = True
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.ICLVAE(
        algo_config=config.algo, obs_config=config.observation,
        global_config=config, obs_key_shapes={"flat": (5,)}, ac_dim=3,
        device=None,
    )
    raw = {
        "obs": {"flat": np.zeros((8, 4, 5), np.float32)},
        "actions": np.zeros((8, 4, 3), np.float32),
    }
    info = algo.train_on_batch(
        algo.process_batch_for_training(raw), epoch=1
    )
    assert {"action_loss", "kl_loss", "recons_loss"} <= set(info["losses"])
