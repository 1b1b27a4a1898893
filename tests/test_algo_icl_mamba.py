"""ICL-Mamba smoke tests (Mamba selective-SSM backbone)."""

import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

B, H, A = 2, 4, 6
OBS_KEYS = {"robot0_eef_pos": (5,)}


def make_algo(gmm=False):
    config = config_factory("icl_mamba")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.algo.mamba.enabled = True
        config.algo.mamba.context_length = H
        config.algo.mamba.embed_dim = 32
        config.algo.mamba.num_layers = 1
        config.algo.mamba.supervise_all_steps = True
        config.algo.mamba.pred_future_acs = True
        config.algo.mamba.vq_vae_enabled = not gmm
        config.algo.mamba.ln_act_enabled = False
        config.algo.mamba.vqvae.num_subclusters = 8
        config.algo.mamba.vqvae.num_clusters = 4
        config.algo.mamba.vqvae.embed_dim = 16
        config.algo.mamba.vqvae.num_stages = 1
        config.algo.mamba.vqvae.num_layers_per_stage = 1
        config.algo.gmm.enabled = gmm
        config.train.max_grad_norm = 100.0
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    return AlgoReg.algo_factory(
        "icl_mamba", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )


def make_batch(rng):
    w = 2 * H - 1
    return {
        "obs": {k: rng.randn(B, w, *s).astype(np.float32)
                for k, s in OBS_KEYS.items()},
        "actions": rng.uniform(-1, 1, (B, w, A)).astype(np.float32),
    }


def test_icl_mamba_hvqvae():
    algo = make_algo()
    assert isinstance(algo, AlgoReg.ICLMambaHVQVAE)
    rng = np.random.RandomState(0)
    for _ in range(2):
        batch = algo.process_batch_for_training(make_batch(rng))
        info = algo.train_on_batch(batch, epoch=1)
        assert np.isfinite(algo.log_info(info)["Loss"])


@pytest.mark.slow
def test_icl_mamba_gmm():
    algo = make_algo(gmm=True)
    assert isinstance(algo, AlgoReg.ICLMamba_GMM)
    rng = np.random.RandomState(1)
    batch = algo.process_batch_for_training(make_batch(rng))
    info = algo.train_on_batch(batch, epoch=1)
    log = algo.log_info(info)
    assert np.isfinite(log["Loss"])
    obs = {k: rng.randn(1, H, *s).astype(np.float32) for k, s in OBS_KEYS.items()}
    ctx = {
        "obs": {k: rng.randn(1, H, *s).astype(np.float32)
                for k, s in OBS_KEYS.items()},
        "actions": rng.uniform(-1, 1, (1, H, A)).astype(np.float32),
    }
    ac = np.asarray(algo.get_action(obs, context_batch=ctx))
    assert ac.shape == (1, A)
