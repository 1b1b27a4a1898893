"""config.train.frozen_batch_norm — the opt-in BN speed mode (+17%
flagship step, docs/design.md §4): train steps normalize with running
statistics and never update them; default (off) keeps the reference's
train-mode BN semantics."""

import numpy as np
import pytest

import jax

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
from robot_manipulation_vq_vae_tpu.models.base_nets import (
    _FROZEN_BATCH_NORM,  # noqa: F401 (import check)
    set_frozen_batch_norm,
)
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

A, IMG = 4, 16


@pytest.fixture(autouse=True)
def _reset_flag():
    yield
    set_frozen_batch_norm(False)


def _make_algo(frozen):
    config = config_factory("bc")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = ["eef"]
        config.observation.modalities.obs.rgb = ["cam"]
        config.observation.encoder.rgb.core_class = "VisualCore"
        config.observation.encoder.rgb.core_kwargs = {
            "feature_dimension": 8,
            "backbone_class": "ResNet18Conv",
            "backbone_kwargs": {"pretrained": False},
            "pool_class": "SpatialSoftmax",
            "pool_kwargs": {"num_kp": 4},
        }
        config.observation.encoder.rgb.obs_randomizer_class = None
        config.train.seed = 0
        config.train.frozen_batch_norm = frozen
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    return AlgoReg.algo_factory(
        "bc", config, obs_key_shapes={"eef": (3,), "cam": (IMG, IMG, 3)},
        ac_dim=A,
    )


def _batch():
    rng = np.random.RandomState(0)
    return {
        "obs": {
            "eef": rng.randn(2, 1, 3).astype(np.float32),
            "cam": rng.randint(0, 255, (2, 1, IMG, IMG, 3)).astype(np.uint8),
        },
        "actions": rng.randn(2, 1, A).astype(np.float32),
    }


def _bn_stats(algo):
    return jax.device_get(
        {k: v.get("batch_stats", {}) for k, v in algo.state.aux.items()}
    )


def test_default_updates_batch_stats():
    algo = _make_algo(frozen=False)
    batch = algo.process_batch_for_training(_batch())
    algo.ensure_state(batch)
    before = _bn_stats(algo)
    info = algo.train_on_batch(batch, epoch=0)
    assert np.isfinite(float(list(info["losses"].values())[0]))
    after = _bn_stats(algo)
    changed = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or not np.array_equal(*pair),
        jax.tree_util.tree_map(lambda a, b: (a, b), before, after),
        False,
        is_leaf=lambda x: isinstance(x, tuple),
    )
    assert changed, "train-mode BN must update running statistics"


def test_frozen_mode_keeps_stats_and_trains():
    algo = _make_algo(frozen=True)
    batch = algo.process_batch_for_training(_batch())
    algo.ensure_state(batch)
    before = _bn_stats(algo)
    params_before = jax.device_get(algo.state.params)
    # several steps: warmup schedules start at lr=0, so step 1 alone
    # cannot distinguish "trains" from "frozen"
    for _ in range(3):
        info = algo.train_on_batch(batch, epoch=0)
    assert np.isfinite(float(list(info["losses"].values())[0]))
    after = _bn_stats(algo)
    jax.tree_util.tree_map(np.testing.assert_array_equal, before, after)
    # the step still trains (params move)
    moved = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or not np.array_equal(*pair),
        jax.tree_util.tree_map(
            lambda a, b: (a, b), params_before,
            jax.device_get(algo.state.params),
        ),
        False,
        is_leaf=lambda x: isinstance(x, tuple),
    )
    assert moved, "frozen-BN step must still update parameters"
