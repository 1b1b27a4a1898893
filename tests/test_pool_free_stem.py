"""config.train.pool_free_stem — the opt-in stride-4 stem speed mode
(docs/design.md §4): the ResNet stem's 7x7/s2 conv + 3x3/s2 maxpool
collapse into one 7x7/s4 conv with identical parameter shapes and
identical output spatial shape for EVERY input size; default (off) keeps
the torchvision stem."""

import numpy as np
import pytest

import jax

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
from robot_manipulation_vq_vae_tpu.models.base_nets import (
    ResNet18Conv,
    set_pool_free_stem,
)
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

A, IMG = 4, 16


@pytest.fixture(autouse=True)
def _reset_flag():
    yield
    set_pool_free_stem(False)


@pytest.mark.parametrize("hw", [(32, 32), (29, 37), (116, 116)])
def test_same_output_shape_and_params(hw):
    """Both stems land on the floor((H-1)/4)+1 grid with the same
    parameter tree, so checkpoints are interchangeable between modes."""
    h, w = hw
    x = np.zeros((1, h, w, 3), np.float32)
    rng = jax.random.PRNGKey(0)
    model = ResNet18Conv()

    set_pool_free_stem(False)
    vars_default = model.init(rng, x)
    out_default = model.apply(vars_default, x)

    set_pool_free_stem(True)
    vars_fast = model.init(rng, x)
    out_fast = model.apply(vars_fast, x)

    assert out_default.shape == out_fast.shape
    assert jax.tree_util.tree_structure(
        vars_default
    ) == jax.tree_util.tree_structure(vars_fast)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_equal(a.shape, b.shape),
        vars_default, vars_fast,
    )


def test_pool_free_step_trains():
    """The config knob reaches the traced network and the step still
    trains (mirrors tests/test_frozen_bn.py for the other speed mode)."""
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
        config.train.pool_free_stem = True
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.algo_factory(
        "bc", config, obs_key_shapes={"eef": (3,), "cam": (IMG, IMG, 3)},
        ac_dim=A,
    )
    rng = np.random.RandomState(0)
    batch = algo.process_batch_for_training({
        "obs": {
            "eef": rng.randn(2, 1, 3).astype(np.float32),
            "cam": rng.randint(0, 255, (2, 1, IMG, IMG, 3)).astype(np.uint8),
        },
        "actions": rng.randn(2, 1, A).astype(np.float32),
    })
    algo.ensure_state(batch)
    params_before = jax.device_get(algo.state.params)
    for _ in range(3):  # warmup lr schedules start at 0
        info = algo.train_on_batch(batch, epoch=0)
    assert np.isfinite(float(list(info["losses"].values())[0]))
    moved = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or not np.array_equal(*pair),
        jax.tree_util.tree_map(
            lambda a, b: (a, b), params_before,
            jax.device_get(algo.state.params),
        ),
        False,
        is_leaf=lambda x: isinstance(x, tuple),
    )
    assert moved, "pool-free-stem step must still update parameters"
