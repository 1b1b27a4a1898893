"""The first-party test harness (utils/test_utils.py) mirrors the
reference's robomimic/utils/test_utils.py API: get_base_config ->
config_from_modifier -> test_run (train -> checkpoint ->
policy_from_checkpoint -> env_from_checkpoint -> rollout)."""

import pytest

import robot_manipulation_vq_vae_tpu.utils.test_utils as TestUtils
from robot_manipulation_vq_vae_tpu.utils.python_utils import (
    extract_class_init_kwargs_from_dict,
    get_class_init_kwargs,
)
from robot_manipulation_vq_vae_tpu.utils.script_utils import deep_update


def test_python_utils():
    class Foo:
        def __init__(self, a, b=2):
            pass

    assert get_class_init_kwargs(Foo) == ["a", "b"]
    out = extract_class_init_kwargs_from_dict(Foo, {"a": 1, "z": 9})
    assert out == {"a": 1}

    # flax dataclass modules work through the dataclass-fields path
    from robot_manipulation_vq_vae_tpu.models.obs_core import VisualCore

    kws = get_class_init_kwargs(VisualCore)
    assert "input_shape" in kws and "parent" not in kws


def test_deep_update():
    d = {"a": {"b": 1, "c": 2}, "x": 0}
    deep_update(d, {"a": {"b": 5}, "y": 3})
    assert d == {"a": {"b": 5, "c": 2}, "x": 0, "y": 3}


@pytest.mark.slow
def test_run_bc_through_harness():
    base = TestUtils.get_base_config("bc")
    res = TestUtils.test_run(base_config=base, config_modifier=lambda c: c)
    assert res == "passed!", res


@pytest.mark.slow
def test_run_reports_failure():
    base = TestUtils.get_base_config("bc")

    def bad_modifier(config):
        config.train.data = "/nonexistent/path.hdf5"
        return config

    res = TestUtils.test_run(base_config=base, config_modifier=bad_modifier)
    assert res.startswith("failed with error")
