"""Config system tests: locking semantics + loading the reference JSON templates."""

import json
import os

import pytest

from robot_manipulation_vq_vae_tpu.config import Config, config_factory

REF_TRAIN_CONFIG = "/root/reference/train_config.json"


def test_attribute_access_and_autoviv():
    c = Config()
    c.a.b.c = 5
    assert c["a"]["b"]["c"] == 5
    assert c.a.b.c == 5


def test_lock_blocks_updates():
    c = Config()
    c.x = 1
    c.lock()
    with pytest.raises(RuntimeError):
        c.x = 2
    with pytest.raises(RuntimeError):
        c.y = 3
    c.unlock()
    c.y = 3
    assert c.y == 3


def test_key_lock_allows_value_edit():
    c = Config()
    c.x = 1
    c.lock_keys()
    c.x = 2
    assert c.x == 2
    with pytest.raises(RuntimeError):
        c.y = 1


def test_do_not_lock_keys():
    c = Config()
    c.kwargs = Config()
    c.kwargs.do_not_lock_keys()
    c.lock_keys()
    c.kwargs.anything = 1  # exempt sub-config accepts new keys
    assert c.kwargs.anything == 1
    with pytest.raises(RuntimeError):
        c.other = 2


def test_values_unlocked_context():
    c = Config()
    c.x = 1
    c.lock()
    with c.values_unlocked():
        c.x = 10
        with pytest.raises(RuntimeError):
            c.newkey = 1
    assert c.x == 10
    assert c.is_locked


def test_update_unknown_key_raises_when_key_locked():
    c = config_factory("icl")
    with c.values_unlocked():
        with pytest.raises(RuntimeError):
            c.update({"definitely_not_a_key": 1})


@pytest.mark.skipif(
    not os.path.exists(REF_TRAIN_CONFIG), reason="reference config not mounted"
)
def test_loads_reference_train_config_unmodified():
    """The shipped reference experiment JSON must load without edits."""
    with open(REF_TRAIN_CONFIG) as f:
        ext = json.load(f)
    config = config_factory(ext["algo_name"])
    with config.values_unlocked():
        config.update(ext)
    config.lock()
    assert config.algo.transformer.vq_vae_enabled is True
    assert config.algo.transformer.context_length == 16  # template default kept
    assert config.train.batch_size == 64
    assert config.observation.encoder.rgb.core_class == "VisualCoreLanguageConditioned"
    assert config.experiment.rollout.horizon == 500
    assert "robot0_agentview_left_image" in config.all_obs_keys


def test_deepcopy_and_dump_roundtrip():
    c = config_factory("icl")
    d = c.deepcopy()
    assert d.to_dict() == c.to_dict()
    s = c.dump()
    assert json.loads(s)["algo_name"] == "icl"


@pytest.mark.skipif(
    not os.path.exists("/root/reference/train_config_v2.json"),
    reason="reference config not mounted",
)
def test_loads_reference_v2_and_eval_configs():
    """The paper-variant (GMM) and eval configs must also load unmodified."""
    for p in ("/root/reference/train_config_v2.json",
              "/root/reference/eval_config.json"):
        with open(p) as f:
            ext = json.load(f)
        config = config_factory(ext["algo_name"])
        with config.values_unlocked():
            config.update(ext)
        config.lock()
        assert config.algo_name == "icl"
