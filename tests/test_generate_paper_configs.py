"""generate_paper_configs produces the full robomimic-paper config matrix
and every json round-trips through the strict config loader (reference
robomimic/scripts/generate_paper_configs.py)."""

import glob
import json
import os
import random

import pytest

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.scripts.generate_paper_configs import (
    ALGO_TO_MODIFIER,
    EXP_NAME_TO_GENERATOR,
)


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    base = tmp_path_factory.mktemp("paper")
    cfg_dir = str(base / "cfgs")
    for name, gen in EXP_NAME_TO_GENERATOR.items():
        gen(
            base_config_dir=cfg_dir,
            base_dataset_dir=str(base / "ds"),
            base_output_dir=str(base / "out"),
            algo_to_config_modifier=ALGO_TO_MODIFIER,
        )
    return cfg_dir


def test_full_matrix_generated(generated):
    paths = glob.glob(os.path.join(generated, "**", "*.json"), recursive=True)
    # core: 6 algos x low_dim + 4 x image over the benchmark tasks, etc.
    # exact total pinned so silent coverage regressions fail loudly
    assert len(paths) == 531
    sets = {p.split(os.sep)[len(generated.split(os.sep))] for p in paths}
    assert sets == {
        "core", "subopt", "dataset_size", "obs_ablation",
        "hyper_ablation", "d4rl",
    }


def test_configs_roundtrip_strictly(generated):
    """Every generated json must load through config_factory + strict
    update (raises on any key the config class doesn't define)."""
    paths = glob.glob(os.path.join(generated, "**", "*.json"), recursive=True)
    random.seed(0)
    for p in random.sample(paths, 60):
        with open(p) as f:
            ext = json.load(f)
        cfg = config_factory(ext["algo_name"])
        with cfg.values_unlocked():
            cfg.update(ext)
        assert cfg.experiment.name


def test_core_settings_spot_checks(generated):
    """Pin a few paper hyperparameters (reference values)."""
    with open(os.path.join(
        generated, "core", "lift", "mg", "low_dim_sparse", "bc.json"
    )) as f:
        bc_mg = json.load(f)
    # mg low-dim: LR 1e-3, no GMM
    assert bc_mg["algo"]["optim_params"]["policy"]["learning_rate"]["initial"] == 1e-3
    assert bc_mg["algo"]["gmm"]["enabled"] is False
    assert bc_mg["experiment"]["validate"] is False  # mg has no validation

    with open(os.path.join(
        generated, "core", "can", "ph", "image", "bc_rnn.json"
    )) as f:
        rnn_im = json.load(f)
    assert rnn_im["algo"]["rnn"]["enabled"] is True
    assert rnn_im["algo"]["rnn"]["hidden_dim"] == 1000  # image rnn dim
    assert rnn_im["train"]["batch_size"] == 16
    assert rnn_im["observation"]["encoder"]["rgb"]["obs_randomizer_class"] \
        == "CropRandomizer"

    with open(os.path.join(
        generated, "hyper_ablation", "square", "ph", "image",
        "bc_rnn_change_conv.json"
    )) as f:
        conv = json.load(f)
    assert conv["observation"]["encoder"]["rgb"]["core_kwargs"][
        "backbone_class"] == "ShallowConv"

    with open(os.path.join(
        generated, "d4rl", "hopper-medium-v2", "cql.json"
    )) as f:
        cql = json.load(f)
    assert cql["algo"]["critic"]["cql_weight"] == 10.0
    assert cql["algo"]["critic"]["target_q_gap"] is None
