"""Every per-algo config generator emits loadable configs (reference
``robomimic/scripts/config_gen/*_gen.py``)."""

import glob
import json

import pytest

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.scripts.config_gen.gen_common import (
    standard_argparser,
    emit,
)

GENERATORS = [
    ("act", "robot_manipulation_vq_vae_tpu.scripts.config_gen.act_gen"),
    ("bc", "robot_manipulation_vq_vae_tpu.scripts.config_gen.bc_rnn_gen"),
    ("bc", "robot_manipulation_vq_vae_tpu.scripts.config_gen.bc_xfmr_gen"),
    ("diffusion_policy",
     "robot_manipulation_vq_vae_tpu.scripts.config_gen.diffusion_gen"),
    ("icl_mamba",
     "robot_manipulation_vq_vae_tpu.scripts.config_gen.icl_mamba_gen"),
    ("mcr", "robot_manipulation_vq_vae_tpu.scripts.config_gen.mcr_gen"),
]


@pytest.mark.parametrize("algo_name,module_name", GENERATORS)
def test_generator_emits_loadable_config(algo_name, module_name, tmp_path):
    import importlib

    mod = importlib.import_module(module_name)
    args = standard_argparser("t").parse_args(
        ["--config_dir", str(tmp_path), "--seeds", "1", "2", "--debug"]
    )
    paths = emit(mod.make_config(args), args)
    assert len(paths) == 2  # one per seed
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        config = config_factory(algo_name, dic=d)
        assert config.train.seed in (1, 2)
    # launcher script exists and points at the generated configs
    sh = glob.glob(str(tmp_path / "*_run.sh"))
    assert sh
    body = open(sh[0]).read()
    assert "scripts.train" in body
