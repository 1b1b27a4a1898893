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


def test_hyperparam_helper_example_sweep(tmp_path):
    """The hyperparam_helper template generates the reference's example
    sweep: 2 LR x 2 GMM x 2 arch = 8 configs + a runnable script
    (reference robomimic/scripts/hyperparam_helper.py:44-110)."""
    from robot_manipulation_vq_vae_tpu.scripts.hyperparam_helper import (
        make_generator,
    )

    base = tmp_path / "base.json"
    base.write_text(json.dumps({
        "algo_name": "bc",
        "experiment": {"name": "scan"},
        "train": {"output_dir": str(tmp_path / "out")},
    }))
    script = str(tmp_path / "out.sh")
    gen = make_generator(str(base), script)
    gen.generate()

    cfgs = sorted(glob.glob(str(tmp_path / "*.json")))
    cfgs = [c for c in cfgs if not c.endswith("base.json")]
    assert len(cfgs) == 8
    lrs, gmms, dims = set(), set(), set()
    for p in cfgs:
        with open(p) as f:
            d = json.load(f)
        assert d["algo"]["rnn"]["enabled"] is True  # group-0 constants
        assert d["train"]["seq_length"] == 10
        lrs.add(d["algo"]["optim_params"]["policy"]["learning_rate"]["initial"])
        gmms.add(d["algo"]["gmm"]["enabled"])
        # grouped params sweep together
        if d["algo"]["rnn"]["hidden_dim"] == 400:
            assert d["algo"]["actor_layer_dims"] == [1024, 1024]
        else:
            assert d["algo"]["actor_layer_dims"] == []
        dims.add(d["algo"]["rnn"]["hidden_dim"])
    assert lrs == {1e-3, 1e-4}
    assert gmms == {True, False}
    assert dims == {400, 1000}
    body = open(script).read()
    assert body.count("scripts.train") == 8
