"""Direct unit tests for utility modules exercised only indirectly
elsewhere: LR schedulers (reference ``torch_utils.py:122-195`` semantics),
the gated language encoder, and the ICL config generator."""

import numpy as np

from robot_manipulation_vq_vae_tpu.utils import optim_utils as OptimUtils
from robot_manipulation_vq_vae_tpu.utils.lang_utils import LangEncoder


def _params(sched, **kw):
    lr = {"initial": 1e-3, "scheduler_type": sched}
    lr.update(kw)
    return {"learning_rate": lr, "regularization": {"L2": 0.0}}


def test_constant_with_warmup_schedule():
    sched = OptimUtils.lr_schedule_from_optim_params(
        _params("constant_with_warmup", num_warmup_steps=100)
    )
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(50)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10_000)), 1e-3, rtol=1e-6)


def test_multistep_schedule():
    sched = OptimUtils.lr_schedule_from_optim_params(
        _params("multistep", epoch_schedule=[10, 20], decay_factor=0.1)
    )
    np.testing.assert_allclose(float(sched(5)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(15)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 1e-5, rtol=1e-6)


def test_linear_schedule():
    sched = OptimUtils.lr_schedule_from_optim_params(
        _params("linear", num_warmup_steps=10, decay_factor=0.5)
    )
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 5e-4, rtol=1e-6)


def test_cosine_schedule_needs_total_steps():
    import pytest

    with pytest.raises(AssertionError):
        OptimUtils.lr_schedule_from_optim_params(_params("cosine"))
    sched = OptimUtils.lr_schedule_from_optim_params(
        _params("cosine", num_warmup_steps=10), num_training_steps=100
    )
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)
    assert float(sched(100)) < 1e-5


def test_pseudo_lang_embeddings_deterministic():
    enc = LangEncoder(model_dir=None)
    assert not enc.is_real
    e1 = enc.get_lang_emb("pick the mug")
    e2 = enc.get_lang_emb("pick the mug")
    e3 = enc.get_lang_emb("open the drawer")
    assert e1.shape == (768,)
    np.testing.assert_array_equal(e1, e2)
    assert not np.allclose(e1, e3)
    np.testing.assert_allclose(np.linalg.norm(e1), 1.0, rtol=1e-5)
    batch = enc.get_lang_emb(["pick the mug", "open the drawer"])
    assert batch.shape == (2, 768)
    np.testing.assert_array_equal(batch[0], e1)
    assert enc.get_lang_emb(None) is None


def test_icl_xfmr_generator(tmp_path):
    """The flagship generator emits configs config_factory can load."""
    import argparse
    import glob
    import json

    from robot_manipulation_vq_vae_tpu.config import config_factory
    from robot_manipulation_vq_vae_tpu.scripts.config_gen import icl_xfmr_gen

    args = argparse.Namespace(
        name="t", tasks=["PnPCabToCounter"], ndemos=50, seeds=[1, 2],
        output_dir=str(tmp_path / "exp"), config_dir=str(tmp_path),
        wandb_proj_name=None, debug=True,
    )
    icl_xfmr_gen.main(args)
    paths = [
        p for p in glob.glob(str(tmp_path / "*.json"))
        if not p.endswith("_base.json")
    ]
    assert len(paths) == 2
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        config = config_factory("icl", dic=d)
        assert config.algo.transformer.vq_vae_enabled


def test_macros_and_setup(capsys):
    """macros defaults + setup_macros private-override bootstrap
    (reference robomimic/macros.py + scripts/setup_macros.py)."""
    import os

    from robot_manipulation_vq_vae_tpu import macros

    assert macros.LANG_EMB_KEY == "lang_emb"

    import robot_manipulation_vq_vae_tpu
    from robot_manipulation_vq_vae_tpu.scripts import setup_macros

    pkg_dir = os.path.dirname(robot_manipulation_vq_vae_tpu.__file__)
    dst = os.path.join(pkg_dir, "macros_private.py")
    existed = os.path.exists(dst)
    try:
        if not existed:
            setup_macros.main()
            assert os.path.exists(dst)
        setup_macros.main()  # second call must not overwrite
        out = capsys.readouterr().out
        assert "not overwriting" in out
    finally:
        if not existed and os.path.exists(dst):
            os.remove(dst)


def test_real_clip_branch_with_stubbed_transformers(monkeypatch, tmp_path):
    """The real-CLIP code path (RMVQ_CLIP_DIR set) exercised end to end with
    stubbed transformers classes: tokenization batching, no_grad encode,
    text_embeds extraction, single-vs-list shapes (reference
    lang_utils.py:5-37 uses CLIPTextModelWithProjection the same way)."""
    import sys

    import torch
    import transformers

    # transformers' lazy-module machinery swaps sys.modules["transformers"]
    # when CLIPTextModelWithProjection is first resolved; force both
    # resolutions *before* patching, then patch the live sys.modules entry
    # (the one lang_utils' deferred `from transformers import ...` will see).
    _ = transformers.AutoTokenizer
    _ = transformers.CLIPTextModelWithProjection
    transformers = sys.modules["transformers"]

    class StubTokenizer:
        @classmethod
        def from_pretrained(cls, model_dir):
            assert model_dir == str(tmp_path)
            return cls()

        def __call__(self, texts, return_tensors="pt", padding=True):
            ids = torch.tensor(
                [[len(t) % 7, len(t) % 5, 1] for t in texts]
            )
            return {"input_ids": ids}

    class StubOutput:
        def __init__(self, embs):
            self.text_embeds = embs

    class StubClip:
        eval_called = False

        @classmethod
        def from_pretrained(cls, model_dir):
            assert model_dir == str(tmp_path)
            return cls()

        def eval(self):
            StubClip.eval_called = True

        def __call__(self, input_ids):
            # deterministic embedding from the token ids
            base = input_ids.float().sum(dim=1, keepdim=True)
            return StubOutput(base * torch.ones(input_ids.shape[0], 768))

    monkeypatch.setattr(transformers, "AutoTokenizer", StubTokenizer)
    monkeypatch.setattr(
        transformers, "CLIPTextModelWithProjection", StubClip
    )
    monkeypatch.setenv("RMVQ_CLIP_DIR", str(tmp_path))

    enc = LangEncoder()
    assert enc.is_real
    assert StubClip.eval_called

    single = enc.get_lang_emb("pick the mug")
    assert single.shape == (768,)
    batch = enc.get_lang_emb(["pick the mug", "close the oven door"])
    assert batch.shape == (2, 768)
    np.testing.assert_array_equal(batch[0], single)
    # different instruction -> different embedding through the stub
    assert not np.allclose(batch[0], batch[1])
