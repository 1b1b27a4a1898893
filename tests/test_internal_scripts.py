"""Tests for scripts/internal/ utilities (reference
robomimic/scripts/internal/)."""

import json
import subprocess
import sys

import h5py
import numpy as np

from robot_manipulation_vq_vae_tpu.scripts.internal.add_train_filter_key import (
    add_train_filter_key,
)
from robot_manipulation_vq_vae_tpu.scripts.internal.copy_hdf5_group import (
    copy_hdf5_group,
)


def _write_mg_dataset(path, env_name="MG_PnPCounterToCab", cats=("can", "apple")):
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": env_name, "type": 1, "env_kwargs": {}}
        )
        for i, cat in enumerate(cats):
            ep = data.create_group(f"demo_{i}")
            ep.attrs["num_samples"] = 3
            ep.attrs["ep_meta"] = json.dumps(
                {"object_cfgs": [{"name": "obj", "info": {"cat": cat}}],
                 "layout_id": 0, "style_id": 0}
            )
            ep.create_group("obs").create_dataset(
                "x", data=np.zeros((3, 2), dtype=np.float32)
            )
            ep.create_dataset("actions", data=np.zeros((3, 7), dtype=np.float32))
    return path


def test_add_train_filter_key_excludes_heldout_cats(tmp_path):
    # "can" is in PnPCounterToCab's exclusion list; "apple" is not
    p = _write_mg_dataset(str(tmp_path / "mg.hdf5"))
    add_train_filter_key(p)
    with h5py.File(p, "r") as f:
        train = [k.decode() for k in f["mask/train"][:]]
    assert train == ["demo_1"]


def test_copy_hdf5_group(tmp_path):
    src = _write_mg_dataset(str(tmp_path / "src.hdf5"))
    # target: same demos but without obs
    tgt = str(tmp_path / "tgt.hdf5")
    with h5py.File(src, "r") as fs, h5py.File(tgt, "w") as ft:
        data = ft.create_group("data")
        data.attrs["env_args"] = fs["data"].attrs["env_args"]
        for ep in fs["data"]:
            g = data.create_group(ep)
            g.create_dataset("actions", data=fs["data"][ep]["actions"][:])

    class Args:
        pass

    args = Args()
    args.src, args.target, args.group = src, tgt, "obs"
    copy_hdf5_group(args)
    with h5py.File(tgt, "r") as f:
        assert f["data/demo_0/obs/x"].shape == (3, 2)
        assert f["data/demo_1/obs/x"].shape == (3, 2)


def test_generate_fkey_cmds_runs():
    out = subprocess.run(
        [sys.executable, "-m",
         "robot_manipulation_vq_vae_tpu.scripts.internal.generate_fkey_cmds"],
        capture_output=True, text=True,
    )
    assert out.returncode == 0
    assert "add_train_filter_key --dataset" in out.stdout
    assert "filter_dataset_size" in out.stdout
