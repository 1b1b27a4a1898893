"""Expand flat action vectors into a structured ``action_dict`` group
(reference ``robomimic/scripts/conversion/extract_action_dict.py:12-68``):
for each demo, split [pos(3), rot_axis_angle(3), gripper(1), (base_mode(1))]
and additionally store the 6d rotation representation, for both relative
(``actions`` -> ``rel_*``) and absolute (``actions_abs`` -> ``abs_*``)
action streams when present."""

import argparse
import os

import h5py
import numpy as np

from robot_manipulation_vq_vae_tpu.utils import rotation_utils as RotUtils

# (input dataset key, is_absolute) pairs scanned per demo
ACTION_SPECS = (("actions", False), ("actions_abs", True))


def action_vector_to_dict(action, prefix):
    """Split one [T, 7|8] action array into the reference's action_dict
    entries. Pure numpy - unit-testable without a dataset on disk."""
    action = np.asarray(action)
    pos = action[:, :3].astype(np.float32)
    rot_aa = action[:, 3:6].astype(np.float32)
    grip = action[:, 6:7].astype(np.float32)
    rot_6d = RotUtils.axis_angle_to_rot_6d(rot_aa).astype(np.float32)
    out = {
        prefix + "pos": pos,
        prefix + "rot_axis_angle": rot_aa,
        prefix + "rot_6d": rot_6d,
        "gripper": grip,
    }
    # 8-dim actions carry a mobile-base mode toggle (reference :58-60)
    if action.shape[1] == 8:
        out["base_mode"] = action[:, 7:8].astype(np.float32)
    return out


def extract_action_dict(dataset):
    """Rewrite @dataset in place, adding ``action_dict/<key>`` datasets to
    every demo for each action stream present."""
    with h5py.File(os.path.expanduser(dataset), mode="r+") as f:
        for demo in f["data"].values():
            for input_key, is_absolute in ACTION_SPECS:
                if input_key not in demo:
                    continue
                prefix = "abs_" if is_absolute else "rel_"
                entries = action_vector_to_dict(demo[input_key][:], prefix)
                group = demo.require_group("action_dict")
                for key, data in entries.items():
                    if key in group:
                        del group[key]
                    group.create_dataset(key, data=data)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    extract_action_dict(parser.parse_args().dataset)
