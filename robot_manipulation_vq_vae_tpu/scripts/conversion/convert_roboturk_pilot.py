"""Convert RoboTurk Pilot demos to this framework's format (reference
``robomimic/scripts/conversion/convert_roboturk_pilot.py``): join joint
velocities + gripper actuations into clipped actions, inline the MuJoCo
model xmls, stamp robosuite-v0.3 env metadata, then create train/val and
fastest-N filter keys."""

import argparse
import json
import os

import h5py
import numpy as np

from robot_manipulation_vq_vae_tpu.envs.env_base import EnvType
from robot_manipulation_vq_vae_tpu.scripts.split_train_val import (
    split_train_val_from_hdf5,
)
from robot_manipulation_vq_vae_tpu.utils.file_utils import (
    create_hdf5_filter_key,
)

# robosuite v0.3 args the pilot datasets were collected with (reference :96-110)
ROBOSUITE_V03_ARGS = {
    "has_renderer": False,
    "has_offscreen_renderer": False,
    "ignore_done": True,
    "use_object_obs": True,
    "use_camera_obs": False,
    "camera_depth": False,
    "camera_height": 84,
    "camera_width": 84,
    "camera_name": "agentview",
    "gripper_visualization": False,
    "reward_shaping": False,
    "control_freq": 100,
}


def convert_rt_pilot_hdf5(ref_folder):
    """demo.hdf5 + models/*.xml -> converted demo.hdf5 (old file is kept as
    demo_bak.hdf5, as the reference does)."""
    hdf5_path = os.path.join(ref_folder, "demo.hdf5")
    new_path = os.path.join(ref_folder, "demo_new.hdf5")

    with h5py.File(hdf5_path, "r") as f, h5py.File(new_path, "w") as f_new:
        grp = f_new.create_group("data")
        demos = list(f["data"].keys())
        demos = [demos[i] for i in np.argsort([int(d[5:]) for d in demos])]

        num_samples_arr = []
        for ep in demos:
            ep_grp = grp.create_group(ep)
            ep_grp.create_dataset(
                "states", data=np.array(f[f"data/{ep}/states"][()])
            )
            jvels = f[f"data/{ep}/joint_velocities"][()]
            gripper = f[f"data/{ep}/gripper_actuations"][()]
            # actions must live in [-1, 1] for the rest of the stack (:72-74)
            actions = np.clip(
                np.concatenate([jvels, gripper], axis=1), -1.0, 1.0
            )
            ep_grp.create_dataset("actions", data=actions)

            model_path = os.path.join(
                ref_folder, "models", f[f"data/{ep}"].attrs["model_file"]
            )
            with open(model_path, "r") as fm:
                ep_grp.attrs["model_file"] = fm.read()
            ep_grp.attrs["num_samples"] = actions.shape[0]
            num_samples_arr.append(actions.shape[0])

        grp.attrs["total"] = int(np.sum(num_samples_arr))
        env_meta = {
            "type": EnvType.ROBOSUITE_TYPE,
            "env_name": f["data"].attrs["env"] + "Teleop",
            "env_kwargs": ROBOSUITE_V03_ARGS,
        }
        grp.attrs["env_args"] = json.dumps(env_meta, indent=4)

    os.rename(hdf5_path, os.path.join(ref_folder, "demo_bak.hdf5"))
    os.rename(new_path, hdf5_path)


def split_fastest_from_hdf5(hdf5_path, n):
    """Filter key for the N shortest (fastest) demos (reference :126-151)."""
    with h5py.File(hdf5_path, "r") as f:
        demos = sorted(list(f["data"].keys()))
        lengths = [f[f"data/{ep}/actions"].shape[0] for ep in demos]
    inds = np.argsort(lengths)[:n]
    filtered = [demos[i] for i in inds]
    key_lengths = create_hdf5_filter_key(
        hdf5_path=hdf5_path, demo_keys=filtered, key_name=f"fastest_{n}"
    )
    print(
        f"fastest_{n}: {int(np.sum(key_lengths))} samples total, "
        f"{float(np.mean(key_lengths)):.1f} on average"
    )
    return filtered


def main(args):
    convert_rt_pilot_hdf5(ref_folder=args.folder)
    hdf5_path = os.path.join(args.folder, "demo.hdf5")
    split_train_val_from_hdf5(hdf5_path=hdf5_path, val_ratio=0.1)
    split_fastest_from_hdf5(hdf5_path=hdf5_path, n=args.n)
    split_train_val_from_hdf5(
        hdf5_path=hdf5_path, val_ratio=0.1, filter_key=f"fastest_{args.n}"
    )
    print("old dataset preserved at demo_bak.hdf5")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--folder", type=str, required=True)
    parser.add_argument("--n", type=int, default=225)
    main(parser.parse_args())
