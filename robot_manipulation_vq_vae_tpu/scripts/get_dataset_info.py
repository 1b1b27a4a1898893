"""Print structural info about an HDF5 dataset
(reference ``robomimic/scripts/get_dataset_info.py``)."""

import argparse
import json

import h5py
import numpy as np


def print_dataset_info(hdf5_path, filter_key=None, verbose=False):
    with h5py.File(hdf5_path, "r") as f:
        if filter_key is not None:
            demos = sorted(
                e.decode("utf-8") for e in np.array(f[f"mask/{filter_key}"][:])
            )
        else:
            demos = sorted(list(f["data"].keys()))
        traj_lengths = [
            int(f[f"data/{ep}"].attrs["num_samples"]) for ep in demos
        ]
        print(f"total transitions: {np.sum(traj_lengths)}")
        print(f"total trajectories: {len(traj_lengths)}")
        print(
            f"traj length mean/std/min/max: {np.mean(traj_lengths):.1f} / "
            f"{np.std(traj_lengths):.1f} / {np.min(traj_lengths)} / "
            f"{np.max(traj_lengths)}"
        )
        ep = demos[0]
        print("obs keys / shapes:")
        for k in f[f"data/{ep}/obs"]:
            d = f[f"data/{ep}/obs/{k}"]
            print(f"  {k}: {d.shape[1:]} {d.dtype}")
        print("dataset keys:")
        for k in f[f"data/{ep}"]:
            if k not in ("obs", "next_obs"):
                d = f[f"data/{ep}/{k}"]
                print(f"  {k}: {d.shape[1:]} {d.dtype}")
        if "mask" in f:
            print(f"filter keys: {sorted(list(f['mask'].keys()))}")
        env_args = f["data"].attrs.get("env_args")
        if env_args is not None:
            print("env_args:")
            print(json.dumps(json.loads(env_args), indent=4))
        if verbose:
            print(f"demo keys: {demos}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset", type=str)
    parser.add_argument("--filter_key", type=str, default=None)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()
    print_dataset_info(args.dataset, args.filter_key, args.verbose)
