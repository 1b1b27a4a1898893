"""Split an HDF5 dataset's demos into train/valid filter keys
(reference ``robomimic/scripts/split_train_val.py``)."""

import argparse

import h5py
import numpy as np

from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils


def split_train_val_from_hdf5(hdf5_path, val_ratio=0.1, filter_key=None):
    with h5py.File(hdf5_path, "r") as f:
        if filter_key is not None:
            demos = [
                e.decode("utf-8") for e in np.array(f[f"mask/{filter_key}"][:])
            ]
        else:
            demos = sorted(list(f["data"].keys()))
    num_demos = len(demos)
    num_val = int(val_ratio * num_demos)
    mask = np.zeros(num_demos, dtype=bool)
    rng = np.random.RandomState(0)
    mask[rng.choice(num_demos, size=num_val, replace=False)] = True
    train_demos = [d for d, m in zip(demos, mask) if not m]
    valid_demos = [d for d, m in zip(demos, mask) if m]

    name_1, name_2 = "train", "valid"
    if filter_key is not None:
        name_1 = f"{filter_key}_{name_1}"
        name_2 = f"{filter_key}_{name_2}"
    train_lengths = FileUtils.create_hdf5_filter_key(
        hdf5_path=hdf5_path, demo_keys=train_demos, key_name=name_1
    )
    valid_lengths = FileUtils.create_hdf5_filter_key(
        hdf5_path=hdf5_path, demo_keys=valid_demos, key_name=name_2
    )
    print(f"total transitions in train split: {np.sum(train_lengths)}")
    print(f"total transitions in valid split: {np.sum(valid_lengths)}")
    return train_demos, valid_demos


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset", type=str)
    parser.add_argument("--filter_key", type=str, default=None)
    parser.add_argument("--ratio", type=float, default=0.1)
    args = parser.parse_args()
    split_train_val_from_hdf5(
        args.dataset, val_ratio=args.ratio, filter_key=args.filter_key
    )
