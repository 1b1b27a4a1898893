"""Copy dataset keys (or whole key groups) from one hdf5 dataset into
another with matching demo names (reference
``robomimic/scripts/copy_ds_key.py``)."""

import argparse

import h5py
import numpy as np


def copy_ds_keys(src, target, keys):
    with h5py.File(src, "r") as f_src, h5py.File(target, "a") as f_target:
        for ep in f_src["data"]:
            src_ep = f_src["data"][ep]
            targ_ep = f_target["data"][ep]
            for key in keys:
                if isinstance(src_ep[key], h5py.Dataset):
                    v = np.array(src_ep[key][:])
                    if key in targ_ep:
                        targ_ep[key][:] = v
                    else:
                        targ_ep.create_dataset(key, data=v)
                else:  # group: copy each member dataset
                    if key not in targ_ep:
                        targ_ep.create_group(key)
                    for k in src_ep[key]:
                        v = np.array(src_ep[key][k][:])
                        if k in targ_ep[key]:
                            targ_ep[key][k][:] = v
                        else:
                            targ_ep[key].create_dataset(k, data=v)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", type=str, required=True)
    parser.add_argument("--target", type=str, required=True)
    parser.add_argument("--keys", type=str, nargs="+", default=[])
    args = parser.parse_args()
    copy_ds_keys(args.src, args.target, args.keys)
