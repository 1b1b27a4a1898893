"""Copy a group from one hdf5 to another.

Equivalent of the reference internal utility
(``robomimic/scripts/internal/copy_hdf5_group.py``): for every demo in the
source file, copy the sub-keys of ``data/<ep>/<group>`` into the target
file, skipping keys the target already has.
"""

import argparse

import h5py


def copy_hdf5_group(args):
    with h5py.File(args.src, "r") as f_src, h5py.File(args.target, "a") as f_target:
        for ep in f_src["data"].keys():
            if args.group not in f_target["data"][ep]:
                f_target["data"][ep].create_group(args.group)
            ep_group = f_target["data"][ep][args.group]
            for k in f_src["data"][ep][args.group].keys():
                if k not in ep_group:
                    f_src["data"][ep][args.group].copy(k, ep_group, name=k)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", type=str, required=True, help="source hdf5")
    parser.add_argument("--target", type=str, required=True, help="target hdf5")
    parser.add_argument("--group", type=str, required=True, help="group to copy")
    copy_hdf5_group(parser.parse_args())
