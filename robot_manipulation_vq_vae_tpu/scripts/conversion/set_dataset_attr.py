"""Bulk-edit hdf5 dataset attributes (reference
``robomimic/scripts/conversion/set_dataset_attr.py``): glob for dataset
files, set ``data``-group attrs from ``key=json_value`` args, and optionally
patch one dotted key inside the serialized ``env_args`` JSON.

Example:
    python set_dataset_attr.py --glob 'datasets/**/*_abs.hdf5' \\
        --env_args env_kwargs.controller_configs.control_delta=false \\
        absolute_actions=true
"""

import argparse
import json
import pathlib

import h5py


def update_nested(d, keys, value):
    """Set d[k0][k1]...[kn] = value, creating intermediate dicts."""
    if not keys:
        return d
    node = d
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value
    return d


def apply_attrs(path, attrs_dict, env_args_key=None, env_args_value=None):
    """Apply attribute updates to one dataset file."""
    with h5py.File(str(path), mode="r+") as f:
        if env_args_key is not None:
            env_args = json.loads(f["data"].attrs["env_args"])
            update_nested(env_args, env_args_key, env_args_value)
            f["data"].attrs["env_args"] = json.dumps(env_args)
        f["data"].attrs.update(attrs_dict)


def main(args):
    attrs_dict = {}
    for attr_arg in args.attrs:
        key, svalue = attr_arg.split("=")
        attrs_dict[key] = json.loads(svalue)

    env_args_key = env_args_value = None
    if args.env_args is not None:
        key, svalue = args.env_args.split("=")
        env_args_key = key.split(".")
        env_args_value = json.loads(svalue)

    file_paths = list(pathlib.Path.cwd().glob(args.glob))
    print("Found matching files:")
    for p in file_paths:
        print(p)
    print("Modify these files with:")
    print(json.dumps(attrs_dict, indent=2))
    if env_args_key is not None:
        print("env_args." + ".".join(env_args_key) + "=" + str(env_args_value))
    if not args.yes and "y" not in input("[y/n]?"):
        return

    for path in file_paths:
        apply_attrs(path, attrs_dict, env_args_key, env_args_value)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--glob", type=str, required=True)
    parser.add_argument("--env_args", type=str, default=None)
    parser.add_argument("--yes", action="store_true",
                        help="skip the interactive confirmation")
    parser.add_argument("attrs", nargs="*")
    main(parser.parse_args())
