"""Convert a raw robosuite demonstration HDF5 into the training format
(reference ``robomimic/scripts/conversion/convert_robosuite.py``): stamps
``env_args`` metadata on the data group and adds per-demo ``num_samples``
attrs + a ``successful`` filter key when success labels exist."""

import argparse
import json

import h5py

from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils


def main(args):
    with h5py.File(args.dataset, "a") as f:
        env_name = f["data"].attrs.get("env")
        if env_name is None:
            env_name = args.env_name
        env_info = f["data"].attrs.get("env_info")
        env_kwargs = json.loads(env_info) if env_info else {}
        env_meta = dict(
            env_name=env_name if isinstance(env_name, str) else env_name.decode(),
            type=1,  # EnvType.ROBOSUITE_TYPE
            env_kwargs=env_kwargs,
        )
        f["data"].attrs["env_args"] = json.dumps(env_meta)

        for ep in f["data"]:
            g = f[f"data/{ep}"]
            if "num_samples" not in g.attrs:
                g.attrs["num_samples"] = g["actions"].shape[0]
        print(f"stamped env_args for {env_meta['env_name']}")

        if args.success_key is not None:
            successful = [
                ep for ep in f["data"]
                if f[f"data/{ep}"].attrs.get(args.success_key, False)
            ]
    if args.success_key is not None and successful:
        FileUtils.create_hdf5_filter_key(
            hdf5_path=args.dataset, demo_keys=successful, key_name="successful"
        )
        print(f"filter key 'successful': {len(successful)} demos")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--env_name", type=str, default=None)
    parser.add_argument("--success_key", type=str, default=None)
    main(parser.parse_args())
