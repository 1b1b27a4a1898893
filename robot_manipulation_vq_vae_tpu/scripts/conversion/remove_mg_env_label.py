"""Strip the MimicGen ``MG_`` prefix from a dataset's env name (reference
``robomimic/scripts/conversion/remove_mg_env_label.py``)."""

import argparse
import json

import h5py


def remove_mg_prefix(dataset):
    with h5py.File(dataset, "a") as f:
        env_args = json.loads(f["data"].attrs["env_args"])
        if env_args["env_name"].startswith("MG_"):
            env_args["env_name"] = env_args["env_name"][3:]
        f["data"].attrs["env_args"] = json.dumps(env_args)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    remove_mg_prefix(parser.parse_args().dataset)
