"""Create random fixed-size demo-subset filter keys (reference
``robomimic/scripts/filter_dataset_size.py``): for each requested N, pick N
random demos (optionally within an input filter key) and write a
``mask/{N}_demos`` filter key for data-efficiency sweeps."""

import argparse

import h5py
import numpy as np

from robot_manipulation_vq_vae_tpu.utils.file_utils import (
    create_hdf5_filter_key,
)

# the reference's default sweep grid
DEFAULT_SIZES = (
    [10, 20, 30, 40, 50, 60, 70, 75, 80, 90, 100, 125, 150, 200, 250, 300,
     400, 500, 600, 700, 800, 900, 1000, 1500, 2000, 2500]
    + [n * 1000 for n in range(3, 21)]
)


def filter_dataset_size(hdf5_path, num_demos, input_filter_key=None,
                        output_filter_key=None):
    with h5py.File(hdf5_path, "r") as f:
        if input_filter_key is not None:
            demos = sorted(
                elem.decode("utf-8")
                for elem in np.array(f[f"mask/{input_filter_key}"])
            )
        else:
            demos = sorted(list(f["data"].keys()))

    mask = np.zeros(len(demos))
    mask[:num_demos] = 1.0
    np.random.shuffle(mask)
    subset_keys = [demos[i] for i in mask.astype(int).nonzero()[0]]

    name = output_filter_key or f"{num_demos}_demos"
    if input_filter_key is not None:
        name = f"{input_filter_key}_{name}"
    lengths = create_hdf5_filter_key(
        hdf5_path=hdf5_path, demo_keys=subset_keys, key_name=name
    )
    print(f"{name}: {int(np.sum(lengths))} samples "
          f"({float(np.mean(lengths)):.1f} avg)")
    return name


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--input_filter_key", type=str, default=None)
    parser.add_argument("--num_demos", type=int, nargs="+",
                        default=DEFAULT_SIZES)
    parser.add_argument("--output_filter_key", type=str, default=None)
    args = parser.parse_args()

    np.random.seed(0)  # deterministic splits, as the reference does
    for n in args.num_demos:
        filter_dataset_size(
            args.dataset, num_demos=n,
            input_filter_key=args.input_filter_key,
            output_filter_key=args.output_filter_key,
        )
