"""
WARNING: This script is only for instructive purposes, and is missing several
         useful components used during training such as logging and rollout
         evaluation.

Example script demonstrating how the SequenceDataset class and a training
loop can interact - mirrors the reference example
(``/root/reference/robomimic/examples/simple_train_loop.py``). Since this
build is zero-egress, the script synthesizes a tiny robomimic-layout HDF5
dataset instead of downloading one; point ``--dataset`` at a real file to
use it instead. The model is a BC policy built through the same
``config_factory`` / ``algo_factory`` path the full trainer uses, and each
step runs the jitted ``train_on_batch`` update.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import robot_manipulation_vq_vae_tpu.utils.obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.algo import algo_factory
from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.data.dataset import SequenceDataset
from robot_manipulation_vq_vae_tpu.data.loader import DataLoader

OBS_KEYS = ("robot0_eef_pos", "robot0_eef_quat", "robot0_gripper_qpos")
OBS_DIMS = {"robot0_eef_pos": 3, "robot0_eef_quat": 4, "robot0_gripper_qpos": 2}
AC_DIM = 7


def make_synthetic_dataset(path, n_demos=5, T=30, seed=0):
    """Write a minimal robomimic-layout HDF5 demo file."""
    import h5py

    rng = np.random.RandomState(seed)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "Example", "type": 1, "env_kwargs": {}}
        )
        for i in range(n_demos):
            ep = data.create_group(f"demo_{i}")
            ep.attrs["num_samples"] = T
            obs = ep.create_group("obs")
            for k, d in OBS_DIMS.items():
                obs.create_dataset(k, data=rng.randn(T, d).astype(np.float32))
            ep.create_dataset(
                "actions", data=rng.uniform(-1, 1, (T, AC_DIM)).astype(np.float32)
            )
            ep.create_dataset("rewards", data=np.zeros(T, dtype=np.float64))
            ep.create_dataset("dones", data=np.zeros(T, dtype=np.int64))
    return path


def get_data_loader(dataset_path):
    """Get a data loader to sample batches of data."""
    dataset = SequenceDataset(
        hdf5_path=dataset_path,
        obs_keys=OBS_KEYS,          # observations we want to appear in batches
        action_keys=("actions",),
        dataset_keys=(              # other keys that should appear in batches
            "actions",
            "rewards",
            "dones",
        ),
        action_config={"actions": {"normalization": None}},
        load_next_obs=False,
        frame_stack=1,
        seq_length=10,              # length-10 temporal sequences
        pad_frame_stack=True,
        pad_seq_length=True,        # pad last obs per trajectory
        get_pad_mask=False,
        goal_mode=None,
        hdf5_cache_mode="all",      # cache in memory to avoid repeated file i/o
        hdf5_use_swmr=True,
        hdf5_normalize_obs=False,
        filter_by_attribute=None,   # optionally provide a filter key here
    )
    print("\n============= Created Dataset =============")
    print(dataset)
    print("")
    return DataLoader(
        dataset=dataset,
        batch_size=16,
        shuffle=True,
        num_workers=0,
        drop_last=True,
    )


def get_example_model(dataset_path):
    """Use a default config to construct a BC model."""
    config = config_factory(algo_name="bc")
    # read config to set up metadata for observation modalities
    ObsUtils.initialize_obs_utils_with_config(config)
    obs_key_shapes = {k: [OBS_DIMS[k]] for k in OBS_KEYS}
    model = algo_factory(
        algo_name=config.algo_name,
        config=config,
        obs_key_shapes=obs_key_shapes,
        ac_dim=AC_DIM,
    )
    return model


def run_train_loop(model, data_loader, num_epochs=3, gradient_steps_per_epoch=10):
    """Training loop: each epoch pulls batches, processes them for the
    algorithm, and runs one jitted gradient step per batch."""
    for epoch in range(1, num_epochs + 1):
        data_loader_iter = iter(data_loader)
        losses = []
        for _ in range(gradient_steps_per_epoch):
            try:
                batch = next(data_loader_iter)
            except StopIteration:
                data_loader_iter = iter(data_loader)
                batch = next(data_loader_iter)
            input_batch = model.process_batch_for_training(batch)
            input_batch = model.postprocess_batch_for_training(
                input_batch, obs_normalization_stats=None
            )
            info = model.train_on_batch(input_batch, epoch)
            step_log = model.log_info(info)
            losses.append(step_log["Loss"])
        print(f"epoch {epoch}: mean Loss = {np.mean(losses):.4f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default=None,
                        help="(optional) path to a robomimic hdf5 dataset; "
                             "a synthetic one is generated if omitted")
    args = parser.parse_args()

    if args.dataset is not None:
        dataset_path = args.dataset
    else:
        tmp = tempfile.mkdtemp(prefix="rmvq_example_")
        dataset_path = make_synthetic_dataset(os.path.join(tmp, "demo.hdf5"))
        print(f"using synthetic dataset at {dataset_path}")

    model = get_example_model(dataset_path)
    data_loader = get_data_loader(dataset_path)
    run_train_loop(model, data_loader)
