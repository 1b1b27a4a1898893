"""Instructive example: SequenceDataset + DataLoader + jitted train steps
without the full train harness (reference
``robomimic/examples/simple_train_loop.py``). Generates a tiny synthetic
hdf5 so it runs anywhere."""

import json
import os
import tempfile

import h5py
import numpy as np

import robot_manipulation_vq_vae_tpu.algo as AlgoReg
from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.data.dataset import SequenceDataset
from robot_manipulation_vq_vae_tpu.data.loader import DataLoader
from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils

A = 7
OBS_KEYS = ("robot0_eef_pos", "robot0_gripper_qpos")
SHAPES = {"robot0_eef_pos": 3, "robot0_gripper_qpos": 2}


def write_synthetic_hdf5(path, n_demos=4, t=20):
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        grp = f.create_group("data")
        grp.attrs["env_args"] = json.dumps(
            {"env_name": "Synthetic", "type": 2, "env_kwargs": {}}
        )
        total = 0
        for i in range(n_demos):
            ep = grp.create_group(f"demo_{i}")
            for k in OBS_KEYS:
                ep.create_dataset(
                    f"obs/{k}", data=rng.randn(t, SHAPES[k]).astype(np.float32)
                )
            ep.create_dataset(
                "actions", data=rng.uniform(-1, 1, (t, A)).astype(np.float32)
            )
            ep.create_dataset("rewards", data=rng.rand(t).astype(np.float32))
            ep.create_dataset("dones", data=np.zeros(t, np.int64))
            ep.attrs["num_samples"] = t
            total += t
        grp.attrs["total"] = total
    return path


def get_data_loader(dataset_path, batch_size=8):
    dataset = SequenceDataset(
        hdf5_path=dataset_path,
        obs_keys=OBS_KEYS,
        action_keys=["actions"],
        dataset_keys=("actions", "rewards", "dones"),
        action_config={},
        seq_length=1,
        frame_stack=1,
        load_next_obs=False,
        hdf5_cache_mode="all",
    )
    return DataLoader(dataset, batch_size=batch_size, shuffle=True)


def main():
    config = config_factory("bc")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.observation.modalities.obs.rgb = []
        config.train.batch_size = 8
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)

    with tempfile.TemporaryDirectory() as tmp:
        data_path = write_synthetic_hdf5(os.path.join(tmp, "demos.hdf5"))
        loader = get_data_loader(data_path)

        model = AlgoReg.algo_factory(
            "bc", config,
            obs_key_shapes={k: (SHAPES[k],) for k in OBS_KEYS},
            ac_dim=A,
        )

        for epoch in range(2):
            for batch in loader:
                input_batch = model.process_batch_for_training(batch)
                info = model.train_on_batch(input_batch, epoch)
            log = model.log_info(info)
            print(f"epoch {epoch}: loss={log['Loss']:.4f}")


if __name__ == "__main__":
    main()
