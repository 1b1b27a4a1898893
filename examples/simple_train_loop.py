"""Minimal programmatic training loop (the analogue of the reference's
``examples/simple_train_loop.py``): build a config, a synthetic dataset,
an algo, and run a few jitted gradient steps by hand."""

import json

import h5py
import numpy as np


def make_synthetic_dataset(path, n_demos=3, T=20, a_dim=7):
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "Example", "type": 2, "env_kwargs": {}}
        )
        for i in range(n_demos):
            ep = data.create_group(f"demo_{i}")
            ep.attrs["num_samples"] = T
            ep.create_group("obs").create_dataset(
                "flat", data=rng.randn(T, 10).astype(np.float32)
            )
            ep.create_dataset(
                "actions", data=rng.uniform(-1, 1, (T, a_dim)).astype(np.float32)
            )
    return path


def main():
    from robot_manipulation_vq_vae_tpu.config import config_factory
    from robot_manipulation_vq_vae_tpu.data import DataLoader, SequenceDataset
    from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
    import robot_manipulation_vq_vae_tpu.algo as AlgoReg

    ds_path = make_synthetic_dataset("/tmp/example_demos.hdf5")

    config = config_factory("bc")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = ["flat"]
        config.observation.modalities.obs.rgb = []
        config.algo.actor_layer_dims = (64, 64)
        config.train.data = ds_path
        config.train.seq_length = 1
        config.train.frame_stack = 1
        config.train.batch_size = 8
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)

    dataset = SequenceDataset(
        hdf5_path=ds_path, obs_keys=["flat"], action_keys=["actions"],
        dataset_keys=["actions"],
        action_config={"actions": {"normalization": None}},
        load_next_obs=False,
    )
    loader = DataLoader(dataset, batch_size=8, num_workers=0)
    algo = AlgoReg.algo_factory(
        "bc", config, obs_key_shapes={"flat": (10,)}, ac_dim=7
    )

    for epoch in range(3):
        for batch in loader:
            processed = algo.process_batch_for_training(batch)
            info = algo.train_on_batch(processed, epoch)
        print(f"epoch {epoch}: loss={algo.log_info(info)['Loss']:.4f}")

    obs = {"flat": np.random.randn(1, 10).astype(np.float32)}
    print("action:", np.asarray(algo.get_action(obs))[0])


if __name__ == "__main__":
    main()
