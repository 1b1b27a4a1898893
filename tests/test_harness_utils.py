"""Harness utility tests: hyperparam sweep generation, MSE eval, dataset
registry, split/info scripts."""

import json
import os

import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu.utils.hyperparam_utils import ConfigGenerator


def test_config_generator_cartesian(tmp_path):
    base = {
        "algo_name": "bc",
        "experiment": {"name": "exp"},
        "train": {"batch_size": 16, "seed": 1},
        "algo": {"optim_params": {"policy": {"learning_rate": {"initial": 1e-4}}}},
        "meta": {},
    }
    base_path = tmp_path / "base.json"
    base_path.write_text(json.dumps(base))
    gen = ConfigGenerator(
        base_config_file=str(base_path),
        script_file=str(tmp_path / "run.sh"),
        generated_config_dir=str(tmp_path / "gen"),
    )
    gen.add_param("train.seed", "seed", 0, [1, 2])
    gen.add_param(
        "algo.optim_params.policy.learning_rate.initial", "lr", 1,
        [1e-4, 1e-3], value_names=["1e4", "1e3"],
    )
    paths = gen.generate()
    assert len(paths) == 4  # 2 seeds x 2 lrs
    cfg = json.loads(open(paths[0]).read())
    assert cfg["train"]["seed"] == 1
    assert cfg["meta"]["hp_keys"] == ["seed", "lr"]
    script = open(tmp_path / "run.sh").read()
    assert script.count("python -m") == 4


def test_mse_eval(tmp_path):
    from robot_manipulation_vq_vae_tpu.config import config_factory
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
    from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
    import robot_manipulation_vq_vae_tpu.algo as AlgoReg

    OBS_KEYS = {"robot0_eef_pos": (4,)}
    config = config_factory("bc")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.algo.actor_layer_dims = (16,)
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.algo_factory("bc", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=3)

    class FakeDataset:
        hdf5_path = "fake.hdf5"

        def __len__(self):
            return 8

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return {
                "obs": {"robot0_eef_pos": rng.randn(2, 4).astype(np.float32)},
                "actions": rng.uniform(-1, 1, (2, 3)).astype(np.float32),
            }

    ds = FakeDataset()
    batch = algo.process_batch_for_training(ds[0])
    batch = {k: (v[None] if not isinstance(v, dict) else {kk: vv[None] for kk, vv in v.items()}) for k, v in batch.items() if v is not None}
    algo.ensure_state({"obs": {"robot0_eef_pos": np.zeros((1, 4), np.float32)}, "actions": np.zeros((1, 3), np.float32)})
    mse_log, vis_log = algo.compute_mse_visualize(
        ds, None, num_samples=4, savedir=str(tmp_path)
    )
    assert "Train/action_mse_error" in mse_log
    assert any("accuracy@" in k for k in mse_log)
    assert os.path.exists(list(vis_log.values())[0])


def test_dataset_registry():
    from robot_manipulation_vq_vae_tpu.utils.dataset_registry import (
        SINGLE_STAGE_TASK_DATASETS,
        MULTI_STAGE_TASK_DATASETS,
        get_ds_path,
    )

    assert "PnPCounterToCab" in SINGLE_STAGE_TASK_DATASETS
    assert len(MULTI_STAGE_TASK_DATASETS) == 5
    p, h = get_ds_path("PreSoakPan", "human_im", return_info=True)
    assert h == 1500 and p.endswith("demo_im128.hdf5")


def test_split_train_val(tmp_path):
    import h5py

    from robot_manipulation_vq_vae_tpu.scripts.split_train_val import (
        split_train_val_from_hdf5,
    )

    p = str(tmp_path / "d.hdf5")
    with h5py.File(p, "w") as f:
        for i in range(10):
            ep = f.create_group(f"data/demo_{i}")
            ep.attrs["num_samples"] = 5
            ep.create_dataset("actions", data=np.zeros((5, 2)))
    train, valid = split_train_val_from_hdf5(p, val_ratio=0.2)
    assert len(train) == 8 and len(valid) == 2
    with h5py.File(p, "r") as f:
        assert "mask/train" in f and "mask/valid" in f


def test_get_dataset_info_and_playback_images(tmp_path, capsys):
    """Sim-free script paths: dataset info printing + image playback
    (reference robomimic/tests/test_scripts.py analogue)."""
    import h5py

    from robot_manipulation_vq_vae_tpu.scripts.get_dataset_info import (
        print_dataset_info,
    )

    p = str(tmp_path / "ds.hdf5")
    rng = np.random.RandomState(0)
    with h5py.File(p, "w") as f:
        grp = f.create_group("data")
        grp.attrs["env_args"] = '{"env_name": "Fake", "type": 1}'
        for i, t in enumerate((5, 7)):
            ep = grp.create_group(f"demo_{i}")
            ep.create_dataset(
                "obs/cam_image",
                data=rng.randint(0, 255, (t, 8, 8, 3), dtype=np.uint8),
            )
            ep.create_dataset("actions", data=rng.randn(t, 4))
            ep.attrs["num_samples"] = t

    print_dataset_info(p)
    out = capsys.readouterr().out
    assert "total transitions: 12" in out
    assert "total trajectories: 2" in out

    from robot_manipulation_vq_vae_tpu.scripts.playback_dataset import (
        playback_trajectory_with_obs,
    )

    class FrameCollector:
        def __init__(self):
            self.frames = []

        def append_data(self, frame):
            self.frames.append(np.asarray(frame))

    with h5py.File(p, "r") as f:
        writer = FrameCollector()
        playback_trajectory_with_obs(
            f["data/demo_0"], writer, video_skip=2, image_names=["cam"]
        )
    assert len(writer.frames) == 3  # ceil(5 / 2)
    assert writer.frames[0].shape == (8, 8, 3)
