"""plot_model_predictions script: trajectory stepping, per-dim figures and
MSE stats on a tiny synthetic dataset with a real BC algo (reference
``robomimic/scripts/plot_model_predictions.py:1-213``)."""

import json
import os

import h5py
import numpy as np

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.data.dataset import SequenceDataset
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
import robot_manipulation_vq_vae_tpu.algo as AlgoReg
from robot_manipulation_vq_vae_tpu.scripts.plot_model_predictions import (
    build_parser,
    predict_trajectory,
    run_plot,
)

A = 7
OBS_KEYS = {"robot0_eef_pos": (3,), "robot0_gripper_qpos": (2,)}


def write_hdf5(path, n_demos=3, t=10):
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "Fake", "type": 1, "env_kwargs": {}}
        )
        for i in range(n_demos):
            ep = data.create_group(f"demo_{i}")
            ep.attrs["num_samples"] = t
            obs = ep.create_group("obs")
            for k, s in OBS_KEYS.items():
                obs.create_dataset(k, data=rng.randn(t, *s).astype(np.float32))
            ep.create_dataset(
                "actions", data=rng.uniform(-1, 1, (t, A)).astype(np.float32)
            )
    return path


def make_algo():
    config = config_factory("bc")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.observation.modalities.obs.rgb = []
        config.train.seed = 0
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    return AlgoReg.algo_factory(
        "bc", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )


def make_dataset(path):
    return SequenceDataset(
        hdf5_path=path,
        obs_keys=list(OBS_KEYS),
        action_keys=["actions"],
        dataset_keys=["actions"],
        action_config={"actions": {"normalization": None}},
        frame_stack=1,
        seq_length=1,
        hdf5_cache_mode=None,
        load_next_obs=False,
    )


def _trained_algo(dataset):
    from robot_manipulation_vq_vae_tpu.data.loader import collate

    algo = make_algo()
    batch = algo.process_batch_for_training(
        collate([dataset[i] for i in range(4)])
    )
    algo.train_on_batch(batch, epoch=0)
    return algo


def test_predict_trajectory_walks_full_demo(tmp_path):
    ds = make_dataset(write_hdf5(str(tmp_path / "d.hdf5")))
    algo = _trained_algo(ds)
    actual, pred, images = predict_trajectory(algo, ds, "demo_0")
    assert actual.shape == (10, A)
    assert pred.shape == (10, A)
    assert np.all(np.isfinite(pred))
    # actual actions must match the stored demo exactly
    with h5py.File(ds.hdf5_path) as f:
        np.testing.assert_allclose(
            actual, f["data/demo_0/actions"][()], atol=1e-6
        )


def test_run_plot_writes_figures_and_stats(tmp_path):
    ds = make_dataset(write_hdf5(str(tmp_path / "d.hdf5")))
    algo = _trained_algo(ds)
    out = str(tmp_path / "figs")
    stats = run_plot(algo, ds, None, out, num_traj=2)

    assert np.isfinite(stats["training_action_mse_error"])
    for thr in np.logspace(-3, -5, num=3).tolist():
        v = stats[f"training_action_accuracy@{thr}"]
        assert 0.0 <= v <= 1.0

    pngs = [p for p in os.listdir(os.path.join(out, "training"))
            if p.endswith(".png")]
    assert len(pngs) == 2
    txt = open(os.path.join(out, "training", "output.txt")).read()
    assert "MSE per trajectory" in txt
    assert "Average MSE across trajectories per dimension" in txt


def test_run_plot_with_validation_split(tmp_path):
    ds1 = make_dataset(write_hdf5(str(tmp_path / "a.hdf5")))
    ds2 = make_dataset(write_hdf5(str(tmp_path / "b.hdf5"), n_demos=2))
    algo = _trained_algo(ds1)
    stats = run_plot(algo, ds1, ds2, str(tmp_path / "figs"), num_traj=1)
    assert "validation_action_mse_error" in stats
    assert os.path.exists(
        str(tmp_path / "figs" / "validation" / "output.txt")
    )


def test_parser_flags():
    args = build_parser().parse_args(
        ["--ckpt", "m.pth", "--output_dir", "o", "--num_traj", "3",
         "--action_names", "x", "y", "z"]
    )
    assert args.num_traj == 3
    assert args.action_names == ["x", "y", "z"]
    assert args.dataset is None
