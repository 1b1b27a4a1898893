"""EnvGym exercised against REAL gymnasium environments (no mocks) - the
closest available analogue of the reference's real-env test strategy in a
sim-less image: robosuite/MuJoCo are absent, but gymnasium ships, so the
full train -> rollout loop runs against a real simulator backend
(reference robomimic/envs/env_gym.py + utils/test_utils.py:42-58)."""

import glob
import json

import h5py
import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

import robot_manipulation_vq_vae_tpu.utils.env_utils as EnvUtils
from robot_manipulation_vq_vae_tpu.envs.env_base import EnvType


def test_env_gym_protocol_roundtrip():
    """create_env_from_metadata -> reset/step/obs/serialize on Pendulum."""
    env_meta = {
        "env_name": "Pendulum-v1", "type": EnvType.GYM_TYPE, "env_kwargs": {},
    }
    env = EnvUtils.create_env_from_metadata(env_meta=env_meta)
    ob = env.reset()
    assert set(ob) == {"flat"} and ob["flat"].shape == (3,)
    assert env.action_dimension == 1
    total_r = 0.0
    for _ in range(5):
        ob, r, done, info = env.step(np.array([0.5], np.float32))
        total_r += r
    assert ob["flat"].dtype == np.float32
    assert np.isfinite(total_r)
    assert env.is_done() in (False, True)
    assert env.serialize()["env_name"] == "Pendulum-v1"
    # env_utils type predicates
    assert not EnvUtils.is_robosuite_env(env_meta=env_meta)


@pytest.mark.slow
def test_train_and_rollout_in_real_gym_env(tmp_path):
    """End to end through scripts/train.py: BC trains on a synthetic
    Pendulum-shaped dataset, then the rollout block steps the REAL
    gymnasium env with the trained policy."""
    from robot_manipulation_vq_vae_tpu.config import config_factory
    from robot_manipulation_vq_vae_tpu.scripts.train import train

    data_path = str(tmp_path / "pendulum.hdf5")
    rng = np.random.RandomState(0)
    with h5py.File(data_path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "Pendulum-v1", "type": EnvType.GYM_TYPE,
             "env_kwargs": {}}
        )
        for i in range(3):
            T = 12
            ep = data.create_group(f"demo_{i}")
            ep.attrs["num_samples"] = T
            ep.create_group("obs").create_dataset(
                "flat", data=rng.randn(T, 3).astype(np.float32)
            )
            ep.create_dataset(
                "actions", data=rng.uniform(-1, 1, (T, 1)).astype(np.float32)
            )

    config = config_factory("bc")
    with config.values_unlocked():
        config.experiment.name = "gym_e2e"
        config.experiment.validate = False
        config.experiment.logging.terminal_output_to_txt = False
        config.experiment.logging.log_tb = False
        config.experiment.save.enabled = True
        config.experiment.save.every_n_epochs = 1
        config.experiment.epoch_every_n_steps = 2
        config.experiment.rollout.enabled = True
        config.experiment.rollout.n = 1
        config.experiment.rollout.horizon = 8
        config.experiment.rollout.rate = 1
        config.experiment.rollout.warmstart = 0
        config.experiment.render_video = False
        config.train.data = [{"path": data_path}]
        config.train.output_dir = str(tmp_path / "out")
        config.train.num_data_workers = 0
        config.train.hdf5_cache_mode = "all"
        config.train.batch_size = 4
        config.train.num_epochs = 1
        config.train.dataset_keys = ("actions",)
        config.train.action_config = {"actions": {"normalization": None}}
        config.observation.modalities.obs.low_dim = ["flat"]
        config.observation.modalities.obs.rgb = []
    config.lock()

    import contextlib
    import io

    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        train(config)
    stdout = out.getvalue()
    assert "Env: Pendulum-v1" in stdout
    assert "Success_Rate" in stdout
    assert glob.glob(str(tmp_path / "out" / "**" / "models" / "*.ckpt"),
                     recursive=True)
