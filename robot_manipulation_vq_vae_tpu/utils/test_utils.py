"""Utilities for testing algorithm implementations end to end (reference
``robomimic/utils/test_utils.py``).

The reference downloads a tiny real dataset and rolls out in robosuite
(test_utils.py:42-58); this build is zero-egress and sim-less, so the same
API is backed by a synthesized robomimic-layout dataset and a registered
scripted env (``register_fake_env``) implementing the EnvBase protocol -
the full train -> checkpoint -> policy_from_checkpoint -> rollout loop
still runs for every algorithm (see tests/test_algo_e2e_matrix.py).
"""

import json
import os
import shutil
import tempfile
import traceback

import numpy as np

import robot_manipulation_vq_vae_tpu.utils.env_utils as EnvUtils
import robot_manipulation_vq_vae_tpu.utils.file_utils as FileUtils
from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.envs.env_base import EnvBase

FAKE_ENV_TYPE = 77  # env-type id the scripted test env registers under
TEST_AC_DIM = 7
TEST_OBS_KEYS = {"robot0_eef_pos": 5, "robot0_gripper_qpos": 2}


def maybe_remove_dir(dir_to_remove):
    """Remove directory if it exists (reference test_utils.py:20-28)."""
    if os.path.exists(dir_to_remove):
        shutil.rmtree(dir_to_remove)


def maybe_remove_file(file_to_remove):
    if os.path.exists(file_to_remove):
        os.remove(file_to_remove)


class ScriptedTestEnv(EnvBase):
    """Deterministic EnvBase-protocol env: obs evolve with the action norm;
    success after enough steps. The sim-free stand-in for the reference's
    robosuite test env."""

    def __init__(self, env_name="ScriptedTestEnv", render=False,
                 render_offscreen=False, use_image_obs=False,
                 use_depth_obs=False, postprocess_visual_obs=True, **kwargs):
        self._env_name = env_name
        self._t = 0
        self._state = np.zeros(TEST_OBS_KEYS["robot0_eef_pos"], np.float32)

    def step(self, action):
        action = np.asarray(action)
        assert action.shape == (TEST_AC_DIM,), action.shape
        self._t += 1
        self._state = self._state + 0.01 * float(np.linalg.norm(action))
        return self.get_observation(), 1.0, False, {}

    def reset(self):
        self._t = 0
        self._state = np.zeros_like(self._state)
        return self.get_observation()

    def reset_to(self, state):
        self._state = np.asarray(state["states"], np.float32)
        return self.get_observation()

    def render(self, mode="human", height=None, width=None, camera_name=None):
        if mode == "rgb_array":
            return np.zeros((height or 32, width or 32, 3), np.uint8)
        return None

    def get_observation(self):
        return {
            "robot0_eef_pos": self._state.copy(),
            "robot0_gripper_qpos": np.full(
                TEST_OBS_KEYS["robot0_gripper_qpos"], self._t, np.float32
            ),
        }

    def get_state(self):
        return {"states": self._state.copy()}

    def get_reward(self):
        return 1.0

    def get_goal(self):
        return self.get_observation()

    def set_goal(self, **kwargs):
        pass

    def is_done(self):
        return False

    def is_success(self):
        return {"task": self._t >= 5}

    @property
    def action_dimension(self):
        return TEST_AC_DIM

    @property
    def name(self):
        return self._env_name

    @property
    def type(self):
        return FAKE_ENV_TYPE

    def serialize(self):
        return dict(env_name=self._env_name, type=self.type, env_kwargs={})

    @classmethod
    def create_for_data_processing(cls, *args, **kwargs):
        return cls()


def register_fake_env():
    """Register ScriptedTestEnv for env type FAKE_ENV_TYPE so env metadata
    written by example_dataset_path resolves through the factory."""
    EnvUtils.register_env_class(FAKE_ENV_TYPE, ScriptedTestEnv)
    return ScriptedTestEnv


def example_dataset_path(dataset_dir=None, n_demos=4, T=14, seed=0):
    """Synthesize (once per directory) the tiny test dataset - the
    zero-egress analogue of the reference's downloaded test_v141.hdf5
    (test_utils.py:42-58). Includes obs/next_obs/rewards/dones plus
    train/valid filter keys."""
    import h5py

    if dataset_dir is None:
        dataset_dir = os.path.join(tempfile.gettempdir(), "rmvq_test_assets")
    os.makedirs(dataset_dir, exist_ok=True)
    path = os.path.join(dataset_dir, "test_synthetic.hdf5")
    if os.path.exists(path):
        return path
    register_fake_env()
    rng = np.random.RandomState(seed)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "ScriptedTestEnv", "type": FAKE_ENV_TYPE,
             "env_kwargs": {}}
        )
        for i in range(n_demos):
            ep = data.create_group(f"demo_{i}")
            ep.attrs["num_samples"] = T
            obs = ep.create_group("obs")
            next_obs = ep.create_group("next_obs")
            for k, d in TEST_OBS_KEYS.items():
                arr = rng.randn(T + 1, d).astype(np.float32)
                obs.create_dataset(k, data=arr[:-1])
                next_obs.create_dataset(k, data=arr[1:])
            ep.create_dataset(
                "actions",
                data=rng.uniform(-1, 1, (T, TEST_AC_DIM)).astype(np.float32),
            )
            rew = np.zeros(T, np.float64)
            rew[-1] = 1.0
            ep.create_dataset("rewards", data=rew)
            done = np.zeros(T, np.int64)
            done[-1] = 1
            ep.create_dataset("dones", data=done)
        mask = f.create_group("mask")
        train_demos = [f"demo_{i}".encode() for i in range(n_demos - 1)]
        mask.create_dataset("train", data=np.array(train_demos))
        mask.create_dataset(
            "valid", data=np.array([f"demo_{n_demos - 1}".encode()])
        )
    return path


def temp_model_dir_path():
    """Temporary model directory for test runs (reference :84-89)."""
    return os.path.join(tempfile.gettempdir(), "rmvq_tmp_model_dir")


def temp_dataset_path():
    return os.path.join(tempfile.gettempdir(), "rmvq_tmp.hdf5")


def temp_video_path():
    return os.path.join(tempfile.gettempdir(), "rmvq_tmp.mp4")


def get_base_config(algo_name):
    """Base config for testing algorithms (reference :104-151): tiny run -
    3 gradient steps, 1 epoch, 1 rollout of horizon 10, saving on."""
    register_fake_env()
    config = config_factory(algo_name)
    with config.values_unlocked():
        config.train.data = example_dataset_path()
        model_dir = temp_model_dir_path()
        maybe_remove_dir(model_dir)
        config.train.output_dir = model_dir

        config.experiment.name = "test"
        config.experiment.validate = True
        config.experiment.epoch_every_n_steps = 3
        config.experiment.validation_epoch_every_n_steps = 3
        config.train.num_epochs = 1
        config.train.num_data_workers = 0
        config.train.hdf5_cache_mode = "all"
        config.train.batch_size = 4
        config.train.hdf5_filter_key = "train"
        config.train.hdf5_validation_filter_key = "valid"
        config.train.action_config = {
            "actions": {"normalization": "min_max"}
        }

        config.experiment.save.enabled = True
        config.experiment.save.every_n_epochs = 1
        config.experiment.rollout.enabled = True
        config.experiment.rollout.rate = 1
        config.experiment.rollout.n = 1
        config.experiment.rollout.horizon = 10
        config.experiment.render_video = False  # no offscreen sim renderer
        config.experiment.logging.terminal_output_to_txt = False
        config.experiment.logging.log_tb = False
        config.experiment.logging.log_wandb = False

        # default the observation modalities to the synthetic dataset keys
        if algo_name == "hbc":
            blocks = [
                config.observation.actor.modalities.obs,
                config.observation.planner.modalities.obs,
                config.observation.planner.modalities.subgoal,
            ]
        elif algo_name == "iris":
            blocks = [
                config.observation.actor.modalities.obs,
                config.observation.value_planner.planner.modalities.obs,
                config.observation.value_planner.planner.modalities.subgoal,
                config.observation.value_planner.value.modalities.obs,
            ]
        else:
            blocks = [config.observation.modalities.obs]
        for blk in blocks:
            blk.low_dim = list(TEST_OBS_KEYS)
            blk.rgb = []
    return config


def config_from_modifier(base_config, config_modifier):
    """Load @base_config's algo defaults, update with it, then apply
    @config_modifier (reference :154-181)."""
    algo_name = base_config["algo_name"]
    config = config_factory(algo_name)
    with config.unlocked():
        config.update(base_config)
        config = config_modifier(config)
    return config


def checkpoint_path_from_test_run():
    """Path of the model checkpoint after a test run (reference :184-193)."""
    exp_dir = os.path.join(temp_model_dir_path(), "test")
    time_dir_names = [f.name for f in os.scandir(exp_dir) if f.is_dir()]
    assert len(time_dir_names) == 1
    path_to_models = os.path.join(exp_dir, time_dir_names[0], "models")
    epoch_name = sorted(
        f.name for f in os.scandir(path_to_models)
        if f.name.startswith("model")
    )[0]
    return os.path.join(path_to_models, epoch_name)


def test_eval_agent_from_checkpoint(ckpt_path):
    """Load policy + env from a checkpoint and run a short rollout
    (reference :196-216)."""
    register_fake_env()
    policy, ckpt_dict = FileUtils.policy_from_checkpoint(ckpt_path=ckpt_path)
    env, _ = FileUtils.env_from_checkpoint(ckpt_dict=ckpt_dict)
    ob_dict = env.reset()
    policy.start_episode()
    for _ in range(15):
        ac = policy(ob=ob_dict)
        ob_dict, r, done, _ = env.step(ac)


def test_run(base_config, config_modifier):
    """Run training as a test, then reload the checkpoint and roll out
    (reference :219-264). Returns "passed!" or a traceback string."""
    from robot_manipulation_vq_vae_tpu.scripts.train import train

    try:
        config = config_from_modifier(
            base_config=base_config, config_modifier=config_modifier
        )
        config.lock()
        train(config)
        ckpt_path = checkpoint_path_from_test_run()
        test_eval_agent_from_checkpoint(ckpt_path)
        ret = "passed!"
    except Exception as e:
        ret = "failed with error:\n{}\n\n{}".format(e, traceback.format_exc())
    maybe_remove_dir(temp_model_dir_path())
    return ret
