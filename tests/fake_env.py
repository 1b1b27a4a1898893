"""A deterministic EnvBase-protocol fake env, importable (and therefore
picklable for SubprocVectorEnv) by any test. Registered under
FAKE_ENV_TYPE via EnvUtils.register_env_class so scripts/train.py's
create_env_from_metadata can build it from dataset env_args - the sim-free
analogue of the reference's tiny-real-dataset + real-env test harness
(reference robomimic/utils/test_utils.py:42-153)."""

import numpy as np

from robot_manipulation_vq_vae_tpu.envs.env_base import EnvBase
import robot_manipulation_vq_vae_tpu.utils.env_utils as EnvUtils

FAKE_ENV_TYPE = 77  # anything not colliding with EnvType constants
A = 7
OBS_KEYS = {"robot0_eef_pos": 5, "robot0_gripper_qpos": 2}


class FakeEnv(EnvBase):
    """Point-mass-ish env: obs evolve with the action norm; success when
    enough steps elapse."""

    def __init__(self, env_name="FakeEnv", render=False,
                 render_offscreen=False, use_image_obs=False,
                 use_depth_obs=False, postprocess_visual_obs=True,
                 ac_dim=A, **kwargs):
        self._env_name = env_name
        self._ac_dim = ac_dim
        self._t = 0
        self._state = np.zeros(OBS_KEYS["robot0_eef_pos"], np.float32)

    def step(self, action):
        action = np.asarray(action)
        assert action.shape == (self._ac_dim,), action.shape
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
                OBS_KEYS["robot0_gripper_qpos"], self._t, np.float32
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
        return self._ac_dim

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


EnvUtils.register_env_class(FAKE_ENV_TYPE, FakeEnv)
