"""Rollout-harness integration: a FakeEnv implementing the EnvBase protocol
drives FrameStackWrapper + run_rollout/rollout_with_stats + ICLRolloutPolicy
(including action unnormalization and rot_6d runtime conversion) and the
subprocess vector env."""

import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu.envs.env_base import EnvBase, EnvType
from robot_manipulation_vq_vae_tpu.envs.wrappers import FrameStackWrapper
from robot_manipulation_vq_vae_tpu.envs.vector_env import SubprocVectorEnv

A = 7
OBS_KEYS = {"robot0_eef_pos": (5,), "robot0_gripper_qpos": (2,)}


class FakeEnv(EnvBase):
    """Deterministic point-mass-ish env: obs evolve with the action norm;
    success when enough steps elapse."""

    def __init__(self, env_name="FakeEnv", render=False, render_offscreen=False,
                 use_image_obs=False, use_depth_obs=False,
                 postprocess_visual_obs=True, **kwargs):
        self._env_name = env_name
        self._t = 0
        self._state = np.zeros(5, np.float32)

    def step(self, action):
        assert action.shape == (A,)
        self._t += 1
        self._state = self._state + 0.01 * float(np.linalg.norm(action))
        return self.get_observation(), 1.0, False, {}

    def reset(self):
        self._t = 0
        self._state = np.zeros(5, np.float32)
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
            "robot0_gripper_qpos": np.full(2, self._t, np.float32),
        }

    def get_state(self):
        return {"states": self._state.copy()}

    def get_reward(self):
        return 1.0

    def get_goal(self):
        raise NotImplementedError

    def set_goal(self, **kwargs):
        raise NotImplementedError

    def is_done(self):
        return False

    def is_success(self):
        return {"task": self._t >= 5}

    @property
    def action_dimension(self):
        return A

    @property
    def name(self):
        return self._env_name

    @property
    def type(self):
        return EnvType.GYM_TYPE

    def serialize(self):
        return dict(env_name=self._env_name, type=self.type, env_kwargs={})

    @classmethod
    def create_for_data_processing(cls, *args, **kwargs):
        return cls()


class FakePolicy:
    """Stands in for an Algo: emits normalized rot_6d-style actions."""

    class _GC:
        class train:
            action_keys = ["action_dict/rel_pos", "action_dict/rel_rot_6d",
                           "action_dict/gripper"]
            action_config = {
                "action_dict/rel_pos": {"normalization": None},
                "action_dict/rel_rot_6d": {"normalization": None,
                                            "format": "rot_6d"},
                "action_dict/gripper": {"normalization": None},
            }

    global_config = _GC

    def __init__(self):
        self.calls = 0

    def set_eval(self):
        pass

    def reset(self):
        pass

    def get_action(self, obs_dict, context_batch=None, goal_dict=None):
        self.calls += 1
        b = next(iter(obs_dict.values())).shape[0]
        # 3 pos + 6 rot_6d + 1 gripper = 10-dim normalized action vector
        ac = np.zeros((b, 10), np.float32)
        ac[:, 3] = 1.0  # rot_6d identity-ish rows
        ac[:, 7] = 1.0
        return ac


def test_frame_stack_wrapper():
    env = FrameStackWrapper(FakeEnv(), num_frames=4)
    obs = env.reset()
    assert obs["robot0_eef_pos"].shape == (4, 5)
    obs, r, done, _ = env.step(np.ones(A, np.float32))
    assert obs["robot0_gripper_qpos"][-1, 0] == 1  # newest frame last
    assert obs["robot0_gripper_qpos"][0, 0] == 0


def test_run_rollout_and_stats(tmp_path):
    from robot_manipulation_vq_vae_tpu.algo.algo import ICLRolloutPolicy
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
    from robot_manipulation_vq_vae_tpu.utils import train_utils as TrainUtils

    ObsUtils.initialize_obs_utils_with_obs_specs(
        {"obs": {"low_dim": list(OBS_KEYS)}}
    )
    algo = FakePolicy()
    # action stats: identity normalization but exercises the vector->dict->
    # rot_6d conversion->vector path
    stats = {
        "action_dict/rel_pos": {"scale": np.ones((1, 3), np.float32),
                                 "offset": np.zeros((1, 3), np.float32)},
        "action_dict/rel_rot_6d": {"scale": np.ones((1, 6), np.float32),
                                    "offset": np.zeros((1, 6), np.float32)},
        "action_dict/gripper": {"scale": np.ones((1, 1), np.float32),
                                 "offset": np.zeros((1, 1), np.float32)},
    }
    policy = ICLRolloutPolicy(algo, action_normalization_stats=stats)
    env = FrameStackWrapper(FakeEnv(), num_frames=4)
    ctx = {"actions": np.zeros((1, 4, 10), np.float32)}

    result = TrainUtils.run_rollout(
        policy=policy, env=env, horizon=8, context_batch=ctx,
        terminate_on_success=True,
    )
    # rot_6d (6 dims) converts to axis-angle (3): action becomes 3+3+1=7
    assert result["Success_Rate"] == 1.0
    assert result["Horizon"] == 5  # success at t=5 with terminate_on_success
    assert algo.calls == 5

    logs, _ = TrainUtils.rollout_with_stats(
        policy=policy, envs={"FakeEnv": env}, horizon=8, context_batch=ctx,
        num_episodes=2, terminate_on_success=True,
        video_dir=str(tmp_path), epoch=1,
    )
    assert logs["FakeEnv"]["Success_Rate"] == 1.0
    assert "Time_Episode" in logs["FakeEnv"]


def test_subproc_vector_env():
    venv = SubprocVectorEnv([FakeEnv for _ in range(3)])
    obs = venv.reset()
    assert len(obs) == 3
    actions = np.ones((3, A), np.float32)
    obs, rews, dones, infos = venv.step(actions)
    assert rews.shape == (3,)
    succ = venv.is_success()
    assert all(s["task"] is False for s in succ)
    for _ in range(5):
        venv.step(actions)
    succ = venv.is_success()
    assert all(s["task"] for s in succ)
    venv.close()


def test_batched_rollout_with_stats():
    """SubprocVectorEnv path: one batched policy query steps every env in
    lockstep (reference train_utils batched rollouts over tianshou)."""
    from robot_manipulation_vq_vae_tpu.algo.algo import ICLRolloutPolicy
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
    from robot_manipulation_vq_vae_tpu.utils import train_utils as TrainUtils

    ObsUtils.initialize_obs_utils_with_obs_specs(
        {"obs": {"low_dim": list(OBS_KEYS)}}
    )
    algo = FakePolicy()
    stats = {
        "action_dict/rel_pos": {"scale": np.ones((1, 3), np.float32),
                                 "offset": np.zeros((1, 3), np.float32)},
        "action_dict/rel_rot_6d": {"scale": np.ones((1, 6), np.float32),
                                    "offset": np.zeros((1, 6), np.float32)},
        "action_dict/gripper": {"scale": np.ones((1, 1), np.float32),
                                 "offset": np.zeros((1, 1), np.float32)},
    }
    policy = ICLRolloutPolicy(algo, action_normalization_stats=stats)
    venv = SubprocVectorEnv(
        [lambda: FrameStackWrapper(FakeEnv(), num_frames=4)] * 3
    )
    ctx = {"actions": np.zeros((1, 4, 10), np.float32)}

    infos = TrainUtils.run_batched_rollout(
        policy=policy, venv=venv, horizon=8, context_batch=ctx,
        terminate_on_success=True,
    )
    assert len(infos) == 3
    for info in infos:
        assert info["Success_Rate"] == 1.0
        assert info["Horizon"] == 5
    # 5 steps, each ONE batched policy query (not 3)
    assert algo.calls == 5

    # through rollout_with_stats: 5 requested episodes -> 2 passes of 3
    logs, _ = TrainUtils.rollout_with_stats(
        policy=policy, envs={"FakeEnv": venv}, horizon=8, context_batch=ctx,
        num_episodes=5, terminate_on_success=True,
    )
    assert logs["FakeEnv"]["Success_Rate"] == 1.0
    venv.close()


def test_shared_obs_transport_equivalence():
    """shared_obs=True: workers write observations into one shm-backed
    batch array instead of pickling them through pipes. Obs values, rollout
    results, and policy-call counts must be identical to the pipe path."""
    from robot_manipulation_vq_vae_tpu.algo.algo import ICLRolloutPolicy
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
    from robot_manipulation_vq_vae_tpu.utils import train_utils as TrainUtils

    ObsUtils.initialize_obs_utils_with_obs_specs(
        {"obs": {"low_dim": list(OBS_KEYS)}}
    )

    def make():
        return FrameStackWrapper(FakeEnv(), num_frames=4)

    # raw transport equality: same deterministic env, both transports
    v_pipe = SubprocVectorEnv([make] * 3)
    v_shm = SubprocVectorEnv([make] * 3, shared_obs=True)
    ob_p = v_pipe.reset_batched()
    ob_s = v_shm.reset_batched()
    assert set(ob_p) == set(ob_s)
    for k in ob_p:
        np.testing.assert_array_equal(np.asarray(ob_p[k]), np.asarray(ob_s[k]))
    actions = np.full((3, A), 0.5, np.float32)
    for _ in range(3):
        ob_p, r_p, d_p, _ = v_pipe.step_batched(actions)
        ob_s, r_s, d_s, _ = v_shm.step_batched(actions)
        np.testing.assert_array_equal(r_p, r_s)
        for k in ob_p:
            np.testing.assert_array_equal(
                np.asarray(ob_p[k]), np.asarray(ob_s[k])
            )
    # per-env view API stays available under shm too
    obs_list = v_shm.step(actions)[0]
    assert len(obs_list) == 3
    v_pipe.close()
    v_shm.close()

    # full rollout through the shm pool (same stats wiring as the pipe-path
    # test above: rot_6d conversion maps the 10-dim policy output to A=7)
    algo = FakePolicy()
    stats = {
        "action_dict/rel_pos": {"scale": np.ones((1, 3), np.float32),
                                "offset": np.zeros((1, 3), np.float32)},
        "action_dict/rel_rot_6d": {"scale": np.ones((1, 6), np.float32),
                                   "offset": np.zeros((1, 6), np.float32)},
        "action_dict/gripper": {"scale": np.ones((1, 1), np.float32),
                                "offset": np.zeros((1, 1), np.float32)},
    }
    policy = ICLRolloutPolicy(algo, action_normalization_stats=stats)
    venv = SubprocVectorEnv([make] * 3, shared_obs=True)
    ctx = {"actions": np.zeros((1, 4, 10), np.float32)}
    infos = TrainUtils.run_batched_rollout(
        policy=policy, venv=venv, horizon=8, context_batch=ctx,
        terminate_on_success=True,
    )
    venv.close()
    assert len(infos) == 3
    for info in infos:
        assert info["Success_Rate"] == 1.0
        assert info["Horizon"] == 5
    assert algo.calls == 5
