"""EnvRobosuite exercised against a structural mock of the robosuite API.

The real sim stack is host-only and absent from this image (VERDICT
missing-item 4); this is the closest executable coverage: every protocol
method (reset_to with model xml + flattened sim state, get_state roundtrip,
create_for_data_processing camera threading, is_success dict semantics,
obs flipping/processing, serialize) runs through the actual wrapper code
against a mock that mimics robosuite's surface
(reference ``robomimic/envs/env_robosuite.py:22-470``)."""

import sys
import types

import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils

STATE_DIM, A, IMG = 7, 5, 12


class MockSimState:
    def __init__(self, vec):
        self._vec = np.asarray(vec, np.float64)

    def flatten(self):
        return self._vec.copy()


class MockSim:
    def __init__(self):
        self.state = np.zeros(STATE_DIM)
        self.reset_count = 0

    class _Model:
        @staticmethod
        def get_xml():
            return "<mujoco><current/></mujoco>"

    model = _Model()

    def reset(self):
        self.reset_count += 1

    def get_state(self):
        return MockSimState(self.state)

    def set_state_from_flattened(self, vec):
        self.state = np.asarray(vec, np.float64).copy()

    def forward(self):
        pass

    def render(self, height=None, width=None, camera_name=None):
        return np.full((height, width, 3), 7, np.uint8)


class MockRobosuiteEnv:
    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.sim = MockSim()
        self.xml_loaded = None
        self._t = 0

    def _obs(self):
        img = np.arange(IMG * IMG * 3, dtype=np.uint8).reshape(IMG, IMG, 3)
        return {
            "robot0_eef_pos": self.sim.state[:3].astype(np.float32),
            "robot0_proprio-state": np.ones(4, np.float32),
            "agentview_image": img,
            "object-state": np.zeros(3, np.float32),  # unregistered key
        }

    def reset(self):
        self.sim.state = np.zeros(STATE_DIM)
        return self._obs()

    def reset_from_xml_string(self, xml):
        self.xml_loaded = xml

    def edit_model_xml(self, xml):
        return xml.replace("<raw/>", "<edited/>")

    def step(self, action):
        self._t += 1
        self.sim.state = self.sim.state + 1.0
        return self._obs(), 0.5, False, {"info": 1}

    def _get_observations(self, force_update=False):
        return self._obs()

    def reward(self):
        return float(self.sim.state[0])

    def _check_success(self):
        return self.sim.state[0] > 2.0

    @property
    def action_spec(self):
        return np.zeros(A), np.ones(A)


@pytest.fixture()
def mock_robosuite(monkeypatch):
    mod = types.ModuleType("robosuite")
    mod.__version__ = "1.5.0-mock"
    made = []

    def make(env_name, **kwargs):
        env = MockRobosuiteEnv(env_name=env_name, **kwargs)
        made.append(env)
        return env

    mod.make = make
    mod._made = made
    monkeypatch.setitem(sys.modules, "robosuite", mod)
    ObsUtils.initialize_obs_utils_with_obs_specs(
        {"obs": {"low_dim": ["robot0_eef_pos"], "rgb": ["agentview_image"]}}
    )
    return mod


def test_factory_and_obs_processing(mock_robosuite):
    from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils

    env_meta = {
        "env_name": "PnPCounterToCab",
        "type": 1,
        "env_kwargs": {"robots": "PandaMobile"},
    }
    env = EnvUtils.create_env_from_metadata(env_meta, use_image_obs=True)
    assert EnvUtils.is_robosuite_env(env_meta)
    inner = mock_robosuite._made[-1]
    assert inner.kwargs["robots"] == "PandaMobile"
    assert inner.kwargs["use_camera_obs"] is True
    assert inner.kwargs["ignore_done"] is True

    obs = env.reset()
    # registered keys kept; proprio kept; unregistered dropped
    assert set(obs) == {"robot0_eef_pos", "robot0_proprio-state",
                        "agentview_image"}
    # rgb flipped vertically then processed (float [0,1] by process_obs)
    raw = inner._obs()["agentview_image"]
    flipped = raw[::-1]
    np.testing.assert_allclose(
        np.asarray(obs["agentview_image"]),
        flipped.astype(np.float32) / 255.0, atol=1e-6,
    )

    obs2, r, done, info = env.step(np.zeros(A))
    assert r == 0.5 and done is False
    assert env.action_dimension == A
    assert env.name == "PnPCounterToCab"


def test_reset_to_semantics(mock_robosuite):
    from robot_manipulation_vq_vae_tpu.envs.env_robosuite import EnvRobosuite

    env = EnvRobosuite("Lift")
    inner = mock_robosuite._made[-1]

    # model xml: edited + loaded + sim reset; returns None without states
    out = env.reset_to({"model": "<mujoco><raw/></mujoco>"})
    assert out is None
    assert inner.xml_loaded == "<mujoco><edited/></mujoco>"
    assert inner.sim.reset_count == 1

    # states: set + forward + returns an observation
    vec = np.arange(STATE_DIM, dtype=np.float64)
    out = env.reset_to({"states": vec})
    assert out is not None
    np.testing.assert_array_equal(inner.sim.state, vec)

    # get_state roundtrip
    state = env.get_state()
    assert state["model"] == "<mujoco><current/></mujoco>"
    np.testing.assert_array_equal(state["states"], vec)
    env.reset_to({"states": state["states"]})
    np.testing.assert_array_equal(inner.sim.state, vec)


def test_success_reward_serialize(mock_robosuite):
    from robot_manipulation_vq_vae_tpu.envs.env_robosuite import EnvRobosuite

    env = EnvRobosuite("Lift", robots="Panda")
    inner = mock_robosuite._made[-1]
    assert env.is_success() == {"task": False}
    inner.sim.state = np.full(STATE_DIM, 5.0)
    assert env.is_success() == {"task": True}
    assert env.get_reward() == 5.0

    blob = env.serialize()
    assert blob["env_name"] == "Lift"
    assert blob["env_version"] == "1.5.0-mock"
    assert blob["env_kwargs"] == {"robots": "Panda"}
    assert isinstance(env.rollout_exceptions, tuple)


def test_create_for_data_processing(mock_robosuite):
    from robot_manipulation_vq_vae_tpu.envs.env_robosuite import EnvRobosuite

    env = EnvRobosuite.create_for_data_processing(
        env_name="Kitchen", camera_names=["agentview"], camera_height=48,
        camera_width=64, reward_shaping=True,
    )
    inner = mock_robosuite._made[-1]
    assert inner.kwargs["camera_names"] == ["agentview"]
    assert inner.kwargs["camera_heights"] == 48
    assert inner.kwargs["camera_widths"] == 64
    assert inner.kwargs["reward_shaping"] is True
    assert inner.kwargs["use_camera_obs"] is True
    # data-processing envs keep raw uint8 (postprocess off)
    obs = env.reset()
    assert obs["agentview_image"].dtype == np.uint8

    # low-dim-only variant: no cameras
    EnvRobosuite.create_for_data_processing(
        env_name="Kitchen", camera_names=[], camera_height=48,
        camera_width=64, reward_shaping=False,
    )
    inner = mock_robosuite._made[-1]
    assert inner.kwargs["use_camera_obs"] is False


def test_render_modes(mock_robosuite):
    from robot_manipulation_vq_vae_tpu.envs.env_robosuite import EnvRobosuite

    env = EnvRobosuite("Lift")
    im = env.render(mode="rgb_array", height=8, width=6, camera_name="agentview")
    assert im.shape == (8, 6, 3)
    with pytest.raises(NotImplementedError):
        env.render(mode="weird")


@pytest.mark.slow
def test_rollout_policy_roundtrip(mock_robosuite):
    """Policy get_action -> EnvRobosuite step protocol roundtrip through the
    real rollout harness (VERDICT weak-5)."""
    from robot_manipulation_vq_vae_tpu.config import config_factory
    from robot_manipulation_vq_vae_tpu.envs.env_robosuite import EnvRobosuite
    from robot_manipulation_vq_vae_tpu.utils import train_utils as TrainUtils
    import robot_manipulation_vq_vae_tpu.algo as AlgoReg

    config = config_factory("bc")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = ["robot0_eef_pos"]
        config.observation.modalities.obs.rgb = []
        config.train.seed = 0
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)

    algo = AlgoReg.algo_factory(
        "bc", config, obs_key_shapes={"robot0_eef_pos": (3,)}, ac_dim=A
    )
    rng = np.random.RandomState(0)
    batch = algo.process_batch_for_training({
        "obs": {"robot0_eef_pos": rng.randn(4, 1, 3).astype(np.float32)},
        "actions": rng.randn(4, 1, A).astype(np.float32),
    })
    algo.train_on_batch(batch, epoch=0)

    policy = AlgoReg.RolloutPolicy(algo)
    env = EnvRobosuite("Lift")
    results = TrainUtils.run_rollout(
        policy, env, horizon=5, terminate_on_success=True
    )
    assert results["Horizon"] >= 3  # success latches at state > 2.0
    assert results["Success_Rate"] == 1.0
