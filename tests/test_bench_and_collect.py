"""Sim-free coverage of bench_speed (single + SubprocVectorEnv pool) and
collect_demos (teleop episode state machine: idle skipping, success latch,
reset discard, HDF5 output)."""

import json

import h5py
import numpy as np

from robot_manipulation_vq_vae_tpu.scripts.bench_speed import (
    bench,
    build_parser as bench_parser,
    run_rollout,
)
from robot_manipulation_vq_vae_tpu.scripts.collect_demos import (
    collect_demos,
    collect_trajectory,
    is_empty_input,
)

STATE_DIM, A = 3, 4


class FakeBenchEnv:
    action_dimension = A

    def __init__(self):
        self.reset_count = 0
        self.step_count = 0

    def reset(self):
        self.reset_count += 1
        return {}

    def step(self, action):
        self.step_count += 1
        return {}, 0.0, False, {}


def test_run_rollout_counts():
    env = FakeBenchEnv()
    reset_time, fps = run_rollout(env, num_steps=25)
    assert env.reset_count == 1 and env.step_count == 25
    assert reset_time >= 0 and fps > 0


def test_bench_single_env():
    args = bench_parser().parse_args(["--episodes", "2", "--steps", "10"])
    envs = []

    def factory(a):
        envs.append(FakeBenchEnv())
        return envs[-1]

    mean_reset, mean_fps = bench(args, env_factory=factory)
    assert len(envs) == 1
    assert envs[0].reset_count == 2
    assert envs[0].step_count == 20
    assert mean_fps > 0


class _PickleableBenchEnv(FakeBenchEnv):
    pass


def _pickleable_factory(args):
    return _PickleableBenchEnv()


def test_bench_vector_pool():
    args = bench_parser().parse_args(
        ["--num_envs", "2", "--episodes", "1", "--steps", "5"]
    )
    mean_reset, mean_fps = bench(args, env_factory=_pickleable_factory)
    assert mean_fps > 0  # pool-wide fps (scaled by num_envs)


# ---------------------------------------------------------------------------
# collect_demos
# ---------------------------------------------------------------------------

class FakeTeleopEnv:
    """Success begins at step @success_at and stays on."""

    def __init__(self, success_at=3):
        self._t = 0
        self._success_at = success_at

    def reset(self):
        self._t = 0
        return {}

    def get_ep_meta(self):
        return {"lang": "pick the mug"}

    def get_state(self):
        return {"states": np.full(STATE_DIM, float(self._t)),
                "model": "<mujoco/>"}

    def step(self, action):
        self._t += 1
        return {}, 0.0, False, {}

    def is_success(self):
        return {"task": self._t >= self._success_at}

    def serialize(self):
        return {"env_name": "FakeTeleop", "type": 99, "env_kwargs": {}}


class ScriptedDevice:
    """Feeds a scripted list of input dicts; None = reset request."""

    active_robot = 0
    active_arm = "right"

    def __init__(self, script):
        self.script = list(script)

    def start_control(self):
        pass

    def input2action(self, mirror_actions=True):
        if not self.script:
            return None
        return self.script.pop(0)


def _ac(v):
    return {"actions": np.full(A, float(v)), "right_delta": np.ones(3),
            "base_mode": -1, "base": np.zeros(3)}


def _idle():
    return {"right_delta": np.zeros(3), "base_mode": -1, "base": np.zeros(3)}


def test_success_latch_runs_hold_steps():
    """Break only after success holds for success_hold consecutive steps."""
    env = FakeTeleopEnv(success_at=2)
    device = ScriptedDevice([_ac(i) for i in range(100)])
    states, acts, ep_meta, discarded = collect_trajectory(
        env, device, max_fr=None, success_hold=5
    )
    assert not discarded
    assert ep_meta["lang"] == "pick the mug"
    # success first True after step 2; latch set to 5 then counts down
    # 5,4,3,2,1,0 -> 8 total steps
    assert len(acts) == 8
    np.testing.assert_array_equal(states[:, 0], np.arange(8))


def test_idle_frames_skipped_until_first_input():
    env = FakeTeleopEnv(success_at=1)
    device = ScriptedDevice([_idle(), _idle(), _ac(1), _ac(2), _ac(3)] +
                            [_ac(9)] * 20)
    states, acts, _, discarded = collect_trajectory(
        env, device, max_fr=None, success_hold=1
    )
    assert not discarded
    # idle frames consumed without stepping the env
    np.testing.assert_array_equal(acts[0], np.full(A, 1.0))


def test_reset_discards():
    env = FakeTeleopEnv(success_at=100)
    device = ScriptedDevice([_ac(1), _ac(2), None])
    _, acts, _, discarded = collect_trajectory(env, device, max_fr=None)
    assert discarded and len(acts) == 2


def test_collect_demos_writes_hdf5(tmp_path):
    out = str(tmp_path / "run" / "demo.hdf5")
    env = FakeTeleopEnv(success_at=2)
    # episode 1 discarded (reset), then 2 successful episodes
    script = [_ac(1), None]
    for _ in range(2):
        script += [_ac(i) for i in range(40)]
    device = ScriptedDevice(script)
    n = collect_demos(env, device, out, num_demos=2, max_fr=None)
    assert n == 2
    with h5py.File(out) as f:
        assert sorted(f["data"].keys()) == ["demo_0", "demo_1"]
        meta = json.loads(f["data/demo_0"].attrs["ep_meta"])
        assert meta["lang"] == "pick the mug"
        assert f["data/demo_0"].attrs["model_file"] == "<mujoco/>"
        assert json.loads(f["data"].attrs["env_args"])["env_name"] == (
            "FakeTeleop"
        )
        assert f["data"].attrs["total"] == sum(
            f[f"data/{d}/actions"].shape[0] for d in f["data"]
        )


def test_is_empty_input():
    assert is_empty_input(_idle())
    assert not is_empty_input(_ac(1))
    assert not is_empty_input(
        {"right_delta": np.zeros(3), "base_mode": 1, "base": np.zeros(3)}
    )
