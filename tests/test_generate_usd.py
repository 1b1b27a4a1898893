"""generate_usd_trajectories exercised pxr/sim-free with injected env and
exporter factories: hdf5 iteration, episode ordering/selection flags,
per-frame streaming, per-layout front-camera + light enrichment, and the
episode output layout (reference
``robocasa/scripts/generate_usd_trajectories.py:57-263``)."""

import json

import h5py
import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu.scripts.generate_usd_trajectories import (
    FRONT_CAMERA_ANGLE,
    FRONT_CAMERA_POS,
    build_parser,
    main,
)

STATE_DIM, A, T = 4, 3, 5


class _FakeSimHandle:
    class _Model:
        _model = "model-handle"

    class _Data:
        _data = "data-handle"

    model = _Model()
    data = _Data()


class FakeUSDEnv:
    """Mimics the EnvRobosuite surface the script touches."""

    def __init__(self):
        self.env = type("Inner", (), {"sim": _FakeSimHandle()})()
        self.reset_calls = 0
        self.reset_to_states = []
        self.stepped_actions = []

    def reset(self):
        self.reset_calls += 1

    def reset_to(self, state):
        self.reset_to_states.append(np.asarray(state["states"]).copy())

    def step(self, action):
        self.stepped_actions.append(np.asarray(action).copy())
        return {}, 0.0, False, {}


class FakeExporter:
    instances = []

    def __init__(self, model, args, episode, output_dir):
        self.model = model
        self.episode = episode
        self.output_dir = output_dir
        self.updates = 0
        self.cameras = []
        self.lights = []
        self.saved = None
        FakeExporter.instances.append(self)

    def update_scene(self, data, scene_option=None):
        assert data == "data-handle"
        self.updates += 1

    def add_camera(self, pos, rotation_xyz, obj_name="camera_1"):
        self.cameras.append((tuple(pos), tuple(rotation_xyz), obj_name))

    def add_light(self, pos, intensity, obj_name="light_1"):
        self.lights.append((tuple(pos), intensity, obj_name))

    def save_scene(self, filetype="usd"):
        self.saved = filetype


def make_dataset(path, n_demos=3, layout_id=2):
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "FakeKitchen", "type": 1, "env_kwargs": {}}
        )
        # non-contiguous, out-of-alpha-order ids to test numeric sorting
        for i in (0, 2, 10)[:n_demos]:
            g = data.create_group(f"demo_{i}")
            g.create_dataset(
                "states", data=rng.rand(T, STATE_DIM).astype(np.float32)
            )
            g.create_dataset(
                "actions", data=rng.rand(T, A).astype(np.float32)
            )
            g.attrs["model_file"] = "<mujoco/>"
            g.attrs["ep_meta"] = json.dumps({"layout_id": layout_id})
        mask = f.create_group("mask")
        mask.create_dataset(
            "valid", data=np.array([b"demo_0", b"demo_10"], dtype="S8")
        )
    return path


@pytest.fixture()
def dataset(tmp_path):
    return make_dataset(str(tmp_path / "demo.hdf5"))


def _run(dataset, extra, env=None):
    FakeExporter.instances = []
    env = env or FakeUSDEnv()
    args = build_parser().parse_args(
        ["--dataset", dataset] + extra
    )
    exported = main(
        args,
        env_factory=lambda meta, a: env,
        exporter_factory=FakeExporter,
    )
    return exported, env


def test_state_replay_streaming_and_enrichment(dataset, tmp_path):
    out_dir = str(tmp_path / "usd_out")
    exported, env = _run(dataset, ["--output_dir", out_dir])
    # numeric episode ordering (not alphabetical, which would give 0,10,2)
    assert exported == ["demo_0", "demo_2", "demo_10"]
    assert len(FakeExporter.instances) == 3
    for ex in FakeExporter.instances:
        assert ex.model == "model-handle"
        assert ex.output_dir == out_dir
        assert ex.updates == T          # one update_scene per stored state
        assert ex.saved == "usd"
        # layout-2 front camera from the reference placement table
        assert ex.cameras == [
            (FRONT_CAMERA_POS[2], FRONT_CAMERA_ANGLE[2], "frontview")
        ]
        assert len(ex.lights) == 1 and ex.lights[0][1] == 4000
    # reset() + reset_to(init) + T per-frame reset_to per episode
    assert env.reset_calls == 3
    assert len(env.reset_to_states) == 3 * (1 + T)
    assert not env.stepped_actions


def test_selection_flags(dataset):
    exported, _ = _run(dataset, ["--filter_key", "valid"])
    assert exported == ["demo_0", "demo_10"]
    exported, _ = _run(dataset, ["--demo_key", "2"])
    assert exported == ["demo_2"]
    exported, _ = _run(dataset, ["--n", "1"])
    assert exported == ["demo_0"]


def test_first_frame_only(dataset):
    _run(dataset, ["--first"])
    assert all(ex.updates == 1 for ex in FakeExporter.instances)


def test_open_loop_action_playback(dataset):
    exported, env = _run(dataset, ["--use-actions", "--n", "1"])
    # frame 0 from the initial state, then T-1 env.step calls
    assert len(env.stepped_actions) == T - 1
    assert FakeExporter.instances[0].updates == T


def test_default_output_dir_naming(dataset):
    exported, _ = _run(dataset, [])
    assert FakeExporter.instances[0].output_dir == (
        dataset.split(".hdf5")[0] + "_usd"
    )
