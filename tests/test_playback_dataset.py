"""playback_dataset script: obs/state/action playback modes driven sim-free
through injected env and video-writer factories (reference
``robomimic/scripts/playback_dataset.py:81-392``)."""

import json

import h5py
import numpy as np

from robot_manipulation_vq_vae_tpu.scripts.playback_dataset import (
    build_parser,
    playback_dataset,
    playback_trajectory_with_env,
)

STATE_DIM, A, T = 4, 3, 6


class FrameCollector:
    def __init__(self, path=None):
        self.frames = []
        self.closed = False

    def append_data(self, frame):
        self.frames.append(np.asarray(frame))

    def close(self):
        self.closed = True


class FakePlaybackEnv:
    """reset_to/step/render/get_state against a scalar-coded state."""

    def __init__(self, divergent=False):
        self._state = np.zeros(STATE_DIM, np.float32)
        self._divergent = divergent

    def reset_to(self, state):
        self._state = np.asarray(state["states"], np.float32)
        return {}

    def step(self, action):
        self._state = self._state + 1.0
        if self._divergent:
            self._state = self._state + 0.5
        return {}, 0.0, False, {}

    def get_state(self):
        return {"states": self._state.copy()}

    def render(self, mode="rgb_array", height=512, width=512,
               camera_name=None):
        v = int(abs(float(self._state[0]))) % 255
        return np.full((4, 4, 3), v, np.uint8)


def make_dataset(path, n_demos=3, with_images=True, robosuite=False):
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "Fake", "type": 1 if robosuite else 2,
             "env_kwargs": {}}
        )
        for i in range(n_demos):
            g = data.create_group(f"demo_{i}")
            states = np.tile(
                np.arange(T, dtype=np.float32)[:, None], (1, STATE_DIM)
            )
            g.create_dataset("states", data=states)
            g.create_dataset("actions", data=np.ones((T, A), np.float32))
            g.attrs["num_samples"] = T
            if robosuite:
                g.attrs["model_file"] = "<mujoco/>"
            if with_images:
                g.create_dataset(
                    "obs/cam_image",
                    data=rng.randint(0, 255, (T, 4, 4, 3), dtype=np.uint8),
                )
        mask = f.create_group("mask")
        mask.create_dataset("sub", data=np.array([b"demo_1"], dtype="S8"))
    return path


def parse(extra, dataset, video):
    return build_parser().parse_args(
        ["--dataset", str(dataset), "--video_path", str(video)] + extra
    )


def run_playback(args, divergent=False):
    writers = []

    def writer_factory(path):
        w = FrameCollector(path)
        writers.append(w)
        return w

    playback_dataset(
        args,
        env_factory=lambda meta, a: FakePlaybackEnv(divergent=divergent),
        video_writer_factory=writer_factory,
    )
    return writers


def test_use_obs_playback(tmp_path):
    ds = make_dataset(str(tmp_path / "d.hdf5"))
    args = parse(["--use-obs", "--render_image_names", "cam",
                  "--video_skip", "2"], ds, tmp_path / "v.mp4")
    (writer,) = run_playback(args)
    assert writer.closed
    # 3 demos x ceil(6/2) frames
    assert len(writer.frames) == 9
    assert writer.frames[0].shape == (4, 4, 3)


def test_state_playback_with_env(tmp_path):
    ds = make_dataset(str(tmp_path / "d.hdf5"))
    args = parse(["--render_image_names", "cam", "--video_skip", "1"],
                 ds, tmp_path / "v.mp4")
    (writer,) = run_playback(args)
    assert len(writer.frames) == 3 * T
    # frames follow the stored state sequence 0..T-1
    firsts = [int(f[0, 0, 0]) for f in writer.frames[:T]]
    assert firsts == list(range(T))


def test_action_playback_divergence_warns(tmp_path, capsys):
    ds = make_dataset(str(tmp_path / "d.hdf5"))
    args = parse(["--use-actions", "--render_image_names", "cam"],
                 ds, tmp_path / "v.mp4")
    run_playback(args, divergent=True)
    assert "playback diverged" in capsys.readouterr().out

    # non-divergent env: step adds exactly 1.0 = the recorded state delta
    run_playback(
        parse(["--use-actions", "--render_image_names", "cam"],
              ds, tmp_path / "v2.mp4")
    )
    assert "playback diverged" not in capsys.readouterr().out


def test_first_and_filter_key(tmp_path):
    ds = make_dataset(str(tmp_path / "d.hdf5"))
    args = parse(["--use-obs", "--render_image_names", "cam", "--first",
                  "--filter_key", "sub"], ds, tmp_path / "v.mp4")
    (writer,) = run_playback(args)
    assert len(writer.frames) == 1  # one demo (filter), first frame only


def test_r2d2_flat_format(tmp_path):
    path = str(tmp_path / "flat.hdf5")
    rng = np.random.RandomState(1)
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "obs/cam_image",
            data=rng.randint(0, 255, (5, 4, 4, 3), dtype=np.uint8),
        )
    args = parse(["--use-obs", "--render_image_names", "cam",
                  "--video_skip", "1"], path, tmp_path / "v.mp4")
    (writer,) = run_playback(args)
    assert len(writer.frames) == 5


def test_robosuite_initial_state_includes_model(tmp_path):
    ds = make_dataset(str(tmp_path / "d.hdf5"), robosuite=True)
    seen = []

    class RecordingEnv(FakePlaybackEnv):
        def reset_to(self, state):
            seen.append(dict(state))
            return super().reset_to(state)

    args = parse(["--render_image_names", "cam", "--n", "1"],
                 ds, tmp_path / "v.mp4")
    writers = []
    playback_dataset(
        args,
        env_factory=lambda meta, a: RecordingEnv(),
        video_writer_factory=lambda p: writers.append(FrameCollector())
        or writers[-1],
    )
    assert seen[0].get("model") == "<mujoco/>"


def test_default_video_path_naming(tmp_path):
    ds = make_dataset(str(tmp_path / "named.hdf5"))
    args = build_parser().parse_args(
        ["--dataset", ds, "--use-obs", "--render_image_names", "cam"]
    )
    run_playback(args)
    assert args.video_path.endswith("named.mp4")
    args2 = build_parser().parse_args(
        ["--dataset", ds, "--use-actions", "--render_image_names", "cam"]
    )
    writers = run_playback(args2)
    assert args2.video_path.endswith("named_use_actions.mp4")
    assert writers


def test_divergence_check_math():
    env = FakePlaybackEnv()
    states = np.tile(np.arange(4, dtype=np.float32)[:, None], (1, STATE_DIM))
    actions = np.ones((4, A), np.float32)
    w = FrameCollector()
    playback_trajectory_with_env(
        env, {"states": states[0]}, states, actions=actions,
        video_writer=w, video_skip=1, camera_names=["c"],
    )
    assert len(w.frames) == 4
