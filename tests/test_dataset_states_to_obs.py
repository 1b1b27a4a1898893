"""dataset_states_to_obs pipeline: worker-pool extraction + single-writer
HDF5 output, exercised sim-free with an injected deterministic env factory
(reference ``robocasa/scripts/dataset_states_to_obs.py:1-666``)."""

import json

import h5py
import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu.scripts.dataset_states_to_obs import (
    build_parser,
    extract_trajectory,
    make_demo_ids_contiguous,
    resolve_output_path,
    run,
)

STATE_DIM, A = 6, 4


class FakeSimEnv:
    """Deterministic state-replay env: obs are functions of the sim state."""

    def __init__(self, camera_names=(), camera_height=8, camera_width=8):
        self._state = np.zeros(STATE_DIM, np.float32)
        self._cams = list(camera_names)
        self._h, self._w = camera_height, camera_width

    def reset(self):
        return self.get_observation()

    def reset_to(self, state):
        self._state = np.asarray(state["states"], np.float32)
        return self.get_observation()

    def step(self, action):
        self._state = self._state + 0.1
        return self.get_observation(), self.get_reward(), False, {}

    def get_observation(self):
        obs = {"flat": self._state.copy()}
        for c in self._cams:
            img = np.full((self._h, self._w, 3), self._state[0], np.float32)
            obs[f"{c}_image"] = img
        return obs

    def get_reward(self):
        return float(self._state.sum())

    def is_success(self):
        return {"task": bool(self._state[0] > 2.0)}

    def serialize(self):
        return {"env_name": "FakeSim", "type": 99, "env_kwargs": {}}


def fake_factory(env_meta, args):
    """Module-level (picklable) factory for worker processes."""
    return FakeSimEnv(
        camera_names=args.camera_names,
        camera_height=args.camera_height,
        camera_width=args.camera_width,
    )


def make_source_dataset(path, n_demos=4, t=5):
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "FakeSim", "type": 99, "env_kwargs": {}}
        )
        total = 0
        for i in range(n_demos):
            g = data.create_group(f"demo_{i}")
            states = rng.rand(t, STATE_DIM).astype(np.float32) * (i + 1)
            g.create_dataset("states", data=states)
            g.create_dataset("actions", data=rng.rand(t, A).astype(np.float32))
            g.create_dataset("rewards", data=np.full(t, 7.0))
            g.create_dataset("dones", data=np.zeros(t))
            g.attrs["num_samples"] = t
            total += t
        data.attrs["total"] = total
        mask = f.create_group("mask")
        mask.create_dataset(
            "valid", data=np.array([b"demo_0", b"demo_2"], dtype="S8")
        )
    return path


def parse(extra, dataset, output):
    return build_parser().parse_args(
        ["--dataset", str(dataset), "--output_name", str(output),
         "--no_postprocess"] + extra
    )


@pytest.fixture()
def source(tmp_path):
    return make_source_dataset(str(tmp_path / "src.hdf5"))


def test_serial_extraction_matches_states(source, tmp_path):
    args = parse(["--num_procs", "0", "--camera_names"], source, "out.hdf5")
    out = run(args, env_factory=fake_factory)
    with h5py.File(source) as fin, h5py.File(out) as f:
        assert sorted(f["data"].keys()) == sorted(fin["data"].keys())
        for ep in fin["data"]:
            states = fin[f"data/{ep}/states"][()]
            obs = f[f"data/{ep}/obs/flat"][()]
            np.testing.assert_allclose(obs, states, rtol=1e-6)
            # done_mode 0 (default): done where s' is a success state
            expect_done = (states[:, 0] > 2.0).astype(int)
            np.testing.assert_array_equal(f[f"data/{ep}/dones"][()], expect_done)
            # inferred rewards = sum of state
            np.testing.assert_allclose(
                f[f"data/{ep}/rewards"][()], states.sum(axis=1), rtol=1e-5
            )
            assert f[f"data/{ep}"].attrs["num_samples"] == len(states)
        assert f["data"].attrs["total"] == sum(
            fin[f"data/{ep}/actions"].shape[0] for ep in fin["data"]
        )
        assert "mask/valid" in f  # filter keys copied through
        assert json.loads(f["data"].attrs["env_args"])["env_name"] == "FakeSim"


@pytest.mark.slow
def test_multiprocess_matches_serial(source, tmp_path):
    a1 = parse(["--num_procs", "0", "--camera_names"], source, "serial.hdf5")
    a2 = parse(["--num_procs", "3", "--camera_names"], source, "mp.hdf5")
    out1, out2 = run(a1, env_factory=fake_factory), run(a2, env_factory=fake_factory)
    with h5py.File(out1) as f1, h5py.File(out2) as f2:
        assert sorted(f1["data"].keys()) == sorted(f2["data"].keys())
        for ep in f1["data"]:
            for key in ("obs/flat", "rewards", "dones", "actions", "states"):
                np.testing.assert_array_equal(
                    f1[f"data/{ep}/{key}"][()], f2[f"data/{ep}/{key}"][()]
                )


def test_flags_next_obs_copy_compress_filter(source, tmp_path):
    args = parse(
        ["--num_procs", "0", "--include-next-obs", "--copy_rewards",
         "--copy_dones", "--filter_key", "valid", "--camera_names", "cam0",
         "--camera_height", "6", "--camera_width", "6"],
        source, "flags.hdf5",
    )
    out = run(args, env_factory=fake_factory)
    with h5py.File(source) as fin, h5py.File(out) as f:
        assert sorted(f["data"].keys()) == ["demo_0", "demo_2"]
        for ep in f["data"]:
            states = fin[f"data/{ep}/states"][()]
            # rendered image obs present, gzip-compressed by default
            img = f[f"data/{ep}/obs/cam0_image"]
            assert img.shape == (len(states), 6, 6, 3)
            assert img.compression == "gzip"
            # next_obs = obs at states[t+1] (fixed upstream breakage)
            np.testing.assert_allclose(
                f[f"data/{ep}/next_obs/flat"][()][:-1], states[1:], rtol=1e-6
            )
            # copy_rewards/copy_dones take source values verbatim
            np.testing.assert_array_equal(f[f"data/{ep}/rewards"][()],
                                          np.full(len(states), 7.0))
            np.testing.assert_array_equal(f[f"data/{ep}/dones"][()],
                                          np.zeros(len(states)))


def test_no_compress_and_done_modes(source, tmp_path):
    args = parse(
        ["--num_procs", "0", "--no_compress", "--done_mode", "1",
         "--camera_names"],
        source, "dm1.hdf5",
    )
    out = run(args, env_factory=fake_factory)
    with h5py.File(out) as f:
        for ep in f["data"]:
            assert f[f"data/{ep}/obs/flat"].compression is None
            dones = f[f"data/{ep}/dones"][()]
            assert dones[-1] == 1 and np.all(dones[:-1] == 0)


def test_extract_trajectory_done_mode_2():
    env = FakeSimEnv()
    states = np.zeros((4, STATE_DIM), np.float32)
    states[2, 0] = 5.0  # success at t=2
    actions = np.zeros((4, A), np.float32)
    traj = extract_trajectory(env, {"states": states[0]}, states, actions,
                              done_mode=2)
    np.testing.assert_array_equal(traj["dones"], [0, 0, 1, 1])


def test_output_naming_convention(tmp_path):
    src = str(tmp_path / "demo.hdf5")

    def nm(extra):
        return resolve_output_path(
            build_parser().parse_args(["--dataset", src] + extra)
        ).split("/")[-1]

    assert nm(["--camera_names"]) == "demo_ld.hdf5"
    assert nm([]) == "demo_im128.hdf5"
    assert nm(["--camera_width", "256"]) == "demo_im256.hdf5"
    assert nm(["--randomize_cameras"]) == "demo_im128_randcams.hdf5"
    assert nm(["--generative_textures"]) == "demo_gentex_im128.hdf5"
    assert nm(["--output_name", "x.hdf5"]) == "x.hdf5"


def test_make_demo_ids_contiguous(tmp_path):
    path = str(tmp_path / "gaps.hdf5")
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        for i in (0, 3, 7):
            g = data.create_group(f"demo_{i}")
            g.create_dataset("actions", data=np.full((2, A), float(i)))
    make_demo_ids_contiguous(path)
    with h5py.File(path) as f:
        assert sorted(f["data"].keys()) == ["demo_0", "demo_1", "demo_2"]
        # numeric order preserved: old demo_3 -> demo_1, demo_7 -> demo_2
        assert f["data/demo_1/actions"][0, 0] == 3.0
        assert f["data/demo_2/actions"][0, 0] == 7.0


def killing_factory(env_meta, args):
    """Module-level (picklable) factory where the FIRST worker to build its
    env dies hard (os._exit, skipping all finally blocks) — simulating a
    MuJoCo segfault / OOM kill."""
    import os

    flag = str(args.dataset) + ".killed.flag"
    try:
        fd = os.open(flag, os.O_CREAT | os.O_EXCL)
        os.close(fd)
        os._exit(137)
    except FileExistsError:
        pass
    return fake_factory(env_meta, args)


@pytest.mark.slow
def test_writer_survives_hard_killed_worker(source, tmp_path):
    """The parent's writer loop must not hang when a worker dies without
    sending its done sentinel (ADVICE r2: sentinels come from a finally
    block, so a hard kill used to deadlock result_queue.get())."""
    a_serial = parse(["--num_procs", "0", "--camera_names"], source, "s.hdf5")
    a_mp = parse(["--num_procs", "3", "--camera_names"], source, "k.hdf5")
    out1 = run(a_serial, env_factory=fake_factory)
    out2 = run(a_mp, env_factory=killing_factory)
    # the dead worker never dequeued a demo, so the survivors must have
    # produced the complete, serial-identical output
    with h5py.File(out1) as f1, h5py.File(out2) as f2:
        assert sorted(f1["data"].keys()) == sorted(f2["data"].keys())
        for ep in f1["data"]:
            np.testing.assert_allclose(
                f1[f"data/{ep}/obs/flat"][()], f2[f"data/{ep}/obs/flat"][()]
            )
