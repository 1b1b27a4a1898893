"""Data-conversion script tests on synthetic hdf5 files (reference
``robomimic/scripts/conversion/``: extract_action_dict, convert_d4rl,
convert_roboturk_pilot, set_dataset_attr, remove_mg_env_label,
convert_to_robosuite_v141 xml surgery, convert_r2d2 pure parts)."""

import json
import os

import h5py
import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu.scripts.conversion.extract_action_dict import (
    action_vector_to_dict,
    extract_action_dict,
)
from robot_manipulation_vq_vae_tpu.scripts.conversion.convert_d4rl import (
    split_d4rl_trajectories,
    write_d4rl_hdf5,
)
from robot_manipulation_vq_vae_tpu.scripts.conversion.convert_roboturk_pilot import (
    convert_rt_pilot_hdf5,
    split_fastest_from_hdf5,
)
from robot_manipulation_vq_vae_tpu.scripts.conversion.set_dataset_attr import (
    apply_attrs,
    update_nested,
)
from robot_manipulation_vq_vae_tpu.scripts.conversion.remove_mg_env_label import (
    remove_mg_prefix,
)
from robot_manipulation_vq_vae_tpu.scripts.conversion.convert_to_robosuite_v141 import (
    graft_bodies,
)
from robot_manipulation_vq_vae_tpu.scripts.conversion import convert_r2d2
from robot_manipulation_vq_vae_tpu.utils import rotation_utils as RotUtils


def _make_demo_file(path, n_demos=3, t=6, ac_dim=7, with_abs=False):
    with h5py.File(path, "w") as f:
        grp = f.create_group("data")
        grp.attrs["env_args"] = json.dumps(
            {"env_name": "MG_Lift", "type": 1, "env_kwargs": {}}
        )
        rng = np.random.RandomState(0)
        for i in range(n_demos):
            ep = grp.create_group(f"demo_{i}")
            ep.create_dataset(
                "actions", data=rng.randn(t, ac_dim).astype(np.float32)
            )
            if with_abs:
                ep.create_dataset(
                    "actions_abs",
                    data=rng.randn(t, ac_dim).astype(np.float32),
                )
            ep.attrs["num_samples"] = t


def test_action_vector_to_dict():
    rng = np.random.RandomState(1)
    a7 = rng.randn(5, 7).astype(np.float32)
    d = action_vector_to_dict(a7, "rel_")
    assert set(d) == {"rel_pos", "rel_rot_axis_angle", "rel_rot_6d", "gripper"}
    np.testing.assert_array_equal(d["rel_pos"], a7[:, :3])
    np.testing.assert_allclose(
        d["rel_rot_6d"], RotUtils.axis_angle_to_rot_6d(a7[:, 3:6]), atol=1e-6
    )
    a8 = rng.randn(5, 8).astype(np.float32)
    d8 = action_vector_to_dict(a8, "abs_")
    assert "base_mode" in d8
    np.testing.assert_array_equal(d8["base_mode"], a8[:, 7:8])


def test_extract_action_dict(tmp_path):
    path = str(tmp_path / "ds.hdf5")
    _make_demo_file(path, with_abs=True)
    extract_action_dict(path)
    with h5py.File(path, "r") as f:
        ad = f["data/demo_0/action_dict"]
        for k in ("rel_pos", "rel_rot_6d", "abs_pos", "abs_rot_6d",
                  "gripper"):
            assert k in ad
        assert ad["rel_rot_6d"].shape == (6, 6)


def test_d4rl_trajectory_split(tmp_path):
    n = 25
    rng = np.random.RandomState(2)
    ds = {
        "observations": rng.randn(n, 4).astype(np.float32),
        "actions": rng.randn(n, 2).astype(np.float32),
        "rewards": rng.rand(n).astype(np.float32),
        "terminals": np.zeros(n, bool),
        "timeouts": np.zeros(n, bool),
    }
    ds["terminals"][9] = True   # traj 1: steps 0..9
    ds["timeouts"][19] = True   # traj 2: steps 10..19; tail 20..23 dropped
    trajs = split_d4rl_trajectories(ds)
    assert len(trajs) == 2
    assert trajs[0]["obs"].shape[0] == 10
    assert trajs[1]["obs"].shape[0] == 10
    # final next_obs replaced with current obs, done forced
    np.testing.assert_array_equal(
        trajs[0]["next_obs"][-1], ds["observations"][9]
    )
    assert trajs[0]["dones"][-1] == 1 and trajs[1]["dones"][-1] == 1

    out = str(tmp_path / "d4rl.hdf5")
    total = write_d4rl_hdf5(trajs, out, json.dumps({"env_name": "walker"}))
    assert total == 20
    with h5py.File(out, "r") as f:
        assert f["data"].attrs["total"] == 20
        assert f["data/demo_0/obs/flat"].shape == (10, 4)
        assert f["data/demo_1"].attrs["num_samples"] == 10


def test_convert_roboturk_pilot(tmp_path):
    folder = str(tmp_path)
    os.makedirs(os.path.join(folder, "models"))
    rng = np.random.RandomState(3)
    lengths = [4, 8, 6]
    with h5py.File(os.path.join(folder, "demo.hdf5"), "w") as f:
        grp = f.create_group("data")
        grp.attrs["env"] = "SawyerBinsCan"
        for i, t in enumerate(lengths):
            ep = grp.create_group(f"demo_{i}")
            ep.create_dataset("states", data=rng.randn(t, 10))
            ep.create_dataset("joint_velocities", data=2 * rng.randn(t, 7))
            ep.create_dataset("gripper_actuations", data=rng.randn(t, 1))
            ep.attrs["model_file"] = f"model_{i}.xml"
            with open(
                os.path.join(folder, "models", f"model_{i}.xml"), "w"
            ) as fm:
                fm.write(f"<mujoco name='m{i}'/>")

    convert_rt_pilot_hdf5(folder)
    path = os.path.join(folder, "demo.hdf5")
    assert os.path.exists(os.path.join(folder, "demo_bak.hdf5"))
    with h5py.File(path, "r") as f:
        assert f["data"].attrs["total"] == sum(lengths)
        acts = f["data/demo_1/actions"][()]
        assert acts.shape == (8, 8)
        assert acts.min() >= -1.0 and acts.max() <= 1.0
        assert f["data/demo_0"].attrs["model_file"] == "<mujoco name='m0'/>"
        env_meta = json.loads(f["data"].attrs["env_args"])
        assert env_meta["env_name"] == "SawyerBinsCanTeleop"

    fastest = split_fastest_from_hdf5(path, n=2)
    assert fastest == ["demo_0", "demo_2"]  # lengths 4 and 6
    with h5py.File(path, "r") as f:
        assert "mask/fastest_2" in f


def test_set_dataset_attr(tmp_path):
    assert update_nested({}, ["a", "b"], 5) == {"a": {"b": 5}}
    path = str(tmp_path / "ds.hdf5")
    _make_demo_file(path)
    apply_attrs(
        path, {"absolute_actions": True},
        env_args_key=["env_kwargs", "controller_configs", "control_delta"],
        env_args_value=False,
    )
    with h5py.File(path, "r") as f:
        assert f["data"].attrs["absolute_actions"]
        env_args = json.loads(f["data"].attrs["env_args"])
        assert (
            env_args["env_kwargs"]["controller_configs"]["control_delta"]
            is False
        )


def test_remove_mg_prefix(tmp_path):
    path = str(tmp_path / "ds.hdf5")
    _make_demo_file(path)
    remove_mg_prefix(path)
    with h5py.File(path, "r") as f:
        assert json.loads(f["data"].attrs["env_args"])["env_name"] == "Lift"


def test_graft_bodies_xml():
    old = (
        "<mujoco><worldbody>"
        "<body name='cube_main' pos='1 2 3'><geom name='old'/></body>"
        "</worldbody></mujoco>"
    )
    new = (
        "<mujoco><worldbody>"
        "<body name='robot'/>"
        "<body name='cube_main' pos='0 0 0'><geom name='new'/></body>"
        "</worldbody></mujoco>"
    )
    out = graft_bodies(new, old, ("cube_main",))
    assert "old" in out and "new" not in out
    assert "pos=\"1 2 3\"" in out
    # position within worldbody preserved (robot still first)
    assert out.index("robot") < out.index("cube_main")


def test_convert_r2d2_pure_parts(tmp_path):
    path = str(tmp_path / "trajectory.h5")
    t = 10
    rng = np.random.RandomState(4)
    cart_pos = np.concatenate(
        [rng.randn(t, 3), rng.uniform(-1.0, 1.0, (t, 3))], axis=1
    )
    cart_vel = np.concatenate(
        [rng.randn(t, 3), rng.uniform(-1.0, 1.0, (t, 3))], axis=1
    )
    movement = np.ones(t, bool)
    movement[[2, 5]] = False
    with h5py.File(path, "w") as f:
        f.create_dataset("action/cartesian_position", data=cart_pos)
        f.create_dataset("action/cartesian_velocity", data=cart_vel)
        f.create_dataset("action/gripper_position", data=rng.rand(t))
        f.create_dataset(
            "observation/robot_state/cartesian_position", data=cart_pos
        )
        f.create_dataset(
            "observation/controller_info/movement_enabled", data=movement
        )
    convert_r2d2.convert_dataset(path, with_images=False)
    with h5py.File(path, "r") as f:
        # idle timesteps removed everywhere
        assert f["action/abs_pos"].shape == (8, 3)
        assert f["observation/robot_state/eef_quat"].shape == (8, 4)
        # 1-d action keys promoted to [T, 1]
        assert f["action/gripper_position"].shape == (8, 1)
        kept = np.ones(t, bool)
        kept[[2, 5]] = False
        np.testing.assert_allclose(
            f["action/abs_pos"][()], cart_pos[kept, :3]
        )
        np.testing.assert_allclose(
            f["action/rel_rot_6d"][()],
            RotUtils.euler_angles_to_rot_6d(cart_vel[kept, 3:6]),
            atol=1e-6,
        )


def test_copy_ds_key_and_filter_size(tmp_path):
    from robot_manipulation_vq_vae_tpu.scripts.copy_ds_key import copy_ds_keys
    from robot_manipulation_vq_vae_tpu.scripts.filter_dataset_size import (
        filter_dataset_size,
    )

    src = str(tmp_path / "src.hdf5")
    dst = str(tmp_path / "dst.hdf5")
    _make_demo_file(src, n_demos=5, with_abs=True)
    _make_demo_file(dst, n_demos=5)

    copy_ds_keys(src, dst, ["actions_abs"])
    with h5py.File(src, "r") as fs, h5py.File(dst, "r") as fd:
        np.testing.assert_array_equal(
            fd["data/demo_2/actions_abs"][()],
            fs["data/demo_2/actions_abs"][()],
        )

    np.random.seed(0)
    name = filter_dataset_size(dst, num_demos=3)
    assert name == "3_demos"
    with h5py.File(dst, "r") as f:
        assert len(f["mask/3_demos"]) == 3


def test_merge_hdf5(tmp_path):
    from robot_manipulation_vq_vae_tpu.scripts.merge_hdf5 import merge_hdf5s

    a = str(tmp_path / "a.hdf5")
    b = str(tmp_path / "b.hdf5")
    _make_demo_file(a, n_demos=2, t=4)
    _make_demo_file(b, n_demos=3, t=5)
    out = str(tmp_path / "merged.hdf5")
    merge_hdf5s([a, b], out)
    with h5py.File(out, "r") as f:
        assert sorted(f["data"].keys()) == [f"demo_{i}" for i in range(5)]
        assert f["data"].attrs["total"] == 2 * 4 + 3 * 5
        assert len(f["mask/src_0"]) == 2 and len(f["mask/src_1"]) == 3
        assert json.loads(f["data"].attrs["env_args"])["env_name"] == "MG_Lift"
