"""Rotation-conversion parity vs the reference torch_utils (PyTorch3D-derived
rot_6d / axis-angle / euler / quaternion suite, torch_utils.py:237-744)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_module
from robot_manipulation_vq_vae_tpu.utils import rotation_utils as RotUtils


@pytest.fixture(scope="module")
def ref():
    return load_module(
        "/root/reference/robomimic/utils/torch_utils.py", "ref_torch_utils"
    )


@pytest.fixture(scope="module")
def rot6d_batch():
    rng = np.random.RandomState(0)
    return rng.randn(32, 6).astype(np.float32)


def test_rot6d_to_axis_angle(ref, rot6d_batch):
    ours = RotUtils.rot_6d_to_axis_angle(rot6d_batch)
    theirs = ref.rot_6d_to_axis_angle(torch.from_numpy(rot6d_batch)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_rot6d_to_euler(ref, rot6d_batch):
    ours = RotUtils.rot_6d_to_euler_angles(rot6d_batch, "XYZ")
    theirs = ref.rot_6d_to_euler_angles(
        torch.from_numpy(rot6d_batch), convention="XYZ"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_axis_angle_roundtrip(ref):
    rng = np.random.RandomState(1)
    aa = rng.randn(16, 3).astype(np.float32)
    mat_ours = RotUtils.axis_angle_to_matrix(aa)
    mat_theirs = ref.axis_angle_to_matrix(torch.from_numpy(aa)).numpy()
    np.testing.assert_allclose(mat_ours, mat_theirs, atol=1e-5)
    back = RotUtils.matrix_to_axis_angle(mat_ours)
    np.testing.assert_allclose(back, aa, atol=1e-4)


def test_quaternion_parity(ref):
    rng = np.random.RandomState(2)
    q = rng.randn(16, 4).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    mat_ours = RotUtils.quaternion_to_matrix(q)
    mat_theirs = ref.quaternion_to_matrix(torch.from_numpy(q)).numpy()
    np.testing.assert_allclose(mat_ours, mat_theirs, atol=1e-5)
    q_back_ours = RotUtils.matrix_to_quaternion(mat_ours)
    # quaternion double cover: compare up to sign
    sign = np.sign(np.sum(q_back_ours * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_back_ours * sign, q, atol=1e-4)


def test_euler_to_quat_parity(ref):
    rng = np.random.RandomState(3)
    e = rng.uniform(-1.2, 1.2, (24, 3)).astype(np.float32)
    ours = RotUtils.euler_angles_to_quat(e)
    theirs = ref.euler_angles_to_quat(torch.from_numpy(e)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_euler_to_rot6d_parity(ref):
    rng = np.random.RandomState(4)
    e = rng.uniform(-1.2, 1.2, (24, 3)).astype(np.float32)
    ours = RotUtils.euler_angles_to_rot_6d(e, "XYZ")
    theirs = ref.euler_angles_to_rot_6d(
        torch.from_numpy(e), convention="XYZ"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)
