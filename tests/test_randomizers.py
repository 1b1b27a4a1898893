"""Randomizer behavior: crop train/eval semantics, output mean-pooling,
color/noise augmentation, and obs normalization plumbing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.models.obs_core import (
    ColorRandomizer,
    CropRandomizer,
    GaussianNoiseRandomizer,
)
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils


def test_crop_randomizer_eval_center_crop():
    r = CropRandomizer(input_shape=(10, 10, 3), crop_height=6, crop_width=6)
    x = jnp.arange(2 * 10 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 10, 3)
    out = r.forward_in(x, train=False)
    assert out.shape == (2, 6, 6, 3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[:, 2:8, 2:8]))
    # eval forward_out is identity at num_crops=1
    np.testing.assert_array_equal(
        np.asarray(r.forward_out(out)), np.asarray(out)
    )


def test_crop_randomizer_train_random_crops():
    r = CropRandomizer(
        input_shape=(10, 10, 3), crop_height=6, crop_width=6, num_crops=2
    )
    x = jnp.asarray(np.random.RandomState(0).rand(3, 10, 10, 3), jnp.float32)
    out = r.forward_in(x, rng=jax.random.PRNGKey(0), train=True)
    assert out.shape == (6, 6, 6, 3)  # B*N
    pooled = r.forward_out(jnp.arange(6.0)[:, None])
    # mean over the 2 crops per sample
    np.testing.assert_allclose(np.asarray(pooled[:, 0]), [0.5, 2.5, 4.5])

    # crops must be actual sub-windows of the source images
    src = np.asarray(x[0])
    crop = np.asarray(out[0])
    found = any(
        np.allclose(src[i : i + 6, j : j + 6], crop)
        for i in range(5)
        for j in range(5)
    )
    assert found


def test_crop_shapes_bookkeeping():
    r = CropRandomizer(input_shape=(116 + 12, 116 + 12, 3),
                       crop_height=116, crop_width=116)
    assert r.output_shape_in((128, 128, 3)) == [116, 116, 3]
    assert r.output_shape_out([64]) == [64]


def test_color_randomizer_train_only():
    r = ColorRandomizer(input_shape=(8, 8, 3))
    x = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 3), jnp.float32)
    out_eval = r.forward_in(x, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))
    out_train = r.forward_in(x, rng=jax.random.PRNGKey(0), train=True)
    assert out_train.shape == x.shape
    assert not np.allclose(np.asarray(out_train), np.asarray(x))
    assert float(jnp.min(out_train)) >= 0.0 and float(jnp.max(out_train)) <= 1.0


def test_gaussian_noise_randomizer():
    r = GaussianNoiseRandomizer(
        input_shape=(4,), noise_std=0.1, limits=(0.0, 1.0)
    )
    x = jnp.full((8, 4), 0.5)
    out = r.forward_in(x, rng=jax.random.PRNGKey(0), train=True)
    assert not np.allclose(np.asarray(out), 0.5)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_obs_normalize_unnormalize_roundtrip():
    stats = {
        "eef": {"offset": np.array([[1.0, -1.0]]), "scale": np.array([[2.0, 0.5]])}
    }
    obs = {"eef": np.array([[3.0, 0.0], [5.0, 1.0]], np.float32)}
    norm = ObsUtils.normalize_dict(obs, stats)
    np.testing.assert_allclose(norm["eef"], [[1.0, 2.0], [2.0, 4.0]])
    back = ObsUtils.unnormalize_dict(norm, stats)
    np.testing.assert_allclose(back["eef"], obs["eef"])
