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


@pytest.mark.slow
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


def test_hsv_roundtrip_vs_colorsys():
    """rgb<->hsv matches python's colorsys per pixel; adjust_hue shifts
    exactly (torchvision semantics)."""
    import colorsys

    import jax.numpy as jnp

    from robot_manipulation_vq_vae_tpu.models.obs_core import (
        adjust_hue,
        hsv_to_rgb,
        rgb_to_hsv,
    )

    rng = np.random.RandomState(0)
    rgb = rng.rand(64, 3).astype(np.float32)
    hsv = np.asarray(rgb_to_hsv(jnp.asarray(rgb)))
    for i in range(rgb.shape[0]):
        expect = colorsys.rgb_to_hsv(*rgb[i])
        np.testing.assert_allclose(hsv[i], expect, atol=1e-5)
    back = np.asarray(hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, rgb, atol=1e-5)

    # hue shift: +0.25 turns then -0.25 turns is identity
    shifted = adjust_hue(jnp.asarray(rgb), 0.25)
    restored = np.asarray(adjust_hue(shifted, -0.25))
    np.testing.assert_allclose(restored, rgb, atol=1e-5)
    # and the hue channel moved by exactly 0.25 (mod 1) where saturated
    h_shift = np.asarray(rgb_to_hsv(shifted))[:, 0]
    expected = (hsv[:, 0] + 0.25) % 1.0
    sat = hsv[:, 1] > 1e-3
    np.testing.assert_allclose(h_shift[sat], expected[sat], atol=1e-5)
