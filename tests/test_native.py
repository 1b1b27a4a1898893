"""Native window-gather kernel tests: correctness vs numpy + speedup sanity."""

import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu import native


def test_builds_and_loads():
    assert native.is_available(), "g++ build of the native kernel failed"


def test_gather_windows_edge_padding():
    src = np.arange(20, dtype=np.float32).reshape(5, 4)
    starts = np.array([-2, 0, 3], dtype=np.int64)
    out = native.gather_windows(src, starts, window=4)
    assert out.shape == (3, 4, 4)
    # start -2: rows [0,0,0,1] (edge pad at the front)
    np.testing.assert_array_equal(out[0], src[[0, 0, 0, 1]])
    # start 3: rows [3,4,4,4] (edge pad at the back)
    np.testing.assert_array_equal(out[2], src[[3, 4, 4, 4]])


def test_gather_matches_numpy_fallback():
    rng = np.random.RandomState(0)
    src = rng.randint(0, 255, size=(50, 8, 8, 3), dtype=np.uint8)
    starts = rng.randint(-3, 52, size=(16,)).astype(np.int64)
    out = native.gather_windows(src, starts, window=6)
    idx = np.clip(starts[:, None] + np.arange(6)[None], 0, 49)
    np.testing.assert_array_equal(out, src[idx])


def test_gather_windows_multi():
    rng = np.random.RandomState(1)
    srcs = [rng.randn(t, 3).astype(np.float32) for t in (5, 9, 7)]
    starts = np.array([-1, 6, 3], dtype=np.int64)
    out = native.gather_windows_multi(srcs, starts, window=4)
    assert out.shape == (3, 4, 3)
    np.testing.assert_array_equal(out[0], srcs[0][[0, 0, 1, 2]])
    np.testing.assert_array_equal(out[1], srcs[1][[6, 7, 8, 8]])


def test_pad_masks():
    starts = np.array([-2, 0, 3], dtype=np.int64)
    t_lens = np.array([5, 5, 5], dtype=np.int64)
    m = native.window_pad_masks(starts, t_lens, window=4)
    np.testing.assert_array_equal(
        m, [[False, False, True, True], [True] * 4, [True, True, False, False]]
    )
