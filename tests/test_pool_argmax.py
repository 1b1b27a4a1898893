"""Recorded-argmax max pooling: forward and index-routed backward must be
bit-compatible with nn.max_pool / XLA's SelectAndScatter gradient
(reference stem semantics: torchvision resnet18 maxpool,
robomimic/models/base_nets.py:550)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu.ops.pool_argmax import (
    max_pool_3x3_s2_argmax,
    pool_argmax_forward,
    reference_maxpool,
)


@pytest.mark.parametrize("shape", [(2, 58, 58, 8), (3, 57, 59, 4),
                                   (1, 5, 5, 2)])
def test_forward_matches_nn_max_pool(shape):
    y = jnp.asarray(np.random.RandomState(0).randn(*shape), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3_s2_argmax(y)),
        np.asarray(reference_maxpool(y)),
    )


def test_forward_bf16():
    y = jnp.asarray(
        np.random.RandomState(1).randn(2, 30, 30, 16), jnp.bfloat16
    )
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3_s2_argmax(y).astype(jnp.float32)),
        np.asarray(reference_maxpool(y).astype(jnp.float32)),
    )


@pytest.mark.parametrize("shape", [(2, 58, 58, 8), (3, 57, 59, 4)])
def test_backward_matches_select_and_scatter(shape):
    rng = np.random.RandomState(2)
    y = jnp.asarray(rng.randn(*shape), jnp.float32)
    dz_shape = reference_maxpool(y).shape
    dz = jnp.asarray(rng.randn(*dz_shape), jnp.float32)

    _, vjp_ref = jax.vjp(reference_maxpool, y)
    _, vjp_new = jax.vjp(max_pool_3x3_s2_argmax, y)
    # positions covered by several windows accumulate their grads in a
    # different order than SelectAndScatter -> fp reassociation only
    np.testing.assert_allclose(
        np.asarray(vjp_new(dz)[0]), np.asarray(vjp_ref(dz)[0]),
        rtol=1e-6, atol=1e-6,
    )


def test_backward_tie_routing_first_argmax():
    """Windows with DUPLICATED maxima: the recorded index must route the
    whole cotangent to the FIRST maximal offset (torch/XLA semantics),
    not split or duplicate it."""
    rng = np.random.RandomState(3)
    y = rng.randn(2, 12, 12, 3).astype(np.float32)
    y[:, ::2, ::2, :] = 1.5  # a constant plateau -> ties in most windows
    y = jnp.asarray(y)
    dz = jnp.asarray(
        rng.randn(*reference_maxpool(y).shape), jnp.float32
    )
    _, vjp_ref = jax.vjp(reference_maxpool, y)
    _, vjp_new = jax.vjp(max_pool_3x3_s2_argmax, y)
    # equality would require SelectAndScatter's exact accumulation order;
    # tie ROUTING correctness is what this asserts (a wrong-index routing
    # moves O(1) gradient mass, 7 orders of magnitude above this bound)
    np.testing.assert_allclose(
        np.asarray(vjp_new(dz)[0]), np.asarray(vjp_ref(dz)[0]),
        rtol=1e-6, atol=1e-6,
    )


def test_idx_range_and_first_semantics():
    y = jnp.asarray(np.zeros((1, 6, 6, 1), np.float32))  # all ties
    out, idx = pool_argmax_forward(y)
    assert int(jnp.max(idx)) <= 8 and int(jnp.min(idx)) >= 0
    # interior windows: every element ties at 0.0 -> first offset wins.
    # Boundary windows exclude padded (-inf) taps, so the first VALID
    # offset wins (e.g. window at (0,0) starts at padded row/col -> 4).
    assert int(idx[0, 1, 1, 0]) == 0
    assert int(idx[0, 0, 0, 0]) == 4
