"""max_pool custom-vjp op: forward identical to nn.max_pool /
reduce_window, backward identical to XLA's SelectAndScatter gradient
wherever window maxima are unique (the tie-routing divergence is
documented in ops/pool.py + PARITY.md)."""

import flax.linen as nn
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.ops.pool import max_pool, max_pool_3x3_s2


@pytest.mark.parametrize("shape,window,strides,padding", [
    ((2, 58, 58, 8), (3, 3), (2, 2), ((1, 1), (1, 1))),  # the stem pool
    ((3, 17, 23, 4), (3, 3), (2, 2), ((1, 1), (1, 1))),  # odd sizes
    ((2, 16, 16, 4), (2, 2), (2, 2), ((0, 0), (0, 0))),  # VALID 2x2
    ((1, 9, 9, 2), (3, 3), (1, 1), ((1, 1), (1, 1))),    # stride 1
])
def test_forward_and_grad_match_xla(shape, window, strides, padding):
    rng = np.random.RandomState(0)
    # distinct values -> unique window maxima -> gradients must be equal
    x = jnp.asarray(
        rng.permutation(np.arange(np.prod(shape), dtype=np.float32))
        .reshape(shape)
    )

    ref_fwd = lambda x: nn.max_pool(  # noqa: E731
        x, window, strides=strides, padding=padding
    )
    ours_fwd = lambda x: max_pool(x, window, strides, padding)  # noqa: E731

    np.testing.assert_array_equal(ours_fwd(x), ref_fwd(x))

    dz = jnp.asarray(
        rng.randn(*np.asarray(ref_fwd(x)).shape).astype(np.float32)
    )
    g_ref = jax.grad(lambda x: jnp.sum(ref_fwd(x) * dz))(x)
    g_ours = jax.grad(lambda x: jnp.sum(ours_fwd(x) * dz))(x)
    # identical routing; only fp32 addition ORDER differs where one input
    # position is the max of 3+ overlapping windows (tap-order vs scatter-
    # order summation), so tight allclose instead of bit equality
    np.testing.assert_allclose(g_ours, g_ref, rtol=1e-5, atol=1e-6)


def test_stem_alias_and_bf16():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 58, 58, 16).astype(np.float32), jnp.bfloat16)
    np.testing.assert_array_equal(
        max_pool_3x3_s2(x),
        nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))),
    )
    g = jax.grad(
        lambda x: jnp.sum(max_pool_3x3_s2(x).astype(jnp.float32))
    )(x)
    assert g.dtype == jnp.bfloat16 and bool(jnp.all(jnp.isfinite(
        g.astype(jnp.float32)
    )))


def test_tie_routing_documented_semantics():
    """On a duplicated window max, the fast 3x3/s2 backward routes the
    cotangent to ALL maxima (valid subgradient; torch/XLA pick one) —
    pinned here so any change is deliberate. For all-zero input, dx[i]
    counts the windows covering position i."""
    x = jnp.zeros((1, 4, 4, 1), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(max_pool_3x3_s2(x)))(x)
    w = np.array([1.0, 2.0, 1.0, 1.0])  # windows covering each row index
    np.testing.assert_array_equal(
        np.asarray(g)[0, :, :, 0], np.outer(w, w)
    )


def test_fallback_config_uses_xla_semantics():
    """Non-3x3/s2 configs fall back to XLA's native gradient (single-max
    routing), so they stay bit-identical to nn.max_pool even on ties."""
    x = jnp.zeros((1, 2, 2, 1), jnp.float32)
    cfg = ((2, 2), (2, 2), ((0, 0), (0, 0)))
    g_ours = jax.grad(lambda x: jnp.sum(max_pool(x, *cfg)))(x)
    g_ref = jax.grad(lambda x: jnp.sum(
        nn.max_pool(x, cfg[0], strides=cfg[1], padding=cfg[2])
    ))(x)
    np.testing.assert_array_equal(g_ours, g_ref)


def test_grad_zero_outside_max():
    x = jnp.asarray([[[[1.0], [5.0]], [[3.0], [2.0]]]])  # [1,2,2,1]
    g = jax.grad(
        lambda x: jnp.sum(max_pool(x, (2, 2), (2, 2), ((0, 0), (0, 0))))
    )(x)
    np.testing.assert_array_equal(
        np.asarray(g)[0, :, :, 0], [[0.0, 1.0], [0.0, 0.0]]
    )
