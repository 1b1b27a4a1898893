"""Exactness of the Pallas stem-pool pair (ops/pallas/stem_pool) against
the XLA recorded-argmax oracle (ops/pool_argmax, itself bit-verified
against torch/XLA tie semantics) — forward max, recorded indices, and the
index-routed backward, including constructed ties. Runs in interpret mode
on CPU; the TPU-compiled path reuses the identical kernel code."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.ops import pool_argmax as oracle
from robot_manipulation_vq_vae_tpu.ops.pallas import stem_pool


def _rand(n, h, w, c, seed=0, dtype=np.float32):
    return np.random.RandomState(seed).randn(n, h, w, c).astype(dtype)


@pytest.mark.parametrize("shape", [(4, 58, 58, 64), (2, 8, 8, 64),
                                   (3, 6, 12, 192)])
def test_forward_matches_oracle(shape):
    y = jnp.asarray(_rand(*shape))
    out_p, idx_p = stem_pool.pool_fwd_pallas(y, interpret=True)
    out_o, idx_o = oracle.pool_argmax_forward(y)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_o))
    np.testing.assert_array_equal(
        np.asarray(idx_p, np.int32), np.asarray(idx_o)
    )


def test_forward_tie_semantics():
    """Constructed ties: equal values in a window must record the FIRST
    maximal offset in row-major window order (torch semantics)."""
    y = np.zeros((1, 8, 8, 64), np.float32)
    y[0, :, :, :] = 1.0  # every window fully tied
    _, idx = stem_pool.pool_fwd_pallas(jnp.asarray(y), interpret=True)
    _, idx_o = oracle.pool_argmax_forward(jnp.asarray(y))
    np.testing.assert_array_equal(
        np.asarray(idx, np.int32), np.asarray(idx_o)
    )
    # window (0,0) on the padded grid: offsets 0,1,3 hit the -inf pad,
    # first real cell is offset 4 (di=1, dj=1)
    assert int(np.asarray(idx)[0, 0, 0, 0]) == 4


@pytest.mark.parametrize("shape", [(4, 58, 58, 64), (2, 8, 8, 64)])
def test_backward_matches_oracle(shape):
    y = jnp.asarray(_rand(*shape, seed=3))
    dz_shape = (shape[0], (shape[1] - 1) // 2 + 1,
                (shape[2] - 1) // 2 + 1, shape[3])
    dz = jnp.asarray(_rand(*dz_shape, seed=4))

    _, idx_p = stem_pool.pool_fwd_pallas(y, interpret=True)
    dx_p = stem_pool.pool_bwd_pallas(idx_p, dz, interpret=True)
    _, idx_o = oracle.pool_argmax_forward(y)
    dx_o = oracle.pool_argmax_backward(idx_o, dz, (shape[1], shape[2]))
    # each input cell receives <= 4 routed contributions; the two
    # formulations add them in different orders -> 1-ulp f32 noise
    np.testing.assert_allclose(
        np.asarray(dx_p), np.asarray(dx_o), rtol=1e-6, atol=1e-6
    )


def test_custom_vjp_grad_equals_xla_pool_grad():
    """jax.grad through the Pallas op == grad through nn.max_pool
    (SelectAndScatter), the production stem's current op."""
    y = jnp.asarray(_rand(2, 12, 12, 64, seed=7))

    def loss_pallas(x):
        return jnp.sum(
            stem_pool.max_pool_3x3_s2_pallas(x, True) ** 2
        )

    def loss_xla(x):
        return jnp.sum(oracle.reference_maxpool(x) ** 2)

    g_p = jax.grad(loss_pallas)(y)
    g_x = jax.grad(loss_xla)(y)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-6, atol=1e-6
    )


def test_bf16_roundtrip():
    y = jnp.asarray(_rand(2, 8, 8, 64, seed=9)).astype(jnp.bfloat16)
    out_p, idx_p = stem_pool.pool_fwd_pallas(y, interpret=True)
    out_o, idx_o = oracle.pool_argmax_forward(y)
    assert out_p.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out_p, np.float32), np.asarray(out_o, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(idx_p, np.int32), np.asarray(idx_o)
    )


def test_dispatch_fallback_on_cpu():
    """On non-TPU backends the dispatcher must use the XLA formulation."""
    y = jnp.asarray(_rand(1, 6, 6, 64, seed=11))
    out = stem_pool.max_pool_3x3_s2(y)
    ref = oracle.reference_maxpool(y)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
