"""LN-Act / Mamba SSM correctness: the associative-scan selective scan must
equal the naive sequential recurrence, and the block must be causal."""

import numpy as np

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.models.tokenizers.ln_act import (
    LNActEncoder,
    MambaBlock,
    _selective_scan,
)


def test_selective_scan_matches_naive():
    rng = np.random.RandomState(0)
    B, T, Di, N = 2, 7, 4, 3
    u = jnp.asarray(rng.randn(B, T, Di).astype(np.float32))
    dt = jnp.asarray(np.abs(rng.randn(B, T, Di)).astype(np.float32) * 0.1)
    A = -jnp.asarray(np.abs(rng.randn(Di, N)).astype(np.float32))
    Bm = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
    C = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
    D = jnp.asarray(rng.randn(Di).astype(np.float32))

    y = _selective_scan(u, dt, A, Bm, C, D)

    # naive sequential recurrence
    h = np.zeros((B, Di, N), np.float32)
    y_ref = np.zeros((B, T, Di), np.float32)
    for t in range(T):
        dA = np.exp(np.asarray(dt)[:, t, :, None] * np.asarray(A)[None])
        dBu = (
            np.asarray(dt)[:, t, :, None]
            * np.asarray(Bm)[:, t, None, :]
            * np.asarray(u)[:, t, :, None]
        )
        h = dA * h + dBu
        y_ref[:, t] = np.einsum("bdn,bn->bd", h, np.asarray(C)[:, t]) + (
            np.asarray(u)[:, t] * np.asarray(D)[None]
        )
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-3)


def test_mamba_block_causal():
    model = MambaBlock(d_model=8, d_state=4, d_conv=3, expand=2)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 10, 8).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    y1 = model.apply(variables, x)
    x2 = x.at[0, -1].add(10.0)
    y2 = model.apply(variables, x2)
    # earlier outputs unchanged (causality)
    np.testing.assert_allclose(
        np.asarray(y1[0, :-1]), np.asarray(y2[0, :-1]), atol=1e-6
    )
    assert not np.allclose(np.asarray(y1[0, -1]), np.asarray(y2[0, -1]))


def test_ln_act_encoder_shapes():
    model = LNActEncoder(action_dim=12, output_dim=20)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 5, 12).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (15, 20)
    assert np.all(np.isfinite(np.asarray(out)))


def _naive_scan(u, dt, A, Bm, C, D):
    """Slow, obviously-correct sequential recurrence (the mamba_ssm update:
    h_t = exp(dt_t A) h_{t-1} + dt_t B_t u_t ; y_t = C_t.h_t + D u_t)."""
    u, dt, A, Bm, C, D = map(np.asarray, (u, dt, A, Bm, C, D))
    B_, T, Di = u.shape
    N = A.shape[1]
    h = np.zeros((B_, Di, N), np.float64)
    y = np.zeros((B_, T, Di), np.float64)
    for t in range(T):
        dA = np.exp(dt[:, t, :, None].astype(np.float64) * A[None])
        dBu = (
            dt[:, t, :, None].astype(np.float64)
            * Bm[:, t, None, :]
            * u[:, t, :, None]
        )
        h = dA * h + dBu
        y[:, t] = np.einsum("bdn,bn->bd", h, C[:, t]) + u[:, t] * D[None]
    return y


import pytest


@pytest.mark.parametrize(
    "B,T,Di,N",
    [(1, 1, 2, 2), (3, 33, 24, 8), (2, 64, 8, 16), (4, 10, 12, 8)],
)
@pytest.mark.slow
def test_selective_scan_matches_naive_shapes(B, T, Di, N):
    """Associative scan == float64 sequential recurrence over a sweep of
    shapes incl. T=1 and non-power-of-two T (scan edge cases)."""
    rng = np.random.RandomState(B * 1000 + T)
    u = jnp.asarray(rng.randn(B, T, Di).astype(np.float32))
    dt = jnp.asarray(np.abs(rng.randn(B, T, Di)).astype(np.float32) * 0.2)
    A = -jnp.asarray(np.abs(rng.randn(Di, N)).astype(np.float32))
    Bm = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
    C = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
    D = jnp.asarray(rng.randn(Di).astype(np.float32))
    y = _selective_scan(u, dt, A, Bm, C, D)
    y_ref = _naive_scan(u, dt, A, Bm, C, D)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_mamba_block_matches_sequential_stepping():
    """The whole block (in_proj, causal depthwise conv, dt/B/C projections,
    ZOH discretization, scan, gate, out_proj) must equal a step-by-step
    numpy re-execution that carries conv state and SSM state one timestep
    at a time — exactly how mamba_ssm's inference mode steps."""
    d_model, d_state, d_conv, expand = 12, 8, 4, 2
    d_inner = expand * d_model
    dt_rank = int(np.ceil(d_model / 16))
    model = MambaBlock(
        d_model=d_model, d_state=d_state, d_conv=d_conv, expand=expand
    )
    rng = np.random.RandomState(5)
    B_, T = 2, 9
    x = rng.randn(B_, T, d_model).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(model.apply(variables, jnp.asarray(x)))

    p = jax.tree_util.tree_map(np.asarray, variables["params"])

    def silu(v):
        return v / (1.0 + np.exp(-v))

    def softplus(v):
        return np.log1p(np.exp(v))

    A = -np.exp(p["A_log"])                    # [Di, N]
    Dp = p["D"]
    conv_k = p["conv1d"]["kernel"]             # [k, 1, Di] (depthwise)
    conv_b = p["conv1d"]["bias"]

    y_ref = np.zeros((B_, T, d_model))
    for b in range(B_):
        conv_state = np.zeros((d_conv - 1, d_inner))
        h = np.zeros((d_inner, d_state))
        for t in range(T):
            xz = x[b, t] @ p["in_proj"]["kernel"]
            u_t, z_t = xz[:d_inner], xz[d_inner:]
            # causal depthwise conv: window = [state..., u_t]
            window = np.concatenate([conv_state, u_t[None]], axis=0)  # [k, Di]
            u_c = np.einsum("kd,kd->d", window, conv_k[:, 0, :]) + conv_b
            conv_state = window[1:]
            u_c = silu(u_c)
            x_dbl = u_c @ p["x_proj"]["kernel"]
            dt_raw = x_dbl[:dt_rank]
            B_t = x_dbl[dt_rank:dt_rank + d_state]
            C_t = x_dbl[dt_rank + d_state:]
            dt_t = softplus(dt_raw @ p["dt_proj"]["kernel"] + p["dt_proj"]["bias"])
            dA = np.exp(dt_t[:, None] * A)
            h = dA * h + dt_t[:, None] * B_t[None, :] * u_c[:, None]
            y_t = h @ C_t + u_c * Dp
            y_t = y_t * silu(z_t)
            y_ref[b, t] = y_t @ p["out_proj"]["kernel"]

    np.testing.assert_allclose(y, y_ref, atol=5e-5, rtol=1e-3)
