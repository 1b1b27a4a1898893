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
