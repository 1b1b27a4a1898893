"""Pallas TPU kernel: backward of 3x3 / stride-2 / pad-1 max pooling.

**Status: measured and NOT adopted** (37.6 ms fwd+bwd at flagship shapes
vs XLA SelectAndScatter's 12.8 ms — see ops/pool.py for the campaign
table). The kernel lowers and is numerically exact, but the VMEM budget
forces 2-frame blocks -> a 1536-step grid whose per-step DMA latency
dominates; a future halo-aware row-blocked variant could revisit this.
Kept as the documented experiment artifact.

XLA lowers max-pool gradients to SelectAndScatter, measured at 11.2 ms for
the flagship stem activation [3072, 58, 58, 64] bf16 — 7x the bandwidth
floor and ~9% of the whole train step (scripts/mfu_campaign.py
``epilogue_decomp``). Pure-XLA reformulations fail on layout: upsampling
the 9 window taps to input resolution materializes ~12 input-sized temps
(OOM), and parity-reshape variants put a size-2 dimension next to the
channel dim, wrecking (8, 128) tiling (measured 16-42 ms).

This kernel routes the cotangent VMEM-resident with layout-native ops
only. The routing rule:

    dx[i, j] = sum over pooled windows (p, q) covering (i, j)
               of dz[p, q] * (x[i, j] == z[p, q])

With stride 2 / window 3, position i = 2p + r is covered by window p
(r = 0) or {p, p+1} (r = 1). The COLUMN parity is packed into the lane
dimension before the call — x is viewed (free, contiguous reshape) as
[N, H, W/2, 2C], lanes [0, C) = even columns, [C, 2C) = odd — so the
column-shifted terms become lane-halved concats (the even half compares
against -inf, i.e. never matches). ROW parity uses a repeat along the
untiled row axis plus an iota parity mask. Four compare-select terms cover
all nine taps; HBM traffic is one read of x/z/dz and one write of dx.

Tie semantics: the cotangent routes to EVERY position equal to its window
max (torch/XLA route to a single argmax) — see ops/pool.py docstring.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _neg_inf(dtype):
    return -jnp.inf if jnp.issubdtype(dtype, jnp.floating) else (
        jnp.iinfo(dtype).min
    )


def _pool_bwd_kernel(x2_ref, z_ref, dz_ref, dx2_ref):
    x2 = x2_ref[...]      # [bn, H, P_w, 2C] — lanes split by column parity
    z = z_ref[...]        # [bn, P_h, P_w, C]
    dz = dz_ref[...]
    fz = jnp.full_like(z, _neg_inf(z.dtype))

    def cshift(t, fill):  # t[:, :, q+1, :] with fill past the boundary
        return jnp.concatenate(
            [t[:, :, 1:, :], jnp.full_like(t[:, :, :1, :], fill)], axis=2
        )

    def rshift(t, fill):  # t[:, p+1, :, :]
        return jnp.concatenate(
            [t[:, 1:], jnp.full_like(t[:, :1], fill)], axis=1
        )

    def lanes(even, odd):  # pack per-column-parity comparands into lanes
        return jnp.concatenate([even, odd], axis=-1)

    def up_rows(t):  # pooled rows -> input rows: value at 2p + r = t[p]
        return jnp.repeat(t, 2, axis=1)

    zero2 = jnp.zeros_like(x2)
    z_c1, d_c1 = cshift(z, _neg_inf(z.dtype)), cshift(dz, 0)
    z_r1, d_r1 = rshift(z, _neg_inf(z.dtype)), rshift(dz, 0)
    z_b1, d_b1 = cshift(z_r1, _neg_inf(z.dtype)), cshift(d_r1, 0)
    dzero = jnp.zeros_like(dz)

    odd_row = (
        jax.lax.broadcasted_iota(jnp.int32, x2.shape, 1) % 2
    ) == 1

    # equality compares run in f32: the VPU has no bf16 compare, and
    # bf16 -> f32 is lossless so exactness is preserved
    xf = x2.astype(jnp.float32)

    def eq(comparand):
        return xf == up_rows(comparand).astype(jnp.float32)

    # window (p, q): matches every parity
    dx2 = jnp.where(eq(lanes(z, z)), up_rows(lanes(dz, dz)), zero2)
    # window (p, q+1): odd columns only (even lanes compare against -inf)
    dx2 = dx2 + jnp.where(
        eq(lanes(fz, z_c1)), up_rows(lanes(dzero, d_c1)), zero2
    )
    # window (p+1, q): odd rows only
    dx2 = dx2 + jnp.where(
        eq(lanes(z_r1, z_r1)) & odd_row,
        up_rows(lanes(d_r1, d_r1)), zero2,
    )
    # window (p+1, q+1): odd rows AND odd columns
    dx2 = dx2 + jnp.where(
        eq(lanes(fz, z_b1)) & odd_row,
        up_rows(lanes(dzero, d_b1)), zero2,
    )
    dx2_ref[...] = dx2


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def max_pool_3x3_s2_bwd_pallas(x, z, dz, block_n=2, interpret=False):
    """dx for z = max_pool_3x3_s2(x); H, W even, pooled dims H/2, W/2."""
    n, h, w, c = x.shape
    p_h, p_w = z.shape[1], z.shape[2]
    bn = block_n
    while n % bn:
        bn //= 2
    bn = max(bn, 1)

    x2 = x.reshape(n, h, p_w, 2 * c)  # contiguous: free reinterpretation
    grid = (n // bn,)
    dx2 = pl.pallas_call(
        _pool_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, h, p_w, 2 * c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bn, p_h, p_w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bn, p_h, p_w, c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, h, p_w, 2 * c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, p_w, 2 * c), x.dtype),
        interpret=interpret,
    )(x2, z, dz)
    return dx2.reshape(n, h, w, c)
