"""Max-pooling with an alternative (equality-routing) backward.

**Status: measured and NOT adopted** — the trunk keeps ``nn.max_pool``.
This op is the best challenger from the round-3 stem-backward campaign
(docs/design.md §4): XLA lowers the gradient of ``reduce_window(max)`` to
SelectAndScatter, which costs 11.2 ms at the flagship stem activation
[3072, 58, 58, 64] bf16 (~7x the forward, ~9% of the train step), but
every replacement measured WORSE on this backend:

=====================================  =========================
formulation (fwd+bwd, flagship shape)  measured
=====================================  =========================
XLA native (SelectAndScatter)          **12.8 ms** (kept)
9-tap input-sized upsample, pure XLA   OOM (~12 x 1.25 GB temps)
parity-reshape quadrants, pure XLA     16.4 ms (relayout passes)
parity broadcast-masks, pure XLA       41.8 ms ((P, 2, C) layout
                                       breaks (8, 128) tiling)
VMEM Pallas routing kernel             37.6 ms (1536 small grid
(``ops/pallas/pool_kernel.py``)        steps, DMA-latency bound)
=====================================  =========================

The op is kept (fully tested, exact forward) as the documented experiment
artifact and for future backends where the scatter/fusion trade-off
differs. Non-3x3/s2 configurations use XLA's native gradient.

Tie semantics (documented divergence): where a window contains several
positions exactly equal to the max, the fast path routes the cotangent to
ALL of them (a valid subgradient); torch/XLA route to a single argmax.
After ReLU the common duplicated value is exactly 0, where the upstream
ReLU backward multiplies the gradient by 0 anyway.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _neg_inf(dtype):
    # a PYTHON scalar, not a traced array: lax.reduce_window only lowers
    # the fast reduce-window-max path for concrete -inf init values
    return -jnp.inf if jnp.issubdtype(
        dtype, jnp.floating
    ) else jnp.iinfo(dtype).min


def _pool_fwd_raw(x, window, strides, padding):
    return lax.reduce_window(
        x, _neg_inf(x.dtype), lax.max,
        (1,) + window + (1,), (1,) + strides + (1,),
        ((0, 0),) + padding + ((0, 0),),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool(x, window=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))):
    """NHWC max pool; identical forward to ``nn.max_pool``, fast backward."""
    return _pool_fwd_raw(x, window, strides, padding)


def max_pool_3x3_s2(x):
    """The ResNet stem pool: 3x3 window, stride 2, padding (1, 1)."""
    return max_pool(x, (3, 3), (2, 2), ((1, 1), (1, 1)))


def _fwd(x, window, strides, padding):
    z = _pool_fwd_raw(x, window, strides, padding)
    return z, (x, z)


def _bwd(window, strides, padding, res, dz):
    x, z = res
    h, w = x.shape[1], x.shape[2]
    if (
        window == (3, 3) and strides == (2, 2)
        and padding == ((1, 1), (1, 1)) and h % 2 == 0 and w % 2 == 0
        and z.shape[1] == h // 2 and z.shape[2] == w // 2
        and x.ndim == 4
    ):
        from robot_manipulation_vq_vae_tpu.ops.pallas.pool_kernel import (
            max_pool_3x3_s2_bwd_pallas,
        )

        on_tpu = jax.default_backend() not in ("cpu",)
        return (
            max_pool_3x3_s2_bwd_pallas(x, z, dz, interpret=not on_tpu),
        )
    # other configurations: XLA's native gradient (SelectAndScatter)
    _, vjp = jax.vjp(
        lambda x: _pool_fwd_raw(x, window, strides, padding), x
    )
    return vjp(dz)


max_pool.defvjp(_fwd, _bwd)
