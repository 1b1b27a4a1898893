"""Pallas TPU kernels for the ResNet stem's 3x3/stride-2/pad-1 max pool —
the round-5 (and FINAL) attempt at the trunk's one wasteful op.

Why this exists: at flagship shapes ([3072, 58, 58, 64] bf16) XLA lowers
the pool's backward to SelectAndScatter (11.2 ms, ~7x its own forward,
~3x its traffic floor; docs/design.md §4). Seven measured replacement
formulations (rounds 2-4) lost; the one untried configuration is a
Pallas pair where the FORWARD records the 4-bit window-offset argmax and
the BACKWARD is a pure index-routed gather — both with layouts chosen so
NO strided vector op ever materializes:

* The input's (W, C) dims are viewed lane-packed as (W/2, 2C) — for the
  stem exactly (29, 128), a full VPU lane tile. Even/odd columns become
  STATIC half-lane slices; stride-2 column windows vanish.
* Even/odd rows are separated by reshaping the UNTILED H dim (free), so
  stride-2 row windows become contiguous shifts along untiled axes.
* The backward never reads the forward activation: input cell (i, j) is
  covered by <= 4 pool windows; which-window-won is answered by the
  recorded int8 index, so dx is 9 masked products + 3 contiguous shifts
  + 2 lane-concats per tile.

Traffic floors at flagship shapes: forward reads 1.32 GB + writes
0.33 GB (max) + 0.17 GB (idx) ~ 2.2 ms; backward reads 0.5 GB + writes
1.32 GB ~ 2.2 ms — vs the 1.6 + 11.2 ms XLA pair. Net step budget if
achieved: ~-8 ms of ~120 (=> the >= 5% adoption bar).

Tie semantics: the recorded index is the FIRST maximal offset in
row-major window order (strict > scan) — identical to torch MaxPool2d /
XLA SelectAndScatter (reference stem robomimic/models/base_nets.py:550),
verified bit-exactly against ``ops/pool_argmax`` in
tests/test_stem_pool_pallas.py.

Constraints for the Pallas path: H, W even; 2C a multiple of 128;
dispatched only on TPU (``use_pallas_pool`` auto-falls back to
``ops/pool_argmax``'s XLA formulation otherwise, which keeps identical
semantics on every backend).
"""

import functools

import jax
import jax.numpy as jnp

try:  # pallas TPU backend (absent on some CPU-only builds)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pl = pltpu = None
    _HAS_PLTPU = False

_NEG = -3.0e38  # finite -inf stand-in (safe in f32; never selected)


# ---------------------------------------------------------------------------
# forward: fused max + first-max argmax recording
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, out_ref, idx_ref, *, c, interpret):
    """x_ref [F, H, W/2, 2C] lane-packed; out/idx [F, H/2, W/2, C]."""
    x = x_ref[:].astype(jnp.float32)
    f, h, wp, l2 = x.shape
    ho = h // 2

    # even/odd ROW split via the untiled H dim (free reshape)
    x5 = x.reshape(f, ho, 2, wp, l2)
    xe = x5[:, :, 0]                     # input rows 2m      [F,Ho,Wp,2C]
    xo = x5[:, :, 1]                     # input rows 2m+1

    neg = jnp.full((f, 1, wp, l2), _NEG, jnp.float32)
    r_top = jnp.concatenate([neg, xo[:, :-1]], axis=1)   # rows 2oi-1 (di=0)
    r_mid = xe                                           # rows 2oi   (di=1)
    r_bot = xo                                           # rows 2oi+1 (di=2)

    # Mosaic layout discipline: a bare half-lane slice row[..., c:] yields
    # a value at lane OFFSET c, and mixing offsets across sublane concats
    # is unimplemented ("result/input offset mismatch on non-concat
    # dimension"); rotate the lanes first so BOTH halves live at offset 0.
    roll = jnp.roll if interpret else pltpu.roll

    def cols(row):
        """Column candidates of one window row: (dj=0, dj=1, dj=2)."""
        even = row[..., :c]              # col 2oj      (dj=1), offset 0
        # lanes have period 2c, so roll(+c) == roll(-c): the odd half
        # lands at lane 0 (pltpu.roll requires non-negative shifts)
        odd = roll(row, shift=c, axis=3)[..., :c]    # col 2oj+1, offset 0
        negc = jnp.full((f, ho, 1, c), _NEG, jnp.float32)
        prev_odd = jnp.concatenate([negc, odd[:, :, :-1]], axis=2)  # 2oj-1
        return prev_odd, even, odd

    best = None
    bidx = None
    for di, row in enumerate((r_top, r_mid, r_bot)):
        for dj, v in enumerate(cols(row)):
            k = 3 * di + dj
            if best is None:
                best = v
                bidx = jnp.zeros(v.shape, jnp.int32)
            else:
                take = v > best          # strict >: FIRST max wins (torch)
                best = jnp.where(take, v, best)
                bidx = jnp.where(take, jnp.int32(k), bidx)

    out_ref[:] = best.astype(out_ref.dtype)
    idx_ref[:] = bidx.astype(jnp.int8)


# ---------------------------------------------------------------------------
# backward: index-routed gather (no activation read, no recompute)
# ---------------------------------------------------------------------------

def _bwd_kernel(idx_ref, g_ref, dx_ref, *, c):
    """idx/g [F, Ho, Wo, C]; dx_ref [F, H, W/2, 2C] lane-packed."""
    g = g_ref[:].astype(jnp.float32)
    idx = idx_ref[:].astype(jnp.int32)
    f, ho, wo, _ = g.shape

    def col_route(di):
        """Distribute one window-row's grads onto (even, odd) input cols."""
        m = [(idx == 3 * di + dj).astype(jnp.float32) for dj in range(3)]
        even = g * m[1]                                   # col 2oj  (dj=1)
        gm0 = g * m[0]
        zero = jnp.zeros_like(gm0[:, :, :1])
        # odd col 2q+1 <- dj=2 at oj=q  +  dj=0 at oj=q+1
        odd = g * m[2] + jnp.concatenate([gm0[:, :, 1:], zero], axis=2)
        return even, odd

    e_even, e_odd = col_route(1)          # even input rows (2m <- row m)
    a_even, a_odd = col_route(2)          # odd rows, part from row m
    b_even, b_odd = col_route(0)          # odd rows, part from row m+1
    zrow = jnp.zeros_like(b_even[:, :1])
    o_even = a_even + jnp.concatenate([b_even[:, 1:], zrow], axis=1)
    o_odd = a_odd + jnp.concatenate([b_odd[:, 1:], zrow], axis=1)

    row_even = jnp.concatenate([e_even, e_odd], axis=-1)  # [F,Ho,Wo,2C]
    row_odd = jnp.concatenate([o_even, o_odd], axis=-1)
    dx = jnp.stack([row_even, row_odd], axis=2)           # [F,Ho,2,Wo,2C]
    dx = dx.reshape(f, 2 * ho, wo, 2 * c)
    dx_ref[:] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _pick_block(n, per_frame_bytes, budget=6 * 1024 * 1024):
    """Frames per grid step: fit compute + double-buffered DMA in VMEM."""
    f = max(1, budget // max(1, per_frame_bytes))
    while n % f:
        f -= 1
    return f


def pool_fwd_pallas(y, interpret=False):
    """[N, H, W, C] -> (max [N,Ho,Wo,C], idx int8). H, W even; 2C%128==0."""
    n, h, w, c = y.shape
    assert h % 2 == 0 and w % 2 == 0 and (2 * c) % 128 == 0, (n, h, w, c)
    ho, wo, wp = h // 2, w // 2, w // 2
    xp = y.reshape(n, h, wp, 2 * c)  # contiguous lane-packing (free)

    itemsize = jnp.dtype(y.dtype).itemsize
    f = _pick_block(n, h * w * c * (itemsize + 4))  # + f32 compute copy
    grid = (n // f,)

    out, idx = pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, interpret=interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((f, h, wp, 2 * c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((f, ho, wo, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((f, ho, wo, c), lambda i: (i, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ho, wo, c), y.dtype),
            jax.ShapeDtypeStruct((n, ho, wo, c), jnp.int8),
        ],
        interpret=interpret,
    )(xp)
    return out, idx


def pool_bwd_pallas(idx, g, interpret=False):
    """(idx int8 [N,Ho,Wo,C], dz [N,Ho,Wo,C]) -> dx [N, 2Ho, 2Wo, C]."""
    n, ho, wo, c = g.shape
    h, w = 2 * ho, 2 * wo

    itemsize = jnp.dtype(g.dtype).itemsize
    f = _pick_block(n, h * w * c * (itemsize + 4))
    grid = (n // f,)

    dxp = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((f, ho, wo, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((f, ho, wo, c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((f, h, wo, 2 * c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wo, 2 * c), g.dtype),
        interpret=interpret,
    )(idx, g)
    return dxp.reshape(n, h, w, c)


# ---------------------------------------------------------------------------
# custom-vjp op + dispatch
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_3x3_s2_pallas(y, interpret=False):
    """Drop-in for ``nn.max_pool(y, (3,3), strides=(2,2), padding=1)`` with
    a recorded-argmax Pallas backward (torch/XLA-exact tie routing)."""
    return pool_fwd_pallas(y, interpret=interpret)[0]


def _vjp_fwd(y, interpret):
    out, idx = pool_fwd_pallas(y, interpret=interpret)
    return out, idx


def _vjp_bwd(interpret, idx, dz):
    return (pool_bwd_pallas(idx, dz, interpret=interpret),)


max_pool_3x3_s2_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def _pallas_ok(shape):
    n, h, w, c = shape
    return (
        _HAS_PLTPU
        and h % 2 == 0 and w % 2 == 0 and (2 * c) % 128 == 0
        and h >= 2 and w >= 2
    )


def max_pool_3x3_s2(y):
    """Backend dispatch: Pallas pair on TPU (shapes permitting), the exact
    XLA recorded-argmax formulation (``ops/pool_argmax``) elsewhere —
    identical semantics either way."""
    if _pallas_ok(y.shape) and jax.default_backend() == "tpu":
        return max_pool_3x3_s2_pallas(y)
    from robot_manipulation_vq_vae_tpu.ops.pool_argmax import (
        max_pool_3x3_s2_argmax,
    )

    return max_pool_3x3_s2_argmax(y)
