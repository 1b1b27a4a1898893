"""3x3 / stride-2 / pad-1 max pooling with RECORDED argmax indices.

Round-4 stem-backward experiment (VERDICT r3 #3b). XLA lowers the
gradient of ``reduce_window(max)`` to SelectAndScatter — 11.2 ms at the
flagship stem activation [3072, 58, 58, 64] bf16, the single most
expensive non-conv op in the trunk. Round 3's five replacements all
RECOMPUTED the selection in the backward (ops/pool.py table); this op
instead records the 4-bit window-offset argmax in the FORWARD (9 strided
compares the compiler fuses into the stem epilogue), so the backward is
pure index-routed gradient placement with no max recomputation and no
read of the forward activation:

    dy[i, j] = sum over the <= 4 windows (p, q) covering (i, j)
               of dz[p, q] * (idx[p, q] == offset(i, j, p, q))

implemented as 9 masked strided scatter-adds into one padded accumulator
(each mask is OUTPUT-sized, 1/4 of the input, so peak temp memory stays
far below the round-3 "9-tap upsample" formulation that OOMed).

Tie semantics: the recorded index is the FIRST maximal offset in
row-major window order — exactly torch's MaxPool2d/XLA's argmax choice,
so this backward is bit-compatible with the reference semantics
(reference stem: robomimic/models/base_nets.py:550, torchvision
resnet18 maxpool).

Status: implemented + exactness-tested (tests/test_pool_argmax.py);
adoption is gated on the on-chip measurement in
``scripts/mfu_campaign.py --exps pool_argmax``.
"""

import jax
import jax.numpy as jnp

_OFFSETS = tuple((di, dj) for di in range(3) for dj in range(3))


def _out_hw(h, w):
    # padded conv-grid pooling: floor((H - 1) / 2) + 1 (torch, pad 1)
    return (h - 1) // 2 + 1, (w - 1) // 2 + 1


def pool_argmax_forward(y):
    """[N, H, W, C] -> (max [N, Ho, Wo, C], idx int32 in [0, 9)).

    idx is the row-major offset of the FIRST maximum in each 3x3 window
    (torch/XLA tie semantics) on the PADDED grid."""
    n, h, w, c = y.shape
    ho, wo = _out_hw(h, w)
    neg = jnp.asarray(-jnp.inf, y.dtype) if jnp.issubdtype(
        y.dtype, jnp.floating) else jnp.iinfo(y.dtype).min
    ypad = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    best = None
    bidx = None
    for k, (di, dj) in enumerate(_OFFSETS):
        v = jax.lax.slice(
            ypad, (0, di, dj, 0),
            (n, di + 2 * ho - 1, dj + 2 * wo - 1, c),
            (1, 2, 2, 1),
        )
        if best is None:
            best = v
            bidx = jnp.zeros(v.shape, jnp.int32)
        else:
            # strict '>' keeps the EARLIEST maximal offset (torch argmax).
            # bf16 compares are fine in XLA (the Mosaic restriction does
            # not apply here); no casts needed.
            take = v > best
            best = jnp.where(take, v, best)
            bidx = jnp.where(take, jnp.int32(k), bidx)
    return best, bidx


def pool_argmax_backward(idx, dz, input_hw):
    """Index-routed gradient: 9 masked strided adds into a padded
    accumulator (no recomputation, no forward-activation read)."""
    h, w = input_hw
    n, ho, wo, c = dz.shape
    acc = jnp.zeros((n, h + 2, w + 2, c), dz.dtype)
    for k, (di, dj) in enumerate(_OFFSETS):
        contrib = jnp.where(idx == k, dz, jnp.zeros_like(dz))
        acc = acc.at[:, di:di + 2 * ho - 1:2, dj:dj + 2 * wo - 1:2, :].add(
            contrib
        )
    return acc[:, 1:h + 1, 1:w + 1, :]


@jax.custom_vjp
def max_pool_3x3_s2_argmax(y):
    """Drop-in for ``nn.max_pool(y, (3, 3), strides=(2, 2),
    padding=((1, 1), (1, 1)))`` with a recorded-argmax backward."""
    return pool_argmax_forward(y)[0]


def _fwd(y):
    out, idx = pool_argmax_forward(y)
    return out, (idx, y.shape[1], y.shape[2])


def _bwd(res, dz):
    idx, h, w = res
    return (pool_argmax_backward(idx, dz, (h, w)),)


max_pool_3x3_s2_argmax.defvjp(_fwd, _bwd)


def reference_maxpool(y):
    """The trunk's current op (nn.max_pool semantics) for comparison."""
    import flax.linen as nn

    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
