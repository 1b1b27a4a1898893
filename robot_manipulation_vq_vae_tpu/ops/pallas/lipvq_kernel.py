"""Pallas TPU kernel: fused nearest-code assignment + codebook gather.

Computes, for a batch of latents z [N, D] against a codebook C [K, D]:

    idx[n]  = argmin_k ||z[n] - C[k]||^2
    z_q[n]  = C[idx[n]]

in one VMEM-resident pass per N-tile:
  * distances via the expanded quadratic form - two MXU matmuls
    (z @ C^T and the precomputed per-code norms) instead of the [N, K, D]
    difference tensor the reference materializes
    (``backbone_lfqvae_v5.py:39-46``),
  * argmin on the VPU,
  * gather as a one-hot matmul (MXU) so no scalar loop touches the lanes.

The codebook is small (<= 1024 x 512 = 2 MB fp32) and is kept whole in VMEM
across the grid; z is tiled over N.

Gradient: a custom VJP treats idx as non-differentiable and routes the
cotangent of z_q into the codebook via segment-sum (exactly the gradient of
``codebook[idx]`` in the reference torch code).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU builds too, but guard anyway
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _assign_kernel(z_ref, cb_ref, csq_ref, idx_ref, zq_ref):
    z = z_ref[:].astype(jnp.float32)                     # [TN, D]
    cb = cb_ref[:].astype(jnp.float32)                   # [K, D]
    c_sq = csq_ref[:]                                    # [1, K]

    cross = jnp.dot(z, cb.T, preferred_element_type=jnp.float32)   # [TN, K]
    # ||z||^2 is constant across K - it cannot change the argmin, skip it.
    dist = c_sq - 2.0 * cross                            # [TN, K]
    idx = jnp.argmin(dist, axis=-1)                      # [TN]

    k_ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, dimension=1)
    onehot = (k_ids == idx[:, None]).astype(jnp.float32)  # [TN, K]
    zq_ref[:] = jnp.dot(onehot, cb, preferred_element_type=jnp.float32).astype(
        zq_ref.dtype
    )
    idx_ref[:] = idx[:, None].astype(jnp.int32)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _assign_pallas_raw(z, codebook, block_n=512, interpret=False):
    n, d = z.shape
    k = codebook.shape[0]
    block_n = min(block_n, _round_up(max(n, 8), 8))
    n_pad = _round_up(n, block_n)
    if n_pad != n:
        z = jnp.pad(z, ((0, n_pad - n), (0, 0)))

    c_sq = jnp.sum(
        codebook.astype(jnp.float32) * codebook.astype(jnp.float32), axis=-1
    )[None, :]  # [1, K]

    grid = (n_pad // block_n,)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        vmem = pltpu.VMEM
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(1.2 * (block_n * d + k * d + block_n * k + k) * 4)
            + (1 << 20),
        )
    else:
        vmem = None

    def spec(shape, index_map):
        if vmem is None:
            return pl.BlockSpec(shape, index_map)
        return pl.BlockSpec(shape, index_map, memory_space=vmem)

    idx, z_q = pl.pallas_call(
        _assign_kernel,
        grid=grid,
        in_specs=[
            spec((block_n, d), lambda i: (i, 0)),
            spec((k, d), lambda i: (0, 0)),
            spec((1, k), lambda i: (0, 0)),
        ],
        out_specs=[
            spec((block_n, 1), lambda i: (i, 0)),
            spec((block_n, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, d), z.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k * d * 2,
            bytes_accessed=(n_pad * d + k * d + n_pad * k) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
        **kwargs,
    )(z, codebook, c_sq)
    return idx[:n, 0], z_q[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def l2_nearest_pallas(z, codebook, block_n=512, interpret=False):
    """Fused nearest-code assign + gather. Returns (idx [N], z_q [N, D])."""
    return _assign_pallas_raw(z, codebook, block_n=block_n, interpret=interpret)


def _fwd(z, codebook, block_n, interpret):
    idx, z_q = _assign_pallas_raw(z, codebook, block_n=block_n, interpret=interpret)
    return (idx, z_q), (idx, codebook.shape[0])


def _bwd(block_n, interpret, res, cotangents):
    idx, num_codes = res
    _, g_zq = cotangents
    # d/d_codebook of gather: scatter-add of cotangents by assignment
    d_cb = jax.ops.segment_sum(g_zq, idx, num_segments=num_codes)
    return jnp.zeros_like(g_zq), d_cb


l2_nearest_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# fused tokenize+detokenize megakernel (inference/serving path)
# ---------------------------------------------------------------------------

def _roundtrip_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, wl_ref, bl_ref,
                      cb_ref, csq_ref, w3_ref, b3_ref, w4_ref, b4_ref,
                      w5_ref, b5_ref, recon_ref, idx_ref):
    """Whole LipVQ roundtrip for one N-tile, VMEM-resident: encoder MLP ->
    Lipschitz latent -> nearest-code assign -> gather -> decoder MLP. Every
    weight (incl. the 1024x210 codebook) stays in VMEM across the grid, so
    no intermediate touches HBM."""

    def gelu(v):
        # Pallas TPU has no erf lowering; the tanh-approximate GELU is the
        # standard serving tradeoff (|err| < 1e-3, see test tolerance)
        return jax.nn.gelu(v, approximate=True)

    x = x_ref[:].astype(jnp.float32)
    h = gelu(jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:])
    h = gelu(jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:])
    z = jax.nn.sigmoid(
        jnp.dot(h, wl_ref[:], preferred_element_type=jnp.float32) + bl_ref[:]
    )
    cb = cb_ref[:]
    cross = jnp.dot(z, cb.T, preferred_element_type=jnp.float32)
    dist = csq_ref[:] - 2.0 * cross
    idx = jnp.argmin(dist, axis=-1)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, dimension=1)
    onehot = (k_ids == idx[:, None]).astype(jnp.float32)
    zq = jnp.dot(onehot, cb, preferred_element_type=jnp.float32)
    d = gelu(jnp.dot(zq, w3_ref[:], preferred_element_type=jnp.float32) + b3_ref[:])
    d = gelu(jnp.dot(d, w4_ref[:], preferred_element_type=jnp.float32) + b4_ref[:])
    recon_ref[:] = (
        jnp.dot(d, w5_ref[:], preferred_element_type=jnp.float32) + b5_ref[:]
    ).astype(recon_ref.dtype)
    idx_ref[:] = idx[:, None].astype(jnp.int32)


def lipvq_roundtrip_pallas(x, enc_w, lip_w, codebook, dec_w, block_n=512,
                           interpret=False):
    """Fused tokenize+detokenize.

    enc_w: ((W1 [in,64], b1), (W2 [64,H], b2)); lip_w: (Wl_norm [H,L], bl)
    (already L-inf row-normalized); dec_w: ((W3 [L,64], b3), (W4 [64,H], b4),
    (W5 [H,out], b5)). Returns (recon [N,out], idx [N]).
    """
    n, in_dim = x.shape
    (w1, b1), (w2, b2) = enc_w
    wl, bl = lip_w
    (w3, b3), (w4, b4), (w5, b5) = dec_w
    k = codebook.shape[0]
    out_dim = w5.shape[1]
    block_n = min(block_n, _round_up(max(n, 8), 8))
    n_pad = _round_up(n, block_n)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    c_sq = jnp.sum(
        codebook.astype(jnp.float32) * codebook.astype(jnp.float32), axis=-1
    )[None, :]

    def row(v):
        return v.reshape(1, -1)

    grid = (n_pad // block_n,)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        vmem = pltpu.VMEM
    else:
        vmem = None

    def spec(shape, index_map):
        if vmem is None:
            return pl.BlockSpec(shape, index_map)
        return pl.BlockSpec(shape, index_map, memory_space=vmem)

    def rep(arr):  # whole-array (replicated across grid) spec
        return spec(arr.shape, lambda i: tuple(0 for _ in arr.shape))

    inputs = [
        x, w1, row(b1), w2, row(b2), wl, row(bl), codebook, c_sq,
        w3, row(b3), w4, row(b4), w5, row(b5),
    ]
    in_specs = [spec((block_n, in_dim), lambda i: (i, 0))] + [
        rep(a) for a in inputs[1:]
    ]
    recon, idx = pl.pallas_call(
        _roundtrip_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            spec((block_n, out_dim), lambda i: (i, 0)),
            spec((block_n, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, out_dim), x.dtype),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        interpret=interpret,
        **kwargs,
    )(*inputs)
    return recon[:n], idx[:n, 0]
