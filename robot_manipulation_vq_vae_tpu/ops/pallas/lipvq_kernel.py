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
