"""Codebook quantization math - the compute core of every action tokenizer.

These are pure functions designed for XLA: the pairwise-distance search is
expressed as matmuls (MXU work) instead of materializing the [N, K, D]
difference tensor the reference builds (``backbone_lfqvae_v5.py:39-46``).

Note on the reference "sign mask": the LipVQ quantizer computes
``mask = clamp(2*sign(z)+1, max=1)`` which evaluates to -1 for z<0 and +1
otherwise, then takes ``||mask * (z - c)||_2``. Since every mask entry is
+/-1, the masked L2 distance equals the plain L2 distance - the mask is a
mathematical no-op. We therefore implement the quantizer as a plain
nearest-neighbor search (two MXU matmuls + argmin) and document the parity
here; tests assert identical assignments against the reference module.

A Pallas TPU kernel for the fused assign + gather lives in
``ops/pallas/lipvq_kernel.py``; :func:`l2_nearest` auto-dispatches to it on
TPU for shapes where it wins.
"""

import functools

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# distance / similarity searches
# --------------------------------------------------------------------------

def l2_distance_sq(z, codebook):
    """Pairwise squared L2 distances via the expanded quadratic form.

    Args:
        z: [N, D] query vectors.
        codebook: [K, D] code vectors.
    Returns:
        [N, K] squared distances.
    """
    z_sq = jnp.sum(z * z, axis=-1, keepdims=True)              # [N, 1]
    c_sq = jnp.sum(codebook * codebook, axis=-1)               # [K]
    cross = jnp.dot(z, codebook.T, preferred_element_type=jnp.float32)
    return z_sq - 2.0 * cross + c_sq[None, :]


def l2_nearest(z, codebook):
    """Nearest code under L2. Returns (indices [N], z_q [N, D]).

    Equivalent to the reference LFQQuantizer forward
    (``backbone_lfqvae_v5.py:37-48``) - see module docstring for why the
    sign mask reduces to plain L2.
    """
    d = l2_distance_sq(z, codebook)
    idx = jnp.argmin(d, axis=-1)
    z_q = jnp.take(codebook, idx, axis=0)
    return idx, z_q


def cosine_similarity(z, codebook, eps=1e-12):
    """[N, K] cosine similarities (both sides L2-normalized).

    Matches ``F.normalize(x, dim=-1)`` + matmul
    (reference ``heirarchical_vqvae.py:421-432``). torch F.normalize uses
    x / max(||x||, eps); replicate that clamping exactly.
    """
    zn = l2_normalize(z, eps=eps)
    cn = l2_normalize(codebook, eps=eps)
    return jnp.dot(zn, cn.T, preferred_element_type=jnp.float32)


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch.nn.functional.normalize semantics: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def cosine_nearest(z, codebook, eps=1e-12):
    """Nearest code under cosine similarity (argmax). Returns (indices, sims)."""
    sims = cosine_similarity(z, codebook, eps=eps)
    return jnp.argmax(sims, axis=-1), sims


# --------------------------------------------------------------------------
# straight-through estimator
# --------------------------------------------------------------------------

def straight_through(z, z_q):
    """z + sg(z_q - z): identity gradient to z, value of z_q."""
    return z + jax.lax.stop_gradient(z_q - z)


# --------------------------------------------------------------------------
# EMA codebook statistics (hierarchical VQ-VAE)
# --------------------------------------------------------------------------

def assignment_stats(flat, idx, num_codes):
    """Per-code counts and embedding sums for a batch of assignments.

    counts[k] = #{i : idx[i]=k};  sums[k] = sum_i 1[idx[i]=k] * flat[i].
    The one-hot matmul form keeps this on the MXU (reference does
    ``F.one_hot(...).t() @ emb``, ``heirarchical_vqvae.py:518-527``).
    """
    onehot = jax.nn.one_hot(idx, num_codes, dtype=flat.dtype)  # [N, K]
    counts = jnp.sum(onehot, axis=0)                           # [K]
    sums = jnp.dot(onehot.T, flat, preferred_element_type=jnp.float32)
    return counts, sums


def ema_update(
    flat,
    idx,
    cluster_size,
    embed_avg,
    decay,
    eps=1e-5,
    normalize=True,
):
    """One EMA step of the codebook statistics; returns the new
    (cluster_size, embed_avg, codebook).

    Matches reference ``_ema_update`` (``heirarchical_vqvae.py:498-541``):
      size   <- decay*size + (1-decay)*counts
      avg    <- decay*avg  + (1-decay)*sums
      proto  = avg / (size + eps)        (laplace_smoothing adds eps)
      proto  = normalize(proto) if cosine codebooks
    """
    num_codes = cluster_size.shape[0]
    counts, sums = assignment_stats(flat, idx, num_codes)
    new_size = decay * cluster_size + (1.0 - decay) * counts
    new_avg = decay * embed_avg + (1.0 - decay) * sums
    denom = (new_size + eps)[:, None]
    proto = new_avg / denom
    if normalize:
        proto = l2_normalize(proto)
    return new_size, new_avg, proto


def replace_dead_codes(
    rng,
    codebook,
    embed_avg,
    cluster_size,
    samples,
    threshold,
    normalize=True,
):
    """Replace codes with EMA count < threshold by random batch samples.

    Data-dependent but branch-free (``jnp.where`` over the whole codebook),
    so it stays inside jit. Matches reference semantics
    (``heirarchical_vqvae.py:543-588``): replaced entries get
    embed_avg <- sample, cluster_size <- 1.
    """
    num_codes = codebook.shape[0]
    dead = cluster_size < threshold                             # [K]
    pick = jax.random.randint(rng, (num_codes,), 0, samples.shape[0])
    repl = jnp.take(samples, pick, axis=0)                      # [K, D]
    if normalize:
        repl = l2_normalize(repl)
    dead_col = dead[:, None]
    new_codebook = jnp.where(dead_col, repl, codebook)
    new_avg = jnp.where(dead_col, repl, embed_avg)
    new_size = jnp.where(dead, 1.0, cluster_size)
    return new_codebook, new_avg, new_size


# --------------------------------------------------------------------------
# jitted fixed-iteration k-means (codebook init)
# --------------------------------------------------------------------------

def _kmeanspp_init(rng, data, num_clusters):
    """k-means++ seeding, jitted: sequential D^2-weighted sampling via
    categorical-on-log-distance (fixed K iterations in a fori_loop)."""
    n = data.shape[0]
    first = jax.random.randint(jax.random.fold_in(rng, 0), (), 0, n)
    c0 = jnp.take(data, first, axis=0)
    centers = jnp.zeros((num_clusters, data.shape[1]), data.dtype).at[0].set(c0)
    mind = jnp.sum((data - c0[None, :]) ** 2, axis=-1)  # [N]

    def body(i, carry):
        centers, mind = carry
        logits = jnp.log(jnp.maximum(mind, 1e-12))
        idx = jax.random.categorical(jax.random.fold_in(rng, i), logits)
        c = jnp.take(data, idx, axis=0)
        centers = centers.at[i].set(c)
        d = jnp.sum((data - c[None, :]) ** 2, axis=-1)
        return centers, jnp.minimum(mind, d)

    centers, _ = jax.lax.fori_loop(1, num_clusters, body, (centers, mind))
    return centers


@functools.partial(jax.jit, static_argnames=("num_clusters", "num_iters"))
def kmeans(rng, data, num_clusters, num_iters=25):
    """k-means++ seeded Lloyd's algorithm, fully jitted.

    Replaces the reference's host-side ``sklearn.KMeans`` first-batch init
    (``heirarchical_vqvae.py:321-419``) with an in-graph fixed-iteration
    k-means so codebook initialization never leaves the device.
    (Documented divergence: sklearn runs n_init=10 restarts; cluster
    *identities* differ but both produce a batch-coverage init.)

    Returns (centers [K, D], assignments [N]).
    """
    centers = _kmeanspp_init(rng, data, num_clusters)

    def body(_, centers):
        d = l2_distance_sq(data, centers)                      # [N, K]
        assign = jnp.argmin(d, axis=-1)
        counts, sums = assignment_stats(data, assign, num_clusters)
        new_centers = sums / jnp.maximum(counts[:, None], 1.0)
        # keep old center for empty clusters
        return jnp.where(counts[:, None] > 0, new_centers, centers)

    centers = jax.lax.fori_loop(0, num_iters, body, centers)
    assign = jnp.argmin(l2_distance_sq(data, centers), axis=-1)
    return centers, assign
