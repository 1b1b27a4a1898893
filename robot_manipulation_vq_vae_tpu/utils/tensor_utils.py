"""Pytree tensor utilities.

The reference maintains ~1.1k lines of recursive dict/list/tuple walkers
(``robomimic/utils/tensor_utils.py``); in JAX almost all of that is
``jax.tree_util.tree_map``. What remains here are the shape helpers the
model stack actually uses (time folding, padding, broadcast-expansion).
"""

import jax
import jax.numpy as jnp
import numpy as np


def map_tensor(x, fn):
    """Apply fn to every array leaf of a nested structure."""
    return jax.tree_util.tree_map(fn, x)


def to_float(x):
    return map_tensor(
        x, lambda a: jnp.asarray(a, jnp.float32) if a is not None else None
    )


def to_numpy(x):
    return map_tensor(x, lambda a: np.asarray(a))


def detach(x):
    return map_tensor(x, jax.lax.stop_gradient)


def clone(x):
    return map_tensor(x, lambda a: jnp.array(a))


def to_batch(x):
    """Add a leading batch dim to every leaf (reference to_batch)."""
    return map_tensor(x, lambda a: a[None])


def to_sequence(x):
    """Add a time dim at axis 1."""
    return map_tensor(x, lambda a: a[:, None])


def index_at_time(x, ind):
    return map_tensor(x, lambda a: a[:, ind])


def unsqueeze(x, dim):
    return map_tensor(x, lambda a: jnp.expand_dims(a, dim))


def unsqueeze_expand_at(x, size, dim):
    """Insert a new axis at @dim and tile it to @size (reference
    ``unsqueeze_expand_at``)."""

    def f(a):
        a = jnp.expand_dims(a, dim)
        reps = [1] * a.ndim
        reps[dim] = size
        return jnp.tile(a, reps)

    return map_tensor(x, f)


def join_dimensions(x, begin_axis, end_axis):
    """Flatten axes [begin, end] into one."""

    def f(a):
        shape = a.shape
        new = shape[:begin_axis] + (-1,) + shape[end_axis + 1 :]
        return a.reshape(new)

    return map_tensor(x, f)


def reshape_dimensions(x, begin_axis, end_axis, target_dims):
    def f(a):
        shape = a.shape
        new = shape[:begin_axis] + tuple(target_dims) + shape[end_axis + 1 :]
        return a.reshape(new)

    return map_tensor(x, f)


def flatten(x, begin_axis=1):
    return map_tensor(x, lambda a: a.reshape(a.shape[:begin_axis] + (-1,)))


def assert_size_at_dim(x, size, dim, msg=""):
    leaves = jax.tree_util.tree_leaves(x)
    for a in leaves:
        assert a.shape[dim] == size, f"{msg} (got {a.shape})"


def fold_time(x):
    """[B, T, ...] -> [B*T, ...] for every leaf; returns (folded, B, T)."""
    leaves = jax.tree_util.tree_leaves(x)
    b, t = leaves[0].shape[:2]
    folded = map_tensor(x, lambda a: a.reshape((b * t,) + a.shape[2:]))
    return folded, b, t


def unfold_time(x, b, t):
    return map_tensor(x, lambda a: a.reshape((b, t) + a.shape[1:]))


def time_distributed(inputs, fn):
    """Fold [B, T, ...] -> [B*T, ...], apply fn, unfold back
    (reference ``time_distributed`` tensor_utils.py:1007)."""
    folded, b, t = fold_time(inputs)
    out = fn(folded)
    return unfold_time(out, b, t)


def pad_sequence_single(seq, padding, batched=False, pad_same=True,
                        pad_values=None):
    """Pad a sequence array at the time axis (reference ``pad_sequence``
    tensor_utils.py:812): @padding=(left, right); ``pad_same`` repeats edge
    values, else uses @pad_values."""
    ax = 1 if batched else 0
    left, right = padding
    if pad_same:
        pads = [(0, 0)] * seq.ndim
        pads[ax] = (left, right)
        return np.pad(np.asarray(seq), pads, mode="edge")
    pads = [(0, 0)] * seq.ndim
    pads[ax] = (left, right)
    return np.pad(np.asarray(seq), pads, constant_values=pad_values or 0)


def pad_sequence(seq, padding, batched=False, pad_same=True, pad_values=None):
    return map_tensor(
        seq,
        lambda a: pad_sequence_single(a, padding, batched, pad_same, pad_values),
    )
