"""Native (C++) host-side data-path kernels, loaded via ctypes.

The shared library is built on first import (g++, ~1 s) and cached next to
the source. All entry points degrade gracefully to numpy fallbacks when a
compiler is unavailable (``is_available()`` reports which path is active).
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "window_gather.cpp")
_LIB = os.path.join(_DIR, "libwindow_gather.so")

_lib = None


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.gather_windows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.gather_windows_at.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.gather_windows_at_mt.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.gather_windows_multi.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.window_pad_masks.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def is_available():
    return bool(_load())


def gather_windows(src, starts, window):
    """Edge-padded batched window gather from one demo array.

    src: [T, ...] contiguous array; starts: [N] int64 window starts (may go
    out of range - edge rows repeat); returns [N, window, ...].
    """
    src = np.ascontiguousarray(src)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    n = starts.shape[0]
    t_len = src.shape[0]
    row_shape = src.shape[1:]
    out = np.empty((n, window) + row_shape, dtype=src.dtype)
    lib = _load()
    if lib:
        row_bytes = int(np.prod(row_shape, dtype=np.int64)) * src.itemsize
        lib.gather_windows(
            src.ctypes.data, out.ctypes.data, starts.ctypes.data,
            n, window, t_len, row_bytes,
        )
        return out
    # numpy fallback
    idx = np.clip(starts[:, None] + np.arange(window)[None, :], 0, t_len - 1)
    return src[idx]


def gather_windows_at(src, out, dst_idx, starts, window):
    """Edge-padded window gather into rows @dst_idx of the preallocated
    batch buffer @out ([N_total, window, ...]); src is one demo's [T, ...]
    contiguous array. Lets several per-demo calls fill one batch with no
    intermediate allocation (page faults on fresh ~100MB batch buffers are
    ~20x the memcpy cost)."""
    src = np.ascontiguousarray(src)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    dst_idx = np.ascontiguousarray(dst_idx, dtype=np.int64)
    assert out.flags.c_contiguous and out.dtype == src.dtype
    n = starts.shape[0]
    t_len = src.shape[0]
    lib = _load()
    if lib:
        row_bytes = (
            int(np.prod(src.shape[1:], dtype=np.int64)) * src.itemsize
        )
        # single-core memcpy saturates around ~1200 flagship samples/s;
        # thread the copy for big (image) gathers. RMVQ_GATHER_THREADS=1
        # disables (e.g. when the caller oversubscribes CPUs already).
        total_bytes = n * window * row_bytes
        n_threads = 1
        if total_bytes >= (8 << 20):
            n_threads = int(os.environ.get(
                "RMVQ_GATHER_THREADS", min(8, os.cpu_count() or 1)
            ))
        if n_threads > 1:
            lib.gather_windows_at_mt(
                src.ctypes.data, out.ctypes.data, dst_idx.ctypes.data,
                starts.ctypes.data, n, window, t_len, row_bytes, n_threads,
            )
        else:
            lib.gather_windows_at(
                src.ctypes.data, out.ctypes.data, dst_idx.ctypes.data,
                starts.ctypes.data, n, window, t_len, row_bytes,
            )
        return out
    idx = np.clip(starts[:, None] + np.arange(window)[None, :], 0, t_len - 1)
    out[dst_idx] = src[idx]
    return out


def gather_windows_multi(srcs, starts, window):
    """Per-sample-demo variant: srcs is a list of [T_i, ...] arrays (equal
    row shapes/dtypes); returns [N, window, ...]."""
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    n = starts.shape[0]
    assert len(srcs) == n
    srcs = [np.ascontiguousarray(s) for s in srcs]
    row_shape = srcs[0].shape[1:]
    dtype = srcs[0].dtype
    out = np.empty((n, window) + row_shape, dtype=dtype)
    lib = _load()
    if lib:
        ptrs = (ctypes.c_void_p * n)(
            *[s.ctypes.data for s in srcs]
        )
        t_lens = np.asarray([s.shape[0] for s in srcs], dtype=np.int64)
        row_bytes = int(np.prod(row_shape, dtype=np.int64)) * dtype.itemsize
        lib.gather_windows_multi(
            ptrs, t_lens.ctypes.data, out.ctypes.data, starts.ctypes.data,
            n, window, row_bytes,
        )
        return out
    for i, s in enumerate(srcs):
        idx = np.clip(starts[i] + np.arange(window), 0, s.shape[0] - 1)
        out[i] = s[idx]
    return out


def window_pad_masks(starts, t_lens, window):
    """[N, window] bool masks: True where the window row was in-range."""
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    t_lens = np.ascontiguousarray(t_lens, dtype=np.int64)
    n = starts.shape[0]
    out = np.empty((n, window), dtype=np.uint8)
    lib = _load()
    if lib:
        lib.window_pad_masks(
            out.ctypes.data, starts.ctypes.data, t_lens.ctypes.data, n, window
        )
        return out.astype(bool)
    rng = starts[:, None] + np.arange(window)[None, :]
    return (rng >= 0) & (rng < t_lens[:, None])
