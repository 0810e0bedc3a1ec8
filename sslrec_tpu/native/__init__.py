"""ctypes loader for the native preprocessing library.

Compiles ``preprocess.cpp`` on first use (g++, cached next to the source) and
exposes typed wrappers.  Every wrapper has a pure-numpy fallback so the
framework works without a toolchain; ``available()`` reports which path is
active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libsslrec_native.so")
_SRC = os.path.join(_DIR, "preprocess.cpp")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
                 "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.padded_rows.argtypes = [i64p, i32p, ctypes.c_int64, ctypes.c_int64,
                                    i32p, u8p, i32p]
        lib.sampled_cooc_edges.restype = ctypes.c_int64
        lib.sampled_cooc_edges.argtypes = [i64p, i32p, ctypes.c_int64,
                                           ctypes.c_double, ctypes.c_uint64,
                                           i32p, i32p, ctypes.c_int64]
        lib.reject_negatives.argtypes = [i64p, i32p, i32p, ctypes.c_int64,
                                         ctypes.c_int32, ctypes.c_int32,
                                         ctypes.c_int32, ctypes.c_uint64, i32p]
        lib.transition_pairs.restype = ctypes.c_int64
        lib.transition_pairs.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                         ctypes.c_int32, i32p, i32p,
                                         ctypes.c_int64]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def padded_rows(indptr: np.ndarray, indices: np.ndarray, width: int):
    """Native build_padded_rows core; returns (cols, mask, lengths)."""
    lib = _load()
    n_rows = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    cols = np.zeros((n_rows, width), np.int32)
    mask = np.zeros((n_rows, width), np.uint8)
    lengths = np.zeros((n_rows,), np.int32)
    if lib is None:  # numpy fallback
        for r in range(n_rows):
            s, e = indptr[r], indptr[r + 1]
            k = min(e - s, width)
            cols[r, :k] = indices[s:s + k]
            mask[r, :k] = 1
            lengths[r] = e - s
        return cols, mask.astype(bool), lengths
    lib.padded_rows(_ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
                    n_rows, width, _ptr(cols, ctypes.c_int32),
                    _ptr(mask, ctypes.c_uint8), _ptr(lengths, ctypes.c_int32))
    return cols, mask.astype(bool), lengths


def sampled_cooc_edges(indptr: np.ndarray, indices: np.ndarray, rate: float,
                       seed: int = 0):
    """Native per-row subsampled co-occurrence edges; returns (rows, cols)."""
    lib = _load()
    n_rows = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    degs = np.diff(indptr)
    cap = int((degs * rate).astype(np.int64).sum() + n_rows + 1)
    rows = np.zeros((cap,), np.int32)
    cols = np.zeros((cap,), np.int32)
    if lib is None:
        rng = np.random.default_rng(seed)
        out_r, out_c = [], []
        for i in range(n_rows):
            ids = indices[indptr[i]:indptr[i + 1]]
            k = int(len(ids) * rate)
            if k <= 0:
                continue
            pick = rng.choice(ids, size=k, replace=False)
            out_r.extend([i] * k)
            out_c.extend(pick)
        return np.asarray(out_r, np.int32), np.asarray(out_c, np.int32)
    n = lib.sampled_cooc_edges(_ptr(indptr, ctypes.c_int64),
                               _ptr(indices, ctypes.c_int32), n_rows,
                               float(rate), int(seed),
                               _ptr(rows, ctypes.c_int32),
                               _ptr(cols, ctypes.c_int32), cap)
    return rows[:n], cols[:n]


def transition_pairs(seqs: np.ndarray, max_dist: int):
    """Native consecutive-pair extraction from padded sequences."""
    lib = _load()
    seqs = np.ascontiguousarray(seqs, np.int32)
    n_rows, seq_len = seqs.shape
    if lib is None:
        a_all, b_all = [], []
        for d in range(1, max_dist + 1):
            a = seqs[:, d:].reshape(-1)
            b = seqs[:, :-d].reshape(-1)
            live = (a > 0) & (b > 0)
            a_all.extend([a[live], b[live]])
            b_all.extend([b[live], a[live]])
        return np.concatenate(a_all), np.concatenate(b_all)
    cap = 2 * n_rows * seq_len * max_dist
    oa = np.zeros((cap,), np.int32)
    ob = np.zeros((cap,), np.int32)
    n = lib.transition_pairs(_ptr(seqs, ctypes.c_int32), n_rows, seq_len,
                             max_dist, _ptr(oa, ctypes.c_int32),
                             _ptr(ob, ctypes.c_int32), cap)
    return oa[:n], ob[:n]
