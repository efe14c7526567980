"""ctypes bridge to the C++ runtime library (native/machisplin_native.cpp).

Loads lazily; every caller has a pure-Python fallback, so the framework works
without the shared object and accelerates transparently when ``make -C
native`` has been run (the repo ships no binary artifacts).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def load_native():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libmachisplin_native.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.tiff_decode_chunks.restype = ctypes.c_int64
    lib.tiff_decode_chunks.argtypes = [
        u8p, i64p, i64p, i64p, i64p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        u8p, ctypes.c_int32,
    ]
    lib.tiff_lzw_decode.restype = ctypes.c_int64
    lib.tiff_lzw_decode.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
    lib.tps_tile_plan.restype = ctypes.c_int64
    lib.tps_tile_plan.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, f64p,
    ]
    lib.mosaic_accumulate.restype = None
    lib.mosaic_accumulate.argtypes = [
        f32p, f32p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.mosaic_finalize.restype = None
    lib.mosaic_finalize.argtypes = [f32p, f32p, ctypes.c_int64]
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.forest_predict_f32.restype = None
    lib.forest_predict_f32.argtypes = [
        i32p, f32p, f32p, i32p, i32p, f32p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        f32p, ctypes.c_int64, ctypes.c_int64,
        f32p, f32p, ctypes.c_int32,
    ]
    _LIB = lib
    return lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def decode_chunks(file_bytes: bytes, offsets, counts, out_offsets, out_sizes,
                  compression: int, predictor: int, row_bytes: int,
                  sample_bytes: int, total_out: int, n_threads: int = 0) -> np.ndarray | None:
    """Decode all strips/tiles in parallel; None if the library is absent."""
    lib = load_native()
    if lib is None:
        return None
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)
    src = np.frombuffer(file_bytes, np.uint8)
    out = np.zeros(total_out, np.uint8)
    offs = np.ascontiguousarray(offsets, np.int64)
    cnts = np.ascontiguousarray(counts, np.int64)
    oofs = np.ascontiguousarray(out_offsets, np.int64)
    osz = np.ascontiguousarray(out_sizes, np.int64)
    rc = lib.tiff_decode_chunks(
        _ptr(src, ctypes.c_uint8), _ptr(offs, ctypes.c_int64),
        _ptr(cnts, ctypes.c_int64), _ptr(oofs, ctypes.c_int64),
        _ptr(osz, ctypes.c_int64), len(offs),
        compression, predictor, row_bytes, sample_bytes,
        _ptr(out, ctypes.c_uint8), n_threads,
    )
    if rc != 0:
        raise ValueError(f"native TIFF decode failed at chunk {rc - 1}")
    return out


def forest_predict_native(trees, x, max_depth: int, weights, n_threads: int = 0) -> np.ndarray | None:
    """Multi-threaded host forest prediction; None if the library is absent.

    trees: a models/trees.Tree pytree with leading tree axis (host arrays ok).
    """
    lib = load_native()
    if lib is None:
        return None
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)
    feat = np.ascontiguousarray(np.asarray(trees.feat), np.int32)
    thr = np.ascontiguousarray(np.asarray(trees.thr), np.float32)
    internal = np.ascontiguousarray(np.asarray(trees.internal), np.float32)
    left = np.ascontiguousarray(np.asarray(trees.left), np.int32)
    right = np.ascontiguousarray(np.asarray(trees.right), np.int32)
    value = np.ascontiguousarray(np.asarray(trees.value), np.float32)
    xq = np.ascontiguousarray(np.asarray(x), np.float32)
    w = np.ascontiguousarray(np.asarray(weights), np.float32)
    t, n_nodes = feat.shape
    m, p = xq.shape
    out = np.zeros(m, np.float32)
    lib.forest_predict_f32(
        _ptr(feat, ctypes.c_int32), _ptr(thr, ctypes.c_float),
        _ptr(internal, ctypes.c_float), _ptr(left, ctypes.c_int32),
        _ptr(right, ctypes.c_int32), _ptr(value, ctypes.c_float),
        t, n_nodes, max_depth,
        _ptr(xq, ctypes.c_float), m, p,
        _ptr(w, ctypes.c_float), _ptr(out, ctypes.c_float), n_threads,
    )
    return out


def tile_plan(grid_extent, nrows, ncols, tile_px, fit_overlap, mosaic_overlap) -> np.ndarray | None:
    lib = load_native()
    if lib is None:
        return None
    xmin, xmax, ymin, ymax = grid_extent
    nrx = -(-nrows // tile_px)
    ncx = -(-ncols // tile_px)
    out = np.zeros((nrx * ncx, 8), np.float64)
    n = lib.tps_tile_plan(
        xmin, xmax, ymin, ymax, nrows, ncols, tile_px,
        fit_overlap, mosaic_overlap, _ptr(out, ctypes.c_double),
    )
    return out[:n]
