"""Nearest-neighbor mean distance for scale initialization.

TPU-native equivalent of the CUDA ``simple-knn`` ``distCUDA2`` (reference N3).
The reference already replaces it host-side with a scipy KDTree
(``gs_lightning/utils/math.py:9-14``): k=4 query, mean of the 3 nearest
*squared* distances. Initialization runs once on the host, so the KDTree is
the right tool; a jnp fallback exists for environments without scipy.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_NATIVE_LIB = None
_NATIVE_TRIED = False


def _load_native():
    """Load the C++ grid-hash KNN (native/knn.cpp), building it on first use
    if a toolchain is available. Returns None when unavailable."""
    global _NATIVE_LIB, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE_LIB
    _NATIVE_TRIED = True
    root = Path(__file__).resolve().parents[2] / "native"
    so = root / "libgsknn.so"
    try:
        if not so.exists():
            import subprocess

            subprocess.run(
                ["make", "-C", str(root)], check=True, capture_output=True
            )
        lib = ctypes.CDLL(str(so))
        lib.gs_knn_mean_sq_dist.restype = ctypes.c_int
        lib.gs_knn_mean_sq_dist.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _NATIVE_LIB = lib
    except Exception:
        _NATIVE_LIB = None
    return _NATIVE_LIB


def mean_knn_sq_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean squared distance to the k nearest neighbors, (N, 3) -> (N,).

    Prefers the native C++ grid-hash (multithreaded, our simple-knn
    equivalent); falls back to scipy KDTree (the reference's own fallback),
    then to chunked numpy. Set GS_TPU_NO_NATIVE_KNN=1 to skip the native path.
    """
    points = np.ascontiguousarray(points, dtype=np.float32)
    n = len(points)
    if not os.environ.get("GS_TPU_NO_NATIVE_KNN"):
        lib = _load_native()
        if lib is not None and n > 1:
            out = np.empty(n, dtype=np.float32)
            rc = lib.gs_knn_mean_sq_dist(
                points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_int64(n), ctypes.c_int(k),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if rc == 0:
                return out
    try:
        from scipy.spatial import KDTree

        dists, _ = KDTree(points).query(points, k=k + 1, workers=-1)
        return (dists[:, 1:] ** 2).mean(axis=1).astype(np.float32)
    except ImportError:
        return _mean_knn_sq_dist_numpy(points, k)


def _mean_knn_sq_dist_numpy(points: np.ndarray, k: int) -> np.ndarray:
    """Chunked brute-force fallback (O(N^2) but vectorized)."""
    n = len(points)
    out = np.empty(n, dtype=np.float32)
    chunk = max(1, (1 << 24) // max(n, 1))
    for start in range(0, n, chunk):
        block = points[start : start + chunk]
        d2 = ((block[:, None, :] - points[None, :, :]) ** 2).sum(-1)
        part = np.partition(d2, k, axis=1)[:, 1 : k + 1]
        out[start : start + chunk] = part.mean(axis=1)
    return out
