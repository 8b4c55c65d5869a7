"""Nearest-neighbor mean distance for scale initialization.

TPU-native equivalent of the CUDA ``simple-knn`` ``distCUDA2`` (reference N3).
The reference already replaces it host-side with a scipy KDTree
(``gs_lightning/utils/math.py:9-14``): k=4 query, mean of the 3 nearest
*squared* distances. Initialization runs once on the host, so the KDTree is
the right tool; a jnp fallback exists for environments without scipy.
"""

from __future__ import annotations

import numpy as np


def mean_knn_sq_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean squared distance to the k nearest neighbors, (N, 3) -> (N,)."""
    points = np.asarray(points, dtype=np.float32)
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
