"""Shortest paths: native C++ multi-source Dijkstra with scipy fallback.

The reference runs one full scipy Dijkstra per pair inside its init loop
(``src/init_splines_ensemble.py:167``) — for 8,778 pairs that is 8,778 runs
even though only 133 unique sources exist.  Here sources are deduplicated and
solved once each, in parallel (OpenMP over sources in the native library,
one vectorized scipy call otherwise), and paths for all pairs are extracted
from the shared predecessor arrays into padded matrices ready for the batched
device-side least-squares spline fit.
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

_NATIVE_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libvlg_graph.so"),
    os.path.join(os.path.dirname(__file__), "libvlg_graph.so"),
)


@lru_cache(maxsize=1)
def _load_native() -> Optional[ctypes.CDLL]:
    for p in _NATIVE_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.vlg_grid_knn_graph.restype = ctypes.c_int64
            lib.vlg_grid_knn_graph.argtypes = [
                ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int32),
                np.ctypeslib.ndpointer(np.float32),
            ]
            lib.vlg_dijkstra_multi.restype = None
            lib.vlg_dijkstra_multi.argtypes = [
                ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int32),
                np.ctypeslib.ndpointer(np.float32),
                np.ctypeslib.ndpointer(np.int32), ctypes.c_int64,
                np.ctypeslib.ndpointer(np.float32), np.ctypeslib.ndpointer(np.int32),
            ]
            lib.vlg_extract_paths.restype = None
            lib.vlg_extract_paths.argtypes = [
                ctypes.c_int64, np.ctypeslib.ndpointer(np.int32),
                np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
                np.ctypeslib.ndpointer(np.int32), ctypes.c_int64, ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
            ]
            return lib
    return None


def native_available() -> bool:
    return _load_native() is not None


def grid_knn_native(nx: int, ny: int, dx: float, dy: float, k: int):
    lib = _load_native()
    n = nx * ny
    indptr = np.empty(n + 1, np.int64)
    indices = np.empty(n * k, np.int32)
    dists = np.empty(n * k, np.float32)
    lib.vlg_grid_knn_graph(nx, ny, dx, dy, k, indptr, indices, dists)
    return indptr, indices, dists


def dijkstra_multi(graph: sp.csr_matrix, sources: np.ndarray,
                   use_native: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Distances and predecessors from each source.

    Returns (dist (m, n) float32, pred (m, n) int32) with pred = -1 for
    unreachable nodes and for the source itself.
    """
    sources = np.asarray(sources, np.int32)
    graph = graph.tocsr().astype(np.float32)
    n = graph.shape[0]
    lib = _load_native() if use_native else None
    if lib is not None:
        m = len(sources)
        dist = np.empty((m, n), np.float32)
        pred = np.empty((m, n), np.int32)
        lib.vlg_dijkstra_multi(
            n, graph.indptr.astype(np.int64), graph.indices.astype(np.int32),
            graph.data, sources, m, dist, pred,
        )
        return dist, pred
    from scipy.sparse.csgraph import dijkstra as sp_dijkstra

    dist, pred = sp_dijkstra(graph, indices=sources, return_predecessors=True)
    pred = np.where(pred == -9999, -1, pred).astype(np.int32)
    return dist.astype(np.float32), pred


def extract_paths(pred: np.ndarray, source_rows: np.ndarray,
                  sources: np.ndarray, targets: np.ndarray,
                  max_len: int = 4096) -> Tuple[np.ndarray, np.ndarray]:
    """Padded node-index paths for each (source_row, target) pair.

    pred: (m, n) predecessor matrix from :func:`dijkstra_multi`
    source_rows: (P,) row into pred per pair;  targets: (P,) target node ids
    Returns (paths (P, max_len) int32 padded with -1, lengths (P,) int32 with
    0 marking unreachable/skipped pairs — reference skip semantics at
    ``src/init_splines_ensemble.py:164-170``).
    """
    pred = np.ascontiguousarray(pred, np.int32)
    source_rows = np.asarray(source_rows, np.int32)
    sources = np.asarray(sources, np.int32)
    targets = np.asarray(targets, np.int32)
    P = len(targets)
    lib = _load_native()
    if lib is not None:
        paths = np.empty((P, max_len), np.int32)
        lengths = np.empty(P, np.int32)
        lib.vlg_extract_paths(pred.shape[1], pred, sources, source_rows,
                              targets, P, max_len, paths, lengths)
        return paths, lengths

    paths = np.full((P, max_len), -1, np.int32)
    lengths = np.zeros(P, np.int32)
    for p in range(P):
        row, src, node = source_rows[p], sources[source_rows[p]], targets[p]
        rev = []
        ok = True
        while node != src:
            if node < 0 or len(rev) >= max_len:
                ok = False
                break
            rev.append(node)
            node = pred[row, node]
        if not ok or len(rev) + 1 > max_len:
            continue
        rev.append(src)
        L = len(rev)
        paths[p, :L] = rev[::-1]
        lengths[p] = L
    return paths, lengths
