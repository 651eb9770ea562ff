"""ctypes bindings for the native graph core (native/graphcore.cpp).

Counterpart of the reference's C/C++ graph layer (union_find, graph.inl
CC/Kruskal, igraph communities). Auto-builds the shared library on first
use (g++ is in the image); every entry point has a pure-Python fallback so
the framework works without the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO = os.path.join(_ROOT, "native", "build", "libgraphcore.so")


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", os.path.join(_ROOT, "native")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.gc_connected_components.restype = ctypes.c_int64
    lib.gc_connected_components.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                            i64p, i64p]
    lib.gc_largest_cc.restype = ctypes.c_int64
    lib.gc_largest_cc.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p, u8p]
    lib.gc_kruskal.restype = ctypes.c_int64
    lib.gc_kruskal.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p, f64p,
                               ctypes.c_int32, i64p]
    lib.gc_triangles.restype = ctypes.c_int64
    lib.gc_triangles.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p, i64p,
                                 ctypes.c_int64]
    lib.gc_cnm_communities.restype = ctypes.c_int64
    lib.gc_cnm_communities.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p,
                                       f64p, i64p]
    lib.gc_ncut.restype = ctypes.c_int64
    lib.gc_ncut.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p, f64p,
                            ctypes.c_int64, ctypes.c_uint64, i64p]
    _LIB = lib
    return _LIB


def _as_i64(a):
    return np.ascontiguousarray(a, np.int64)


def available() -> bool:
    return _load() is not None


def connected_components(num_nodes: int, edges: np.ndarray) -> np.ndarray:
    lib = _load()
    edges = _as_i64(edges)
    if lib is not None:
        labels = np.empty(num_nodes, np.int64)
        lib.gc_connected_components(
            num_nodes, len(edges),
            edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return labels
    # fallback
    from dagsfm_tpu.graph.view_graph import UnionFind
    uf = UnionFind(num_nodes)
    for (i, j) in edges:
        uf.union(int(i), int(j))
    remap: dict = {}
    labels = np.empty(num_nodes, np.int64)
    for v in range(num_nodes):
        r = uf.find(v)
        labels[v] = remap.setdefault(r, len(remap))
    return labels


def largest_cc_mask(num_nodes: int, edges: np.ndarray) -> np.ndarray:
    lib = _load()
    edges = _as_i64(edges)
    if lib is not None:
        mask = np.empty(num_nodes, np.uint8)
        lib.gc_largest_cc(
            num_nodes, len(edges),
            edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return mask.astype(bool)
    labels = connected_components(num_nodes, edges)
    counts = np.bincount(labels)
    return labels == np.argmax(counts)


def kruskal(num_nodes: int, edges: np.ndarray, weights: np.ndarray,
            maximize: bool = False) -> np.ndarray:
    lib = _load()
    edges = _as_i64(edges)
    weights = np.ascontiguousarray(weights, np.float64)
    if lib is not None:
        out = np.empty(len(edges), np.int64)
        k = lib.gc_kruskal(
            num_nodes, len(edges),
            edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            1 if maximize else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out[:k]
    from dagsfm_tpu.graph.view_graph import UnionFind
    order = np.argsort(-weights if maximize else weights, kind="stable")
    uf = UnionFind(num_nodes)
    out = []
    for e in order:
        i, j = int(edges[e, 0]), int(edges[e, 1])
        if uf.find(i) != uf.find(j):
            uf.union(i, j)
            out.append(e)
    return np.array(out, np.int64)


def triangles(num_nodes: int, edges: np.ndarray,
              max_out: int = 2_000_000) -> np.ndarray:
    lib = _load()
    edges = _as_i64(edges)
    if lib is not None:
        out = np.empty((max_out, 3), np.int64)
        k = lib.gc_triangles(
            num_nodes, len(edges),
            edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_out)
        return out[:k]
    adj: dict[int, set] = {}
    for (i, j) in edges:
        adj.setdefault(int(i), set()).add(int(j))
        adj.setdefault(int(j), set()).add(int(i))
    tris = []
    seen = set()
    for (i, j) in edges:
        i, j = int(i), int(j)
        for k in adj.get(i, set()) & adj.get(j, set()):
            key = tuple(sorted((i, j, k)))
            if key not in seen:
                seen.add(key)
                tris.append(key)
    return np.array(sorted(tris), np.int64).reshape(-1, 3)


def ncut(num_nodes: int, edges: np.ndarray, weights: np.ndarray,
         num_parts: int, seed: int = 0) -> np.ndarray:
    """Multilevel normalized cut (native Graclus-style kernel k-means;
    counterpart of ref base/graph_cut.cc ComputeNormalizedMinGraphCut).
    Falls back to the device spectral relaxation when the shared library
    is unavailable."""
    lib = _load()
    edges = _as_i64(edges)
    weights = np.ascontiguousarray(weights, np.float64)
    if lib is not None:
        labels = np.empty(num_nodes, np.int64)
        lib.gc_ncut(
            num_nodes, len(edges),
            edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            num_parts, seed,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return labels
    from dagsfm_tpu.clustering.spectral import spectral_cluster
    return spectral_cluster(edges.astype(np.int32), weights, num_nodes,
                            num_parts, seed=seed).astype(np.int64)


def cnm_communities(num_nodes: int, edges: np.ndarray,
                    weights: np.ndarray) -> np.ndarray:
    lib = _load()
    edges = _as_i64(edges)
    weights = np.ascontiguousarray(weights, np.float64)
    if lib is not None:
        labels = np.empty(num_nodes, np.int64)
        lib.gc_cnm_communities(
            num_nodes, len(edges),
            edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return labels
    from dagsfm_tpu.clustering.community import community_detection
    return community_detection(edges.astype(np.int32), weights,
                               num_nodes).astype(np.int64)
