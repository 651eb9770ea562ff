"""Spectral graph clustering on device: Laplacian eigenmaps + k-means.

TPU-native counterpart of /root/reference/src/clustering/spectral_cluster.
{h,cpp} (sparse Laplacian -> Spectra SymEigsSolver -> KMeans,
spectral_cluster.cpp:52-148) AND the primary replacement for the Graclus
normalized cut used by NCutCluster (ncut_cluster.cpp:39-54) — spectral
relaxation optimizes the same normalized-cut objective, with the
eigendecomposition and Lloyd iterations running as one jitted program on
the MXU instead of a vendored C library.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_clusters", "num_nodes",
                                             "kmeans_iters"))
def _spectral_jit(edges, weights, num_nodes: int, num_clusters: int,
                  key, kmeans_iters: int = 50):
    N = num_nodes
    k = num_clusters
    dtype = weights.dtype

    W = jnp.zeros((N, N), dtype)
    W = W.at[edges[:, 0], edges[:, 1]].add(weights)
    W = W.at[edges[:, 1], edges[:, 0]].add(weights)
    deg = jnp.sum(W, axis=1)
    dinv = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12))
    # normalized Laplacian L = I - D^-1/2 W D^-1/2 (dense: the per-cut
    # graphs are bounded by the partition driver; MXU-friendly)
    L = jnp.eye(N, dtype=dtype) - W * dinv[:, None] * dinv[None, :]
    evals, evecs = jnp.linalg.eigh(L)
    emb = evecs[:, :k]                                  # (N, k)
    # row-normalize (Ng-Jordan-Weiss)
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True),
                            1e-12)

    # k-means++ -ish init: pick k rows by farthest-point on a random start
    def init_centroids(key):
        i0 = jax.random.randint(key, (), 0, N)
        cents = jnp.zeros((k, emb.shape[1]), dtype).at[0].set(emb[i0])
        d = jnp.sum((emb - emb[i0]) ** 2, axis=1)

        def body(carry, j):
            cents, d = carry
            nxt = jnp.argmax(d)
            cents = cents.at[j].set(emb[nxt])
            d = jnp.minimum(d, jnp.sum((emb - emb[nxt]) ** 2, axis=1))
            return (cents, d), None

        (cents, _), _ = jax.lax.scan(body, (cents, d),
                                     jnp.arange(1, k))
        return cents

    cents = init_centroids(key)

    def lloyd(cents, _):
        d2 = jnp.sum((emb[:, None, :] - cents[None]) ** 2, axis=-1)  # (N,k)
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=dtype)              # (N,k)
        counts = jnp.maximum(onehot.sum(0), 1e-9)
        new_c = (onehot.T @ emb) / counts[:, None]
        # keep old centroid if cluster emptied
        new_c = jnp.where((onehot.sum(0) > 0)[:, None], new_c, cents)
        return new_c, None

    cents, _ = jax.lax.scan(lloyd, cents, None, length=kmeans_iters)
    d2 = jnp.sum((emb[:, None, :] - cents[None]) ** 2, axis=-1)
    return jnp.argmin(d2, axis=1)


def spectral_cluster(edges: np.ndarray, weights: np.ndarray,
                     num_nodes: int, num_clusters: int,
                     seed: int = 0) -> np.ndarray:
    """Cluster labels (num_nodes,) for an undirected weighted graph."""
    if num_clusters <= 1 or num_nodes <= num_clusters:
        return np.zeros(num_nodes, np.int32) if num_clusters <= 1 \
            else np.arange(num_nodes, dtype=np.int32) % num_clusters
    labels = _spectral_jit(jnp.asarray(edges, jnp.int32),
                           jnp.asarray(weights, jnp.float64),
                           num_nodes, num_clusters,
                           jax.random.PRNGKey(seed))
    return np.asarray(labels, np.int32)


def normalized_cut_value(edges, weights, labels) -> float:
    """NCut objective (for tests / adaptive cluster-type choice)."""
    labels = np.asarray(labels)
    w = np.asarray(weights, float)
    cut = 0.0
    vol = {}
    for (i, j), wt in zip(np.asarray(edges), w):
        vol[labels[i]] = vol.get(labels[i], 0.0) + wt
        vol[labels[j]] = vol.get(labels[j], 0.0) + wt
        if labels[i] != labels[j]:
            cut += wt
    out = 0.0
    for c, v in vol.items():
        cut_c = sum(wt for (i, j), wt in zip(np.asarray(edges), w)
                    if (labels[i] == c) != (labels[j] == c))
        out += cut_c / max(v, 1e-12)
    return out
