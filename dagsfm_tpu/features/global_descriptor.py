"""Global image descriptors for similarity-graph pair selection.

TPU-native counterpart of the reference's MirrorSimilarityGraph
(/root/reference/src/graph/similarity_graph.h:91-120 + lib/mirror): there,
a pretrained CNN (MirrorNet/TF1) embeds every image into one global
descriptor and candidate pairs come from descriptor kNN. No pretrained
weights ship in this environment, so the embedding is a hand-crafted
GIST-style descriptor with the same API role and the same downstream
consumer (top-k cosine pairs feeding matching):

  resize to a fixed grid -> oriented multi-scale Gabor filter bank
  (one batched conv on the MXU) -> per-cell average energy pooling ->
  L2-normalized vector.

The whole batch embeds in ONE jitted program; the similarity graph is a
single (N, D) x (D, N) matmul. BoW retrieval (features/retrieval.py,
features/visual_index.py) remains the local-feature alternative — this
module covers the reference's global-descriptor modality.

Measured retrieval quality (tests/test_global_descriptor.py::
test_pair_selection_precision_vs_covisibility — per-image precision of
top-4 descriptor neighbors vs top-4 ground-truth covisible neighbors on
a rendered 20-camera ring): VLAD ~0.69 > BoW ~0.58 > Gabor ~0.35
(random ~0.27). The hand-crafted Gabor embedding is therefore only the
raw-image FALLBACK; whenever SIFT descriptors exist, 'global' pair mode
uses vlad_descriptors (feature_pipeline.select_pairs), which is also
the strongest modality measured. A learned CNN embedding (the
reference's MirrorNet) would likely beat all three but no pretrained
weights ship in this environment.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

GRID = 4            # pooling cells per side
SIZE = 128          # working resolution
_ORIENTATIONS = 8
_SCALES = (2.0, 4.0, 8.0)
_KSIZE = 15


def _gabor_bank() -> np.ndarray:
    """(F, 1, K, K) real Gabor kernels, F = orientations x scales."""
    ax = np.arange(_KSIZE) - _KSIZE // 2
    yy, xx = np.meshgrid(ax, ax, indexing="ij")
    kernels = []
    for lam in _SCALES:
        sigma = 0.6 * lam
        for o in range(_ORIENTATIONS):
            th = np.pi * o / _ORIENTATIONS
            xr = xx * np.cos(th) + yy * np.sin(th)
            yr = -xx * np.sin(th) + yy * np.cos(th)
            g = np.exp(-(xr ** 2 + yr ** 2) / (2 * sigma ** 2)) * \
                np.cos(2 * np.pi * xr / lam)
            g -= g.mean()
            n = np.linalg.norm(g)
            kernels.append(g / max(n, 1e-9))
    return np.stack(kernels)[:, None].astype(np.float32)


_BANK = _gabor_bank()
DESC_DIM = _BANK.shape[0] * GRID * GRID


@jax.jit
def embed_batch(images: jax.Array) -> jax.Array:
    """(B, H, W) float images -> (B, DESC_DIM) L2-normalized descriptors.

    One conv + one pool on device; H/W arbitrary (resized internally).
    """
    B = images.shape[0]
    x = jax.image.resize(images, (B, SIZE, SIZE), method="linear")
    x = x - jnp.mean(x, axis=(1, 2), keepdims=True)
    resp = jax.lax.conv_general_dilated(
        x[:, None], jnp.asarray(_BANK),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))      # (B, F, S, S)
    energy = jnp.abs(resp)
    cell = SIZE // GRID
    pooled = energy.reshape(B, -1, GRID, cell, GRID, cell).mean((3, 5))
    v = pooled.reshape(B, -1)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True),
                           1e-9)


def global_descriptors(images: dict, batch_size: int = 16) -> dict:
    """image_id -> (DESC_DIM,) np.float32 descriptor (batched embed)."""
    ids = sorted(images)
    out = {}
    for s in range(0, len(ids), batch_size):
        chunk = ids[s: s + batch_size]
        # per-shape grouping: images may have mixed sizes
        by_shape: dict = {}
        for i in chunk:
            by_shape.setdefault(np.asarray(images[i]).shape, []).append(i)
        for shp, members in by_shape.items():
            batch = jnp.asarray(np.stack(
                [np.asarray(images[i], np.float32) for i in members]))
            d = np.asarray(embed_batch(batch))
            for k, i in enumerate(members):
                out[i] = d[k]
    return out


# ---------------------------------------------------------------------------
# VLAD aggregation over local SIFT descriptors — the workhorse global
# embedding (the Gabor-GIST path above covers the no-features case; VLAD
# is far more discriminative and is what the pipeline's `global` pair
# mode uses, aggregating the SIFT descriptors it has already extracted).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k",))
def _vlad_one(desc, mask, centroids, k: int):
    """(N,128) descs + (N,) mask + (k,128) centroids -> (k*128,) VLAD."""
    sim = desc @ centroids.T                              # (N, k)
    assign = jnp.argmax(sim, axis=1)
    onehot = jax.nn.one_hot(assign, k, dtype=desc.dtype) * \
        mask[:, None].astype(desc.dtype)                  # (N, k)
    resid = desc[:, None, :] - centroids[None, :, :]      # (N, k, 128)
    v = jnp.einsum("nk,nkd->kd", onehot, resid).reshape(-1)
    # power-law (signed sqrt) + L2 normalization (standard VLAD)
    v = jnp.sign(v) * jnp.sqrt(jnp.abs(v))
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-9)


def vlad_descriptors(descriptors: dict, masks: dict, k: int = 16,
                     seed: int = 0, train_cap: int = 20000) -> dict:
    """image_id -> VLAD embedding aggregated from local SIFT descriptors
    (codebook k-means-fit on the scene's own descriptors). Counterpart
    of the reference's CNN global embedding for similarity-graph
    construction (similarity_graph.h:91-120) built from features the
    pipeline has already extracted."""
    from dagsfm_tpu.features.retrieval import kmeans_fit
    ids = sorted(descriptors)
    train = np.concatenate([np.asarray(descriptors[i])[np.asarray(masks[i])]
                            for i in ids])
    rng = np.random.default_rng(seed)
    if len(train) > train_cap:
        train = train[rng.choice(len(train), train_cap, replace=False)]
    cents = kmeans_fit(jnp.asarray(train), jax.random.PRNGKey(seed), k)
    out = {}
    for i in ids:
        out[i] = np.asarray(_vlad_one(jnp.asarray(descriptors[i]),
                                      jnp.asarray(masks[i]), cents, k))
    return out


def global_similarity_pairs(descriptors: dict, num_neighbors: int = 10,
                            min_score: float = 0.0) -> list:
    """Top-k cosine neighbors per image -> candidate pair list
    [(i, j, score)], deduplicated (ref MirrorSimilarityGraph kNN edge
    construction). One (N, D) x (D, N) matmul."""
    ids = sorted(descriptors)
    if len(ids) < 2:
        return []
    D = np.stack([descriptors[i] for i in ids])
    S = D @ D.T
    np.fill_diagonal(S, -np.inf)
    pairs = {}
    k = min(num_neighbors, len(ids) - 1)
    for a, i in enumerate(ids):
        nbrs = np.argpartition(-S[a], k - 1)[:k]
        for b in nbrs:
            j = ids[int(b)]
            if S[a, b] < min_score:
                continue
            key = (i, j) if i < j else (j, i)
            pairs[key] = max(pairs.get(key, -np.inf), float(S[a, b]))
    return [(i, j, s) for (i, j), s in sorted(pairs.items())]
