"""Similarity search / match-pair selection: BoW retrieval on the MXU.

TPU-native counterpart of /root/reference/src/retrieval/ (FLANN vocab-tree
VisualIndex, visual_index.h:61) and graph/similarity_graph.{h,cpp}
(VocabSimilarityGraph queries top-num_images neighbors per image,
similarity_graph.cpp:101-199; options num_images=100). The FLANN
hierarchical k-means tree + inverted index becomes: device k-means vocab
(Lloyd on the MXU) -> tf-idf BoW vectors -> ONE similarity matmul ->
top-k neighbor pairs. The MIRROR CNN path (lib/mirror, TF1 ResNet R-MAC)
is intentionally not replicated (SURVEY.md non-goals); this module is the
`VOCAB_TREE` retrieval parity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class RetrievalOptions(NamedTuple):
    vocab_size: int = 256
    kmeans_iters: int = 20
    num_neighbors: int = 50       # ref similarity_graph num_images=100
    sample_per_image: int = 256   # descriptors sampled for vocab training


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_fit(data: jax.Array, key, k: int, iters: int = 20):
    """Lloyd k-means on (N, D) -> (k, D) centroids (MXU distance matmuls)."""
    N = data.shape[0]
    idx = jax.random.choice(key, N, (k,), replace=False)
    cents = data[idx]

    def body(cents, _):
        # assign via -2 x·c + |c|^2 (|x|^2 constant)
        d2 = -2.0 * data @ cents.T + jnp.sum(cents ** 2, -1)[None, :]
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=data.dtype)
        counts = onehot.sum(0)
        newc = (onehot.T @ data) / jnp.maximum(counts, 1e-9)[:, None]
        newc = jnp.where((counts > 0)[:, None], newc, cents)
        return newc, None

    cents, _ = jax.lax.scan(body, cents, None, length=iters)
    return cents


@functools.partial(jax.jit, static_argnames=("k",))
def bow_histograms(desc: jax.Array, mask: jax.Array, cents: jax.Array,
                   k: int):
    """(B, K, D) descriptors -> (B, k) tf histograms."""
    d2 = -2.0 * jnp.einsum("bkd,vd->bkv", desc, cents,
                           preferred_element_type=jnp.float32) + \
        jnp.sum(cents ** 2, -1)[None, None, :]
    assign = jnp.argmin(d2, axis=-1)                     # (B, K)
    onehot = jax.nn.one_hot(assign, k, dtype=desc.dtype)
    onehot = onehot * mask[..., None]
    return onehot.sum(axis=1)                            # (B, k)


def bow_similarity_matrix(descriptors: dict, masks: dict,
                          opts: RetrievalOptions = RetrievalOptions(),
                          seed: int = 0):
    """(ids, sim) — full tf-idf BoW cosine similarity matrix.

    Shared by similarity_pairs and sequential loop detection; one vocab
    fit + one similarity matmul for the whole image set.
    """
    ids = sorted(descriptors)
    if len(ids) < 2:
        return ids, np.zeros((len(ids), len(ids)))
    key = jax.random.PRNGKey(seed)
    rng = np.random.default_rng(seed)

    # vocab training sample
    samples = []
    for i in ids:
        d = descriptors[i][np.asarray(masks[i])]
        if len(d) == 0:
            continue
        take = min(len(d), opts.sample_per_image)
        samples.append(d[rng.choice(len(d), take, replace=False)])
    train = np.concatenate(samples, axis=0)
    k = min(opts.vocab_size, max(8, len(train) // 4))
    cents = kmeans_fit(jnp.asarray(train), key, k, opts.kmeans_iters)

    desc = jnp.asarray(np.stack([descriptors[i] for i in ids]))
    mask = jnp.asarray(np.stack([masks[i] for i in ids]))
    tf = bow_histograms(desc, mask, cents, k)            # (B, k)
    tf = np.asarray(tf)

    # idf weighting + cosine similarity (one matmul)
    df = (tf > 0).sum(axis=0)
    idf = np.log(len(ids) / np.maximum(df, 1))
    v = tf * idf[None, :]
    v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-9)
    sim = v @ v.T
    np.fill_diagonal(sim, -1.0)
    return ids, sim


def similarity_pairs(descriptors: dict, masks: dict,
                     opts: RetrievalOptions = RetrievalOptions(),
                     seed: int = 0) -> list:
    """Top-num_neighbors candidate pairs per image via tf-idf BoW cosine.

    descriptors: image_id -> (K, D) np arrays. Returns list of
    (i, j, score) with i < j, deduplicated, score-sorted descending.
    """
    ids, sim = bow_similarity_matrix(descriptors, masks, opts, seed)
    if len(ids) < 2:
        return []

    pairs = {}
    nn = min(opts.num_neighbors, len(ids) - 1)
    for a in range(len(ids)):
        top = np.argsort(-sim[a])[:nn]
        for b in top:
            i, j = ids[a], ids[int(b)]
            keyp = (i, j) if i < j else (j, i)
            pairs[keyp] = max(pairs.get(keyp, -1.0), float(sim[a, b]))
    return sorted([(i, j, s) for (i, j), s in pairs.items()],
                  key=lambda t: -t[2])


def exhaustive_pairs(image_ids: list, block_size: int = 50) -> list:
    """All pairs, in blocks (ref ExhaustiveMatchingOptions block_size=50)."""
    out = []
    ids = sorted(image_ids)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            out.append((ids[a], ids[b], 0.0))
    return out


def sequential_pairs(image_ids: list, overlap: int = 10,
                     loop_detection_period: int = 0,
                     loop_detection_num_images: int = 50,
                     descriptors: dict | None = None,
                     masks: dict | None = None,
                     retrieval_opts: "RetrievalOptions | None" = None,
                     seed: int = 0) -> list:
    """Consecutive frames (ref SequentialMatchingOptions overlap=10),
    plus vocab-retrieval LOOP CLOSURE every `loop_detection_period`
    images (ref SequentialFeatureMatcher, matching.h:427-448:
    loop_detection_period=10, loop_detection_num_images=50) — without
    it, long video sequences drift with no loop edges for rotation
    averaging to close.

    Loop detection needs `descriptors`/`masks`; the BoW similarity
    matrix is computed ONCE for all query frames.
    """
    out = []
    ids = sorted(image_ids)
    have = set()
    for a in range(len(ids)):
        for d in range(1, overlap + 1):
            if a + d < len(ids):
                out.append((ids[a], ids[a + d], 0.0))
                have.add((ids[a], ids[a + d]))

    if loop_detection_period > 0 and descriptors is not None:
        desc_ids, sim = bow_similarity_matrix(
            descriptors, masks, retrieval_opts or RetrievalOptions(),
            seed=seed)
        row_of = {im: k for k, im in enumerate(desc_ids)}
        seq_pos = {im: k for k, im in enumerate(ids)}
        for a in range(0, len(ids), loop_detection_period):
            if ids[a] not in row_of:
                continue
            ra = row_of[ids[a]]
            order = np.argsort(-sim[ra])
            added = 0
            for rb in order:
                if added >= loop_detection_num_images:
                    break
                b_id = desc_ids[int(rb)]
                b = seq_pos.get(b_id)
                if b is None or b_id == ids[a]:
                    continue
                if abs(b - a) <= overlap:
                    continue  # already a temporal neighbor
                keyp = (ids[a], b_id) if ids[a] < b_id else (b_id, ids[a])
                if keyp in have:
                    continue
                have.add(keyp)
                out.append((keyp[0], keyp[1], float(sim[ra, rb])))
                added += 1
    return out


def spatial_pairs(image_ids: list, locations: np.ndarray,
                  max_num_neighbors: int = 50,
                  max_distance: float = 100.0) -> list:
    """GPS/location kNN pairing (ref SpatialMatchingOptions, FLANN kNN
    replaced by a brute-force distance matrix — small I)."""
    ids = sorted(image_ids)
    loc = np.asarray(locations, float)
    d = np.linalg.norm(loc[:, None] - loc[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    out = {}
    for a in range(len(ids)):
        nbr = np.argsort(d[a])[:max_num_neighbors]
        for b in nbr:
            if d[a, b] > max_distance:
                break
            keyp = (ids[a], ids[int(b)]) if ids[a] < ids[int(b)] \
                else (ids[int(b)], ids[a])
            out[keyp] = -float(d[a, b])
    return sorted([(i, j, s) for (i, j), s in out.items()],
                  key=lambda t: -t[2])


def transitive_pairs(matched_pairs: list, num_iterations: int = 3,
                     batch_size: int = 1000) -> list:
    """Transitive closure pairing (ref TransitiveMatchingOptions
    batch_size=1000, num_iterations=3, matching.h:486): if (a,b) and
    (b,c) matched, propose (a,c). Returns NEW pairs only."""
    have = set()
    adj: dict = {}
    for i, j, *_ in matched_pairs:
        a, b = (i, j) if i < j else (j, i)
        have.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    new_out = []
    for _ in range(num_iterations):
        fresh = []
        for b, nbrs in list(adj.items()):
            ns = sorted(nbrs)
            for x in range(len(ns)):
                for y in range(x + 1, len(ns)):
                    a, c = ns[x], ns[y]
                    if (a, c) not in have:
                        fresh.append((a, c, 0.0))
                        have.add((a, c))
                        if len(fresh) >= batch_size:
                            break
                if len(fresh) >= batch_size:
                    break
            if len(fresh) >= batch_size:
                break
        if not fresh:
            break
        for a, c, _ in fresh:
            adj.setdefault(a, set()).add(c)
            adj.setdefault(c, set()).add(a)
        new_out.extend(fresh)
    return new_out


def pairs_from_file(path: str, name_to_id: dict) -> list:
    """Import explicit pair list "name1 name2" per line (ref
    ImagePairsMatchingOptions match_list_path, matching.h:511)."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2 or line.lstrip().startswith("#"):
                continue
            a, b = name_to_id.get(parts[0]), name_to_id.get(parts[1])
            if a is None or b is None or a == b:
                continue
            out.append((min(a, b), max(a, b), 0.0))
    return out
