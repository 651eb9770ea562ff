"""Vocab-tree VisualIndex tests (ref retrieval/visual_index_test.cc,
inverted_file_entry_test.cc style: synthetic descriptors through the index).
"""
import numpy as np
import jax.numpy as jnp

from dagsfm_tpu.features import visual_index as vi


def _unit(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-9)


def _make_scene_descs(rng, num_images=8, per_image=64, dim=32,
                      num_groups=4):
    """Images in the same group share a descriptor distribution."""
    protos = _unit(rng.standard_normal((num_groups, 16, dim)))
    descs, groups = [], []
    for i in range(num_images):
        g = i % num_groups
        base = protos[g][rng.integers(0, 16, per_image)]
        d = _unit(base + 0.05 * rng.standard_normal((per_image, dim)))
        descs.append(d.astype(np.float32))
        groups.append(g)
    return descs, groups


def test_quantize_deterministic_and_in_range():
    rng = np.random.default_rng(0)
    train = _unit(rng.standard_normal((512, 32))).astype(np.float32)
    opts = vi.VocabTreeOptions(branching=4, depth=2)
    tree = vi.build_vocab_tree(train, opts)
    w1 = np.asarray(vi.quantize(tree, jnp.asarray(train[:64])))
    w2 = np.asarray(vi.quantize(tree, jnp.asarray(train[:64])))
    assert (w1 == w2).all()
    assert (w1 >= 0).all() and (w1 < tree.num_words).all()
    # a descriptor lands in the leaf whose centroid chain it descends:
    # identical descriptors map to identical words trivially; also check
    # the words use a reasonable spread of the vocabulary
    assert len(np.unique(np.asarray(
        vi.quantize(tree, jnp.asarray(train))))) > 4


def test_query_ranks_same_group_first():
    rng = np.random.default_rng(1)
    descs, groups = _make_scene_descs(rng)
    train = np.concatenate(descs)
    opts = vi.VocabTreeOptions(branching=4, depth=2)
    tree = vi.build_vocab_tree(train, opts)
    index = vi.VisualIndex(tree, opts)
    for i, d in enumerate(descs):
        index.add(i, d)
    hits = 0
    for i in range(len(descs)):
        top = index.query(i, num_images=2)
        hits += sum(1 for j, _ in top if groups[j] == groups[i])
    assert hits >= len(descs)  # >=1 same-group hit per query on average


def test_hamming_rerank_and_match_words():
    rng = np.random.default_rng(2)
    descs, groups = _make_scene_descs(rng, num_images=4, num_groups=2)
    train = np.concatenate(descs)
    opts = vi.VocabTreeOptions(branching=4, depth=1, hamming_threshold=40)
    tree = vi.build_vocab_tree(train, opts)
    index = vi.VisualIndex(tree, opts)
    for i, d in enumerate(descs):
        index.add(i, d)
    top = index.query(0, num_images=3, rerank=3)
    assert len(top) == 3
    # image 2 shares group with 0: its hamming vote score must beat the
    # off-group images
    s_same = index._hamming_score(0, 2)
    assert s_same >= index._hamming_score(0, 1)
    assert s_same >= index._hamming_score(0, 3)
    m = index.match_words(0, 2)
    assert m.ndim == 2 and m.shape[1] == 2
    assert len(m) > 0


def test_vote_and_verify_recovers_similarity_inliers():
    rng = np.random.default_rng(3)
    n = 60
    x = rng.uniform(0, 1000, (n, 2))
    scale = rng.uniform(1.0, 2.0, n)
    ori = rng.uniform(-np.pi, np.pi, n)
    kp1 = np.column_stack([x, scale, ori]).astype(np.float32)
    # ground-truth similarity: s=1.5, rot=0.3, t=(50, -30)
    s, th = 1.5, 0.3
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    y = (s * (R @ x.T)).T + np.array([50.0, -30.0])
    kp2 = np.column_stack([y, scale * s, ori + th]).astype(np.float32)
    matches = np.column_stack([np.arange(n), np.arange(n)])
    # corrupt 20 matches
    bad = rng.choice(n, 20, replace=False)
    matches[bad, 1] = rng.permutation(matches[bad, 1])
    score, inl = vote_score = vote = vi.vote_and_verify(
        kp1, kp2, matches, image_extent=2048.0)
    assert score >= 30
    good = np.setdiff1d(np.arange(n), bad)
    assert inl[good].mean() > 0.8
