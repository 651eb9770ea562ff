"""Native graph core: C++ results must match the Python fallbacks."""
import numpy as np
import pytest

from dagsfm_tpu.graph import native as ng


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(0)
    n = 500
    edges = []
    # two components: [0, 300) dense-ish, [300, 500) chain
    for _ in range(2000):
        i, j = rng.integers(0, 300, 2)
        if i != j:
            edges.append((min(i, j), max(i, j)))
    for v in range(300, 499):
        edges.append((v, v + 1))
    edges = np.array(sorted(set(edges)), np.int64)
    weights = rng.uniform(1, 100, len(edges))
    return n, edges, weights


def test_native_available():
    assert ng.available(), "native graphcore failed to build"


def test_connected_components(graph):
    n, edges, _ = graph
    labels = ng.connected_components(n, edges)
    assert len(set(labels[:300].tolist())) == 1
    assert len(set(labels[300:].tolist())) == 1
    assert labels[0] != labels[400]


def test_largest_cc(graph):
    n, edges, _ = graph
    mask = ng.largest_cc_mask(n, edges)
    assert mask[:300].all() and not mask[300:].any()


def test_kruskal_matches_python(graph):
    n, edges, weights = graph
    lib = ng._load()
    assert lib is not None
    native_idx = ng.kruskal(n, edges, weights, maximize=True)
    ng._LIB, saved = None, ng._LIB
    ng._TRIED = True
    try:
        py_idx = ng.kruskal(n, edges, weights, maximize=True)
    finally:
        ng._LIB = saved
    # same total weight (edge sets can differ on ties)
    assert abs(weights[native_idx].sum() - weights[py_idx].sum()) < 1e-9
    assert len(native_idx) == len(py_idx) == (300 - 1) + (200 - 1)


def test_triangles(graph):
    n, edges, _ = graph
    tris = ng.triangles(n, edges)
    # verify every reported triangle is a real triangle
    eset = {(int(i), int(j)) for (i, j) in edges}
    for (i, j, k) in tris[:200]:
        assert (min(i, j), max(i, j)) in eset
        assert (min(j, k), max(j, k)) in eset
        assert (min(i, k), max(i, k)) in eset
    # count matches python fallback
    lib_saved = ng._LIB
    ng._LIB = None
    try:
        py_tris = ng.triangles(n, edges)
    finally:
        ng._LIB = lib_saved
    assert len(tris) == len(py_tris)


def test_cnm_matches_structure():
    # two cliques bridged weakly -> two communities
    edges = []
    for base in (0, 10):
        for i in range(10):
            for j in range(i + 1, 10):
                edges.append((base + i, base + j))
    edges.append((0, 10))
    edges = np.array(edges, np.int64)
    w = np.ones(len(edges))
    w[-1] = 0.1
    labels = ng.cnm_communities(20, edges, w)
    assert len(set(labels[:10].tolist())) == 1
    assert len(set(labels[10:].tolist())) == 1
    assert labels[0] != labels[10]


def test_native_ncut_two_blobs():
    """Multilevel NCut separates two dense blobs joined by one weak edge
    (ref ncut_cluster_test.cpp style)."""
    from dagsfm_tpu.graph import native
    rng = np.random.default_rng(0)
    edges, weights = [], []
    for off in (0, 30):
        for i in range(30):
            for j in range(i + 1, 30):
                if rng.random() < 0.35:
                    edges.append((off + i, off + j))
                    weights.append(10.0)
    edges.append((3, 33)); weights.append(0.5)
    labels = native.ncut(60, np.asarray(edges, np.int64),
                         np.asarray(weights), 2, seed=1)
    assert len(np.unique(labels)) == 2
    # each blob nearly pure
    l0 = np.bincount(labels[:30]).argmax()
    l1 = np.bincount(labels[30:]).argmax()
    assert l0 != l1
    assert (labels[:30] == l0).mean() > 0.9
    assert (labels[30:] == l1).mean() > 0.9


def test_native_ncut_balance_and_k():
    from dagsfm_tpu.graph import native
    rng = np.random.default_rng(1)
    n = 200
    edges = []
    for i in range(n):
        for _ in range(6):
            j = rng.integers(0, n)
            if i != j:
                edges.append((min(i, j), max(i, j)))
    edges = np.unique(np.asarray(edges, np.int64), axis=0)
    w = np.ones(len(edges))
    labels = native.ncut(n, edges, w, 4, seed=2)
    sizes = np.bincount(labels)
    assert len(sizes) == 4
    # random graph: expect rough balance (no part > 60%)
    assert sizes.max() < 0.6 * n
