"""Rotation averaging + view graph tests.

Mirrors reference rotation_estimation/robust_rotation_estimator_test.cpp:
GT rotations -> noisy relative measurements -> estimate -> angular error.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from dagsfm_tpu.estimation import rotation_averaging as ra
from dagsfm_tpu.graph.view_graph import TwoViewEdge, ViewGraph
from dagsfm_tpu.ops import rotations as rops


def make_ra_problem(num_images=30, noise_deg=0.0, outlier_frac=0.0,
                    seed=0, edge_prob=0.3):
    rng = np.random.default_rng(seed)
    aa = rng.normal(0, 0.8, (num_images, 3))
    R_gt = np.asarray(rops.angleaxis_to_rotmat(jnp.asarray(aa)))
    edges, rels = [], []
    for i in range(num_images):
        for j in range(i + 1, num_images):
            if j != i + 1 and rng.random() > edge_prob:
                continue  # keep chain + random extra edges
            Rij = R_gt[j] @ R_gt[i].T
            if noise_deg > 0:
                naxis = rng.normal(0, 1, 3)
                naxis /= np.linalg.norm(naxis)
                nang = np.radians(rng.normal(0, noise_deg))
                Rn = np.asarray(rops.angleaxis_to_rotmat(
                    jnp.asarray(naxis * nang)))
                Rij = Rn @ Rij
            if outlier_frac > 0 and rng.random() < outlier_frac:
                raxis = rng.normal(0, 1, 3)
                raxis /= np.linalg.norm(raxis)
                Rij = np.asarray(rops.angleaxis_to_rotmat(
                    jnp.asarray(raxis * rng.uniform(0.5, 3.0))))
            edges.append((i, j))
            rels.append(Rij)
    return R_gt, np.array(edges, np.int32), np.stack(rels)


def angular_errors(R_est, R_gt):
    """Align gauge (R[0]) then compare."""
    R_est = np.einsum("nij,kj->nik", R_est, R_est[0])
    R_gt = np.einsum("nij,kj->nik", R_gt, R_gt[0])
    ang = np.asarray(rops.rotation_angle_deg(jnp.asarray(R_est),
                                             jnp.asarray(R_gt)))
    return ang


class TestRotationAveraging:
    def test_exact(self):
        R_gt, edges, rels = make_ra_problem(20, noise_deg=0.0)
        R = ra.estimate_rotations(20, edges, rels)
        assert angular_errors(R, R_gt).max() < 1e-4

    def test_noise(self):
        R_gt, edges, rels = make_ra_problem(30, noise_deg=1.0, seed=1)
        R = ra.estimate_rotations(30, edges, rels)
        errs = angular_errors(R, R_gt)
        assert errs.mean() < 0.5, errs.mean()

    def test_outliers(self):
        R_gt, edges, rels = make_ra_problem(30, noise_deg=0.5,
                                            outlier_frac=0.15, seed=2)
        R = ra.estimate_rotations(30, edges, rels)
        errs = angular_errors(R, R_gt)
        assert errs.mean() < 1.0, errs.mean()
        assert np.median(errs) < 0.5

    def test_orientation_filter(self):
        R_gt, edges, rels = make_ra_problem(25, noise_deg=0.3,
                                            outlier_frac=0.2, seed=3)
        R = ra.estimate_rotations(25, edges, rels)
        keep = ra.filter_pairs_from_orientation(edges, rels, R,
                                                max_angle_deg=5.0)
        # which edges were outliers? recompute GT consistency
        Ri = R_gt[edges[:, 0]]
        Rj = R_gt[edges[:, 1]]
        gt_ang = np.asarray(rops.rotation_angle_deg(
            jnp.asarray(rels), jnp.asarray(Rj @ Ri.transpose(0, 2, 1))))
        # align labels with the filter threshold: edges whose GT deviation
        # is within 3 deg must survive a 5 deg filter; > 10 deg must drop
        assert keep[gt_ang < 3.0].mean() > 0.9
        assert keep[gt_ang > 10.0].mean() < 0.1


class TestViewGraph:
    def _graph(self, edges, rels, n):
        g = ViewGraph()
        for (i, j), R in zip(edges, rels):
            g.add_edge(TwoViewEdge(int(i), int(j), R, np.zeros(3), 100))
        return g

    def test_largest_cc(self):
        g = ViewGraph()
        R = np.eye(3)
        for (i, j) in [(0, 1), (1, 2), (2, 0), (5, 6)]:
            g.add_edge(TwoViewEdge(i, j, R, np.zeros(3), 10))
        cc = g.largest_connected_component()
        assert cc == {0, 1, 2}
        sub = g.subgraph(cc)
        assert sub.num_edges() == 3

    def test_mst(self):
        g = ViewGraph()
        R = np.eye(3)
        g.add_edge(TwoViewEdge(0, 1, R, np.zeros(3), 10))
        g.add_edge(TwoViewEdge(1, 2, R, np.zeros(3), 20))
        g.add_edge(TwoViewEdge(0, 2, R, np.zeros(3), 5))
        mst = g.maximum_spanning_tree()
        assert set(mst) == {(0, 1), (1, 2)}

    def test_cycle_filter(self):
        R_gt, edges, rels = make_ra_problem(12, noise_deg=0.2, seed=4,
                                            edge_prob=0.8)
        g = self._graph(edges, rels, 12)
        # corrupt one well-connected edge
        bad_key = list(g.edges.keys())[3]
        g.edges[bad_key].rotation = np.asarray(
            rops.angleaxis_to_rotmat(jnp.asarray([1.5, 0.5, -0.4])))
        removed = g.filter_cycles_by_rotation(max_angle_deg=5.0)
        assert removed >= 1
        assert bad_key not in g.edges
        # most good edges survive
        assert g.num_edges() >= len(edges) - removed


def _rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def test_sharded_matches_single_device():
    """Edge-sharded RA over the 8-device mesh matches the single-device
    solver (replicated state, psum'd reductions)."""
    import jax.numpy as jnp

    from dagsfm_tpu.ops import rotations as rops
    from dagsfm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    n = 20
    Rg = np.stack([np.asarray(rops.quat_to_rotmat_np(
        _rand_quat(rng))) for _ in range(n)])
    edges, rels = [], []
    for i in range(n):
        for j in range(i + 1, min(i + 4, n)):
            edges.append((i, j))
            aa = rng.normal(0, 0.01, 3)
            Rn = np.asarray(rops.quat_to_rotmat_np(np.asarray(
                rops.angleaxis_to_quat(jnp.asarray(aa)))))
            rels.append(Rn @ Rg[j] @ Rg[i].T)
    edges = np.array(edges, np.int32)
    rels = np.stack(rels)

    opts = ra.RAOptions(l1_iterations=5, irls_iterations=20,
                        cg_iterations=30)
    R1 = ra.estimate_rotations(n, edges, rels, opts)
    mesh = make_mesh(8)
    R2 = ra.estimate_rotations_sharded(n, edges, rels, mesh, opts)
    for k in range(n):
        dR = R1[k] @ R2[k].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2,
                                           -1, 1)))
        assert ang < 0.05, (k, ang)
