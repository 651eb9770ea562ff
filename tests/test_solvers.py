"""Solver tests: ADMM L1/QP, SDP rotation averaging (ref solver/*_test)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dagsfm_tpu.solvers import admm, sdp
from dagsfm_tpu.estimation import lagrange_dual as ld
from tests.test_rotation_averaging import make_ra_problem, angular_errors


class TestL1:
    def test_l1_robust_to_outliers(self):
        rng = np.random.default_rng(0)
        N, M = 20, 200
        x_true = rng.normal(0, 1, N)
        A = rng.normal(0, 1, (M, N))
        b = A @ x_true
        out = rng.random(M) < 0.2
        b[out] += rng.uniform(5, 10, out.sum()) * rng.choice([-1, 1],
                                                             out.sum())
        x, _, _ = admm.l1_regression(
            jnp.asarray(A), jnp.asarray(b),
            admm.ADMMOptions(max_iterations=300))
        assert np.abs(np.asarray(x) - x_true).max() < 1e-2
        # least squares would be much worse
        x_ls = np.linalg.lstsq(A, b, rcond=None)[0]
        assert np.abs(x_ls - x_true).max() > 0.1

    def test_constrained_l1(self):
        rng = np.random.default_rng(1)
        N, M = 10, 100
        x_true = np.abs(rng.normal(0, 1, N)) + 0.5
        A = rng.normal(0, 1, (M, N))
        b = A @ x_true
        C = np.eye(N)
        d = np.full(N, 0.5)   # x >= 0.5 (active for none; sanity)
        x = admm.constrained_l1(jnp.asarray(A), jnp.asarray(b),
                                jnp.asarray(C), jnp.asarray(d),
                                admm.ADMMOptions(max_iterations=300))
        assert np.abs(np.asarray(x) - x_true).max() < 1e-2
        assert (np.asarray(x) >= 0.5 - 1e-6).all()


class TestQP:
    def test_box_qp(self):
        rng = np.random.default_rng(2)
        N = 15
        Q = rng.normal(0, 1, (N, N))
        P = Q.T @ Q + np.eye(N)
        x_unc = rng.normal(0, 2, N)
        q = -P @ x_unc    # unconstrained minimum at x_unc
        lb = np.full(N, -1.0)
        ub = np.full(N, 1.0)
        x = np.asarray(admm.box_qp(jnp.asarray(P), jnp.asarray(q),
                                   jnp.asarray(lb), jnp.asarray(ub),
                                   admm.ADMMOptions(max_iterations=400)))
        assert (x >= lb - 1e-8).all() and (x <= ub + 1e-8).all()
        # KKT sanity: where strictly inside the box, gradient ~ 0
        g = P @ x + q
        inside = (x > lb + 1e-3) & (x < ub - 1e-3)
        if inside.any():
            assert np.abs(g[inside]).max() < 0.05


class TestSDPRotationAveraging:
    def test_exact(self):
        R_gt, edges, rels = make_ra_problem(12, noise_deg=0.0, seed=5,
                                            edge_prob=0.6)
        R, cert = ld.estimate_rotations_lagrange_dual(12, edges, rels)
        errs = angular_errors(R, R_gt)
        assert errs.max() < 0.1, errs.max()
        assert cert < 1e-3  # strong duality: rank-3 solution

    def test_noise(self):
        R_gt, edges, rels = make_ra_problem(15, noise_deg=2.0, seed=6,
                                            edge_prob=0.5)
        R, cert = ld.estimate_rotations_lagrange_dual(15, edges, rels)
        errs = angular_errors(R, R_gt)
        assert errs.mean() < 1.5, errs.mean()

    def test_nonlinear_refinement(self):
        R_gt, edges, rels = make_ra_problem(20, noise_deg=1.0, seed=7)
        R = ld.estimate_rotations_nonlinear(20, edges, rels)
        errs = angular_errors(R, R_gt)
        assert errs.mean() < 0.6, errs.mean()
