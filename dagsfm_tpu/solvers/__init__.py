"""Convex solvers: ADMM L1 / QP / SDP (reference: src/solver, src/math)."""
