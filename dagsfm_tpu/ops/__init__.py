"""Batched geometry kernels (reference: src/estimators, src/optim, src/math)."""
