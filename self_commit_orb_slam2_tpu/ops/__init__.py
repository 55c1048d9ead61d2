"""Batched compute kernels: geometry, ORB extraction, matching, solvers, optimization."""
