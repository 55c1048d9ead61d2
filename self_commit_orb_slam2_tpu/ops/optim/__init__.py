"""Nonlinear least-squares optimizers: pose, bundle adjustment, pose graph, Sim3."""
