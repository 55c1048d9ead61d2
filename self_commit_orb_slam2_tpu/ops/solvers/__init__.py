"""Minimal-set solvers: homography/fundamental RANSAC, EPnP, Horn Sim3."""
