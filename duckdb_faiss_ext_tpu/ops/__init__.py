"""Compute kernels: pairwise distances, fused search+top-k, k-means, IVF scans.

XLA-first implementations with Pallas TPU kernels for the hot paths.
"""
