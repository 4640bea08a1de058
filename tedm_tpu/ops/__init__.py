"""Numerical ops: diffusion schedules, metrics, resize, and Pallas TPU kernels."""
