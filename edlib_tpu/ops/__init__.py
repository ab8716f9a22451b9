"""Compute engines: host big-int, batched JAX scan, Pallas TPU kernels."""
