"""Pallas TPU kernels for the TFHE hot path (registered lazily)."""
