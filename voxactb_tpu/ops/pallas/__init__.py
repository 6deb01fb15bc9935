"""Pallas TPU kernels for the fused act/update programs' hot ops."""
