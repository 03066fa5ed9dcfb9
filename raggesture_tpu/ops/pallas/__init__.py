"""Pallas TPU kernels for the hot attention ops."""
