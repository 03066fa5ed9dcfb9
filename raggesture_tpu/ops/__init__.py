"""Compute ops: rotation math, linear attention (XLA + Pallas kernels)."""
