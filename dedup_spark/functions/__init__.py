"""Shared vectorized kernels + pandas UDF factories."""
