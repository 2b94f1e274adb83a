"""Vectorized numpy kernels — semantic core shared by the compat API,
the test oracle, and the Arrow-UDF hot paths."""

from pyrle_spark.kernels import rlecore

__all__ = ["rlecore"]
