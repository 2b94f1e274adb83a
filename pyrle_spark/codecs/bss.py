"""Byte-stream-split codec for floating-point data.

The transform behind Parquet's BYTE_STREAM_SPLIT encoding (public format
spec): an array of k-byte floats is viewed as an (n, k) byte matrix and
stored transposed, so byte plane 0 of every value is contiguous, then
plane 1, and so on.  IEEE-754 neighbors (sign/exponent bytes) are highly
repetitive across a column while mantissa tails are noise; separating
the planes lets a general-purpose entropy stage (the ``+zstd`` wrapper)
compress the structured planes instead of seeing them interleaved with
noise.  The transform itself is size-neutral and lossless — bit-identical
bytes back on decode — so it is only ever selected *with* zstd, where the
selector's trial pass measures a real win.

This extends the codec suite beyond the reference's integer-oriented
storage model (pyrle keeps runs/values as raw int64/double arrays,
/root/reference/pyrle/rle.py:139-147) with a float-specific lightweight
encoding — the embeddings path (array<float> columns) is where it pays.
"""

from __future__ import annotations

import numpy as np

__all__ = ["BssCodec"]


class BssCodec:
    """Byte-plane transpose of fixed-width values (float or any numeric)."""

    name = "bss"

    @staticmethod
    def encode(payload: np.ndarray):
        a = np.ascontiguousarray(payload)
        n = len(a)
        k = a.dtype.itemsize
        meta = {"n": n, "dtype": a.dtype.str, "kind": "fixed"}
        planes = a.view(np.uint8).reshape(n, k).T if n else np.zeros((k, 0), np.uint8)
        return meta, {"planes": np.ascontiguousarray(planes).tobytes()}

    @staticmethod
    def decode(meta: dict, buffers: dict) -> np.ndarray:
        n = int(meta["n"])
        dt = np.dtype(meta["dtype"])
        k = dt.itemsize
        if n == 0:
            return np.zeros(0, dtype=dt)
        planes = np.frombuffer(buffers["planes"], dtype=np.uint8).reshape(k, n)
        return np.ascontiguousarray(planes.T).reshape(-1).view(dt)
