"""Bit-packing, frame-of-reference, and delta codecs for integer data.

Generalizes the reference's int64 runs array storage (pyrle keeps runs as
full 8-byte ints, /root/reference/pyrle/rle.py:146) into width-minimal
packed storage:

- ``bitpack`` — pack non-negative ints at bit_length(max) bits each
- ``for``     — frame-of-reference: subtract block min, then bitpack
- ``delta``   — successive differences, zigzag, then bitpack (sorted or
  clustered sequences, e.g. crawl timestamps)

All vectorized numpy; decode is exact for any int64 input.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pack_ints", "unpack_ints", "ForCodec", "DeltaCodec", "BitpackCodec"]


def pack_ints(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints (< 2**width) at ``width`` bits each, MSB first."""
    if width == 0 or len(values) == 0:
        return b""
    v = values.astype(np.uint64, copy=False)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def unpack_ints(data: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_ints` → uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width)
    mat = bits.reshape(n, width).astype(np.uint64)
    weights = np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64)
    return mat @ weights


def _width_of(maxval: int) -> int:
    return int(maxval).bit_length()


class BitpackCodec:
    """Plain bit-packing of non-negative ints against their max."""

    name = "bitpack"

    @staticmethod
    def applicable(payload: np.ndarray) -> bool:
        return payload.dtype.kind in "iu" and (len(payload) == 0 or payload.min() >= 0)

    @staticmethod
    def encode(payload: np.ndarray):
        n = len(payload)
        width = _width_of(int(payload.max())) if n else 0
        meta = {"n": n, "width": width, "dtype": payload.dtype.str}
        return meta, {"packed": pack_ints(payload, width)}

    @staticmethod
    def decode(meta: dict, buffers: dict) -> np.ndarray:
        out = unpack_ints(buffers["packed"], meta["n"], meta["width"])
        return out.astype(np.dtype(meta["dtype"]))


class ForCodec:
    """Frame-of-reference: store block min + bitpacked offsets from it."""

    name = "for"

    @staticmethod
    def applicable(payload: np.ndarray) -> bool:
        return payload.dtype.kind in "iu"

    @staticmethod
    def encode(payload: np.ndarray):
        n = len(payload)
        mn = int(payload.min()) if n else 0
        # mod-2^64 arithmetic: a uint64 column whose min exceeds int64
        # max would overflow the old int64 path and corrupt silently;
        # wrap-exact uint64 subtraction gives the true delta for every
        # signed AND unsigned dtype (0 <= max-min < 2^64 always)
        mn_u = np.uint64(mn & ((1 << 64) - 1))
        if payload.dtype.kind == "u":
            p64 = payload.astype(np.uint64)
        else:
            p64 = payload.astype(np.int64).view(np.uint64)
        deltas = p64 - mn_u
        width = _width_of(int(deltas.max())) if n else 0
        meta = {"n": n, "width": width, "min": mn, "dtype": payload.dtype.str}
        return meta, {"packed": pack_ints(deltas, width)}

    @staticmethod
    def decode(meta: dict, buffers: dict) -> np.ndarray:
        target = np.dtype(meta["dtype"])
        deltas = unpack_ints(buffers["packed"], meta["n"], meta["width"])
        out = deltas.astype(np.uint64) + np.uint64(meta["min"] & ((1 << 64) - 1))
        if target.kind == "i":
            out = out.view(np.int64)  # reinterpret mod-2^64 back to signed
        return out.astype(target)


def _zigzag(x: np.ndarray) -> np.ndarray:
    return ((x << 1) ^ (x >> 63)).astype(np.uint64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint64)
    return (z >> np.uint64(1)).astype(np.int64) ^ -(z & np.uint64(1)).astype(np.int64)


class DeltaCodec:
    """Delta + zigzag + bitpack: best for sorted/clustered int sequences
    (crawl timestamps per host, monotonically assigned ids)."""

    name = "delta"

    @staticmethod
    def applicable(payload: np.ndarray) -> bool:
        return payload.dtype.kind in "iu"

    @staticmethod
    def encode(payload: np.ndarray):
        n = len(payload)
        x = payload.astype(np.int64)
        first = int(x[0]) if n else 0
        d = np.diff(x)
        z = _zigzag(d)
        width = _width_of(int(z.max())) if len(z) else 0
        meta = {"n": n, "width": width, "first": first, "dtype": payload.dtype.str}
        return meta, {"packed": pack_ints(z, width)}

    @staticmethod
    def decode(meta: dict, buffers: dict) -> np.ndarray:
        n = meta["n"]
        if n == 0:
            return np.zeros(0, dtype=np.dtype(meta["dtype"]))
        z = unpack_ints(buffers["packed"], n - 1, meta["width"])
        d = _unzigzag(z)
        out = np.empty(n, dtype=np.int64)
        out[0] = meta["first"]
        np.cumsum(d, out=out[1:])
        out[1:] += meta["first"]
        return out.astype(np.dtype(meta["dtype"]))


def est_bits_for(payload: np.ndarray) -> int:
    """Estimated packed size in bits under FoR (selector cost model)."""
    if len(payload) == 0:
        return 0
    rng = int(payload.max()) - int(payload.min())
    return len(payload) * _width_of(rng)


def est_bits_delta(payload: np.ndarray) -> int:
    if len(payload) <= 1:
        return 64
    z = _zigzag(np.diff(payload.astype(np.int64)))
    return (len(payload) - 1) * _width_of(int(z.max()))
