"""ALP — adaptive lossless floating-point compression for float64 columns.

Implements the two-factor core of ALP (Afroozeh & Boncz, "ALP: Adaptive
Lossless floating-Point compression", SIGMOD 2024, public): most
real-world doubles are decimals in disguise, so each chunk picks the
exponent pair ``(e, f)`` (from a bounded sample, by estimated compressed
bits) such that the integer digits ``round(x * 10^e * 10^-f)`` reproduce
``x`` bit-identically under the fixed decode ``digits * 10^f * 10^-e``.
The second factor matters: a single multiply by ``10^-2`` mis-rounds
~13% of real 2-decimal prices, while the split form covers 100% of them
(measured on the TPC-H-style test tables).  Exact values store only
their digits (frame-of-reference bit-packed, reusing
:class:`~pyrle_spark.codecs.bitpack.ForCodec`); the rest are
*exceptions* — raw 8-byte patterns plus bit-packed positions — so decode
is exact for EVERY input by construction, including NaN/inf/-0.0 (the
exactness test runs on the int64-cast digits, so -0.0 — whose digit 0
decodes to +0.0 — is always routed to the exception path).

This generalizes the reference's float64 values array (pyrle keeps
values as full 8-byte doubles, /root/reference/pyrle/rle.py:147) the
same way FoR/delta generalize its int64 runs array: width-minimal
storage chosen from content, never trusted without a per-value roundtrip
proof.
"""

from __future__ import annotations

import numpy as np

from pyrle_spark.codecs.bitpack import ForCodec, pack_ints, unpack_ints

__all__ = ["AlpCodec"]

_MAX_E = 15  # e in 0..14, f in 0..e
_EXP = 10.0 ** np.arange(_MAX_E)
_INV = 10.0 ** -np.arange(_MAX_E, dtype=np.float64)
# digits must stay exactly representable as float64 AND leave headroom for
# the FoR delta (max - min < 2^52 guaranteed when |digits| < 2^51)
_MAX_DIGITS = float(1 << 51)
_SAMPLE = 512


def _digits_and_mask(x: np.ndarray, e: int, f: int):
    """(int64 digits, bool exact-roundtrip mask) for exponents ``(e, f)``.

    The roundtrip test multiplies the *int64-cast* digits back through
    the exact expression decode uses — ``(digits * 10^f) * 10^-e``, left
    to right — and compares bit patterns, so any value the mask admits is
    guaranteed to decode bit-identically.
    """
    with np.errstate(invalid="ignore", over="ignore"):
        dig_f = np.round(x * _EXP[e] * _INV[f])
    ok = np.isfinite(dig_f) & (np.abs(dig_f) < _MAX_DIGITS)
    dig = np.where(ok, dig_f, 0.0).astype(np.int64)
    rt = dig.astype(np.float64) * _EXP[f] * _INV[e]
    exact = ok & (rt.view(np.uint64) == x.view(np.uint64))
    return dig, exact


def _choose_exponents(x: np.ndarray) -> tuple[int, int]:
    """Cost-model (e, f) choice over a bounded prefix sample: minimize
    estimated bits = n·FoR_width(exact digits) + n_exc·(64 + pos bits).
    Hit count alone is the wrong objective — binary-fraction noise often
    roundtrips at huge e with 50-bit digits; weighing the digit width
    steers to the narrow decimal pair (the ALP paper's compression-size
    criterion)."""
    sample = x[: min(len(x), _SAMPLE)]
    n = len(sample)
    if n == 0:
        return 0, 0
    pos_bits = 64 + max(int(n - 1).bit_length(), 1)
    best, best_bits = (0, 0), float("inf")
    for e in range(_MAX_E):
        for f in range(e + 1):
            dig, exact = _digits_and_mask(sample, e, f)
            n_exc = n - int(exact.sum())
            if n_exc < n:
                d = dig[exact]
                width = int(int(d.max()) - int(d.min())).bit_length()
            else:
                width = 0
            bits = n * width + n_exc * pos_bits
            if bits < best_bits:
                best, best_bits = (e, f), bits
    return best


class AlpCodec:
    """Decimal-scaled doubles: FoR-packed digits + raw exceptions."""

    name = "alp"

    @staticmethod
    def applicable(payload: np.ndarray) -> bool:
        return payload.dtype == np.float64

    @staticmethod
    def encode(payload: np.ndarray):
        x = np.ascontiguousarray(payload, dtype=np.float64)
        n = len(x)
        if n == 0:
            meta = {"n": 0, "e": 0, "f": 0, "n_exc": 0, "pos_width": 0,
                    "for": {"n": 0, "width": 0, "min": 0, "dtype": "<i8"}}
            return meta, {"packed": b"", "exc_pos": b"", "exc_val": b""}
        e, f = _choose_exponents(x)
        dig, exact = _digits_and_mask(x, e, f)
        exc_pos = np.nonzero(~exact)[0]
        if len(exc_pos) and exact.any():
            # exception slots' digit content is masked out on decode; pin
            # them to an in-range digit so they never widen the FoR frame
            dig[exc_pos] = dig[int(np.argmax(exact))]
        elif len(exc_pos) == n:
            dig[:] = 0
        for_meta, for_bufs = ForCodec.encode(dig)
        pos_width = int(n - 1).bit_length() if n > 1 else 1
        meta = {
            "n": n,
            "e": e,
            "f": f,
            "n_exc": int(len(exc_pos)),
            "pos_width": pos_width,
            "for": for_meta,
        }
        bufs = {
            "packed": for_bufs["packed"],
            "exc_pos": pack_ints(exc_pos.astype(np.uint64), pos_width),
            "exc_val": x[exc_pos].tobytes(),
        }
        return meta, bufs

    @staticmethod
    def decode(meta: dict, buffers: dict) -> np.ndarray:
        n = meta["n"]
        if n == 0:
            return np.zeros(0, dtype=np.float64)
        dig = ForCodec.decode(meta["for"], {"packed": buffers["packed"]})
        out = dig.astype(np.float64) * _EXP[meta["f"]] * _INV[meta["e"]]
        if meta["n_exc"]:
            pos = unpack_ints(
                buffers["exc_pos"], meta["n_exc"], meta["pos_width"]
            ).astype(np.int64)
            out[pos] = np.frombuffer(buffers["exc_val"], dtype=np.float64)
        return out
