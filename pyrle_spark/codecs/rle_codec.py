"""RLE codec — the direct generalization of the reference's data structure.

Stores a column chunk as (runs, values) exactly like pyrle's Rle
(/root/reference/pyrle/rle.py:139-147), but:

- run detection uses **exact** equality (NaN never merges) so decode is
  bit-identical — the tolerance-merge semantics of the compat layer
  (pyrle's 1e-5 rule) deliberately do NOT apply to storage;
- runs are themselves FoR+bitpacked (they're small positive ints);
- values are stored by a nested codec: FoR for ints, raw bits for floats.

Variable-width (string) columns go through DictCodec + RLE-on-codes
instead (see dictionary.py).
"""

from __future__ import annotations

import numpy as np

from pyrle_spark.codecs.bitpack import ForCodec

__all__ = ["RleCodec", "exact_find_runs"]


def exact_find_runs(x: np.ndarray):
    """Change-point RLE with exact equality (bitwise for floats: compare
    via void view so NaN == NaN and -0.0 != +0.0 — bit-identity safe)."""
    n = len(x)
    if n == 0:
        return np.array([], dtype=np.int64), x[:0]
    if x.dtype.kind == "f":
        xb = x.view(np.uint64 if x.dtype.itemsize == 8 else np.uint32)
        neq = xb[:-1] != xb[1:]
    else:
        neq = x[:-1] != x[1:]
    starts = np.empty(n, dtype=bool)
    starts[0] = True
    starts[1:] = neq
    idx = np.nonzero(starts)[0]
    runs = np.diff(np.append(idx, n)).astype(np.int64)
    return runs, x[idx]


class RleCodec:
    name = "rle"

    @staticmethod
    def applicable(payload: np.ndarray) -> bool:
        return payload.dtype.kind in "iuf"

    @staticmethod
    def encode(payload: np.ndarray):
        runs, values = exact_find_runs(payload)
        runs_meta, runs_buf = ForCodec.encode(runs)
        if values.dtype.kind in "iu":
            vals_meta, vals_buf = ForCodec.encode(values)
            vals_mode = "for"
            vals_bytes = vals_buf["packed"]
        else:
            vals_meta = {"dtype": values.dtype.str, "n": len(values)}
            vals_mode = "bits"
            vals_bytes = np.ascontiguousarray(values).tobytes()
        meta = {
            "n": int(payload.shape[0]),
            "n_runs": len(runs),
            "runs_meta": runs_meta,
            "vals_meta": vals_meta,
            "vals_mode": vals_mode,
            "dtype": payload.dtype.str,
        }
        return meta, {"runs": runs_buf["packed"], "values": vals_bytes}

    @staticmethod
    def decode(meta: dict, buffers: dict) -> np.ndarray:
        runs = ForCodec.decode(meta["runs_meta"], {"packed": buffers["runs"]})
        if meta["vals_mode"] == "for":
            values = ForCodec.decode(meta["vals_meta"], {"packed": buffers["values"]})
        else:
            values = np.frombuffer(
                buffers["values"], dtype=np.dtype(meta["vals_meta"]["dtype"])
            )
        return np.repeat(values, runs).astype(np.dtype(meta["dtype"]))
