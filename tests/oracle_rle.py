"""Independent test oracle for RLE semantics.

Role equivalent of the R/S4Vectors oracle in the reference's suite
(/root/reference/tests/compute_Rle.R): a *separate, naive* implementation
the engine is differentially tested against.  Deliberately written the
dumb way — decode to dense vectors, operate elementwise, re-encode —
so it shares no code path with the vectorized kernels under test.
Only suitable for small logical lengths.
"""

from __future__ import annotations

import numpy as np


def dense(runs, values, length=None, fill=0.0):
    """Materialize an RLE into a dense float64 vector, optionally
    zero-extended to ``length`` (the reference's alignment rule)."""
    v = np.repeat(np.asarray(values, dtype=np.float64), np.asarray(runs, dtype=np.int64))
    if length is not None and len(v) < length:
        v = np.concatenate([v, np.full(length - len(v), fill, dtype=np.float64)])
    return v


def encode_exact(x):
    """Naive RLE encode with exact-equality merging (NaN never merges)."""
    runs, vals = [], []
    for item in np.asarray(x, dtype=np.float64):
        if runs and (vals[-1] == item):
            runs[-1] += 1
        else:
            runs.append(1)
            vals.append(item)
    return np.array(runs, dtype=np.int64), np.array(vals, dtype=np.float64)


def binary_op_dense(op, r1, v1, r2, v2, extend=0.0):
    """Elementwise op on zero-extended dense vectors, then exact re-encode.

    Matches the reference's *semantic* contract ("operations between Rles
    act as if it was a regular vector", rle.py:72-74) with its
    zero-extension alignment and IEEE division rules.
    """
    n = max(int(np.sum(r1)), int(np.sum(r2)))
    a = dense(r1, v1, n, extend)
    b = dense(r2, v2, n, extend)
    with np.errstate(divide="ignore", invalid="ignore"):
        if op == "add":
            out = a + b
        elif op == "sub":
            out = a - b
        elif op == "mul":
            out = a * b
        elif op == "div":
            out = a / b
            zero = b == 0
            sign = np.copysign(1.0, a) * np.copysign(1.0, b)
            out = np.where(
                zero, np.where(a != 0, np.inf * sign, np.nan), out
            )
        else:
            raise ValueError(op)
    return encode_exact(out)


def coverage_dense(starts, ends, weights=None, size=None):
    """Dense step-function coverage over [0, size)."""
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    if weights is None:
        weights = np.ones(len(starts), dtype=np.float64)
    size = size or (int(ends.max()) if len(ends) else 0)
    acc = np.zeros(size + 1, dtype=np.float64)
    np.add.at(acc, starts, weights)
    np.add.at(acc, ends, -np.asarray(weights, dtype=np.float64))
    return np.cumsum(acc)[:-1]


def getitems_loop(runs, values, starts, ends):
    """Per-query loop version of batch range extraction: for each query,
    emit overlapping runs clipped to [start, end)."""
    cum = np.concatenate([[0], np.cumsum(runs)])
    out = []
    for qid, (s, e) in enumerate(zip(starts, ends)):
        for i in range(len(runs)):
            lo, hi = cum[i], cum[i + 1]
            a, b = max(lo, s), min(hi, e)
            if b > a:
                out.append((qid, s, e, b - a, values[i]))
    return out
