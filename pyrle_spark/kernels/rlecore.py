"""Vectorized numpy RLE kernels — the semantic core of the engine.

These reproduce the observable semantics of the reference implementation
(pyrle v0.0.42) from first principles, vectorized with numpy instead of
per-element loops.  They serve three roles:

1. the *vendored oracle* for the test suite (replacing the R/S4Vectors
   oracle the reference uses, which is unavailable here),
2. the driver-side compat `Rle` class (:mod:`pyrle_spark.rle`),
3. the hot-path kernels invoked inside Arrow UDFs (``mapInArrow`` /
   ``applyInArrow``) by the distributed operators and codecs.

Reference semantics reproduced (cited file:line refer to /root/reference):

* constructor normalization — ``pyrle/rle.py:139-167``
* adjacent-duplicate merge with 1e-5 abs tolerance, NaN==NaN, ±inf==±inf,
  and the float32 cast of the incoming value — ``pyrle/src/coverage.pyx:87-183``
* zero-extension length alignment — ``pyrle/rle.py:17-31``
* two-pointer run-aligned binary ops with exact-equality emission merge —
  ``pyrle/src/rle.pyx:20-349``
* division-by-zero IEEE rules (x/0 = ±inf via copysign, 0/0 = NaN) —
  ``pyrle/src/rle.pyx:244-252``
* slicing / point lookup / batch range extraction — ``pyrle/src/getitem.pyx``
* interval coverage — ``pyrle/src/coverage.pyx:28-81`` + ``pyrle/methods.py:139-156``
* shift — ``pyrle/rle.py:1000-1095``
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "find_runs",
    "remove_dupes",
    "normalize",
    "defragment",
    "equalize",
    "merge_binary",
    "getitem_slice",
    "getlocs",
    "getitems",
    "coverage",
    "shift_rle",
    "decode_runs",
]

_I8 = np.int64
_F8 = np.float64


def find_runs(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """RLE-encode a plain vector: change-point detection.

    Returns ``(runs int64, values)``.  Matches ``pyrle/rle.py:34-64``:
    NaNs never merge (``NaN != NaN``), values coerced to float64 when
    numeric.  Works on any 1-D array (object/str arrays use ``!=`` too).
    """
    x = np.asarray(x)
    n = x.shape[0]
    if n == 0:
        return np.array([], dtype=_I8), np.array([], dtype=_F8)
    starts = np.empty(n, dtype=bool)
    starts[0] = True
    np.not_equal(x[:-1], x[1:], out=starts[1:])
    start_idx = np.nonzero(starts)[0]
    values = x[start_idx]
    if values.dtype.kind in "fiub":
        values = values.astype(_F8)
    runs = np.diff(np.append(start_idx, n)).astype(_I8)
    return runs, values


def remove_dupes(runs: np.ndarray, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Merge adjacent runs whose values are "equal" under the reference's rules.

    Sequential left-to-right scan (``pyrle/src/coverage.pyx:87-183``):
    the incoming value is compared against the *first value of the current
    group* with absolute tolerance 1e-5; NaN==NaN and +inf==+inf and
    -inf==-inf also merge.  Quirk reproduced deliberately: the reference
    declares the incoming value as a C ``float``, so every group value
    after the first is rounded to float32 — we replicate that cast so the
    compat layer is bit-identical to the reference (exact for the integer
    value ranges its own test suite generates, |v| <= 1e7 < 2**24).

    Single-element input is returned as-is (reference early-exit).
    """
    n = len(values)
    if n <= 1:
        return np.asarray(runs, dtype=_I8), np.asarray(values, dtype=_F8)
    out_r = np.empty(n, dtype=_I8)
    out_v = np.empty(n, dtype=_F8)
    old_val = float(values[0])
    old_run = int(runs[0])
    k = 0
    for i in range(1, n):
        run = int(runs[i])
        value = float(np.float32(values[i]))  # C `float` cast, coverage.pyx:97
        if np.isnan(value) and np.isnan(old_val):
            old_run += run
        elif (value == np.inf and old_val == np.inf) or (
            value == -np.inf and old_val == -np.inf
        ):
            old_run += run
        elif abs(value - old_val) < 1e-5:
            old_run += run
        else:
            out_r[k] = old_run
            out_v[k] = old_val
            old_run = run
            old_val = value
            k += 1
    out_r[k] = old_run
    out_v[k] = old_val
    k += 1
    return out_r[:k], out_v[:k]


def normalize(runs, values) -> tuple[np.ndarray, np.ndarray]:
    """Constructor normalization (``pyrle/rle.py:139-159``).

    1. coerce runs→int64, values→float64;
    2. drop zero-length runs;
    3. *only if* some adjacent pair is ``np.isclose`` (relative 1e-5 /
       atol 1e-8, equal_nan) — a different, looser-then-tighter test than
       the merge itself — run :func:`remove_dupes`.
    """
    runs = np.asarray(runs, dtype=_I8)
    values = np.asarray(values, dtype=_F8)
    if len(runs) != len(values):
        raise AssertionError("runs and values must have equal length")
    nz = runs != 0
    if not nz.all():
        runs = runs[nz]
        values = values[nz]
    if len(values) > 1:
        prev = np.concatenate(([np.nan], values[:-1]))
        with np.errstate(invalid="ignore"):
            close = np.isclose(prev, values, equal_nan=True)
        if close.any():
            runs, values = remove_dupes(runs, values)
    return runs, values


def defragment(runs, values) -> tuple[np.ndarray, np.ndarray]:
    """``pyrle/rle.py:879-915``: remove_dupes then canonicalize -0.0 → 0.0."""
    runs, values = remove_dupes(np.asarray(runs, dtype=_I8), np.asarray(values, dtype=_F8))
    values = values.copy()
    values[values == 0] = 0.0  # folds -0.0 into +0.0
    return normalize(runs, values)


def equalize(
    r1, v1, r2, v2, value: float = 0.0
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Zero-extension alignment (``pyrle/rle.py:17-31``).

    Extends the shorter logical vector with one run of ``value`` (0 for
    arithmetic, NaN for ``==``/``!=``) so both sides have equal total
    length.  The extended side is re-normalized, as the reference does by
    round-tripping through the constructor.
    """
    ls = int(np.sum(r1))
    lo = int(np.sum(r2))
    if ls > lo:
        r2 = np.append(r2, ls - lo)
        v2 = np.append(v2, value)
        r2, v2 = normalize(r2, v2)
    elif lo > ls:
        r1 = np.append(r1, lo - ls)
        v1 = np.append(v1, value)
        r1, v1 = normalize(r1, v1)
    return (
        np.asarray(r1, dtype=_I8),
        np.asarray(v1, dtype=_F8),
        np.asarray(r2, dtype=_I8),
        np.asarray(v2, dtype=_F8),
    )


def _boundary_union(r1, r2):
    """Union of the two sides' cumulative run boundaries plus covering-run
    indices per boundary — the vectorized equivalent of the reference's
    two-pointer walk (``pyrle/src/rle.pyx:41-64``)."""
    c1 = np.cumsum(r1)
    c2 = np.cumsum(r2)
    bounds = np.union1d(c1, c2)
    i1 = np.searchsorted(c1, bounds, side="left")
    i2 = np.searchsorted(c2, bounds, side="left")
    runs = np.diff(bounds, prepend=0)
    return runs.astype(_I8), i1, i2


def _emission_merge(runs, values):
    """Merge *exactly* equal adjacent emitted values, as the kernels do
    on the fly (``pyrle/src/rle.pyx:66-72``).  NaN != NaN, so NaN runs
    stay separate; -0.0 == 0.0 merges — both match C `==` semantics."""
    n = len(values)
    if n == 0:
        return runs, values
    keep = np.empty(n, dtype=bool)
    keep[0] = True
    np.not_equal(values[1:], values[:-1], out=keep[1:])
    idx = np.nonzero(keep)[0]
    merged_runs = np.add.reduceat(runs, idx)
    return merged_runs.astype(_I8), values[idx]


def merge_binary(op: str, r1, v1, r2, v2) -> tuple[np.ndarray, np.ndarray]:
    """Run-aligned binary operation between two equal-total-length RLEs.

    ``op`` in {"add","sub","mul","div_nonzeroes","div_zeroes"} — the five
    kernels of ``pyrle/src/rle.pyx``, vectorized: boundary union + gather
    + elementwise op + exact-equality emission merge.  Output is *not*
    constructor-normalized; callers wrap in :func:`normalize` as the
    reference wraps kernel output in ``Rle(...)``.
    """
    r1 = np.asarray(r1, dtype=_I8)
    v1 = np.asarray(v1, dtype=_F8)
    r2 = np.asarray(r2, dtype=_I8)
    v2 = np.asarray(v2, dtype=_F8)
    if len(r1) == 0 or len(r2) == 0:
        # two-pointer loop body never executes (rle.pyx:41 while condition)
        return np.array([], dtype=_I8), np.array([], dtype=_F8)
    runs, i1, i2 = _boundary_union(r1, r2)
    a = v1[i1]
    b = v2[i2]
    if op == "add":
        nv = a + b
    elif op == "sub":
        nv = a - b
    elif op == "mul":
        nv = a * b
    elif op == "div_nonzeroes":
        with np.errstate(divide="ignore", invalid="ignore"):
            nv = a / b
    elif op == "div_zeroes":
        zero_b = b == 0
        safe_b = np.where(zero_b, 1.0, b)
        with np.errstate(divide="ignore", invalid="ignore"):
            nv = a / safe_b
        # x/0 = ±inf by the product of copysigns (rle.pyx:248-250);
        # 0/0 = NaN (rle.pyx:251-252)
        sign = np.copysign(1.0, a) * np.copysign(1.0, b)
        nv = np.where(zero_b, np.where(a != 0, np.inf * sign, np.nan), nv)
    else:
        raise ValueError(f"unknown op {op!r}")
    return _emission_merge(runs, nv)


def binary_op(op: str, r1, v1, r2, v2) -> tuple[np.ndarray, np.ndarray]:
    """Full reference-path binary op: equalize, pick kernel, normalize.

    ``op`` in {"add","sub","mul","div"}.  Division picks the zero-aware
    kernel when the (equalized) divisor contains zeros (``pyrle/rle.py:740-743``).
    Comparisons are NOT handled here — they go through :func:`compare_op`.
    """
    r1, v1, r2, v2 = equalize(r1, v1, r2, v2, value=0.0)
    if op == "div":
        kernel = "div_zeroes" if (v2 == 0).any() or np.sum(r2) < np.sum(r1) else "div_nonzeroes"
    else:
        kernel = {"add": "add", "sub": "sub", "mul": "mul"}[op]
    runs, values = merge_binary(kernel, r1, v1, r2, v2)
    return normalize(runs, values)


_CMP_FNS = {
    "eq": np.equal,
    "ne": np.not_equal,
    "lt": np.less,
    "le": np.less_equal,
    "gt": np.greater,
    "ge": np.greater_equal,
}


def compare_op(op: str, r1, v1, r2, v2) -> tuple[np.ndarray, np.ndarray]:
    """Comparison returning a 0/1-valued RLE (``pyrle/rle.py:248-276,
    342-466, 502-522``): equality ops extend the shorter side with NaN
    (rle.py:272), order ops with 0; all are rewritten as subtract +
    threshold, then defragmented."""
    extend = np.nan if op in ("eq", "ne") else 0.0
    r1, v1, r2, v2 = equalize(r1, v1, r2, v2, value=extend)
    runs, diff = merge_binary("sub", r1, v1, r2, v2)
    # the reference thresholds the CONSTRUCTED difference Rle
    # (rle.py:248-276: `self - other` passes through Rle() normalization
    # before np.where), so near-zero diffs adjacent to exact-zero diffs
    # merge under the constructor's isclose rule FIRST — skipping this
    # step yields different 0/1 run splits than the reference
    runs, diff = normalize(runs, diff)
    with np.errstate(invalid="ignore"):
        vals = np.where(_CMP_FNS[op](diff, 0.0), 1.0, 0.0)
    return defragment(runs, vals)


def numbers_only(
    runs, values, nan=0.0, posinf=2147483647, neginf=-2147483648
) -> tuple[np.ndarray, np.ndarray]:
    """NaN/±inf → finite sentinels, then defragment (rle.py:961-998)."""
    runs, values = normalize(
        runs, np.nan_to_num(np.asarray(values, dtype=_F8), nan=nan, posinf=posinf, neginf=neginf)
    )
    return defragment(runs, values)


def getitem_slice(runs, values, start: int, end: int) -> tuple[np.ndarray, np.ndarray]:
    """Slice the logical vector at ``[start, end)`` → clipped sub-RLE.

    Matches ``pyrle/src/getitem.pyx:11-83``: first/last overlapping runs
    clipped, ``end`` beyond total length truncates, empty result when
    ``start >= total`` or the window is empty.
    """
    runs = np.asarray(runs, dtype=_I8)
    values = np.asarray(values, dtype=_F8)
    cum = np.cumsum(runs)
    total = int(cum[-1]) if len(cum) else 0
    if start >= total or end <= start or total == 0:
        return np.array([], dtype=_I8), np.array([], dtype=_F8)
    end_c = min(end, total)
    # first run whose cumsum exceeds start / first whose cumsum reaches end
    lo = int(np.searchsorted(cum, start, side="right"))
    hi = int(np.searchsorted(cum, end_c, side="left"))
    out_r = runs[lo : hi + 1].copy()
    out_v = values[lo : hi + 1].copy()
    prev = int(cum[lo - 1]) if lo > 0 else 0
    out_r[0] -= start - prev
    out_r[-1] -= int(cum[hi]) - end_c
    return out_r, out_v


def getlocs(runs, values, locs) -> np.ndarray:
    """Point lookups.  ``pyrle/src/getitem.pyx:89-109``: value of the run
    covering each position; positions past the end yield 0 (the reference
    leaves its zero-initialized output untouched)."""
    runs = np.asarray(runs, dtype=_I8)
    values = np.asarray(values, dtype=_F8)
    locs = np.asarray(locs, dtype=_I8)
    out = np.zeros(len(locs), dtype=_F8)
    cum = np.cumsum(runs)
    total = int(cum[-1]) if len(cum) else 0
    ok = locs < total
    if ok.any():
        out[ok] = values[np.searchsorted(cum, locs[ok], side="right")]
    return out


def getitems(
    runs, values, starts, ends
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch range extraction — the reference's range join
    (``pyrle/src/getitem.pyx:201-325``).

    For each query interval ``[start_i, end_i)`` emit the overlapping runs
    clipped to the interval, tagged with the query index.  Returns
    ``(ids, q_starts, q_ends, out_runs, out_values)``.  Vectorized:
    searchsorted entry/exit per query, then flat gather via repeat/arange.
    Queries with start >= total length emit nothing (clamping); zero-length
    trailing clips are dropped as the reference's ``l == 0`` break does.
    """
    runs = np.asarray(runs, dtype=_I8)
    values = np.asarray(values, dtype=_F8)
    starts = np.asarray(starts, dtype=_I8)
    ends = np.asarray(ends, dtype=_I8)
    cum = np.cumsum(runs)
    total = int(cum[-1]) if len(cum) else 0
    nq = len(starts)
    if total == 0 or nq == 0:
        e = np.array([], dtype=_I8)
        return e, e, e, e, np.array([], dtype=_F8)
    s = np.minimum(starts, total)
    e_ = np.minimum(ends, total)
    valid = s < e_
    lo = np.searchsorted(cum, s, side="right")  # first overlapping run
    hi = np.searchsorted(cum, e_, side="left")  # last overlapping run
    counts = np.where(valid, hi - lo + 1, 0)
    n_out = int(counts.sum())
    if n_out == 0:
        e = np.array([], dtype=_I8)
        return e, e, e, e, np.array([], dtype=_F8)
    ids = np.repeat(np.arange(nq, dtype=_I8), counts)
    # flat run indices: lo[q] + offset within query
    offs = np.arange(n_out, dtype=_I8) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    ridx = np.repeat(lo, counts) + offs
    out_r = runs[ridx].copy()
    out_v = values[ridx]
    # clip first run of each query
    first_mask = offs == 0
    prev = np.where(ridx > 0, cum[np.maximum(ridx - 1, 0)], 0)
    out_r[first_mask] -= (np.repeat(s, counts) - prev)[first_mask]
    # clip last run of each query
    last_mask = offs == np.repeat(counts - 1, counts)
    out_r[last_mask] -= (cum[ridx] - np.repeat(e_, counts))[last_mask]
    keep = out_r > 0
    return (
        ids[keep],
        np.repeat(starts, counts)[keep],
        np.repeat(ends, counts)[keep],
        out_r[keep],
        out_v[keep],
    )


def coverage(positions, deltas) -> tuple[np.ndarray, np.ndarray]:
    """Interval coverage: boundary events → step-function RLE.

    ``positions``/``deltas`` are the concatenated (Start, +v) and (End, -v)
    events, in any order.  Reproduces ``pyrle/src/coverage.pyx:28-81``
    plus the event-frame construction of ``pyrle/methods.py:139-156``:

    * per-unique-position delta sums,
    * values = shifted cumulative sum with pos-0 special case,
    * runs = position diffs (first run = first position),
    * first-two-runs merge when the leading implicit value equals the
      first summed value.
    """
    positions = np.asarray(positions, dtype=_I8)
    deltas = np.asarray(deltas, dtype=_F8)
    if len(positions) == 0:
        return np.array([], dtype=_I8), np.array([], dtype=_F8)
    order = np.argsort(positions, kind="stable")
    positions = positions[order]
    deltas = deltas[order]
    unique, inverse = np.unique(positions, return_inverse=True)
    sums = np.zeros(len(unique), dtype=_F8)
    np.add.at(sums, inverse, deltas)
    first_value = sums[0] if unique[0] == 0 else 0.0
    vals = np.empty(len(unique), dtype=_F8)
    vals[0] = first_value
    vals[1:] = np.cumsum(sums)[:-1]
    runs = np.diff(unique, prepend=0).astype(_I8)
    if len(vals) > 1 and first_value == vals[1]:
        runs = runs[1:].copy()
        runs[0] += int(unique[0])
        vals = vals[1:]
    return runs, vals


def shift_rle(
    runs, values, dist: int = 1, preserve_length: bool = True, fill: float = 0.0
) -> tuple[np.ndarray, np.ndarray]:
    """Shift the logical vector (``pyrle/rle.py:1000-1095``).

    Positive dist prepends a fill run (or extends the first run when it
    already holds ``fill``) and truncates to the original length when
    ``preserve_length``; negative dist consumes from the front and
    appends fill.
    """
    runs = np.asarray(runs, dtype=_I8).copy()
    values = np.asarray(values, dtype=_F8).copy()
    if dist == 0 or len(runs) == 0:
        return runs, values
    if dist > 0:
        original_length = int(np.sum(runs))
        if values[0] == fill:
            runs[0] += dist
        else:
            runs = np.concatenate(([dist], runs))
            values = np.concatenate(([fill], values))
        if preserve_length:
            runs, values = getitem_slice(runs, values, 0, original_length)
            runs, values = normalize(runs, values)
        return runs, values
    dist = -dist
    original_total = int(np.sum(runs))
    if dist < runs[0]:
        runs[0] -= dist
    else:
        cs = np.cumsum(runs)
        ix = int(np.argmax(cs > dist))
        if cs[-1] <= dist:
            # everything shifted out; the reference crashes here
            # (rle.py:1088 indexes values[-1] of an empty Rle) — we keep
            # its documented intent: an all-fill vector when
            # preserve_length, else empty
            runs = np.array([], dtype=_I8)
            values = np.array([], dtype=_F8)
        else:
            leftover = int(np.sum(runs[:ix])) - dist
            runs, values = normalize(runs[ix:], values[ix:])
            runs = runs.copy()
            runs[0] += leftover
    if preserve_length:
        # pad back to the original logical length (== dist when the shift
        # stayed in bounds, == original_total when it consumed everything)
        pad = original_total - int(np.sum(runs))
        if pad > 0:
            if len(values) and values[-1] == fill:
                runs[-1] += pad
            else:
                runs = np.concatenate((runs, [pad]))
                values = np.concatenate((values, [fill]))
    return runs, values


def decode_runs(runs, values) -> np.ndarray:
    """Materialize the logical vector: inverse of :func:`find_runs`."""
    return np.repeat(np.asarray(values), np.asarray(runs, dtype=_I8))
