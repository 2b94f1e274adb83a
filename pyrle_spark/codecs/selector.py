"""Stats-driven codec auto-selection.

Generalizes the reference's content-based kernel choice (it inspects the
divisor for zeros to pick a division kernel, /root/reference/pyrle/rle.py:740-743)
into a per-chunk codec decision: one vectorized stats pass (row count,
exact run count, distinct estimate, int range, delta range, avg string
length) feeds a cost model; the winner is verified against the raw size
so a bad pick can never inflate a chunk beyond raw+ε.

Stats and choice are recorded in the Encoded meta so the pipeline's
lineage manifest can report them per partition (north-rule requirement).
"""

from __future__ import annotations

import numpy as np

from pyrle_spark.codecs import bitpack as bp
from pyrle_spark.codecs.rle_codec import exact_find_runs

__all__ = ["column_stats", "choose_fixed", "choose_var", "kmv_merge_estimate"]

_KMV_K = 16
_KMV_MIN_ROWS = 1024  # below this, sketch overhead would dent the raw+eps contract
_TWO64 = float(1 << 64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 — the per-block value hash for
    the KMV distinct sketch (deterministic, order-free, mergeable)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _kmv_b64(arr: np.ndarray) -> str | None:
    """Base64-packed k-min-values sketch (k=16, ~172 chars) of a
    fixed-width payload: the k smallest splitmix64 hashes of the
    DISTINCT bit patterns.  Two sketches merge by union+re-min, so
    per-block sketches roll up to a table NDV estimate without decoding
    a row (ANALYZE)."""
    n = len(arr)
    if n == 0:
        return None
    kind = arr.dtype.kind
    if kind == "f":
        x = np.ascontiguousarray(arr).view(
            np.uint64 if arr.dtype.itemsize == 8 else np.uint32
        )
    elif kind in "iuMm":
        x = np.ascontiguousarray(arr).view(
            {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}[
                arr.dtype.itemsize
            ]
        )
    else:
        return None
    with np.errstate(over="ignore"):
        h = _splitmix64(x.astype(np.uint64, copy=False))
    mins = np.unique(h)[:_KMV_K]  # sorted distinct hashes, k smallest
    import base64

    return base64.b64encode(mins.tobytes()).decode("ascii")


def kmv_union(sketches_b64) -> str | None:
    """Union per-block KMV sketches into ONE sketch (k smallest of the
    union, base64) — the partial-aggregate form incremental ANALYZE
    stores so later folds merge against it instead of re-reading every
    block."""
    import base64

    parts = [
        np.frombuffer(base64.b64decode(s), dtype=np.uint64)
        for s in sketches_b64
        if s
    ]
    if not parts:
        return None
    u = np.unique(np.concatenate(parts))[:_KMV_K]
    return base64.b64encode(u.tobytes()).decode("ascii")


def kmv_merge_estimate(sketches_b64) -> int | None:
    """Merge per-block KMV sketches → table-level NDV estimate.

    Union the hash sets, keep the k smallest.  Fewer than k in the union
    means every hash ever sketched is present → the count is exact (a
    block contributes min(k, its distinct) hashes, so a union below k
    implies no block truncated).  Otherwise the classic KMV estimator
    (k-1) / kth-min scaled to the 2^64 hash space."""
    import base64

    parts = [
        np.frombuffer(base64.b64decode(s), dtype=np.uint64)
        for s in sketches_b64
        if s
    ]
    if not parts:
        return None
    u = np.unique(np.concatenate(parts))
    if len(u) < _KMV_K:
        return int(len(u))
    kth = float(u[_KMV_K - 1]) + 1.0
    return int(round((_KMV_K - 1) * _TWO64 / kth))


def column_stats(kind: str, payload) -> dict:
    """One vectorized pass of selector statistics."""
    if kind == "fixed":
        arr = payload
        n = len(arr)
        runs, rvals = exact_find_runs(arr)
        stats = {"n": n, "n_runs": int(len(runs))}
        if len(runs):
            # log2-bucketed run-length histogram (16 buckets, last open):
            # distinguishes many-short-runs (dict/bitpack territory) from
            # few-long-runs (RLE territory) beyond the mean run length
            lg = np.minimum(np.log2(runs).astype(np.int64), 15)
            stats["run_hist_log2"] = np.bincount(lg, minlength=16).tolist()
        if arr.dtype.kind in "iu" and n:
            stats["vmin"] = int(arr.min())
            stats["vmax"] = int(arr.max())
            stats["for_bits"] = bp.est_bits_for(arr)
            stats["delta_bits"] = bp.est_bits_delta(arr)
        # distinct estimate from a bounded sample
        sample = arr[: min(n, 4096)]
        stats["distinct_est"] = int(len(np.unique(sample)))
        # KMV over the run-START values: set-equal to the whole payload
        # (a run's value appears at its start), usually far smaller.
        # Gated on block size: on tiny blocks the ~172-char sketch would
        # dent the raw-size guarantee it rides inside (meta counts).
        if n >= _KMV_MIN_ROWS:
            kmv = _kmv_b64(rvals)
            if kmv is not None:
                stats["kmv"] = kmv
        return stats
    offsets, data = payload
    n = len(offsets) - 1
    lens = np.diff(offsets)
    sample_n = min(n, 2048)
    if sample_n:
        # distinct estimate via hash of (len, first bytes) — cheap proxy
        import pyarrow as pa

        head = pa.Array.from_buffers(
            pa.large_binary(),
            sample_n,
            [None,
             pa.py_buffer(np.ascontiguousarray(offsets[: sample_n + 1], np.int64).tobytes()),
             pa.py_buffer(data)],
        )
        distinct = len(head.unique())
    else:
        distinct = 0
    if n:
        # exact run count via one vectorized adjacent-not-equal on a
        # zero-copy arrow view — block manifests carry it for every
        # column, so layout metrics (rewrite_sorted's before/after run
        # totals) see string columns too, not just fixed-width ones
        import pyarrow as pa
        import pyarrow.compute as pc

        view = pa.Array.from_buffers(
            pa.large_binary(),
            n,
            [
                None,
                pa.py_buffer(np.ascontiguousarray(offsets, dtype=np.int64)),
                pa.py_buffer(np.ascontiguousarray(data)),
            ],
        )
        neq = pc.not_equal(view.slice(0, n - 1), view.slice(1))
        n_runs = 1 + int(pc.sum(pc.cast(neq, "int64")).as_py() or 0)
    else:
        n_runs = 0
    return {
        "n": n,
        "n_runs": n_runs,
        "avg_len": float(lens.mean()) if n else 0.0,
        "total_bytes": int(offsets[-1]) if n else 0,
        "distinct_est": distinct,
        "sample_n": sample_n,
    }


def choose_fixed(stats: dict, dtype_kind: str) -> str:
    """Rule/cost table for fixed-width columns."""
    n = stats["n"]
    if n == 0:
        return "raw"
    run_ratio = stats["n_runs"] / n
    if dtype_kind in "iu":
        # candidate bit costs
        width_bits = 64
        for_bits = stats.get("for_bits", n * 64)
        delta_bits = stats.get("delta_bits", n * 64)
        # rle cost: runs need ~ (value width + run width) each
        rle_bits = stats["n_runs"] * 2 * max(for_bits // max(n, 1), 8)
        # dict cost: dictionary entries at full width + codes at
        # bit_length(n_dict).  distinct_est is a 4096-row sample; when
        # the sample saturates (every sampled value distinct) treat the
        # column as high-cardinality — the raw-size guard still protects
        # against a rare under-sampled pick.
        distinct = stats.get("distinct_est", n)
        if distinct >= min(n, 4096) or distinct == 0:
            dict_bits = float("inf")
        else:
            code_bits = max(int(distinct - 1).bit_length(), 1)
            dict_bits = distinct * width_bits + n * code_bits
        best = min(
            ("rle", rle_bits) if run_ratio < 0.5 else ("rle", float("inf")),
            ("delta", delta_bits),
            ("for", for_bits),
            ("dict", dict_bits),
            key=lambda kv: kv[1],
        )
        if best[1] < n * width_bits:
            return best[0]
        return "raw"
    # floats: rle only helps with long exact runs; otherwise raw bits
    if run_ratio < 0.5:
        return "rle"
    return "raw"


def choose_var(stats: dict) -> str:
    """Closed-form rule table for string/binary columns.

    NOTE: the production var-width path in ``encode_payload_auto``
    supersedes this with TRIAL selection (dict when the distinct ratio
    is low, else the smallest of fsst / raw+zstd measured on a sample) —
    this function remains only as the documented closed-form fallback
    for callers that cannot afford the trial, and is intentionally NOT
    consulted by the auto encoder."""
    n = stats["n"]
    if n == 0:
        return "raw"
    distinct_ratio = stats["distinct_est"] / max(stats["sample_n"], 1)
    if distinct_ratio < 0.5:
        return "dict"
    if stats["avg_len"] >= 8:
        return "fsst"
    return "raw"
