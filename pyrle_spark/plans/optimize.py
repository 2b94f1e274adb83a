"""OPTIMIZE — stats-driven table maintenance advisor.

Iceberg leaves "when should I compact / re-sort / Z-order?" to the
operator; at 10^12 documents nobody eyeballs run counts.  This module
closes the loop over machinery the engine already has:

- :func:`pyrle_spark.plans.stats.analyze_table` supplies decode-free
  per-column ``n_runs`` / exact NDV / byte sizes (manifest zones +
  dictionary buffers);
- the decision is the same content-based dispatch idea as the codec
  selector (the reference picks its division kernel by inspecting the
  divisor, rle.py:740-743 — here the "kernel" is a layout rewrite);
- the actions are :func:`compact_table`, :func:`rewrite_sorted`, and
  :func:`rewrite_zorder`.

The advisor never decodes a row: a column whose current run count is far
above its NDV would collapse to ~NDV runs if the table were sorted by it
(perfect clustering), so ``n_runs / NDV`` IS the achievable RLE/dict win,
readable straight from the manifest.  Cost model:

- ``rewrite_sorted(c)``: column c's runs drop to ~NDV(c); weight the win
  by c's share of encoded bytes.
- ``rewrite_zorder(c1, c2)``: chosen when TWO columns independently show
  a large ratio and neither dominates the byte weight — Morton
  interleaving trades a bit of each column's clustering for pruning on
  both.
- ``compact_table``: chosen when the win is storage hygiene, not layout —
  a large merge-on-read delete set or manifest bloat from many
  incremental passes.

All thresholds are explicit keyword arguments; ``apply=False`` (default)
returns the recommendation without touching the table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from pyrle_spark.plans.encode_job import (
    _delete_positions,
    compact_table,
    rewrite_column_codec,
    rewrite_sorted,
)
from pyrle_spark.plans.stats import analyze_table
from pyrle_spark.plans.zorder import rewrite_zorder
from pyrle_spark.sources.icetable import IceTable

__all__ = ["optimize_table"]

# fixed-width value byte widths the codec tier can bound RLE size for
_FIXED_WIDTH = {
    "bool": 1,
    "int8": 1,
    "uint8": 1,
    "int16": 2,
    "uint16": 2,
    "int32": 4,
    "uint32": 4,
    "float": 4,
    "date32[day]": 4,
    "int64": 8,
    "uint64": 8,
    "double": 8,
}


def optimize_table(
    spark: SparkSession,
    table_dir: str,
    out_dir: str | None = None,
    apply: bool = False,
    run_ratio_threshold: float = 2.0,
    delete_ratio_threshold: float = 0.1,
    ndv_cap_ratio: float = 0.1,
    zorder_weight_ratio: float = 4.0,
    codec_gain_threshold: float = 1.5,
    small_file_bytes: int = 8 << 20,
    small_file_count_threshold: int = 8,
    binpack_target_bytes: int = 128 << 20,
) -> dict:
    """Recommend (and optionally apply) the highest-value maintenance
    action for an encoded table.

    Decision order:

    1. ``rewrite_sorted`` on the best column — the column with the
       largest ``n_runs / NDV`` ratio among clusterable columns
       (``NDV / n_rows <= ndv_cap_ratio``; high-cardinality columns
       don't cluster usefully), if that ratio ≥ ``run_ratio_threshold``.
    2. ``rewrite_zorder`` instead, when the SECOND-best column also
       clears the ratio threshold and its encoded-byte weight is within
       ``zorder_weight_ratio``× of the best — neither column dominates,
       so interleaving beats a single-column sort.
    3. ``rewrite_column_codec`` when no layout win exists but a
       column's stored bytes exceed the manifest-estimated RLE size
       (``n_runs × (8 + value width)``) by ``codec_gain_threshold`` and
       the column isn't already run-length coded — the legacy-pin case:
       the per-block selector chooses well at encode time, but a table
       encoded under an old pin (or whose distribution changed through
       appends) keeps paying for it until a maintenance pass re-decides.
       Applied IN PLACE (no ``out_dir``): only that column re-encodes.
    4. ``compact_table`` when no layout or codec win exists but the
       deleted-row fraction ≥ ``delete_ratio_threshold`` (rewrites also
       compact deletes, so this only fires when sorting isn't worth it).
    5. ``rewrite_binpack`` when the only problem is storage hygiene of
       the cheapest kind: ≥ ``small_file_count_threshold`` manifest
       files below ``small_file_bytes`` (incremental appends / resume
       passes leave small files; binpack rewrites ONLY those, verbatim,
       where compact_table would rewrite the whole live set).
    6. ``none`` otherwise.

    ``apply=True`` executes the recommendation (``out_dir`` required for
    the rewrite actions — they produce a new table directory, like
    Iceberg's rewrite into new data files).  Note ``analyze_table`` runs
    as part of the advisory and commits its stats to the table's
    metadata (a metadata-only snapshot).

    Returns ``{"action", "order_by", "delete_ratio", "columns":
    {col: {"n_runs", "ndv", "ratio", "bytes_out"}}, "applied": ...}``."""
    table = IceTable(table_dir)
    # Manifest-only ANALYZE first (ndv_columns=[]: zero data IO), then
    # NDV only where it stays decode-free: exact from dictionary buffers
    # when EVERY block of the column is dict-coded, estimated from the
    # zone range for integer columns (NDV <= max-min+1).  Columns with
    # neither (high-entropy strings, floats) are not clustering
    # candidates anyway — exact-counting them would decode every block,
    # breaking the advisor's no-decode contract.
    stats = analyze_table(spark, table_dir, ndv_columns=[])["columns"]
    from pyrle_spark.plans.compressed import distinct_values

    for c, s in stats.items():
        if s["codecs"] and all(k.startswith("dict") for k in s["codecs"]):
            vals = distinct_values(spark, table_dir, c)
            agg = vals.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(F.col("value").isNull(), 1).otherwise(0)
                ).alias("nulls"),
            ).first()
            s["ndv"] = int(agg["n"]) - int(agg["nulls"])
        elif s.get("ndv_est"):
            # merged per-block KMV sketch (analyze_table): an actual NDV
            # estimate, strictly better than the value-range cap — and
            # available for floats/timestamps where the range cap is not
            s["ndv"] = int(s["ndv_est"])
        elif (
            s["arrow_type"].startswith(("int", "uint"))
            and s["min"] is not None
        ):
            s["ndv"] = min(int(s["max"]) - int(s["min"]) + 1, s["n_rows"])
    total_rows = max((s["n_rows"] for s in stats.values()), default=0)
    n_deleted = len(_delete_positions(table_dir, None))
    delete_ratio = n_deleted / total_rows if total_rows else 0.0

    report: dict = {}
    candidates = []
    for c, s in stats.items():
        ndv = s.get("ndv")
        n_runs = s.get("n_runs")
        if not ndv or not n_runs or not s["n_rows"]:
            continue
        ratio = n_runs / ndv
        report[c] = {
            "n_runs": n_runs,
            "ndv": ndv,
            "ratio": round(ratio, 2),
            "bytes_out": s["bytes_out"],
        }
        if ndv / s["n_rows"] <= ndv_cap_ratio and ratio >= run_ratio_threshold:
            candidates.append((c, ratio, s["bytes_out"]))

    # rank by achievable saved runs weighted by the column's byte share:
    # a huge ratio on a tiny column moves less than a 3x on the big one
    candidates.sort(key=lambda t: (t[1] - 1.0) * max(t[2], 1), reverse=True)

    # codec tier: a fixed-width column stored ABOVE its manifest-derived
    # RLE size bound (n_runs × (run int64 + value width)) by the gain
    # threshold, and not already run-length coded — the per-snapshot
    # stats re-decide what the per-block encode-time sample could not
    codec_pick = None  # (column, est_gain, est_saved_bytes)
    for c, s in stats.items():
        n_runs = s.get("n_runs")
        width = _FIXED_WIDTH.get(s["arrow_type"]) or (
            8 if s["arrow_type"].startswith("timestamp") else None
        )
        if not n_runs or width is None or not s["bytes_out"]:
            continue
        if any(k.split("+")[0] == "rle" for k in s["codecs"]):
            continue
        rle_est = n_runs * (8 + width)
        gain = s["bytes_out"] / rle_est
        report.setdefault(c, {})["codec_gain"] = round(gain, 2)
        if gain >= codec_gain_threshold and (
            codec_pick is None or gain > codec_pick[1]
        ):
            codec_pick = (c, gain, s["bytes_out"] - rle_est)

    action, order_by = "none", []
    if candidates:
        best = candidates[0]
        if (
            len(candidates) > 1
            and candidates[1][2] * zorder_weight_ratio >= best[2]
        ):
            action, order_by = "rewrite_zorder", [best[0], candidates[1][0]]
        else:
            action, order_by = "rewrite_sorted", [best[0]]
    else:
        # codec vs compaction: both below the layout tier (a layout
        # rewrite re-selects codecs AND compacts deletes, so it is
        # strictly more powerful); between these two, estimated byte
        # savings decide — a rewrite that reclaims more wins
        total_bytes = sum(s["bytes_out"] for s in stats.values())
        codec_saved = codec_pick[2] if codec_pick is not None else 0
        delete_saved = (
            delete_ratio * total_bytes
            if delete_ratio >= delete_ratio_threshold
            else 0
        )
        if codec_pick is not None and codec_saved >= delete_saved:
            action, order_by = "rewrite_column_codec", [codec_pick[0]]
        elif delete_saved:
            action = "compact_table"

    manifest_files = table._manifest(table.current_snapshot_id())["files"]
    n_small = sum(1 for f in manifest_files if f["bytes"] < small_file_bytes)
    if action == "none" and n_small >= small_file_count_threshold:
        action = "rewrite_binpack"

    out = {
        "action": action,
        "order_by": order_by,
        "delete_ratio": round(delete_ratio, 4),
        "small_files": n_small,
        "total_files": len(manifest_files),
        "columns": report,
        "applied": None,
    }
    if not apply or action == "none":
        return out
    if action == "compact_table":
        out["applied"] = compact_table(spark, table_dir)
    elif action == "rewrite_binpack":
        from pyrle_spark.plans.binpack import rewrite_binpack

        out["applied"] = rewrite_binpack(
            spark,
            table_dir,
            target_file_bytes=binpack_target_bytes,
            min_file_bytes=small_file_bytes,
        )
    elif action == "rewrite_column_codec":
        out["applied"] = rewrite_column_codec(
            spark, table_dir, codec_pick[0], "rle+zstd"
        )
    else:
        if out_dir is None:
            raise ValueError(f"{action} requires out_dir for the rewrite")
        fn = rewrite_sorted if action == "rewrite_sorted" else rewrite_zorder
        if action == "rewrite_sorted":
            out["applied"] = fn(spark, table_dir, out_dir, order_by)
        else:
            # two clustering dimensions: the Hilbert walk gives strictly
            # tighter block rectangles than Morton's interleave (no
            # power-of-two teleports); >2 columns stay Morton (Hilbert
            # here is defined for 2-D)
            curve = "hilbert" if len(order_by) == 2 else "morton"
            out["applied"] = fn(
                spark, table_dir, out_dir, zorder_by=order_by, curve=curve
            )
    return out
