"""ANALYZE TABLE — decode-free column statistics, persisted to metadata.

A query planner (and a human) wants per-column ``n_rows / NDV / min /
max / null presence / size / codec mix`` without scanning data.  This
engine already stores the raw material in two compressed-domain places:

- the **blocks manifest** carries per-block row counts, byte sizes, run
  counts, codec names and zone bounds → one O(#blocks) aggregation
  yields rows, sizes, codec mix, and global min/max (fold of the
  per-block zones);
- **dictionary buffers** are per-block distinct sets →
  :func:`pyrle_spark.plans.compressed.distinct_values` yields EXACT NDV
  with the code streams never decoded (exact decode fallback for
  non-dict blocks), delete-aware.

``analyze_table`` runs both and commits the result as a metadata-only
snapshot (``properties["stats"]``), stamped with the analyzed snapshot
id — the Iceberg ``ANALYZE``/Puffin-statistics pattern: stats travel
with the table, readers know exactly how stale they are, and time
travel to the parent still sees the old stats.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pyrle_spark.codecs.selector import kmv_merge_estimate, kmv_union
from pyrle_spark.plans.compressed import distinct_values
from pyrle_spark.plans.encode_job import (
    _delete_positions,
    _widest_type,
    dedup_blocks,
)
from pyrle_spark.sources.icetable import IceTable

__all__ = ["analyze_table", "table_stats_df"]

_NUMERIC_PREFIXES = ("int", "uint", "float", "double", "timestamp", "date")

_EPOCH = __import__("datetime").datetime(1970, 1, 1)


def _us_str(us) -> str | None:
    """Epoch-micros → the same naive-UTC string str(datetime) produced
    when the fold collected timestamp objects (value contract kept)."""
    if us is None:
        return None
    return str(_EPOCH + __import__("datetime").timedelta(microseconds=int(us)))




def _fold_blocks(enc) -> list:
    """One mergeable aggregation over block-manifest rows, grouped by
    PHYSICAL column name.  Every quantity here merges across folds
    (sums, min/max, set unions, sketch lists) — the property the
    incremental ANALYZE path relies on."""
    return (
        enc.groupBy("column")
        .agg(
            F.sort_array(F.collect_set("arrow_type")).alias("arrow_types"),
            F.count(F.lit(1)).alias("n_blocks"),
            F.min("block_id").alias("min_block_id"),
            F.max("block_id").alias("max_block_id"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("bytes_out").alias("bytes_out"),
            F.sum("n_runs").alias("n_runs"),
            F.sort_array(F.collect_set("codec")).alias("codecs"),
            F.min(F.when(F.col("zmin").isNotNull(), F.col("zmin"))).alias(
                "zmin_str"
            ),
            F.max(F.when(F.col("zmax").isNotNull(), F.col("zmax"))).alias(
                "zmax_str"
            ),
            # numeric zones must fold numerically ("99" > "100" as strings);
            # int zones fold as LONG (doubles round above 2^53), temporal
            # zones as timestamps (their isoformat strings neither cast to
            # double nor compare lexicographically at mixed precision)
            F.min(F.expr("try_cast(zmin AS double)")).alias("zmin_num"),
            F.max(F.expr("try_cast(zmax AS double)")).alias("zmax_num"),
            F.min(F.expr("try_cast(zmin AS long)")).alias("zmin_long"),
            F.max(F.expr("try_cast(zmax AS long)")).alias("zmax_long"),
            # fold as epoch micros (long), NOT timestamp objects: collect()
            # would convert every group's timestamp to a Python datetime —
            # and a NUMERIC column whose zone string happens to try_cast
            # to a far-future timestamp (e.g. zmin "22647...") overflows
            # datetime.year and kills the whole ANALYZE.  The long fold is
            # value-identical (session tz pinned UTC) and range-unbounded.
            F.min(
                F.expr(
                    "unix_micros(cast(try_cast(zmin AS timestamp_ntz)"
                    " AS timestamp))"
                )
            ).alias("zmin_ts_us"),
            F.max(
                F.expr(
                    "unix_micros(cast(try_cast(zmax AS timestamp_ntz)"
                    " AS timestamp))"
                )
            ).alias("zmax_ts_us"),
            F.sum(F.when(F.col("zmin").isNull(), 1).otherwise(0)).alias(
                "blocks_without_zone"
            ),
            # per-block KMV distinct sketches (selector stats, fixed-width
            # columns): merged driver-side into an NDV estimate — ~0.5 KB
            # per block-column, the same O(#blocks) metadata budget as the
            # manifest walk.  At 10^12 docs a two-level tree agg would
            # pre-merge per partition; the estimator itself is mergeable.
            F.collect_list(
                F.get_json_object(F.col("meta"), "$.stats.kmv")
            ).alias("kmv_sketches"),
            # rows covered by a sketch: blocks under the encode-side row
            # gate (_KMV_MIN_ROWS) carry none, so the NDV estimate is
            # emitted with a coverage fraction rather than gated on
            # every-block coverage (one small tail block must not
            # permanently disable the column's estimate)
            F.sum(
                F.when(
                    F.get_json_object(
                        F.col("meta"), "$.stats.kmv"
                    ).isNotNull(),
                    F.col("n_rows"),
                ).otherwise(F.lit(0))
            ).alias("kmv_rows"),
        )
        .collect()
    )


def _entry_from_row(lc: str, r) -> dict:
    """Folded row → per-column stats entry (bounds reported in the
    widest type's own domain).  An all-null block has no zone; its rows
    contribute no values, so the folded bounds over the zoned blocks
    are still exact — bounds_complete=False only flags pre-zone-era
    blocks honestly."""
    at = _widest_type(lc, set(r["arrow_types"]))
    if at.startswith(("int", "uint")):
        vmin, vmax = r["zmin_long"], r["zmax_long"]
    elif at.startswith(("timestamp", "date")):
        vmin = _us_str(r["zmin_ts_us"])
        vmax = _us_str(r["zmax_ts_us"])
    elif at.startswith(_NUMERIC_PREFIXES):
        vmin, vmax = r["zmin_num"], r["zmax_num"]
    else:
        vmin, vmax = r["zmin_str"], r["zmax_str"]
    entry = {
        "arrow_type": at,
        "arrow_types": list(r["arrow_types"]),
        "n_blocks": r["n_blocks"],
        "min_block_id": int(r["min_block_id"]),
        "max_block_id": int(r["max_block_id"]),
        "n_rows": int(r["n_rows"]),
        "bytes_in": int(r["bytes_in"]),
        "bytes_out": int(r["bytes_out"]),
        "n_runs": int(r["n_runs"]) if r["n_runs"] is not None else None,
        "codecs": list(r["codecs"]),
        "min": vmin,
        "max": vmax,
        "bounds_complete": int(r["blocks_without_zone"]) == 0,
    }
    sketches = [s for s in (r["kmv_sketches"] or []) if s]
    if sketches:
        # the union under-counts values unique to unsketched blocks
        # (those below the encode-side row gate), so the estimate is
        # emitted alongside its rows-covered fraction — the consumer
        # decides how much to trust it, and a single tiny tail block no
        # longer disables the estimate for the whole column
        est = kmv_merge_estimate(sketches)
        if est is not None:
            entry["ndv_est"] = est
            entry["kmv_union"] = kmv_union(sketches)
            entry["ndv_sketched_frac"] = round(
                int(r["kmv_rows"] or 0) / max(int(r["n_rows"]), 1), 6
            )
    return entry


def _merge_bounds(at: str, a, b, take_min: bool):
    if a is None:
        return b
    if b is None:
        return a
    # within one domain (numbers, padded temporal strings, raw strings)
    # plain comparison is the fold — same rule the Spark-side agg used
    return min(a, b) if take_min else max(a, b)


def _merge_entry(lc: str, prior: dict, new: dict) -> dict:
    at = _widest_type(
        lc, set(prior.get("arrow_types", [prior["arrow_type"]]))
        | set(new["arrow_types"])
    )
    merged = {
        "arrow_type": at,
        "arrow_types": sorted(
            set(prior.get("arrow_types", [prior["arrow_type"]]))
            | set(new["arrow_types"])
        ),
        "n_blocks": prior["n_blocks"] + new["n_blocks"],
        "min_block_id": min(prior["min_block_id"], new["min_block_id"]),
        "max_block_id": max(prior["max_block_id"], new["max_block_id"]),
        "n_rows": prior["n_rows"] + new["n_rows"],
        "bytes_in": prior["bytes_in"] + new["bytes_in"],
        "bytes_out": prior["bytes_out"] + new["bytes_out"],
        "n_runs": (
            prior["n_runs"] + new["n_runs"]
            if prior["n_runs"] is not None and new["n_runs"] is not None
            else None
        ),
        "codecs": sorted(set(prior["codecs"]) | set(new["codecs"])),
        "min": _merge_bounds(at, prior["min"], new["min"], True),
        "max": _merge_bounds(at, prior["max"], new["max"], False),
        "bounds_complete": prior["bounds_complete"] and new["bounds_complete"],
    }
    pu, nu = prior.get("kmv_union"), new.get("kmv_union")
    if pu or nu:
        # union whatever coverage exists (dropping the union whenever one
        # side lacked it would permanently lose the estimate on the next
        # incremental pass); the rows-weighted coverage fraction carries
        # the honesty the old all-or-nothing gate encoded
        u = kmv_union([s for s in (pu, nu) if s])
        merged["kmv_union"] = u
        est = kmv_merge_estimate([u])
        if est is not None:
            merged["ndv_est"] = est
        pf = prior.get("ndv_sketched_frac", 1.0 if pu else 0.0)
        nf = new.get("ndv_sketched_frac", 1.0 if nu else 0.0)
        tot = prior["n_rows"] + new["n_rows"]
        merged["ndv_sketched_frac"] = round(
            (pf * prior["n_rows"] + nf * new["n_rows"]) / max(tot, 1), 6
        )
    return merged


def _try_incremental(spark, table, props, snap, cols):
    """The mergeable half of incremental ANALYZE: returns the merged
    payload (without exact-NDV refresh) or None when a full pass is
    required.  See :func:`analyze_table` for the soundness rules."""
    prior = props.get("stats")
    if not prior or "columns" not in prior:
        return None
    pcols = prior["columns"]
    if any("max_block_id" not in e for e in pcols.values()):
        return None  # stats from before the incremental format
    prev_snap = prior.get("analyzed_snapshot")
    known = {s["id"] for s in table.snapshots()}
    if prev_snap not in known:
        return None  # expired from the log: can't diff manifests
    old_files = {f["path"] for f in table._manifest(prev_snap)["files"]}
    cur_files = {f["path"] for f in table._manifest(snap)["files"]}
    if old_files - cur_files:
        return None  # files removed: compaction/rewrite/overwrite
    added = sorted(cur_files - old_files)
    merged_cols = {c: dict(e) for c, e in pcols.items()}
    if added:
        enc = dedup_blocks(
            spark.read.parquet(*added).filter(F.col("column").isNotNull())
        )
        logical_of = {
            p: c for c, p in props.get("column_aliases", {}).items()
        }
        for r in _fold_blocks(enc):
            lc = logical_of.get(r["column"], r["column"])
            if lc not in cols:
                continue
            entry = _entry_from_row(lc, r)
            if lc not in merged_cols:
                merged_cols[lc] = entry  # widen pass: brand-new column
                continue
            if entry["min_block_id"] <= merged_cols[lc]["max_block_id"]:
                # an added file re-encodes an existing block id (resume
                # supersede): the prior sums can't be subtracted — full
                return None
            merged_cols[lc] = _merge_entry(lc, merged_cols[lc], entry)
    for e in merged_cols.values():
        # exact NDV does not merge; stale values must not survive
        e.pop("ndv", None)
        e.pop("has_nulls", None)
    return {
        "analyzed_snapshot": snap,
        "analyzed_at_ms": int(time.time() * 1000),
        "deleted_rows": len(_delete_positions(table.path, None)),
        "columns": merged_cols,
        "mode": "incremental",
    }


def analyze_table(
    spark: SparkSession,
    table_dir: str,
    ndv_columns: list[str] | None = None,
    incremental: bool = False,
) -> dict:
    """Compute and persist column statistics at the current snapshot.

    ``ndv_columns``: columns to compute exact NDV for (default: all).
    Pass ``[]`` to skip NDV entirely (manifest-only, zero data IO).

    ``incremental=True``: merge previously-committed stats with a fold
    over ONLY the data files added since they were computed — every
    statistic here is mergeable (sums, zone min/max folds, codec-set
    unions, KMV sketch unions), so an append-only history refreshes at
    O(new files) instead of O(table).  Falls back to the full pass
    (silently — correctness first) whenever merging would be unsound:
    no prior stats, files REMOVED since (compaction / rewrite /
    overwrite), the prior snapshot expired from the log, or an added
    file re-encodes an existing block id (resume supersede — the prior
    aggregates can't be subtracted).  Exact ``ndv`` is never merged:
    requested ``ndv_columns`` recompute, others drop to the sketch
    estimate.

    Returns the stats dict (also committed to table properties)."""
    table = IceTable(table_dir)
    snap = table.current_snapshot_id()
    props = table.properties()
    cols = list(props["columns"])
    if ndv_columns is None:
        ndv_columns = cols
    unknown = [c for c in ndv_columns if c not in cols]
    if unknown:
        raise KeyError(f"ndv columns {unknown} not in table columns {cols}")
    if incremental:
        merged = _try_incremental(spark, table, props, snap, cols)
        if merged is not None:
            for c in ndv_columns:
                if c not in merged["columns"]:
                    continue
                vals = distinct_values(spark, table_dir, c)
                agg = vals.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(
                        F.when(F.col("value").isNull(), 1).otherwise(0)
                    ).alias("nulls"),
                ).first()
                merged["columns"][c]["ndv"] = int(agg["n"]) - int(agg["nulls"])
                merged["columns"][c]["has_nulls"] = bool(agg["nulls"])
            table.commit_metadata({**table.properties(), "stats": merged})
            return merged
    enc = dedup_blocks(table.read_table(spark))
    rows = _fold_blocks(enc)
    # block rows carry PHYSICAL column names; report stats under the
    # LOGICAL names the snapshot advertises (rename_column aliases)
    logical_of = {
        p: c for c, p in props.get("column_aliases", {}).items()
    }
    stats: dict = {}
    for r in rows:
        lc = logical_of.get(r["column"], r["column"])
        if lc not in cols:
            continue  # stale blocks of dropped/renamed-away columns
        stats[lc] = _entry_from_row(lc, r)
    for c in ndv_columns:
        if c not in stats:
            continue  # no blocks at all (empty table / pending widen)
        vals = distinct_values(spark, table_dir, c)
        agg = vals.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("nulls"),
        ).first()
        stats[c]["ndv"] = int(agg["n"]) - int(agg["nulls"])  # NDV of non-nulls
        stats[c]["has_nulls"] = bool(agg["nulls"])
    payload = {
        "analyzed_snapshot": snap,
        "analyzed_at_ms": int(time.time() * 1000),
        # n_rows above are MANIFEST rows (pre-delete); ndv IS delete-aware.
        # deleted_rows lets a reader reconcile the two.
        "deleted_rows": len(_delete_positions(table_dir, None)),
        "columns": stats,
    }
    table.commit_metadata({**table.properties(), "stats": payload})
    return payload


def table_stats_df(spark: SparkSession, table_dir: str) -> DataFrame:
    """The persisted stats as a relation (one row per column)."""
    props = IceTable(table_dir).properties()
    if "stats" not in props:
        raise FileNotFoundError(
            f"no stats committed for {table_dir}; run analyze_table first"
        )
    payload = props["stats"]
    rows = [
        {
            "column": c,
            "n_rows": s["n_rows"],
            "ndv": s.get("ndv"),
            "vmin": None if s["min"] is None else str(s["min"]),
            "vmax": None if s["max"] is None else str(s["max"]),
            "bytes_out": s["bytes_out"],
            "n_blocks": s["n_blocks"],
            "codecs": ",".join(s["codecs"]),
        }
        for c, s in sorted(payload["columns"].items())
    ]
    return spark.createDataFrame(
        rows,
        "column string, n_rows long, ndv long, vmin string, vmax string, "
        "bytes_out long, n_blocks long, codecs string",
    )
