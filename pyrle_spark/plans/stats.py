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

from pyrle_spark.codecs.selector import kmv_merge_estimate
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


def analyze_table(
    spark: SparkSession,
    table_dir: str,
    ndv_columns: list[str] | None = None,
) -> dict:
    """Compute and persist column statistics at the current snapshot.

    ``ndv_columns``: columns to compute exact NDV for (default: all).
    Pass ``[]`` to skip NDV entirely (manifest-only, zero data IO).

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
    enc = dedup_blocks(table.read_table(spark))
    # one manifest aggregation for every per-block quantity.  Group by
    # column ONLY: a type-widened column legally carries mixed-width
    # blocks (int32 before the widening, int64 after) and must fold to
    # one stats row — the reported type is the widest of the family,
    # exactly what decode_table serves.
    rows = (
        enc.groupBy("column")
        .agg(
            F.sort_array(F.collect_set("arrow_type")).alias("arrow_types"),
            F.count(F.lit(1)).alias("n_blocks"),
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
        )
        .collect()
    )
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
        at = _widest_type(lc, set(r["arrow_types"]))
        # fold in the widest type's own domain: long for ints, timestamp
        # for temporal, double for floats, raw string otherwise.  An
        # all-null block has no zone; its rows contribute no values, so
        # the folded bounds over the zoned blocks are still exact —
        # bounds_complete=False only flags pre-zone-era blocks honestly.
        if at.startswith(("int", "uint")):
            vmin, vmax = r["zmin_long"], r["zmax_long"]
        elif at.startswith(("timestamp", "date")):
            vmin = _us_str(r["zmin_ts_us"])
            vmax = _us_str(r["zmax_ts_us"])
        elif at.startswith(_NUMERIC_PREFIXES):
            vmin, vmax = r["zmin_num"], r["zmax_num"]
        else:
            vmin, vmax = r["zmin_str"], r["zmax_str"]
        stats[lc] = {
            "arrow_type": at,
            "n_blocks": r["n_blocks"],
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
        if len(sketches) == r["n_blocks"]:
            # estimate only when EVERY block carries a sketch — a partial
            # union under-counts the unsketched blocks' values
            est = kmv_merge_estimate(sketches)
            if est is not None:
                stats[lc]["ndv_est"] = est
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
