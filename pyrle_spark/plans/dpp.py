"""Dynamic semi-join pushdown over the encoded table — the block-level
analog of Spark's dynamic partition pruning (DPP).

``semi_join_scan`` answers ``fact WHERE fact.col IN (SELECT key FROM
dim_subquery)`` without ever decoding blocks the dim keys cannot touch:

1. the dim side's DISTINCT keys are counted with a ``limit(max_keys+1)``
   guard (never an unbounded collect — the same broadcast-threshold idea
   Spark's DPP uses for its reused-subquery filter);
2. if bounded, the keys collect to the driver and push down through the
   existing conjunctive scan machinery (:func:`plans.encode_job.
   scan_encoded` IN-list path → zone range [min,max] ∩ per-block bloom
   disjunction), so only blocks that MAY contain a key decode;
3. if the key set exceeds the threshold, the scan falls back to a
   decode of the needed columns plus a ``left_semi`` join against the
   distinct keys — the plan Spark would pick anyway when the dim side
   is too big to broadcast as a filter.

Either way the result is EXACTLY the semi join; the pushdown is a pure
superset optimization (the residual IN filter re-checks decoded rows).

At 10^12 documents the win is the usual data-skipping one: a dim
subquery selecting a handful of hosts/langs prunes the manifest
(O(#blocks), driver-free) and the job reads only surviving blocks.

This generalizes the reference's content-dispatch idea (pyrle picks a
kernel from the data, rle.py:740-743) to picking a JOIN STRATEGY from
the runtime key-set size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyrle_spark.plans.encode_job import (
    decode_table,
    prune_blocks,
    prune_blocks_in,
    scan_encoded,
)
from pyrle_spark.sources.icetable import IceTable

__all__ = ["semi_join_scan"]


def semi_join_scan(
    spark: SparkSession,
    table_dir: str,
    column: str,
    keys_df: DataFrame,
    columns: list | None = None,
    snapshot_id: str | None = None,
    max_keys: int = 256,
) -> tuple[DataFrame, dict]:
    """Semi-join the encoded table at ``table_dir`` against the first
    column of ``keys_df``, pushing the key set below decode when it is
    small enough.  Returns ``(rows, info)`` where ``info`` records the
    strategy taken and, on the pushdown path, how hard pruning bit:
    ``{"pushed": bool, "n_keys": int, "kept_blocks": int,
    "total_blocks": int}`` (block counts are -1 on the fallback path —
    nothing was pruned there by construction).
    """
    key_col = keys_df.columns[0]
    keys = keys_df.select(key_col).distinct()
    # bounded probe: pulls at most max_keys+1 rows, never the full dim
    sample = [r[0] for r in keys.limit(max_keys + 1).collect()]
    if len(sample) <= max_keys:
        vals = sorted(v for v in sample if v is not None)
        if not vals:
            # empty/all-NULL dim: the semi join is empty — short-circuit
            # with a schema-stable empty result instead of decoding
            # every block just to filter it away
            empty = decode_table(
                spark, table_dir, columns=columns, snapshot_id=snapshot_id
            ).filter(F.lit(False))
            return empty, {
                "pushed": True,
                "n_keys": 0,
                "kept_blocks": 0,
                "total_blocks": -1,
            }
        df = scan_encoded(
            spark,
            table_dir,
            columns=columns,
            predicates=[(column, vals)],
            snapshot_id=snapshot_id,
        )
        enc = IceTable(table_dir).read_table(spark, snapshot_id)
        col_blocks = enc.filter(F.col("column") == column)
        total = col_blocks.select("block_id").distinct().count()
        kept = (
            prune_blocks(enc, column, min(vals), max(vals))
            .join(prune_blocks_in(enc, column, vals), "block_id", "inner")
            .count()
            if vals
            else 0
        )
        info = {
            "pushed": True,
            "n_keys": len(vals),
            "kept_blocks": int(kept),
            "total_blocks": int(total),
        }
        return df, info
    # key set too large to push as a literal filter: decode the needed
    # columns once and semi-join — distributed, no driver materialization
    dec = decode_table(spark, table_dir, columns=columns, snapshot_id=snapshot_id)
    joined = dec.join(
        keys.withColumnRenamed(key_col, column), column, "left_semi"
    )
    info = {"pushed": False, "n_keys": -1, "kept_blocks": -1, "total_blocks": -1}
    return joined, info
