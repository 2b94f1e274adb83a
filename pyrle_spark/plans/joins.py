"""Value-key equi-join of two encoded tables with BOTH sides pruned
below decode.

A join between two 100 TB encoded tables should not start by decoding
either side.  ``join_tables_on`` runs the classic late-materialization
plan with the engine's own metadata:

1. each side's DISTINCT key set comes from
   :func:`plans.compressed.distinct_values` — dictionary buffers alone
   for dict-coded columns (the common case for join-able string keys),
   a one-column decode otherwise;
2. the key sets intersect (a join of two O(distinct) relations — rows
   that cannot find a partner are dead on BOTH sides);
3. the intersection drives :func:`plans.dpp.semi_join_scan` on each
   table: bounded intersections push down as IN-lists (zone ∩ bloom
   block pruning, only surviving blocks decode), oversized ones fall
   back to decode + ``left_semi`` — still filtered before the join;
4. the two filtered, column-pruned decodes hash-join on the key.

Inner join only — the pre-filter is exactly the inner join's matching
set.  ``_order`` is dropped from both sides (row positions are
table-local and meaningless across a value join); non-key column name
collisions on the right side get a ``_r`` suffix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyrle_spark.plans.compressed import distinct_values
from pyrle_spark.plans.dpp import semi_join_scan

__all__ = ["join_tables_on"]


def join_tables_on(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    on: str,
    left_columns: list | None = None,
    right_columns: list | None = None,
    max_keys: int = 4096,
) -> tuple[DataFrame, dict]:
    """Inner-join the encoded tables at ``left_dir`` and ``right_dir``
    on column ``on``.  Returns ``(rows, info)`` with per-side pushdown
    stats (see :func:`semi_join_scan`)."""
    k_left = distinct_values(spark, left_dir, on).withColumnRenamed(
        "value", on
    )
    k_right = distinct_values(spark, right_dir, on).withColumnRenamed(
        "value", on
    )
    # NULL never equi-joins; dropping it keeps the IN-list pushdown clean
    inter = (
        k_left.join(k_right, on, "inner")
        .filter(F.col(on).isNotNull())
        .distinct()
    )
    if left_columns is not None and on not in left_columns:
        left_columns = [on, *left_columns]
    if right_columns is not None and on not in right_columns:
        right_columns = [on, *right_columns]
    d_left, i_left = semi_join_scan(
        spark, left_dir, on, inter, columns=left_columns, max_keys=max_keys
    )
    d_right, i_right = semi_join_scan(
        spark, right_dir, on, inter, columns=right_columns, max_keys=max_keys
    )
    d_left = d_left.drop("_order")
    d_right = d_right.drop("_order")
    clash = (set(d_left.columns) & set(d_right.columns)) - {on}
    for c in clash:
        d_right = d_right.withColumnRenamed(c, f"{c}_r")
    out = d_left.join(d_right, on, "inner")
    return out, {"left": i_left, "right": i_right}
