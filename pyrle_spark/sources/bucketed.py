"""Bucketed tables: shuffle-free (co-located) joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides
on the key.  Writing each side ``bucketBy(N, key)`` once amortizes that
shuffle into the write: Spark records the hash-bucket layout in the
catalog, and a later equi-join of two tables bucketed by the same key
into the same bucket count needs NO Exchange on either side — the scan
partitions are already co-located (sort-merge join with at most a
per-partition sort).  The same layout also serves repeated
``groupBy(key)`` aggregations shuffle-free.

This is the storage-layout counterpart of the encode pipeline's
block-aligned scan (plans/encode_job.py): pay the partitioning once at
write time, reuse it across every downstream stage.  The reference has
no equivalent (single-process, everything in memory); this module is
engine infrastructure for the join-heavy dedup/similarity family —
e.g. joining per-doc MinHash signatures against candidate pairs round
after round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed", "co_located_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed on ``bucket_col``.

    ``sort=True`` additionally sorts within buckets, letting a
    sort-merge join skip its sort stage too (scan → merge, nothing
    else).  Both join sides must use the same column semantics and the
    same ``n_buckets`` for the co-location to apply."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (the bucket layout rides along from the
    catalog — a plain ``spark.table``, named for symmetry)."""
    return spark.table(table)


def co_located_join(
    spark: SparkSession, left: str, right: str, on: str | list, how: str = "inner"
) -> DataFrame:
    """Equi-join two same-bucketed catalog tables.

    The plan for this join contains no Exchange on either side (verify
    with ``.explain``/tests): each task merges bucket i of the left with
    bucket i of the right.  Falls back to a normal shuffle join
    transparently if the layouts don't line up — correctness never
    depends on the layout, only the shuffle count does."""
    return spark.table(left).join(spark.table(right), on=on, how=how)
