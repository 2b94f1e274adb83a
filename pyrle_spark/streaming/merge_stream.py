"""Streaming CDC apply: a change stream upserts into an encoded table.

The batch verb is :func:`pyrle_spark.plans.encode_job.merge_into`; a
crawl pipeline sees changes ARRIVE — re-crawled pages (upserts) and
takedowns (deletes) — and must fold them into the table continuously.
``foreachBatch`` + the batch MERGE is the standard Structured-Streaming
shape for this (stream-to-table upsert, e.g. Delta/Iceberg CDC apply):

- **per-batch collapse**: a micro-batch may carry several changes for
  one key; the row with the highest ``version_col`` wins, ties (and the
  no-version case) resolved by a deterministic content order (bounded
  per-key window — no global window), so each batch presents MERGE with
  unique keys, as its cardinality contract requires, and a crash-replay
  collapses to the SAME image;
- **delete markers**: rows with ``delete_col = true`` become
  ``when_matched="delete"`` merges; the rest upsert;
- **replay convergence**: if a batch crashes after the merge but before
  the streaming checkpoint commits, the replay re-merges the same
  changes — updates rewrite identical images, inserts match their own
  earlier copy and update it, deletes no-op.  State converges (the
  snapshot log grows by one — history is the audit trail, not the
  state).

Ordering caveat, stated rather than hidden: version collapse is
per-batch.  A key's changes split across two micro-batches apply in
batch order, which is file-arrival order — the same guarantee every
file-source CDC consumer gives.  An out-of-order-tolerant variant would
persist last-applied version per key (applyInPandasWithState) in front
of the merge.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession
from pyspark.sql import Window as W

from pyrle_spark.plans.encode_job import merge_into

__all__ = ["merge_stream"]


def merge_stream(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    on: str,
    checkpoint_dir: str,
    version_col: str | None = None,
    delete_col: str | None = None,
    available_now: bool = True,
):
    """Start the CDC-apply stream; returns the StreamingQuery.

    ``source_dir``: parquet change files with the table's columns plus
    optionally ``version_col`` (per-key change ordering within a batch)
    and ``delete_col`` (boolean delete marker)."""
    schema = spark.read.parquet(source_dir).schema

    def process_batch(batch_df, epoch_id: int):
        if batch_df.isEmpty():
            return
        changes = batch_df
        # Per-batch collapse ALWAYS runs: a micro-batch can carry several
        # changes for one key even without a version column (availableNow
        # coalesces many files into one batch), and merge_into's
        # cardinality check would fail the stream.  Without version_col
        # the winner is deterministic-by-content (ordered over every
        # column), so a crash-replay re-collapses to the SAME image —
        # the replay-convergence contract needs determinism, not any
        # particular winner.  Ties on version_col fall back to the same
        # content order for the same reason.
        order = [F.desc(version_col)] if version_col is not None else []
        order += [
            F.desc(c) for c in changes.columns if c not in (on, version_col)
        ]
        w = W.partitionBy(on).orderBy(*order)
        changes = (
            changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if delete_col is not None:
            dels = changes.filter(F.col(delete_col)).select(on)
            ups = changes.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
            if version_col is not None:
                ups = ups.drop(version_col)
            if not dels.isEmpty():
                merge_into(
                    spark,
                    table_dir,
                    dels,
                    on=on,
                    when_matched="delete",
                    when_not_matched=None,
                )
        else:
            ups = changes.drop(version_col) if version_col else changes
        if not ups.isEmpty():
            merge_into(spark, table_dir, ups, on=on)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
