"""Streaming decode: continuously tail an encoded table's data files
and deliver DECODED rows per micro-batch — the consumer half of the CDC
story (``encode_stream`` is the producer half; ``scan_incremental`` is
the batch form of this).

Semantics: Spark's file-stream checkpoint hands each data file to
exactly one micro-batch, so every batch decodes the blocks ADDED by
newly committed snapshots and nothing else — a training job keeps
consuming fresh crawl data with no manifest polling of its own.
File-granularity CDC caveats (same as Iceberg's incremental scan):
a re-encoded block (resume completing a partial pass) is re-delivered,
so exactly-once consumers key on ``block_id``/``_order`` and upsert;
MoR deletes are not part of the append stream — diff them with
:func:`pyrle_spark.plans.encode_job.incremental_deletes`.

Scale shape: per batch it is the same streaming ``mapInArrow`` decode
as the batch reader over only the new files; state is Spark's file
log, O(files seen), no driver row state.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pyrle_spark.plans.encode_job import (
    ENCODED_SPARK_SCHEMA,
    _make_decode_fn,
    _spark_type_of,
    dedup_blocks,
)
from pyrle_spark.sources.icetable import IceTable

__all__ = ["decode_stream"]


def decode_stream(
    spark: SparkSession,
    table_dir: str,
    checkpoint_dir: str,
    process,
    columns: list | None = None,
    available_now: bool = True,
):
    """Start the streaming decode; ``process(decoded_df, epoch_id)`` is
    invoked per micro-batch with the decoded rows (``_order`` + columns).
    Returns the StreamingQuery.  ``trigger(availableNow=True)`` drains
    everything currently committed and stops (the batch-ish test mode);
    drop it for a long-running tail."""
    props = IceTable(table_dir).properties()
    block_rows = int(props["block_rows"])
    cols = sorted(columns or props["columns"])

    def _batch(batch_df, epoch_id: int):
        if batch_df.isEmpty():
            return
        enc = dedup_blocks(batch_df.filter(F.col("column").isin(cols)))
        types = dict(enc.select("column", "arrow_type").distinct().collect())
        present = [c for c in cols if c in types]
        if not present:
            return
        # only blocks complete for the present columns decode this batch;
        # a widen pass delivers its column as a later batch of its own
        complete = (
            enc.groupBy("block_id")
            .agg(F.countDistinct("column").alias("_nc"))
            .filter(F.col("_nc") == len(present))
            .select("block_id")
        )
        ready = (
            enc.join(F.broadcast(complete), "block_id", "left_semi")
            .repartition("block_id")
            .sortWithinPartitions("block_id", "column")
        )
        out_schema = ", ".join(
            ["_order long"] + [f"{c} {_spark_type_of(types[c])}" for c in present]
        )
        process(ready.mapInArrow(_make_decode_fn(block_rows), out_schema), epoch_id)

    stream = (
        spark.readStream.schema(ENCODED_SPARK_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(f"{table_dir}/data/")
    )
    writer = stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
