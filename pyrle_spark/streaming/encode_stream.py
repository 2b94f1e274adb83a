"""Streaming encode: new webtext files → encoded blocks, continuously.

The reference is batch/eager only (SURVEY §2.11); this is the engine's
extension for continuously-arriving crawl data.  ``foreachBatch`` reuses
the batch encoder per micro-batch, so one code path serves both modes:

- exactly-once at the block level: Spark's streaming checkpoint dedupes
  *file* replays; the encode table's complete-block resume + read-side
  supersede (plans/encode_job.py) dedupes *block* replays, so a crashed
  micro-batch re-encodes idempotently;
- the snapshot lineage records the epoch id per pass.

``trigger(availableNow=True)`` drains everything currently in the
source and stops — the batch-ish mode used in tests; drop it for a
long-running continuous job.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pyrle_spark.plans.encode_job import EncodeConfig, encode_table

__all__ = ["encode_stream"]


def encode_stream(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    config: EncodeConfig,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the streaming encode; returns the StreamingQuery."""
    schema = spark.read.parquet(source_dir).schema

    def process_batch(batch_df, epoch_id: int):
        if batch_df.isEmpty():
            return
        cfg = EncodeConfig(
            columns=config.columns,
            order_col=config.order_col,
            block_rows=config.block_rows,
            block_aligned=False,  # micro-batches are arbitrary file sets
            zstd_threshold=config.zstd_threshold,
            properties={**config.properties, "stream_epoch": epoch_id},
        )
        encode_table(spark, batch_df, table_dir, cfg)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
