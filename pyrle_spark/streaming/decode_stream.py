"""Streaming decode: continuously tail an encoded table and deliver
DECODED rows per micro-batch — the consumer half of the CDC story
(``encode_stream`` is the producer half; ``scan_incremental`` is the
batch form of this).

Semantics: the file-stream checkpoint hands each data file to exactly
one micro-batch, and the batch acts as a TRIGGER — it names the touched
``block_id``s, and the delivery reads those blocks from the TABLE at
its current committed snapshot.  That manifest gating is load-bearing:

- a block whose column files STRADDLE two micro-batches (a widen pass
  racing the listing) is delivered whole when its last file arrives —
  the earlier files being checkpoint-consumed doesn't matter, because
  delivery reads the table, not the batch;
- files never referenced by a committed snapshot (aborted writers,
  rolled-back commits) trigger nothing deliverable — the table read
  simply doesn't contain them;
- rename aliases and type widening resolve exactly as in the batch
  reader (physical-name filter, widest-promoted-type cast).

At-least-once by design, like Iceberg's incremental scan: a re-encoded
block (resume completing a partial pass, a widen adding a column, a
compaction rewriting the table) is RE-delivered with its current
content, so exactly-once consumers key on ``block_id``/``_order`` and
upsert.  MoR deletes are not part of the append stream — diff them with
:func:`pyrle_spark.plans.encode_job.incremental_deletes`.  A concurrent
``expire_snapshots`` may delete files the stream has listed but not yet
read; ``ignoreMissingFiles`` keeps the tail alive through that.

Scale shape: per batch it is the same streaming ``mapInArrow`` decode
as the batch reader over only the touched blocks; state is Spark's file
log, O(files seen), no driver row state.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pyrle_spark.plans.encode_job import (
    ENCODED_SPARK_SCHEMA,
    _make_decode_fn,
    _spark_type_of,
    _widest_type,
    dedup_blocks,
    physical_column,
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
    table = IceTable(table_dir)
    block_rows = int(table.properties()["block_rows"])

    def _batch(batch_df, epoch_id: int):
        if batch_df.isEmpty():
            return
        # per-batch props: renames/widenings may land mid-stream
        props = table.properties()
        cols = sorted(columns or props["columns"])
        phys_of = {c: physical_column(table, c) for c in cols}
        rename = {p: c for c, p in phys_of.items() if p != c}
        touched = batch_df.select("block_id").distinct()
        # manifest-gated read of the touched blocks' CURRENT rows
        enc = dedup_blocks(
            table.read_table(spark)
            .filter(F.col("column").isin(sorted(phys_of.values())))
            .join(F.broadcast(touched), "block_id", "left_semi")
        )
        type_rows = enc.select("column", "arrow_type").distinct().collect()
        by_col: dict = {}
        for r in type_rows:
            by_col.setdefault(
                rename.get(r["column"], r["column"]), set()
            ).add(r["arrow_type"])
        types = {c: _widest_type(c, ts) for c, ts in by_col.items()}
        present = [c for c in cols if c in types]
        if not present:
            return
        # only blocks complete for every present column decode now; an
        # in-flight widen's block re-triggers when its files commit
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
        process(
            ready.mapInArrow(
                _make_decode_fn(block_rows, types, rename), out_schema
            ),
            epoch_id,
        )

    stream = (
        spark.readStream.schema(ENCODED_SPARK_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("ignoreMissingFiles", "true")
        .parquet(f"{table_dir}/data/")
    )
    writer = stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
