"""Incremental encoded-table replication: CDC-tail the source table
through the V2 stream reader and re-encode each micro-batch into a
destination table through the V2 stream writer — the cross-region
mirror / derived-table shape.

Why this composes for free: the stream reader's partitions are
block-disjoint file groups and each task yields blocks in ascending
``_order``, which is exactly the clustered + sorted-within-partition
contract the encode writer verifies.  So ``order_col="_order"`` mirrors
the source's block layout bit-identically — block ids are a property of
the data (``_order // block_rows``), not of which table holds it.

Delivery semantics end-to-end: the reader is at-least-once per block
(a resume/compaction re-adds files); the writer's (sink id, batch id)
snapshot properties make metadata exactly-once per micro-batch; a block
delivered twice across batches lands as two manifest rows that the
read-side per-(block_id, column) dedup resolves — the mirror DECODES
identically to the source at every point.

At 10^12 docs this is O(new blocks) per trigger: planning reads the
snapshot diff (O(metadata)), each task re-encodes only added files, and
nothing global is ever materialized.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def mirror_encoded(
    spark: SparkSession,
    src_table: str,
    dst_table: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Start (and return) the mirror query.  With ``available_now`` the
    query drains the source's current snapshots and stops — rerunning
    with the same checkpoint processes only the delta (incremental,
    exactly-once metadata)."""
    from pyrle_spark.sources.icetable import IceTable

    props = IceTable(src_table).properties()
    reader = spark.readStream.format("pyrle").load(src_table)
    writer = (
        reader.writeStream.format("pyrle")
        .option("path", dst_table)
        .option("order_col", "_order")
        .option("block_rows", str(props["block_rows"]))
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
