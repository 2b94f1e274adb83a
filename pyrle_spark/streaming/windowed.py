"""Watermarked windowed aggregation over the event stream.

The late-data half of the streaming story (stateful_rle / dedup_stream
cover custom state): tumbling event-time windows with a watermark bound
the aggregation state — a window's partial aggregate is held only until
``watermark = max(event time seen) − delay`` passes the window end,
then it is finalized, emitted once (append mode), and its state freed.
Events arriving later than the watermark are dropped, which is the
contract that makes the state size O(open windows), not O(stream) — at
web-crawl scale an unbounded groupBy over event time would hold every
window forever.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["windowed_event_counts"]


def windowed_event_counts(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "windowed_events",
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    output_dir: str | None = None,
):
    """Start the windowed counter over a parquet file source of
    ``(ts timestamp, event_type string, value double)`` rows; finalized
    windows are appended exactly once, after the watermark closes them.

    With ``output_dir`` the sink is parquet — fault-tolerant, so the
    query RESUMES from ``checkpoint_dir`` (watermark and window state
    restored) across restarts; without it, an in-memory table named
    ``query_name`` (inspection only — the memory sink cannot recover
    from a checkpoint).  Returns the StreamingQuery."""
    schema = "ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    if output_dir is not None:
        writer = (
            agg.writeStream.format("parquet")
            .option("path", output_dir)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
        )
    else:
        writer = (
            agg.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
        )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
