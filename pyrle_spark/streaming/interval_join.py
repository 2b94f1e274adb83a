"""Stream-stream interval join, driver-oracle-certified.

Structured Streaming's hardest stateful operator family is the
stream-stream join: both sides buffer state, the time-range condition
bounds it, and the watermark evicts it.  This module certifies the
INNER interval join — clicks joined to the views that follow them
within one hour for the same user — against the batch join the DuckDB
oracle runs on the same rows.

Inner stream-stream joins emit a match in the micro-batch where it is
found (no watermark hold-back — only OUTER sides wait for eviction), so
replaying the bounded event table through a file stream and letting
``availableNow`` drain it yields the complete, deterministic match set.

Certification vs deployment configuration: here the watermark delay is
set far beyond the table's time span so no replay-order "lateness" can
drop a row — the certified semantics are exactly the batch join's.  A
production deployment uses a tight delay (state = O(events inside the
watermark horizon × join window), evicted as the watermark advances);
the append-mode drop semantics of tight watermarks are pinned
separately in ``tests/test_salting_streaming.py``.

Scale shape: the join keys on ``user_id`` so state shards by key across
executors; the time-range predicate keeps per-key state to one join
window; output is aggregated to O(#buckets) integer rows.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["stream_interval_join", "QUERIES", "ORACLE_SQL"]


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "user_id", "event_id"
    )
    src_c = tempfile.mkdtemp(prefix="ssj_clicks_")
    src_v = tempfile.mkdtemp(prefix="ssj_views_")
    ckpt = tempfile.mkdtemp(prefix="ssj_ckpt_")
    # range-partition by ts: each trigger's file is a disjoint time
    # slice, so the streams see (roughly) time-ordered arrivals, the
    # shape a replayed crawl/click log has
    ev.filter(F.col("event_type") == "click").select(
        "ts", "user_id", "event_id"
    ).repartitionByRange(3, "ts").write.mode("overwrite").parquet(src_c)
    ev.filter(F.col("event_type") == "view").select(
        "ts", "user_id", "event_id"
    ).repartitionByRange(3, "ts").write.mode("overwrite").parquet(src_v)

    schema = "ts timestamp, user_id long, event_id long"
    clicks = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_c)
        .withWatermark("ts", "3650 days")
        .select(
            F.col("ts").alias("c_ts"),
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("c_eid"),
        )
    )
    views = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_v)
        .withWatermark("ts", "3650 days")
        .select(
            F.col("ts").alias("v_ts"),
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("v_eid"),
        )
    )
    joined = clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("c_ts"))
        & (F.col("v_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(ckpt, "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy((F.col("c_user") % 97).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("c_eid").alias("sum_click_ids"),
            F.sum("v_eid").alias("sum_view_ids"),
        )
    )


_STREAM_INTERVAL_JOIN_SQL = """
SELECT c.user_id % 97 AS bucket,
       count(*) AS n_pairs,
       CAST(sum(c.event_id) AS BIGINT) AS sum_click_ids,
       CAST(sum(v.event_id) AS BIGINT) AS sum_view_ids
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id
 AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 1 HOUR
GROUP BY bucket
"""


QUERIES = {"stream_interval_join": stream_interval_join}
ORACLE_SQL = {"stream_interval_join": _STREAM_INTERVAL_JOIN_SQL}
