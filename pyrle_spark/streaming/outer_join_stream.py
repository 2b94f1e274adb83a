"""Stream-stream LEFT OUTER interval join + dropDuplicatesWithinWatermark,
driver-oracle-certified.

Two stateful operators the r3 registry lacked:

``stream_outer_interval_join`` — the OUTER side of the interval join is
the genuinely hard half: an unmatched left row can only emit once the
watermark proves no match can still arrive, so the null-padded rows
surface from state EVICTION, not from the match path.  Certification
needs the final watermark to pass every click's join horizon, which a
bounded replay alone never guarantees (the watermark trails the maximum
seen event time by the delay).  The module closes the horizon with a
SENTINEL row per source, timestamped past ``max(ts) + delay + window``
and written as a strictly-later file (FileStreamSource picks oldest
mtime first), so the closing no-data micro-batch flushes every held
row; sentinels carry ``user_id = -1`` and are excluded from the result.
The big delay (3650 days ≫ the table's 30-day span) makes every real
arrival order drop-free, so the certified semantics are exactly the
batch LEFT JOIN the oracle runs.

``stream_dedup_within_watermark`` — Spark's
``dropDuplicatesWithinWatermark``: state holds one entry per key seen
inside the watermark horizon and drops re-arrivals.  The replay plants
duplicates (every third event re-sent); with the delay spanning the
whole table every duplicate is inside the horizon, so the certified
output equals the batch DISTINCT-by-key — the oracle is the plain
aggregate of the un-duplicated table.

Scale shape: both operators key their state by the natural key
(user_id / event_id) so it shards across executors; a production
deployment uses a tight delay, making outer-join state O(events in one
join window) and dedup state O(keys in one horizon) with watermark
eviction — the same shapes pinned for the inner join and TTL dedup in
``tests/test_salting_streaming.py``.
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "stream_outer_interval_join",
    "stream_dedup_within_watermark",
    "QUERIES",
    "ORACLE_SQL",
]

_DELAY = "3650 days"


def _write_with_sentinel(df, sentinel_row, schema: str, prefix: str) -> str:
    """Range-partitioned replay files + one strictly-later sentinel file
    (mtime bumped so the file source processes it LAST)."""
    src = tempfile.mkdtemp(prefix=prefix)
    df.repartitionByRange(3, "ts").write.mode("overwrite").parquet(src)
    sent_dir = tempfile.mkdtemp(prefix=prefix + "sent_")
    spark = df.sparkSession
    spark.createDataFrame([sentinel_row], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(sent_dir)
    future = time.time() + 3600
    for name in os.listdir(sent_dir):
        if name.endswith(".parquet"):
            full = os.path.join(sent_dir, name)
            dst = os.path.join(src, f"zz-sentinel-{name}")
            os.replace(full, dst)
            os.utime(dst, (future, future))
    return src


def stream_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "user_id",
        "event_id",
    )
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel_ts = max_ts + timedelta(days=3650, hours=2)
    schema = "ts timestamp, user_id long, event_id long"
    src_c = _write_with_sentinel(
        ev.filter(F.col("event_type") == "click").select(
            "ts", "user_id", "event_id"
        ),
        (sentinel_ts, -1, -1),
        schema,
        "soj_clicks_",
    )
    src_v = _write_with_sentinel(
        ev.filter(F.col("event_type") == "view").select(
            "ts", "user_id", "event_id"
        ),
        (sentinel_ts, -1, -1),
        schema,
        "soj_views_",
    )
    ckpt = tempfile.mkdtemp(prefix="soj_ckpt_")
    clicks = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_c)
        .withWatermark("ts", _DELAY)
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
        .withWatermark("ts", _DELAY)
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
        "left_outer",
    )
    name = f"soj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(ckpt, "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).filter(F.col("c_user") >= 0)
    return out.groupBy((F.col("c_user") % 97).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v_eid").alias("n_matched"),
        F.sum(
            F.when(F.col("v_eid").isNull(), 1).otherwise(0)
        ).alias("n_unmatched"),
        F.sum("c_eid").alias("sum_click_ids"),
        F.sum("v_eid").alias("sum_view_ids"),
    )


_STREAM_OUTER_INTERVAL_JOIN_SQL = """
SELECT c.user_id % 97 AS bucket,
       count(*) AS n_rows,
       count(v.event_id) AS n_matched,
       CAST(sum(CASE WHEN v.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unmatched,
       CAST(sum(c.event_id) AS BIGINT) AS sum_click_ids,
       CAST(sum(v.event_id) AS BIGINT) AS sum_view_ids
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id
 AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 1 HOUR
GROUP BY bucket
"""


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "user_id",
        "event_id",
    )
    planted = ev.filter(F.col("event_id") % 3 == 0)
    replay = ev.unionByName(planted)  # every third event arrives twice
    src = tempfile.mkdtemp(prefix="ddw_src_")
    replay.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src)
    ckpt = tempfile.mkdtemp(prefix="ddw_ckpt_")
    stream = (
        spark.readStream.schema(
            "ts timestamp, event_type string, user_id long, event_id long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", _DELAY)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    name = f"ddw_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(ckpt, "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    # non-vacuous: the replay really contained duplicates, and dedup
    # really removed them all (event_id is unique in the base table)
    n_in = replay.count()
    n_out = out.count()
    assert n_out < n_in, (n_out, n_in)
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("user_id").alias("sum_uid"),
        F.sum("event_id").alias("sum_eid"),
    )


_STREAM_DEDUP_WITHIN_WATERMARK_SQL = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(user_id) AS BIGINT) AS sum_uid,
       CAST(sum(event_id) AS BIGINT) AS sum_eid
FROM events GROUP BY event_type
"""


QUERIES = {
    "stream_outer_interval_join": stream_outer_interval_join,
    "stream_dedup_within_watermark": stream_dedup_within_watermark,
}
ORACLE_SQL = {
    "stream_outer_interval_join": _STREAM_OUTER_INTERVAL_JOIN_SQL,
    "stream_dedup_within_watermark": _STREAM_DEDUP_WITHIN_WATERMARK_SQL,
}
