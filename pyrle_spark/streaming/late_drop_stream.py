"""Tight-watermark stream-stream join with REAL late-data drops,
driver-oracle-certified.

The r4 outer/inner interval-join certifications use a delay wider than
the replayed table's span, so no arrival order can drop a row — honest,
but it certifies only the drop-FREE semantics.  At 100 TB the production
configuration is the opposite: a delay much tighter than the log, where
late arrivals MUST drop or state grows without bound.  This module
certifies that configuration:

- the events table (30-day span) replays through time-ordered files with
  explicitly sequenced mtimes, under a 7-day watermark delay;
- a final strictly-later file replays COPIES of the first five days'
  clicks under offset event ids — by the time it processes, every
  source has delivered its full history, so the global watermark sits
  ~7 days behind the table's end, ≥18 days PAST the planted rows;
- Structured Streaming therefore drops every planted row at the join
  input, and the certified output equals the batch inner join of the
  BASE table — "batch join minus the late set" where the late set is
  exactly the planted replay.

The certification is sharp on both sides, asserted in-query:
- every row (base + planted) entered the stream (``numInputRows`` total),
  and the join's state operator reports ≥ n_planted
  ``numRowsDroppedByWatermark`` — the drops really happened inside the
  engine, the planted file wasn't just never read;
- no planted event id reaches the output — if Spark ever admitted them,
  they'd add join pairs and the oracle hash would diverge anyway (the
  copies share user/ts with real clicks, so admission is guaranteed to
  change the aggregate).

Scale shape: with the tight delay, join state is O(events inside one
watermark horizon) per side — the deployment configuration's bound —
and state keys by user_id so it shards across executors.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["stream_late_drop_join", "QUERIES", "ORACLE_SQL"]

_DELAY = "7 days"
_PLANT_OFFSET = 10_000_000
_PLANT_DAYS = 5  # replayed-late slice: clicks from the first 5 days


def _write_sequenced(df, n_files: int, prefix: str) -> str:
    """Range-partitioned time-ordered replay files with explicitly
    increasing mtimes (partition i = i-th time slice), so the file
    source's oldest-first order IS event-time order — the deterministic
    arrival sequence the watermark arithmetic below relies on."""
    src = tempfile.mkdtemp(prefix=prefix)
    df.repartitionByRange(n_files, "ts").write.mode("overwrite").parquet(src)
    base = time.time()
    for name in sorted(os.listdir(src)):
        if name.endswith(".parquet"):
            # part-00000 is the earliest range bucket; sequence mtimes
            # 10 s apart so ties cannot reorder buckets
            idx = int(name.split("-")[1])
            full = os.path.join(src, name)
            os.utime(full, (base + 10 * idx, base + 10 * idx))
    return src


def stream_late_drop_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "user_id",
        "event_id",
    )
    clicks_b = ev.filter(F.col("event_type") == "click").select(
        "ts", "user_id", "event_id"
    )
    views_b = ev.filter(F.col("event_type") == "view").select(
        "ts", "user_id", "event_id"
    )
    min_ts = ev.agg(F.min("ts")).first()[0]
    late_cut = F.lit(min_ts) + F.expr(f"INTERVAL {_PLANT_DAYS} DAYS")
    planted = clicks_b.filter(F.col("ts") < late_cut).select(
        "ts", "user_id", (F.col("event_id") + _PLANT_OFFSET).alias("event_id")
    )
    n_clicks, n_views = clicks_b.count(), views_b.count()
    n_planted = planted.count()
    assert n_planted > 0, "fixture must plant late rows"

    src_c = _write_sequenced(clicks_b, 3, "ldj_clicks_")
    src_v = _write_sequenced(views_b, 3, "ldj_views_")
    # the late file: strictly after every base file of BOTH sources, so
    # when it processes the global watermark is max(ts) - 7d ≈ day 23 —
    # at least 18 days past every planted row
    late_dir = tempfile.mkdtemp(prefix="ldj_late_")
    planted.coalesce(1).write.mode("overwrite").parquet(late_dir)
    future = time.time() + 3600
    for name in os.listdir(late_dir):
        if name.endswith(".parquet"):
            dst = os.path.join(src_c, f"zz-late-{name}")
            os.replace(os.path.join(late_dir, name), dst)
            os.utime(dst, (future, future))

    schema = "ts timestamp, user_id long, event_id long"
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
        "inner",
    )
    ckpt = tempfile.mkdtemp(prefix="ldj_ckpt_")
    name = f"ldj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(ckpt, "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_in = dropped = 0
    for p in q.recentProgress:
        prog = json.loads(p.json) if hasattr(p, "json") else p
        n_in += int(prog.get("numInputRows", 0))
        for so in prog.get("stateOperators", []):
            dropped += int(so.get("numRowsDroppedByWatermark", 0))
    # everything entered the engine — including the planted late file —
    # and the join really dropped (at least) the planted rows by
    # watermark; a never-read late file or a leaked admission both fail
    assert n_in == n_clicks + n_views + n_planted, (
        n_in, n_clicks, n_views, n_planted,
    )
    assert dropped >= n_planted, (dropped, n_planted)
    out = spark.table(name)
    assert (
        out.filter(F.col("c_eid") >= _PLANT_OFFSET).count() == 0
    ), "late rows must never reach the output"
    return out.groupBy((F.col("c_user") % 97).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("c_eid").alias("sum_click_ids"),
        F.sum("v_eid").alias("sum_view_ids"),
    )


_STREAM_LATE_DROP_JOIN_SQL = """
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


QUERIES = {"stream_late_drop_join": stream_late_drop_join}
ORACLE_SQL = {"stream_late_drop_join": _STREAM_LATE_DROP_JOIN_SQL}
