"""Event-stream analytics over the events table (SURVEY §2.3/§2.6
extensions a complete engine needs): gap-based sessionization and the
as-of join.

Both are single-shuffle window plans (partition by user, order by
time), the shape that scales: state per user is a running scalar, no
self-join, no driver state.  Timestamps are compared as exact epoch
microseconds so the duckdb twins match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def _events(spark, sf_dir):
    # ts is TIMESTAMP_NTZ in the driver parquet; the session timezone is
    # pinned to UTC, so the cast to TIMESTAMP is value-preserving and
    # unix_micros matches duckdb's epoch_us on the naive value
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds 30 minutes.  One shuffle (by user), two
    window passes, then a grouped rollup per session."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    sess = ev.select(
        "user_id",
        "ts_us",
        F.sum(is_new).over(w).alias("session_seq"),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
            F.min("ts_us").alias("start_us"),
        )
    )


_SESSIONIZE_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
), marked AS (
  SELECT user_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sess AS (
  SELECT user_id, ts_us,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events,
       max(ts_us) - min(ts_us) AS dur_us,
       min(ts_us) AS start_us
FROM sess GROUP BY user_id, session_seq
"""


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the user's latest purchase at
    or before the click.  Implemented as ONE sorted window over the
    tagged union (purchases carry their id forward with
    ``last(..., ignorenulls)``) — no join, one shuffle by user; the
    duckdb twin uses its native ASOF JOIN, so two entirely different
    algorithms must agree row-for-row.  Purchases are pre-deduped to
    one per (user, ts) by max event_id, making ties deterministic in
    both engines; at equal timestamps the purchase sorts first so
    'at or before' includes the same instant."""
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("purchase_id"))
        .select("user_id", "ts_us", "purchase_id", F.lit(0).alias("kind"),
                F.lit(None).cast("long").alias("click_id"))
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", F.lit(None).cast("long").alias("purchase_id"),
        F.lit(1).alias("kind"), F.col("event_id").alias("click_id"),
    )
    u = p.unionByName(c)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last("purchase_id", ignorenulls=True).over(w)
    return (
        u.select("user_id", "ts_us", "kind", "click_id",
                 carried.alias("prior_purchase_id"))
        .filter(F.col("kind") == 1)
        .select("click_id", "user_id", "ts_us", "prior_purchase_id")
    )


_ASOF_SQL = """
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, epoch_us(ts)
)
SELECT c.click_id, c.user_id, c.ts_us,
       p.purchase_id AS prior_purchase_id
FROM c ASOF LEFT JOIN p
  ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
"""


def events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function family (§2.9): per-day, per-type rollup with
    day-of-week — date_trunc arithmetic on exact UTC timestamps."""
    ev = _events(spark, sf_dir).select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )
    day = F.date_trunc("day", F.col("ts"))
    return (
        ev.groupBy(day.alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("value_milli"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.dayofweek("day").alias("dow"),
            "event_type",
            "n",
            "value_milli",
        )
    )


_DAILY_ROLLUP_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(dayofweek(date_trunc('day', ts)) + 1 AS INT) AS dow,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
FROM events
GROUP BY 1, 2, 3
"""


def topk_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (§2.7): the 3 longest documents per language,
    deterministic tie-break on doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = W.partitionBy("lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


_TOPK_SQL = """
SELECT lang, doc_id, n_chars, CAST(rk AS INT) AS rk
FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
)
WHERE rk <= 3
"""


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: a user converts at stage
    k only with an event of that type STRICTLY AFTER their first
    qualifying event of stage k−1 (ties on the microsecond excluded the
    same way in both engines).  Per-stage user counts.

    Scale shape: each stage is a per-user conditional min — a map-side-
    combined groupBy(user), never a window over the raw stream — and
    stages chain through equi-joins on user_id (co-partitioned: one
    shuffle key throughout, AQE coalesces).  Stage tables only ever
    shrink, and the output is |stages| rows."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    v = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t0"))
    )
    c = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[1])
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[2])
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    rows = [
        v.agg(
            F.lit(1).cast("int").alias("stage"),
            F.lit(FUNNEL_STAGES[0]).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
        ),
        c.agg(
            F.lit(2).cast("int").alias("stage"),
            F.lit(FUNNEL_STAGES[1]).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
        ),
        p.agg(
            F.lit(3).cast("int").alias("stage"),
            F.lit(FUNNEL_STAGES[2]).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


_FUNNEL_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
v AS (
  SELECT user_id, min(ts_us) AS t0 FROM e
  WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts_us) AS t1
  FROM e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts_us > v.t0
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts_us) AS t2
  FROM e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts_us > c.t1
  GROUP BY e.user_id
)
SELECT CAST(1 AS INT) AS stage, '{FUNNEL_STAGES[0]}' AS event_type,
       count(*) AS n_users FROM v
UNION ALL
SELECT CAST(2 AS INT), '{FUNNEL_STAGES[1]}', count(*) FROM c
UNION ALL
SELECT CAST(3 AS INT), '{FUNNEL_STAGES[2]}', count(*) FROM p
"""


RETENTION_MAX_WEEKS = 4


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users grouped by the week of their
    FIRST event (cohort), counted again in each later week they were
    active.  Weeks are ``floor(epoch_days / 7)`` — a pure-arithmetic
    week that both engines define identically (date_trunc('week') ISO
    rules would have to match across engines; integer division just
    does).

    Scale shape: first-event week is a map-side-combined min per user;
    (user, week) activity is a distinct over the same shuffle key; one
    user_id equi-join, then an O(#cohorts × #weeks) rollup."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(86_400_000_000 * 7)
            )
        ).alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .filter(F.col("week_offset") < RETENTION_MAX_WEEKS)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_RETENTION_SQL = f"""
WITH e AS (
  SELECT user_id,
         CAST(floor(epoch_us(ts) / {86_400_000_000 * 7}) AS BIGINT) AS week
  FROM events
),
first AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
active AS (SELECT DISTINCT user_id, week FROM e)
SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
       count(*) AS n_users
FROM active a JOIN first f ON f.user_id = a.user_id
WHERE a.week - f.cohort_week < {RETENTION_MAX_WEEKS}
GROUP BY f.cohort_week, week_offset
"""



def events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-median anomaly scan: per event type, each day's count is
    compared with the exact median of the previous 7 observed days
    (ROWS frame, so crawl gaps compress instead of widening the frame).
    A day is a spike at >= 2x the trailing median, a drop at <= half.
    Exact `median` (not percentile_approx) keeps the twin bit-equal:
    integer counts give .0/.5 medians both engines represent exactly.

    Scale shape: the windowed scan runs on the per-(type, day) rollup —
    #types x #days rows, metadata-sized next to the event stream — so
    the only corpus-sized work is the partially-aggregated groupBy."""
    ev = _events(spark, sf_dir).select(
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d"),
        "event_type",
    )
    daily = ev.groupBy("d", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
    # F.median rejects window frames; percentile(·, 0.5) is the
    # same exact ordered-set aggregate and accepts one
    m = F.expr("percentile(n, 0.5)").over(w)
    return (
        daily.withColumn("trail_median", m)
        .filter(F.col("trail_median").isNotNull())
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
            "trail_median",
            (F.col("n") >= 2 * F.col("trail_median")).cast("int").alias("is_spike"),
            (F.col("n") * 2 <= F.col("trail_median")).cast("int").alias("is_drop"),
        )
    )


_ANOMALY_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS d, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
scan AS (
  SELECT d, event_type, n,
         median(n) OVER (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
           AS trail_median
  FROM daily
)
SELECT strftime(d, '%Y-%m-%d') AS day, event_type,
       CAST(n AS BIGINT) AS n, trail_median,
       CAST(n >= 2 * trail_median AS INT) AS is_spike,
       CAST(n * 2 <= trail_median AS INT) AS is_drop
FROM scan WHERE trail_median IS NOT NULL
"""


GAPFILL_MOD = 101  # deterministic sparse subset: event_id % 101 == 0


def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: hourly counts of a sparse event subset
    (``event_id % 101 == 0``), zero-filled over EVERY hour between the
    subset's first and last event — the time-series densification step
    every monitoring rollup needs, and the relational face of pyrle's
    run extension (a missing hour is a zero-run, reference
    rle.py:961-998 zero-extends the shorter operand the same way).

    Scale shape: the corpus-sized work is one partially-aggregated
    groupBy; the hour spine is calendar-bounded (range/3600s rows,
    independent of data volume) and generated with ``sequence`` +
    ``explode``, then the counts join it BROADCAST — no global window,
    no driver loop."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000))
        .cast("long")
        .alias("hour_id"),
    ).filter(F.col("event_id") % GAPFILL_MOD == 0)
    counts = ev.groupBy("hour_id").agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(
        F.min("hour_id").alias("lo"), F.max("hour_id").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("hour_id")
    )
    return (
        spine.join(F.broadcast(counts), "hour_id", "left")
        .select("hour_id", F.coalesce("n", F.lit(0)).alias("n_events"))
    )


_GAPFILL_HOURLY_SQL = f"""
WITH sparse AS (
  SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_id
  FROM events WHERE event_id % {GAPFILL_MOD} = 0
),
counts AS (SELECT hour_id, count(*) AS n FROM sparse GROUP BY hour_id),
spine AS (
  SELECT CAST(unnest(generate_series((SELECT min(hour_id) FROM sparse),
                                     (SELECT max(hour_id) FROM sparse)))
              AS BIGINT) AS hour_id
)
SELECT s.hour_id, COALESCE(c.n, 0) AS n_events
FROM spine s LEFT JOIN counts c ON c.hour_id = s.hour_id
"""


def events_ffill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill over the day calendar: the daily mean purchase value
    of a sparse subset, with empty days carrying the LAST OBSERVED day's
    mean forward (pyrle semantics exactly — extending a run's value over
    the gap instead of emitting null).  Days before the first
    observation stay null-free by starting the spine at the first
    observed day.

    Determinism across engines: per-row values floor to integer
    milli-units, the daily mean is the exact rational sum_milli/n
    evaluated as one BIGINT/BIGINT division in both engines — identical
    operands, identical double.  The ``last(..., ignorenulls)`` window
    runs over the day spine only (calendar-bounded rows, ~range/86400 —
    metadata-sized at any corpus scale, same argument as
    :func:`events_anomaly_days`)."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day_id"),
        F.floor(F.col("value") * 1000).cast("long").alias("v_milli"),
    ).filter(
        (F.col("event_id") % GAPFILL_MOD == 0)
        & (F.col("event_type") == "purchase")
    )
    daily = ev.groupBy("day_id").agg(
        F.sum("v_milli").alias("s"), F.count(F.lit(1)).alias("c")
    )
    bounds = ev.agg(F.min("day_id").alias("lo"), F.max("day_id").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day_id"))
    joined = spine.join(F.broadcast(daily), "day_id", "left").select(
        "day_id", (F.col("s") / F.col("c")).alias("day_avg")
    )
    w = W.orderBy("day_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    return joined.select(
        "day_id",
        F.last("day_avg", ignorenulls=True).over(w).alias("filled_avg"),
        F.col("day_avg").isNull().cast("int").alias("was_gap"),
    )


_FFILL_DAILY_SQL = f"""
WITH sparse AS (
  SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day_id,
         CAST(floor(value * 1000) AS BIGINT) AS v_milli
  FROM events
  WHERE event_id % {GAPFILL_MOD} = 0 AND event_type = 'purchase'
),
daily AS (SELECT day_id, sum(v_milli) AS s, count(*) AS c
          FROM sparse GROUP BY day_id),
spine AS (
  SELECT CAST(unnest(generate_series((SELECT min(day_id) FROM sparse),
                                     (SELECT max(day_id) FROM sparse)))
              AS BIGINT) AS day_id
),
joined AS (
  SELECT sp.day_id, d.s / d.c AS day_avg
  FROM spine sp LEFT JOIN daily d ON d.day_id = sp.day_id
)
SELECT day_id,
       last_value(day_avg IGNORE NULLS)
         OVER (ORDER BY day_id ROWS UNBOUNDED PRECEDING) AS filled_avg,
       CAST(day_avg IS NULL AS INT) AS was_gap
FROM joined
"""


QUERIES = {
    "events_anomaly_days": events_anomaly_days,
    "events_gapfill_hourly": events_gapfill_hourly,
    "events_ffill_daily": events_ffill_daily,
    "sessionize_events": sessionize_events,
    "asof_join_events": asof_join_events,
    "events_daily_rollup": events_daily_rollup,
    "topk_docs_per_lang": topk_docs_per_lang,
    "funnel_conversion": funnel_conversion,
    "retention_cohorts": retention_cohorts,
}

ORACLE_SQL = {
    "events_anomaly_days": _ANOMALY_SQL,
    "events_gapfill_hourly": _GAPFILL_HOURLY_SQL,
    "events_ffill_daily": _FFILL_DAILY_SQL,
    "sessionize_events": _SESSIONIZE_SQL,
    "asof_join_events": _ASOF_SQL,
    "events_daily_rollup": _DAILY_ROLLUP_SQL,
    "topk_docs_per_lang": _TOPK_SQL,
    "funnel_conversion": _FUNNEL_SQL,
    "retention_cohorts": _RETENTION_SQL,
}
