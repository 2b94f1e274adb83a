"""Skew mitigation: hot-key census + salting.

Common-Crawl-style data is Zipf-skewed on lang and host (the generator
reproduces this: 'en' alone is >30% of rows).  A naive groupBy on such a
key sends the hot key's entire volume to one reducer.  The utilities
here implement the standard two-phase pattern:

1. ``salted_agg`` — aggregate on (key, salt) first (salt spreads the hot
   key over N reducers), then re-aggregate on key.  For algebraic
   aggregates (count/sum/min/max) the result is exactly the plain
   groupBy result.
2. ``hot_key_census`` — cheap skew report (itself salted) used to pick
   explicit salt factors for keys above a volume threshold.
3. ``with_salted_key`` — attach a partition key `key#salt` where only
   census-hot keys receive salt > 1 (cold keys keep locality).

AQE's skew-join handles *joins* at runtime; these handle *aggregations
and repartitions*, which AQE does not salt for you.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "hot_key_census", "with_salted_key"]


def _salt(order_col, buckets: int):
    return F.pmod(F.xxhash64(F.col(order_col)), F.lit(buckets)).alias("_salt")


def salted_agg(
    df: DataFrame,
    key_col: str,
    order_col: str,
    aggs: dict,
    buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: {output_name: ("count"|"sum", column)}.  Phase 1 groups by
    (key, salt) — the hot key fans out over ``buckets`` reducers with
    map-side partial aggregation; phase 2 merges the per-salt partials.
    """
    phase1_exprs = []
    phase2_exprs = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(F.lit(1)).alias(f"_p_{name}"))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(f"_p_{name}"))
        else:
            raise ValueError(f"unsupported agg {fn} (algebraic aggs only)")
        phase2_exprs.append(F.sum(f"_p_{name}").alias(name))
    phase1 = df.groupBy(F.col(key_col), _salt(order_col, buckets)).agg(*phase1_exprs)
    return phase1.groupBy(key_col).agg(*phase2_exprs)


def hot_key_census(
    df: DataFrame, key_col: str, order_col: str, hot_fraction: float = 0.05
) -> DataFrame:
    """Keys holding more than ``hot_fraction`` of all rows, with their
    row counts — computed skew-safely (salted two-phase)."""
    counts = salted_agg(df, key_col, order_col, {"n": ("count", None)})
    total = counts.agg(F.sum("n").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") >= F.col("t") * hot_fraction)
        .select(key_col, "n", (F.col("n") / F.col("t")).alias("fraction"))
    )


def with_salted_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    rows_per_task: int = 1_000_000,
    hot_fraction: float = 0.05,
) -> DataFrame:
    """Attach ``_salted_key`` = `key#i`: census-hot keys get enough salt
    buckets that no task sees more than ~rows_per_task rows; cold keys
    keep salt 0 (one partition, preserved locality)."""
    census = hot_key_census(df, key_col, order_col, hot_fraction).select(
        F.col(key_col).alias("_hot_key"),
        F.greatest(
            F.lit(1), F.ceil(F.col("n") / F.lit(rows_per_task))
        ).alias("_n_salts"),
    )
    # null-safe match: a NULL key is often THE hot key (missing lang on
    # 40% of a crawl); plain == never matches NULL and would leave all
    # those rows unsalted on one reducer
    joined = df.join(
        F.broadcast(census), df[key_col].eqNullSafe(F.col("_hot_key")), "left"
    )
    salt = F.when(
        F.col("_n_salts").isNotNull(),
        F.pmod(F.xxhash64(F.col(order_col)), F.col("_n_salts")),
    ).otherwise(F.lit(0))
    # coalesce the key into the salted string: concat_ws silently drops
    # NULLs, which would collide "NULL with salt 3" with a real key "3"
    return joined.withColumn(
        "_salted_key",
        F.concat_ws(
            "#", F.coalesce(F.col(key_col), F.lit("\x00null")), salt.cast("string")
        ),
    ).drop("_hot_key", "_n_salts")
