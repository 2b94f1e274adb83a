"""Differential tests: every relational operator vs its duckdb oracle at
sf0.001 — the same comparison the driver's correctness gate performs
(row count, column names, sorted values)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyrle_spark.operators import relational

from tests.conftest import SF_SMALL


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_query_matches_oracle(spark, ducks, name):
    got = _canon(relational.QUERIES[name](spark, SF_SMALL).toPandas())
    exp = _canon(ducks.sql(relational.ORACLE_SQL[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    for c in got.columns:
        g, e = got[c], exp[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
            assert np.allclose(
                g.astype(float), e.astype(float), rtol=1e-9, equal_nan=True
            ), f"{name}.{c}"
        else:
            pd.testing.assert_series_equal(g, e, check_dtype=False, obj=f"{name}.{c}")


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


# ---------------------------------------------------------- _bucketed_fill
# r02 verdict task #8: the bucketed two-level fill is the load-bearing
# primitive behind rle_add_step / rle_eq_step / rle_cmp_step — pin its
# equivalence to the naive global-window form over random event sets and
# bucket widths (incl. width 1 and width >= the position range).

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_fill_events = st.dictionaries(
    keys=st.tuples(
        st.sampled_from(["click", "view", "scroll"]),
        st.integers(min_value=0, max_value=60),
    ),
    values=st.sampled_from([0.0, 1.0, 2.5, -3.0, 7.25]),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_fill_events, bucket=st.sampled_from([1, 3, 16, 1000]))
def test_bucketed_fill_equals_global_window(spark, events, bucket):
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from pyrle_spark.operators.relational import _bucketed_fill

    cov = spark.createDataFrame(
        [(et, pos, v) for (et, pos), v in sorted(events.items())],
        "event_type string, start_pos long, cov_value double",
    )
    got = sorted(
        tuple(r)
        for r in _bucketed_fill(cov, bucket=bucket)
        .select("pos", "af", "bf", "next_pos")
        .collect()
    )
    # naive single-window reference form (what _bucketed_fill replaced)
    j = (
        cov.filter(F.col("event_type").isin("click", "view"))
        .groupBy(F.col("start_pos").alias("pos"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", F.col("cov_value"))
            ).alias("av"),
            F.max(
                F.when(F.col("event_type") == "view", F.col("cov_value"))
            ).alias("bv"),
        )
    )
    w = W.orderBy("pos")
    exp = sorted(
        tuple(r)
        for r in j.select(
            "pos",
            F.coalesce(F.last("av", ignorenulls=True).over(w), F.lit(0.0)).alias("af"),
            F.coalesce(F.last("bv", ignorenulls=True).over(w), F.lit(0.0)).alias("bf"),
            F.lead("pos").over(w).alias("next_pos"),
        ).collect()
    )
    assert got == exp
