"""Bucketed tables: co-located joins must shuffle NOTHING — the plan
has no Exchange on either side (the write paid the partitioning once)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest

from pyrle_spark.sources.bucketed import co_located_join, read_bucketed, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def test_co_located_join_no_shuffle(spark, no_broadcast, tmp_path):
    docs = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).cast("double").alias("score")
    )
    sigs = spark.range(0, 5000, 2).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13).alias("sig")
    )
    write_bucketed(docs, "t_docs_b", "doc_id", n_buckets=8)
    write_bucketed(sigs, "t_sigs_b", "doc_id", n_buckets=8)
    try:
        joined = co_located_join(spark, "t_docs_b", "t_sigs_b", on="doc_id")
        assert _exchanges(joined) == 0, "bucketed join must not shuffle"
        # and it is CORRECT: equals the plain (shuffled) join
        plain = docs.join(sigs, "doc_id").orderBy("doc_id").collect()
        got = joined.orderBy("doc_id").collect()
        assert got == plain and len(got) == 2500
        # bucketed groupBy on the bucket key is shuffle-free too
        agg = read_bucketed(spark, "t_docs_b").groupBy("doc_id").count()
        assert _exchanges(agg) == 0
        # a non-bucketed copy of the same join DOES shuffle (sanity that
        # the zero above is the bucketing, not some other rewrite)
        assert _exchanges(docs.join(sigs, "doc_id")) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_sigs_b")
