"""Salting utilities + streaming encode tests."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pyrle_spark.plans.encode_job import EncodeConfig, decode_table, verify_checksums
from pyrle_spark.plans.salting import hot_key_census, salted_agg, with_salted_key
from pyrle_spark.sources.icetable import IceTable
from pyrle_spark.sources.webtext import generate_webtext
from pyrle_spark.streaming.encode_stream import encode_stream


@pytest.fixture(scope="module")
def webtext(spark):
    return generate_webtext(spark, 3000, n_hosts=30).cache()


def test_salted_agg_matches_plain_groupby(spark, webtext):
    salted = salted_agg(
        webtext, "lang", "doc_seq", {"n": ("count", None)}, buckets=16
    ).toPandas()
    plain = webtext.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).toPandas()
    merged = salted.merge(plain, on="lang", suffixes=("_s", "_p"))
    assert (merged["n_s"] == merged["n_p"]).all()
    assert len(merged) == len(plain)


def test_hot_key_census_finds_en(spark, webtext):
    hot = hot_key_census(webtext, "lang", "doc_seq", hot_fraction=0.2).toPandas()
    assert "en" in set(hot["lang"])


def test_salted_key_spreads_hot_key(spark, webtext):
    salted = with_salted_key(
        webtext, "lang", "doc_seq", rows_per_task=300, hot_fraction=0.2
    )
    per_key = (
        salted.filter(F.col("lang") == "en")
        .groupBy("_salted_key")
        .count()
        .toPandas()
    )
    assert len(per_key) > 1  # hot key fanned out
    assert per_key["count"].max() <= 450  # ~rows_per_task with hash slack
    # row preservation
    assert salted.count() == webtext.count()


def test_streaming_encode_incremental(spark, webtext, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "enc")
    cp = str(tmp_path / "cp")
    cols = ["url", "warc_ts", "html", "text", "lang"]
    cfg = EncodeConfig(columns=cols, block_rows=500)
    # first two files arrive
    webtext.filter(F.col("doc_seq") < 2000).repartition(2).write.mode(
        "append"
    ).parquet(src)
    q = encode_stream(spark, src, table, cfg, cp)
    q.awaitTermination(120)
    assert decode_table(spark, table).count() == 2000
    # a new file arrives; only the new data is processed (checkpoint) and
    # only missing blocks are encoded (manifest resume)
    webtext.filter(F.col("doc_seq") >= 2000).repartition(1).write.mode(
        "append"
    ).parquet(src)
    q2 = encode_stream(spark, src, table, cfg, cp)
    q2.awaitTermination(120)
    dec = decode_table(spark, table)
    assert dec.count() == 3000
    assert verify_checksums(spark, table)["bad"] == 0
    snaps = IceTable(table).snapshots()
    assert len(snaps) >= 2
