"""Deterministic TPC-H fact scaling (BENCH sf1 point): row counts scale
by the factor, keys stay referentially intact, per-order groups
replicate exactly, and two syntheses are byte-deterministic."""

from __future__ import annotations

import pyspark.sql.functions as F

from pyrle_spark.sources.tpch_scale import scale_tpch

SF = "/root/testdata/sf0.001"


def test_scale_tpch_counts_and_integrity(spark, tmp_path):
    dst = str(tmp_path / "sf2x")
    info = scale_tpch(spark, SF, dst, factor=2)
    assert not info["reused"]

    src_li = spark.read.parquet(f"{SF}/lineitem.parquet")
    src_or = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{dst}/lineitem.parquet")
    orders = spark.read.parquet(f"{dst}/orders.parquet")
    assert li.count() == 2 * src_li.count()
    assert orders.count() == 2 * src_or.count()
    # dims copy verbatim
    assert (
        spark.read.parquet(f"{dst}/part.parquet").count()
        == spark.read.parquet(f"{SF}/part.parquet").count()
    )
    # webtext-analog facts scale too, with collision-free id remaps
    docs = spark.read.parquet(f"{dst}/documents.parquet")
    assert docs.count() == 2 * spark.read.parquet(
        f"{SF}/documents.parquet"
    ).count()
    assert docs.select("doc_id").distinct().count() == docs.count()
    ev = spark.read.parquet(f"{dst}/events.parquet")
    assert ev.select("event_id").distinct().count() == ev.count()
    # referential integrity: every lineitem still joins an order
    orphans = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"),
                      "left_anti").count()
    assert orphans == 0
    # per-order line groups replicate exactly: the multiset of per-order
    # line counts is the source's, twice
    src_sizes = sorted(
        r["n"]
        for r in src_li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    dst_sizes = sorted(
        r["n"]
        for r in li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert dst_sizes == sorted(src_sizes * 2)
    # key remap is collision-free
    assert (
        orders.select("o_orderkey").distinct().count() == orders.count()
    )

    # deterministic: a second synthesis produces identical content
    dst2 = str(tmp_path / "sf2x_b")
    scale_tpch(spark, SF, dst2, factor=2)
    a = spark.read.parquet(f"{dst}/lineitem.parquet")
    b = spark.read.parquet(f"{dst2}/lineitem.parquet")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # idempotent reuse via marker
    assert scale_tpch(spark, SF, dst, factor=2)["reused"]
