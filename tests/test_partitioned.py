"""Hidden partitioning: spec transforms, manifest partition tuples,
transform-aware file pruning, metadata tables.

The load-bearing invariants:
- pruned read ≡ full-scan filter (exact same rows), with strictly fewer
  files touched when the predicate hits a partition source;
- the driver-side murmur3 used to bucket predicate literals is
  bit-identical to Spark's ``F.hash`` (else bucket pruning would be
  silently wrong);
- pruning is conservative: predicates the spec can't serve keep all
  files.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pyrle_spark.sources.partitioned import (
    PartitionField,
    PartitionSpec,
    PartitionedIceTable,
    _murmur3_spark,
)
from pyrle_spark.sources.webtext import generate_webtext

N = 2000


@pytest.fixture(scope="module")
def web(spark):
    return generate_webtext(spark, N, n_hosts=20).cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_murmur3_matches_spark_hash(spark):
    longs = [0, 1, -1, 42, 2**40, -(2**40), 123456789]
    strs = ["", "a", "en", "abc", "abcd", "abcde", "héllo wörld", "x" * 33]
    got_l = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in longs], "v long")
        .select("v", F.hash("v").alias("h"))
        .collect()
    }
    got_s = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in strs], "v string")
        .select("v", F.hash("v").alias("h"))
        .collect()
    }
    for v in longs:
        assert _murmur3_spark(v) == got_l[v], f"long {v}"
    for v in strs:
        assert _murmur3_spark(v) == got_s[v], f"str {v!r}"


def test_identity_partition_prune_exact(spark, web, tmp_path):
    spec = PartitionSpec(PartitionField("lang"))
    t = PartitionedIceTable(str(tmp_path / "p1"), spec)
    t.write_snapshot(web.select("doc_seq", "url", "lang", "warc_ts"))
    preds = [("lang", "=", "en")]
    got = t.read(spark, preds)
    exp = web.select("doc_seq", "url", "lang", "warc_ts").filter(
        F.col("lang") == "en"
    )
    assert _rows(got) == _rows(exp)
    stats = t.prune(preds)
    assert 0 < stats["kept_files"] < stats["total_files"]
    # non-partition predicate: keeps everything (conservative), still exact
    got2 = t.read(spark, [("doc_seq", "<", 100)])
    assert got2.count() == 100
    assert t.prune([("doc_seq", "<", 100)])["kept_files"] == stats["total_files"]


def test_bucket_partition_prune(spark, web, tmp_path):
    spec = PartitionSpec(PartitionField("url", "bucket[8]", "url_bucket"))
    t = PartitionedIceTable(str(tmp_path / "p2"), spec)
    t.write_snapshot(web.select("doc_seq", "url", "lang"))
    victim = web.select("url").first()["url"]
    got = t.read(spark, [("url", "=", victim)])
    exp = web.select("doc_seq", "url", "lang").filter(F.col("url") == victim)
    assert _rows(got) == _rows(exp)
    stats = t.prune([("url", "=", victim)])
    assert stats["kept_files"] < stats["total_files"]
    # bucket cannot prune ranges — conservative keep
    assert (
        t.prune([("url", ">", victim)])["kept_files"] == stats["total_files"]
    )
    # IN-list prunes to the union of buckets
    urls = [r["url"] for r in web.select("url").distinct().limit(3).collect()]
    got_in = t.read(spark, [("url", "in", urls)])
    exp_in = web.select("doc_seq", "url", "lang").filter(F.col("url").isin(urls))
    assert _rows(got_in) == _rows(exp_in)


def test_days_partition_range_prune(spark, web, tmp_path):
    spec = PartitionSpec(PartitionField("warc_ts", "days", "ts_day"))
    t = PartitionedIceTable(str(tmp_path / "p3"), spec)
    t.write_snapshot(web.select("doc_seq", "warc_ts", "lang"))
    # webtext spans 2024-01-01..02; a predicate inside day 2 must drop
    # every day-1 file but keep the boundary day (superset contract)
    from datetime import datetime

    mid = datetime(2024, 1, 2, 3, 0, 0)
    preds = [("warc_ts", ">=", mid)]
    got = t.read(spark, preds)
    exp = web.select("doc_seq", "warc_ts", "lang").filter(F.col("warc_ts") >= mid)
    assert _rows(got) == _rows(exp)
    stats = t.prune(preds)
    assert stats["kept_files"] < stats["total_files"]
    # boundary day is kept (superset contract), strictly-before days drop
    days = {
        r["partition_ts_day"]
        for r in t.files_df(spark).collect()
    }
    kept_days = {
        d for d in days if d >= mid.strftime("%Y-%m-%d")
    }
    assert stats["kept_files"] >= len(kept_days)


def test_truncate_int_and_multifield(spark, web, tmp_path):
    spec = PartitionSpec(
        PartitionField("lang"),
        PartitionField("doc_seq", "truncate[500]", "seq_range"),
    )
    t = PartitionedIceTable(str(tmp_path / "p4"), spec)
    t.write_snapshot(web.select("doc_seq", "lang", "url"))
    preds = [("lang", "=", "en"), ("doc_seq", ">=", 1500)]
    got = t.read(spark, preds)
    exp = web.select("doc_seq", "lang", "url").filter(
        (F.col("lang") == "en") & (F.col("doc_seq") >= 1500)
    )
    assert _rows(got) == _rows(exp)
    stats = t.prune(preds)
    full = t.prune([])
    assert stats["kept_files"] < full["kept_files"]


def test_spec_persisted_and_checked(spark, web, tmp_path):
    path = str(tmp_path / "p5")
    spec = PartitionSpec(PartitionField("lang"))
    t = PartitionedIceTable(path, spec)
    t.write_snapshot(web.select("doc_seq", "lang"))
    # reopen without a spec: recovered from metadata
    t2 = PartitionedIceTable(path)
    assert t2.spec.to_json() == spec.to_json()
    # reopen with a DIFFERENT spec: refused
    with pytest.raises(ValueError, match="differs"):
        PartitionedIceTable(path, PartitionSpec(PartitionField("url")))


def test_metadata_tables(spark, web, tmp_path):
    spec = PartitionSpec(PartitionField("lang"))
    t = PartitionedIceTable(str(tmp_path / "p6"), spec)
    t.write_snapshot(web.select("doc_seq", "lang"))
    parts = {
        r["partition_p_lang"]: r["file_count"]
        for r in t.partitions_df(spark).collect()
    }
    langs = {
        r["lang"] for r in web.select("lang").distinct().collect()
    }
    assert set(parts) == langs
    files = t.files_df(spark)
    assert files.count() == t.prune([])["total_files"]
    assert files.agg(F.sum("bytes")).first()[0] == t.prune([])["total_bytes"]


def test_append_accumulates_and_time_travel(spark, web, tmp_path):
    spec = PartitionSpec(PartitionField("lang"))
    t = PartitionedIceTable(str(tmp_path / "p7"), spec)
    s1 = t.write_snapshot(web.filter(F.col("doc_seq") < 1000).select("doc_seq", "lang"))
    t.write_snapshot(
        web.filter(F.col("doc_seq") >= 1000).select("doc_seq", "lang")
    )
    assert t.read(spark).count() == N
    assert t.read(spark, snapshot_id=s1).count() == 1000
    # pruning applies at the old snapshot too
    en_old = t.read(spark, [("lang", "=", "en")], snapshot_id=s1)
    assert en_old.count() == web.filter(
        (F.col("doc_seq") < 1000) & (F.col("lang") == "en")
    ).count()


def test_partition_evolution(spark, web, tmp_path):
    """evolve_spec changes the layout of future writes only: old files
    keep their spec id and prune under the old spec, new files under the
    new one; reads spanning both generations stay exact (superset
    contract), and a predicate only the new layout serves keeps every
    old-generation file."""
    path = str(tmp_path / "pevo")
    t = PartitionedIceTable(path, PartitionSpec(PartitionField("lang")))
    gen1 = web.filter(F.col("doc_seq") < N // 2)
    gen2 = web.filter(F.col("doc_seq") >= N // 2)
    t.write_snapshot(gen1)
    n_gen1 = len(t._manifest(None)["files"])

    new_id = t.evolve_spec(
        PartitionSpec(
            PartitionField("lang"),
            PartitionField("url", "bucket[4]", "url_bucket"),
        )
    )
    assert new_id == 1
    t.write_snapshot(gen2, mode="append")
    files = t._manifest(None)["files"]
    assert {f["spec_id"] for f in files} == {0, 1}
    assert all(f["spec_id"] == 0 for f in files[:n_gen1])

    # lang predicate prunes BOTH generations (both specs carry lang)
    st = t.prune([("lang", "=", "en")])
    assert st["kept_files"] < st["total_files"]
    got = _rows(t.read(spark, [("lang", "=", "en")]))
    exp = _rows(web.filter(F.col("lang") == "en"))
    assert got == exp

    # url predicate: only the NEW generation can prune; every old file
    # must survive (conservative superset)
    some_url = web.select("url").first()["url"]
    st2 = t.prune([("url", "=", some_url)])
    assert st2["kept_files"] >= n_gen1
    assert st2["kept_files"] < st2["total_files"]  # new gen did prune
    got2 = _rows(t.read(spark, [("url", "=", some_url)]))
    exp2 = _rows(web.filter(F.col("url") == some_url))
    assert got2 == exp2

    # re-evolving to an existing spec reuses its id (no spec-list growth)
    assert t.evolve_spec(PartitionSpec(PartitionField("lang"))) == 0
    assert len(t._specs) == 2

    # reopening the table picks up the current default spec
    t2 = PartitionedIceTable(path)
    assert t2.spec.to_json() == PartitionSpec(PartitionField("lang")).to_json()
    assert len(t2._specs) == 2

    # passing a stale spec at open time is refused with guidance
    with pytest.raises(ValueError, match="evolve_spec"):
        PartitionedIceTable(
            path, PartitionSpec(PartitionField("url", "bucket[4]", "url_bucket"))
        )

    # metadata tables surface the mixed layout
    fdf = t.files_df(spark)
    assert "spec_id" in fdf.columns and "partition_url_bucket" in fdf.columns
    assert fdf.filter(F.col("spec_id") == 1).count() > 0
    assert (
        fdf.filter((F.col("spec_id") == 0) & F.col("partition_url_bucket").isNotNull()).count()
        == 0
    )


def test_date_and_datetime_literal_prune_exact(spark, web, tmp_path):
    """ADVICE r02: _coerce used to return the raw directory string for
    date/datetime/Decimal literals, so identity-partitioned '=' predicates
    with a date literal silently dropped matching files (str != date) and
    range predicates raised TypeError.  Both must now be exact supersets."""
    from datetime import date, datetime
    from decimal import Decimal

    src = web.select(
        "doc_seq", "warc_ts", F.to_date("warc_ts").alias("warc_day"), "lang"
    )
    # identity partition on a DATE column
    t = PartitionedIceTable(
        str(tmp_path / "pdate"), PartitionSpec(PartitionField("warc_day"))
    )
    t.write_snapshot(src)
    lit = date(2024, 1, 2)
    got = t.read(spark, [("warc_day", "=", lit)])
    exp = src.filter(F.col("warc_day") == F.lit(lit))
    assert _rows(got) == _rows(exp)
    st = t.prune([("warc_day", "=", lit)])
    assert 0 < st["kept_files"] < st["total_files"]
    # range op on the date literal must not raise and stays exact
    got_r = t.read(spark, [("warc_day", ">=", lit)])
    exp_r = src.filter(F.col("warc_day") >= F.lit(lit))
    assert _rows(got_r) == _rows(exp_r)
    assert t.prune([("warc_day", ">=", lit)])["kept_files"] < st["total_files"]

    # identity partition on a TIMESTAMP column (dirs spell 'Y-m-d H:M:S')
    t2 = PartitionedIceTable(
        str(tmp_path / "pts"),
        PartitionSpec(PartitionField("warc_ts", "hours", "ts_hour")),
    )
    t2.write_snapshot(src)
    mid = datetime(2024, 1, 2, 3, 0, 0)
    got2 = t2.read(spark, [("warc_ts", ">=", mid)])
    exp2 = src.filter(F.col("warc_ts") >= F.lit(mid))
    assert _rows(got2) == _rows(exp2)

    # Decimal literal vs int partition dirs: now coerced, prunes exactly
    t3 = PartitionedIceTable(
        str(tmp_path / "pint"),
        PartitionSpec(PartitionField("doc_seq", "truncate[500]", "seq_range")),
    )
    t3.write_snapshot(src)
    st3 = t3.prune([("doc_seq", "=", Decimal("123"))])
    assert 0 < st3["kept_files"] < st3["total_files"]
    got3 = t3.read(spark, [("doc_seq", "=", 123)])
    assert _rows(got3) == _rows(src.filter(F.col("doc_seq") == 123))
    # genuinely unhandled literal type: _coerce says unknowable (file kept)
    from pyrle_spark.sources.partitioned import _UNKNOWN, _coerce

    assert _coerce(b"en", "en") is _UNKNOWN
    assert _coerce((1, 2), "1") is _UNKNOWN
