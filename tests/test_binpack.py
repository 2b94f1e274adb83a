"""Binpack small-file compaction: decode-identical, delete-transparent,
time-travel-safe."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from pyrle_spark.plans.binpack import rewrite_binpack
from pyrle_spark.plans.encode_job import (
    EncodeConfig,
    decode_table,
    delete_rows,
    encode_table,
)
from pyrle_spark.sources.icetable import IceTable


def _tiny_table(spark, path: str, n: int = 2000) -> None:
    df = spark.range(0, n, 1, 4).select(
        F.col("id").alias("doc_seq"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 3).alias("v"),
    )
    # 100-row blocks + one-block scan splits → many small files
    encode_table(
        spark,
        df,
        path,
        EncodeConfig(columns=["g", "v"], block_rows=100),
    )


def test_binpack_reduces_files_decode_identical(spark, tmp_path):
    t = str(tmp_path / "t")
    _tiny_table(spark, t)
    table = IceTable(t)
    before_snap = table.current_snapshot_id()
    before_files = len(table._manifest(before_snap)["files"])
    before = decode_table(spark, t).orderBy("_order").toPandas()

    info = rewrite_binpack(spark, t, target_file_bytes=1 << 20)
    assert info["snapshot_id"] is not None
    assert info["rewritten_files"] >= 2 and info["new_files"] >= 1
    after_files = len(table._manifest(table.current_snapshot_id())["files"])
    assert after_files < before_files
    assert after_files == info["new_files"] + info["kept_files"]

    after = decode_table(spark, t).orderBy("_order").toPandas()
    assert before.equals(after)

    # time travel: the pre-binpack snapshot still reads its own files
    old = decode_table(spark, t, snapshot_id=before_snap).orderBy("_order").toPandas()
    assert before.equals(old)


def test_binpack_transparent_to_deletes(spark, tmp_path):
    t = str(tmp_path / "t")
    _tiny_table(spark, t)
    delete_rows(spark, t, range(0, 250))
    before = decode_table(spark, t).orderBy("_order").toPandas()
    assert len(before) == 1750

    info = rewrite_binpack(spark, t, target_file_bytes=1 << 20)
    assert info["snapshot_id"] is not None
    after = decode_table(spark, t).orderBy("_order").toPandas()
    assert before.equals(after)

    # deletes committed AFTER the binpack apply to the packed files too
    delete_rows(spark, t, range(250, 500))
    assert decode_table(spark, t).count() == 1500


def test_binpack_noop_when_nothing_small(spark, tmp_path):
    t = str(tmp_path / "t")
    _tiny_table(spark, t, n=400)
    table = IceTable(t)
    snaps_before = len(table.snapshots())
    # a floor of 1 byte means no file qualifies as small
    info = rewrite_binpack(spark, t, target_file_bytes=1 << 20, min_file_bytes=1)
    assert info["snapshot_id"] is None and info["rewritten_files"] == 0
    assert len(table.snapshots()) == snaps_before  # no empty commit


def test_binpack_respects_schema_groups(spark, tmp_path):
    """Files written under different field-id registries (a widened
    re-encode) never pack together."""
    from pyrle_spark.plans.binpack import _group_sig

    a = {"path": "x", "bytes": 1, "field_ids": {"v": 1}, "types": {"v": "long"}}
    b = {"path": "y", "bytes": 1, "field_ids": {"v": 2}, "types": {"v": "long"}}
    assert _group_sig(a) != _group_sig(b)
    assert _group_sig(a) == _group_sig(dict(a, path="z", bytes=99))


def test_optimize_advisor_recommends_binpack(spark, tmp_path):
    """A table with no layout/codec/delete win but many small files gets
    the binpack recommendation, and apply=True packs them."""
    from pyrle_spark.plans.optimize import optimize_table

    t = str(tmp_path / "t")
    # high-cardinality random-ish values: no clustering win, no deletes
    df = spark.range(0, 3000, 1, 4).select(
        F.col("id").alias("doc_seq"),
        ((F.col("id") * 2654435761) % 100000007).alias("v"),
    )
    encode_table(spark, df, t, EncodeConfig(columns=["v"], block_rows=100))
    rec = optimize_table(spark, t)
    assert rec["action"] == "rewrite_binpack", rec
    assert rec["small_files"] >= 8

    out = optimize_table(spark, t, apply=True)
    assert out["applied"]["snapshot_id"] is not None
    again = optimize_table(spark, t)
    assert again["small_files"] < rec["small_files"]


def test_binpack_path_with_space(spark, tmp_path):
    """input_file_name() yields a percent-encoded URI; the pack routing
    must URI-decode it or rows from tables under paths with spaces land
    in the Hive default partition and the one-file-per-pack grouping
    silently degrades."""
    t = str(tmp_path / "my table dir")
    _tiny_table(spark, t)
    table = IceTable(t)
    before_files = len(table._manifest(table.current_snapshot_id())["files"])
    before = decode_table(spark, t).orderBy("_order").toPandas()

    info = rewrite_binpack(spark, t, target_file_bytes=1 << 20)
    assert info["snapshot_id"] is not None and info["new_files"] >= 1
    after_files = len(table._manifest(table.current_snapshot_id())["files"])
    assert after_files < before_files
    # grouping held: every new file is a real pack, none in a Hive
    # default-partition dir (the null-_pack symptom)
    new = table._manifest(table.current_snapshot_id())["files"]
    assert not any("__HIVE_DEFAULT_PARTITION__" in f["path"] for f in new)
    after = decode_table(spark, t).orderBy("_order").toPandas()
    assert before.equals(after)
