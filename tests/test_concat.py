"""concat_tables: metadata+buffer-copy UNION ALL of two encoded tables."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pyrle_spark.plans.concat import concat_tables
from pyrle_spark.plans.encode_job import (
    EncodeConfig,
    decode_table,
    delete_rows,
    encode_table,
    point_lookup,
)


def _enc(spark, path, lo, hi, block_rows=100, cols=("g", "v"), mult=3):
    df = spark.range(lo, hi, 1, 4).select(
        F.col("id").alias("doc_seq"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") * mult).alias("v"),
    )
    encode_table(
        spark, df, path, EncodeConfig(columns=list(cols), block_rows=block_rows)
    )


def test_concat_union_decode(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _enc(spark, a, 0, 1000)
    _enc(spark, b, 0, 400, mult=11)
    before_b = decode_table(spark, b).orderBy("_order").toPandas()

    info = concat_tables(spark, a, b)
    assert info["snapshot_id"] is not None
    assert info["shift_blocks"] == 10  # 1000 rows / 100-row blocks
    assert info["moved_blocks"] == 8  # 400 rows x 2 cols / 100

    got = decode_table(spark, a).orderBy("_order").toPandas()
    assert len(got) == 1400
    # dst region untouched, src region appended in order with shifted _order
    assert list(got["v"][:1000]) == [3 * i for i in range(1000)]
    assert list(got["v"][1000:]) == [11 * i for i in range(400)]
    assert got["_order"].iloc[1000] == 1000  # full tail block → no gap
    # src unchanged
    assert decode_table(spark, b).orderBy("_order").toPandas().equals(before_b)


def test_concat_partial_tail_gap_is_consistent(spark, tmp_path):
    """dst ends in a partial block: src lands on the next block boundary
    leaving a position gap, and position math (point_lookup) stays
    exact on both sides of the seam."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _enc(spark, a, 0, 250)  # 2.5 blocks: tail block partial
    _enc(spark, b, 0, 100, mult=11)
    info = concat_tables(spark, a, b)
    assert info["shift_blocks"] == 3

    got = decode_table(spark, a).orderBy("_order").toPandas()
    assert len(got) == 350
    # gap: positions 250..299 don't exist; src starts at 300
    assert list(got["_order"][248:252]) == [248, 249, 300, 301]

    hits = point_lookup(spark, a, [0, 249, 300, 349]).orderBy("_order").toPandas()
    assert list(hits["v"]) == [0, 3 * 249, 11 * 0, 11 * 49]


def test_concat_carries_src_deletes(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _enc(spark, a, 0, 500)
    _enc(spark, b, 0, 500, mult=11)
    delete_rows(spark, b, range(0, 100))
    info = concat_tables(spark, a, b)
    assert info["carried_deletes"] == 100
    got = decode_table(spark, a)
    assert got.count() == 900  # 500 + (500 - 100)
    # exactly src's first 100 rows are missing
    vals = sorted(r[0] for r in got.select("_order").collect())
    assert vals == list(range(0, 500)) + list(range(600, 1000))


def test_concat_mismatch_raises(spark, tmp_path):
    a, b, c = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "c")
    _enc(spark, a, 0, 200, block_rows=100)
    _enc(spark, b, 0, 200, block_rows=50)
    with pytest.raises(ValueError, match="block_rows"):
        concat_tables(spark, a, b)
    _enc(spark, c, 0, 200, block_rows=100, cols=("g",))
    with pytest.raises(ValueError, match="column sets"):
        concat_tables(spark, a, c)


def test_concat_after_rename_reconciles_names(spark, tmp_path):
    from pyrle_spark.plans.encode_job import rename_column

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _enc(spark, a, 0, 300)
    _enc(spark, b, 300, 600)
    # rename on BOTH sides to different logical states would differ the
    # column sets; rename dst's v -> val and src's v -> val keeps them equal
    rename_column(spark, a, "v", "val")
    rename_column(spark, b, "v", "val")
    info = concat_tables(spark, a, b)
    assert info["snapshot_id"] is not None
    got = decode_table(spark, a).orderBy("_order").toPandas()
    assert list(got["val"]) == [3 * i for i in range(600)]


def test_snapshot_as_of_timestamp(spark, tmp_path):
    """FOR TIMESTAMP AS OF resolves along the CURRENT parent chain:
    commits orphaned by a rollback never resolve even though their
    timestamps are in range."""
    import pytest as _pytest

    from pyrle_spark.sources.icetable import IceTable

    t = IceTable(str(tmp_path / "t"))
    s1 = t.write_snapshot(spark.range(0, 10).toDF("id"))
    s2 = t.write_snapshot(spark.range(10, 20).toDF("id"), mode="append")
    ts = {s["id"]: s["timestamp_ms"] for s in t.snapshots()}

    assert t.snapshot_as_of(ts[s1]) == s1
    assert t.snapshot_as_of(ts[s2]) == s2
    assert t.snapshot_as_of(ts[s2] + 10_000) == s2
    with _pytest.raises(KeyError):
        t.snapshot_as_of(ts[s1] - 1)

    # rollback orphans s2; a new commit s3 has a LATER timestamp, but
    # as-of s2's time must now resolve to s1 (s2 left main history)
    t.rollback_to(s1)
    s3 = t.write_snapshot(spark.range(20, 30).toDF("id"), mode="append")
    assert t.snapshot_as_of(ts[s2]) == s1
    ts3 = {s["id"]: s["timestamp_ms"] for s in t.snapshots()}[s3]
    assert t.snapshot_as_of(ts3) == s3


def test_shallow_clone_diverges_and_gc_is_ownership_safe(spark, tmp_path):
    """clone_table: O(metadata) fork with full history; divergence is
    invisible to the source; expiring clone history never deletes the
    source's data files (ownership guard)."""
    from pyrle_spark.sources.icetable import IceTable, clone_table

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _enc(spark, a, 0, 500)
    delete_rows(spark, a, range(0, 50))
    src_before = decode_table(spark, a).orderBy("_order").toPandas()

    info = clone_table(a, b)
    assert info["snapshots"] >= 1

    # clone reads identically, including the copied delete vectors
    got = decode_table(spark, b).orderBy("_order").toPandas()
    assert got.equals(src_before)

    # divergence: append + delete on the clone; source unchanged
    from pyrle_spark.plans.concat import concat_tables

    c = str(tmp_path / "c")
    _enc(spark, c, 0, 100, mult=11)
    concat_tables(spark, b, c)
    delete_rows(spark, b, range(50, 100))
    assert decode_table(spark, b).count() == 500 - 100 + 100
    assert decode_table(spark, a).orderBy("_order").toPandas().equals(src_before)

    # expire the clone's whole pre-divergence history: the shared files
    # live under the SOURCE's data root and must survive
    t_b = IceTable(b)
    gc = t_b.expire_snapshots(keep_last=1)
    assert gc["expired_snapshots"]
    assert decode_table(spark, a).orderBy("_order").toPandas().equals(src_before)

    # cloning onto an existing table refuses
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        clone_table(a, b)


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    import os

    from pyrle_spark.sources.icetable import IceTable

    t = IceTable(str(tmp_path / "t"))
    t.write_snapshot(spark.range(0, 50).toDF("id"))
    # plant an orphan (a killed writer's stranded output)
    orphan_dir = os.path.join(t.path, "data", "deadbeef-0000")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-zzz.parquet")
    with open(orphan, "wb") as f:
        f.write(b"x" * 1234)
    old = 0
    os.utime(orphan, (old, old))

    rep = t.vacuum(dry_run=True)
    assert os.path.exists(orphan)  # nothing deleted
    assert orphan in rep["candidates"]
    assert rep["deleted_files"] == len(rep["candidates"]) >= 1
    assert rep["reclaimed_bytes"] >= 1234
    # every candidate must be a genuine orphan: dead by mtime, unreferenced
    live = {f["path"] for sn in t.snapshots()
            for f in t._manifest(sn["id"])["files"]}
    assert not (set(rep["candidates"]) & live)

    real = t.vacuum(older_than_s=0.0, force=True)
    assert real["deleted_files"] >= len(rep["candidates"])
    assert not os.path.exists(orphan)


def test_clone_binpack_concat_interaction(spark, tmp_path):
    """The three table ops compose: a shallow clone binpacks its SHARED
    files into its own data root (source untouched), then a concat
    appends on top of the packed layout — decode stays exact at every
    step and the source never changes."""
    from pyrle_spark.plans.binpack import rewrite_binpack
    from pyrle_spark.sources.icetable import IceTable, clone_table

    src, extra = str(tmp_path / "src"), str(tmp_path / "x")
    cl = str(tmp_path / "cl")
    _enc(spark, src, 0, 1000)
    _enc(spark, extra, 0, 300, mult=11)
    src_before = decode_table(spark, src).orderBy("_order").toPandas()

    clone_table(src, cl)
    info = rewrite_binpack(spark, cl, target_file_bytes=1 << 20)
    assert info["snapshot_id"] is not None and info["new_files"] >= 1
    # packed files live under the CLONE's data root, source files untouched
    packed = IceTable(cl)._manifest(IceTable(cl).current_snapshot_id())["files"]
    assert all(p["path"].startswith(cl) for p in packed)
    got = decode_table(spark, cl).orderBy("_order").toPandas()
    assert got.equals(src_before)

    info2 = concat_tables(spark, cl, extra)
    assert info2["snapshot_id"] is not None
    combined = decode_table(spark, cl).orderBy("_order").toPandas()
    assert len(combined) == 1300
    assert list(combined["v"][:1000]) == [3 * i for i in range(1000)]
    assert list(combined["v"][1000:]) == [11 * i for i in range(300)]
    # source still pristine after both mutations on the clone
    assert decode_table(spark, src).orderBy("_order").toPandas().equals(src_before)


def test_concat_source_schema_widens(spark, tmp_path):
    """source_schema merges per column taking the WIDER type: a src
    carrying a long column must not be recorded as dst's int — the
    DSv2 reader types reads from source_schema and would mistype src's
    moved int64 blocks."""
    from pyrle_spark.plans.encode_job import EncodeConfig, encode_table
    from pyrle_spark.sources.icetable import IceTable

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df_int = spark.range(0, 300, 1, 2).select(
        F.col("id").alias("doc_seq"), (F.col("id") % 5).cast("int").alias("v")
    )
    df_long = spark.range(0, 300, 1, 2).select(
        F.col("id").alias("doc_seq"), (F.col("id") * 10).alias("v")
    )
    encode_table(spark, df_int, a, EncodeConfig(columns=["v"], block_rows=100))
    encode_table(spark, df_long, b, EncodeConfig(columns=["v"], block_rows=100))
    concat_tables(spark, a, b)
    props = IceTable(a).properties()
    assert props["source_schema"]["v"] == "long"
    got = decode_table(spark, a).orderBy("_order").toPandas()
    assert list(got["v"]) == [i % 5 for i in range(300)] + [
        i * 10 for i in range(300)
    ]


def test_concat_carried_deletes_survive_snapshot_expiry(spark, tmp_path):
    """The carried-delete entry is conditional on the concat snapshot;
    expire_snapshots must clear the marker when it retires that
    snapshot, or the deleted rows resurrect."""
    from pyrle_spark.sources.icetable import IceTable

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _enc(spark, a, 0, 500)
    _enc(spark, b, 0, 300, mult=11)
    delete_rows(spark, b, list(range(50)))
    concat_tables(spark, a, b)
    assert decode_table(spark, a).count() == 500 + 250
    # one more commit so the concat snapshot becomes expirable
    _enc(spark, a, 800, 900)
    IceTable(a).expire_snapshots(keep_last=1)
    assert decode_table(spark, a).count() == 500 + 250 + 100


def test_orphan_conditional_delete_never_applies(spark, tmp_path):
    """The concat crash window: a delete vector published with
    only_if_snapshot but whose paired snapshot never committed must not
    apply — a later unrelated append allocates those block ids and its
    rows must survive."""
    from pyrle_spark.sources.icetable import IceTable

    a = str(tmp_path / "a")
    _enc(spark, a, 0, 500)  # blocks 0-4 per column
    # simulate the crash: conditional delete targeting future blocks,
    # paired snapshot id never committed
    ghost = IceTable(a).new_snapshot_id()
    delete_rows(
        spark, a, list(range(500, 600)), only_if_snapshot=ghost
    )
    assert decode_table(spark, a).count() == 500
    # an unrelated append now allocates positions 500-599
    _enc(spark, a, 500, 700)
    assert decode_table(spark, a).count() == 700  # nothing swallowed
