"""Streaming half of the Spark Python Data Source:
``spark.readStream.format("pyrle")`` (CDC tail of the encoded table via
Spark's offset machinery) and ``df.writeStream.format("pyrle")`` (one
Iceberg-style snapshot per micro-batch, exactly-once metadata via the
batch id recorded in snapshot properties)."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from pyrle_spark.sources.datasource import (
    PyrleStreamWriter,
    _encode_task,
    register,
)
from pyrle_spark.sources.icetable import IceTable
from pyrle_spark.sources.webtext import generate_webtext

BR = 512
COLS = ["url", "warc_ts", "html", "text", "lang"]


@pytest.fixture(scope="module")
def ds_spark(spark):
    register(spark)
    return spark


def _batch_write(df, out: str) -> None:
    (
        df.repartition(2, F.floor(F.col("doc_seq") / BR).cast("long"))
        .sortWithinPartitions("doc_seq")
        .write.format("pyrle")
        .option("order_col", "doc_seq")
        .option("block_rows", str(BR))
        .mode("append")
        .save(out)
    )


def test_file_uri_load_and_sql_view(ds_spark, tmp_path):
    """``load("file:/…")`` (the spelling Hadoop's resolver produces, e.g.
    from SQL DDL paths) reads the same table as the plain path, and the
    SQL surface works through a temp view.  (Catalog tables — CREATE
    TABLE … USING pyrle — are parsed but this pyspark version hands the
    Python reader EMPTY options, so the supported SQL route is a view
    over ``spark.read``.)"""
    out = str(tmp_path / "tbl")
    rows = generate_webtext(ds_spark, BR, n_hosts=7, block_rows=BR)
    _batch_write(rows, out)
    got = ds_spark.read.format("pyrle").load("file:" + out)
    assert got.count() == BR
    got.createOrReplaceTempView("enc_uri_view")
    n = ds_spark.sql(
        "SELECT count(DISTINCT _order) FROM enc_uri_view WHERE lang IS NOT NULL"
    ).first()[0]
    assert n == BR
    ds_spark.catalog.dropTempView("enc_uri_view")


def test_stream_read_tails_snapshots(ds_spark, tmp_path):
    out = str(tmp_path / "tbl")
    rows = generate_webtext(ds_spark, 3 * BR, n_hosts=7, block_rows=BR)
    _batch_write(rows.filter(F.col("doc_seq") < BR), out)  # snapshot 1

    q = (
        ds_spark.readStream.format("pyrle")
        .load(out)
        .writeStream.format("memory")
        .queryName("pyrle_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = ds_spark.sql(
            "SELECT count(*) n, count(DISTINCT _order) d FROM pyrle_tail"
        ).first()
        assert got["n"] == BR == got["d"]

        # two more snapshots while the stream is live -> both delivered
        _batch_write(
            rows.filter((F.col("doc_seq") >= BR) & (F.col("doc_seq") < 2 * BR)),
            out,
        )
        _batch_write(rows.filter(F.col("doc_seq") >= 2 * BR), out)
        q.processAllAvailable()
        got = ds_spark.sql(
            "SELECT count(*) n, count(DISTINCT _order) d FROM pyrle_tail"
        ).first()
        assert got["n"] == 3 * BR == got["d"]

        # decoded payloads match the batch read, not just the counts
        tail = ds_spark.sql(
            "SELECT * FROM pyrle_tail ORDER BY _order"
        ).toPandas()
        batch = (
            ds_spark.read.format("pyrle").load(out).orderBy("_order").toPandas()
        )
        assert list(tail.columns) == list(batch.columns)
        for c in tail.columns:
            assert (tail[c].values == batch[c].values).all(), c
    finally:
        q.stop()
        ds_spark.catalog.dropTempView("pyrle_tail")


def test_stream_read_starting_latest(ds_spark, tmp_path):
    out = str(tmp_path / "tbl")
    rows = generate_webtext(ds_spark, 2 * BR, n_hosts=7, block_rows=BR)
    _batch_write(rows.filter(F.col("doc_seq") < BR), out)  # pre-stream

    q = (
        ds_spark.readStream.format("pyrle")
        .option("startingSnapshot", "latest")
        .load(out)
        .writeStream.format("memory")
        .queryName("pyrle_latest")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert ds_spark.sql("SELECT count(*) FROM pyrle_latest").first()[0] == 0

        _batch_write(rows.filter(F.col("doc_seq") >= BR), out)
        q.processAllAvailable()
        got = ds_spark.sql(
            "SELECT count(*) n, min(_order) lo FROM pyrle_latest"
        ).first()
        assert got["n"] == BR and got["lo"] == BR  # only the new snapshot
    finally:
        q.stop()
        ds_spark.catalog.dropTempView("pyrle_latest")


def test_stream_read_rollback_fails_loudly(ds_spark, tmp_path):
    """Streaming offsets cannot regress: after the streamed prefix is
    rolled back, the reader must raise instead of silently re-reading a
    diverged chain (the consumer restarts with a fresh checkpoint)."""
    from pyspark.sql.types import StructType

    from pyrle_spark.sources.datasource import PyrleStreamReader

    out = str(tmp_path / "tbl")
    rows = generate_webtext(ds_spark, 2 * BR, n_hosts=7, block_rows=BR)
    _batch_write(rows.filter(F.col("doc_seq") < BR), out)
    table = IceTable(out)
    first = table.current_snapshot_id()
    _batch_write(rows.filter(F.col("doc_seq") >= BR), out)

    schema = StructType.fromJson(
        __import__("json").loads(
            '{"type":"struct","fields":[{"name":"_order","type":"long",'
            '"nullable":false,"metadata":{}}]}'
        )
    )
    # minimal reader: only the lineage walk matters here
    reader = PyrleStreamReader({"path": out}, schema.add("lang", "string"))
    assert reader.latestOffset() == {"idx": 2}

    table.rollback_to(first)  # undo the second ingest
    with pytest.raises(RuntimeError, match="rollback|diverged"):
        reader.latestOffset()


def test_stream_write_end_to_end(ds_spark, tmp_path):
    """File-stream source -> writeStream.format("pyrle") with an
    availableNow trigger: one snapshot per micro-batch, decoded rows
    identical to the source."""
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "tbl")
    rows = generate_webtext(ds_spark, 2 * BR, n_hosts=7, block_rows=BR)
    # two pre-sorted single-file parquet drops covering disjoint block
    # ranges -> with maxFilesPerTrigger=1 each becomes one micro-batch
    for i, (lo, hi) in enumerate([(0, BR), (BR, 2 * BR)]):
        stage = str(tmp_path / f"stage{i}")
        (
            rows.filter((F.col("doc_seq") >= lo) & (F.col("doc_seq") < hi))
            .coalesce(1)
            .sortWithinPartitions("doc_seq")
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"drop{i}.parquet"))

    q = (
        ds_spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .writeStream.format("pyrle")
        .option("path", out)
        .option("order_col", "doc_seq")
        .option("block_rows", str(BR))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive

    table = IceTable(out)
    props_per_snap = [table.properties(s["id"]) for s in table.snapshots()]
    batch_ids = sorted(
        p["stream_batch_id"] for p in props_per_snap if "stream_batch_id" in p
    )
    assert batch_ids == [0, 1]  # one snapshot per micro-batch

    got = (
        ds_spark.read.format("pyrle").load(out).orderBy("_order").toPandas()
    )
    exp = rows.orderBy("doc_seq").select(*sorted(COLS)).toPandas()
    assert len(got) == 2 * BR
    for c in sorted(COLS):
        assert (got[c].values == exp[c].values).all(), c


def test_mirror_encoded_incremental(ds_spark, tmp_path):
    """readStream → writeStream composition: mirror an encoded table
    into another encoded table, incrementally.  First drain copies the
    existing snapshots; an append to the source followed by a rerun on
    the SAME checkpoint processes only the delta; the mirror decodes
    identically to the source at both points."""
    from pyrle_spark.streaming.mirror import mirror_encoded

    src = str(tmp_path / "src_tbl")
    dst = str(tmp_path / "dst_tbl")
    ck = str(tmp_path / "ck")
    rows = generate_webtext(ds_spark, 2 * BR, n_hosts=7, block_rows=BR)
    _batch_write(rows.filter(F.col("doc_seq") < BR), src)

    q = mirror_encoded(ds_spark, src, dst, ck)
    q.awaitTermination(120)
    assert not q.isActive

    def decoded(path):
        return (
            ds_spark.read.format("pyrle").load(path).orderBy("_order").toPandas()
        )

    a, b = decoded(src), decoded(dst)
    assert len(b) == BR
    for c in a.columns:
        assert (a[c].values == b[c].values).all(), c

    # append to the source, rerun on the same checkpoint → only the
    # delta is processed (exactly one new mirror snapshot)
    _batch_write(rows.filter(F.col("doc_seq") >= BR), src)
    n_snaps_before = len(IceTable(dst).snapshots())
    q2 = mirror_encoded(ds_spark, src, dst, ck)
    q2.awaitTermination(120)
    assert not q2.isActive
    assert len(IceTable(dst).snapshots()) == n_snaps_before + 1

    a, b = decoded(src), decoded(dst)
    assert len(b) == 2 * BR
    for c in a.columns:
        assert (a[c].values == b[c].values).all(), c


def test_stream_write_replayed_batch_commits_once(ds_spark, tmp_path):
    """Exactly-once metadata: re-delivering a batch id that is already in
    the snapshot log must not add a second snapshot, and the replayed
    task's file must be cleaned up (it would otherwise be an orphan)."""
    out = str(tmp_path / "tbl")
    rows = generate_webtext(ds_spark, BR, n_hosts=7, block_rows=BR)
    schema = rows.schema
    arrow = rows.coalesce(1).sortWithinPartitions("doc_seq").toArrow()

    def writer():
        return PyrleStreamWriter(
            {
                "path": out,
                "order_col": "doc_seq",
                "block_rows": str(BR),
                "checkpointLocation": str(tmp_path / "ckpt"),
            },
            schema,
            overwrite=False,
        )

    w = writer()
    data_dir = os.path.join(out, "data", "stream")
    msg = _encode_task(
        iter(arrow.to_batches()), list(w._w.columns), "doc_seq", BR, 0.9,
        data_dir,
    )
    w.commit([msg], 7)
    table = IceTable(out)
    assert len(table.snapshots()) == 1
    assert table.properties().get("stream_batch_id") == 7

    # replay (failure between commit and checkpoint advance): a fresh
    # writer instance re-encodes and re-commits the same batch id
    w2 = writer()
    msg2 = _encode_task(
        iter(arrow.to_batches()), list(w2._w.columns), "doc_seq", BR, 0.9,
        data_dir,
    )
    assert os.path.exists(msg2.file)
    w2.commit([msg2], 7)
    assert len(IceTable(out).snapshots()) == 1  # no duplicate snapshot
    assert not os.path.exists(msg2.file)  # replayed file removed

    got = ds_spark.read.format("pyrle").load(out)
    assert got.count() == BR
    assert got.select(F.countDistinct("_order")).first()[0] == BR
