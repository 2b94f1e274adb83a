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


def test_stateful_streaming_rle_matches_batch(spark, tmp_path):
    """applyInPandasWithState RLE: runs spanning micro-batch boundaries
    merge through per-key state; the completed-run stream equals the
    batch find_runs encode of the concatenated input (flush sentinel
    closes trailing runs)."""
    import os
    import time

    import numpy as np
    import pandas as pd

    from pyrle_spark.kernels.rlecore import find_runs
    from pyrle_spark.streaming.stateful_rle import rle_runs_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    rng = np.random.default_rng(7)
    seqs = {
        "a": rng.integers(0, 3, 300).astype(float),
        "b": rng.integers(0, 2, 250).astype(float),
    }
    chunks = []
    for i in range(3):
        frames = []
        for key, v in seqs.items():
            n = len(v) // 3
            lo, hi = i * n, (i + 1) * n if i < 2 else len(v)
            frames.append(
                pd.DataFrame(
                    {"key": key, "pos": np.arange(lo, hi, dtype=np.int64),
                     "value": v[lo:hi]}
                )
            )
        chunks.append(pd.concat(frames))
    term = pd.DataFrame(
        {"key": list(seqs), "pos": [10**9] * 2, "value": [float("nan")] * 2}
    )
    for i, c in enumerate(chunks + [term]):
        p = f"{src}/f{i}.parquet"
        c.to_parquet(p)
        os.utime(p, (time.time() + i, time.time() + i))  # file-source order
    q = rle_runs_stream(
        spark, src, str(tmp_path / "ckpt"), query_name="rle_runs_t"
    )
    q.awaitTermination(120)
    got = (
        spark.table("rle_runs_t")
        .toPandas()
        .sort_values(["key", "start_pos"])
        .reset_index(drop=True)
    )
    for key, v in seqs.items():
        runs, vals = find_runs(v)
        starts = np.concatenate(([0], np.cumsum(runs[:-1])))
        g = got[got.key == key].reset_index(drop=True)
        assert (g.start_pos.to_numpy() == starts).all()
        assert (g.run_len.to_numpy() == runs).all()
        assert (g.value.to_numpy() == vals).all()


def test_stateful_streaming_rle_gap_closes_run(spark, tmp_path):
    """A position gap closes the open run and starts a new one at the
    gap (the stream analog of a new block)."""
    import os
    import time

    import numpy as np
    import pandas as pd

    from pyrle_spark.streaming.stateful_rle import rle_runs_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    c1 = pd.DataFrame({"key": "k", "pos": [0, 1, 2], "value": [5.0, 5.0, 5.0]})
    c2 = pd.DataFrame({"key": "k", "pos": [10, 11], "value": [5.0, 7.0]})  # gap at 3..9
    term = pd.DataFrame({"key": ["k"], "pos": [10**9], "value": [float("nan")]})
    for i, c in enumerate([c1, c2, term]):
        p = f"{src}/f{i}.parquet"
        c.to_parquet(p)
        os.utime(p, (time.time() + i, time.time() + i))
    q = rle_runs_stream(spark, src, str(tmp_path / "ck"), query_name="rle_gap_t")
    q.awaitTermination(120)
    got = (
        spark.table("rle_gap_t").toPandas().sort_values("start_pos").reset_index(drop=True)
    )
    # run [0,3) of 5.0 closed by the gap; new run [10,11) of 5.0; [11,12) of 7.0
    assert list(got["start_pos"]) == [0, 10, 11]
    assert list(got["run_len"]) == [3, 1, 1]
    assert list(got["value"]) == [5.0, 5.0, 7.0]


def test_stateful_streaming_rle_gap_within_batch(spark, tmp_path):
    """Gaps INSIDE one micro-batch are detected too: with
    maxFilesPerTrigger > 1 several files land in a single batch, so a gap
    can sit inside a pandas chunk rather than at a batch boundary, and
    rows of one key may be split across chunks — the encoder must
    concatenate+sort the whole batch and split runs at every gap."""
    import os
    import time

    import numpy as np
    import pandas as pd

    from pyrle_spark.streaming.stateful_rle import rle_runs_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    # f0 has a gap at 3..6 inside the file; f1 continues pos 9 contiguously
    f0 = pd.DataFrame(
        {"key": "k", "pos": np.array([0, 1, 2, 7, 8], dtype=np.int64),
         "value": [5.0, 5.0, 5.0, 5.0, 5.0]}
    )
    f1 = pd.DataFrame({"key": "k", "pos": [9, 10], "value": [5.0, 6.0]})
    term = pd.DataFrame({"key": ["k"], "pos": [10**9], "value": [float("nan")]})
    for i, c in enumerate([f0, f1, term]):
        p = f"{src}/f{i}.parquet"
        c.to_parquet(p)
        os.utime(p, (time.time() + i, time.time() + i))
    q = rle_runs_stream(
        spark, src, str(tmp_path / "ck"), query_name="rle_gap_batch_t",
        max_files_per_trigger=10,  # all three files in ONE micro-batch
    )
    q.awaitTermination(120)
    got = (
        spark.table("rle_gap_batch_t")
        .toPandas()
        .sort_values("start_pos")
        .reset_index(drop=True)
    )
    # [0,3)=5.0 closed by in-chunk gap; [7,10)=5.0 spans the f0/f1 seam; [10,11)=6.0
    assert list(got["start_pos"]) == [0, 7, 10]
    assert list(got["run_len"]) == [3, 3, 1]
    assert list(got["value"]) == [5.0, 5.0, 6.0]


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """Streaming exact dedup: documents re-arriving in the same or later
    micro-batches are dropped; the emitted set equals the batch
    dedup_exact keepers (min doc_id per content hash) on the full input."""
    import hashlib
    import os
    import time

    import pandas as pd

    from pyrle_spark.streaming.dedup_stream import dedup_docs_stream

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    texts = ["alpha doc", "beta doc", "gamma doc", "alpha doc", "beta doc"]
    # batch 0: docs 0-2 (alpha, beta, gamma); batch 1: re-crawls of alpha
    # (doc 3) and beta (doc 4) plus a new delta (doc 5); batch 2: another
    # alpha re-crawl (doc 6) and in-batch dup pair of epsilon (7, 8)
    batches = [
        pd.DataFrame({"doc_id": [0, 1, 2], "text": texts[:3]}),
        pd.DataFrame({"doc_id": [3, 4, 5], "text": ["alpha doc", "beta doc", "delta doc"]}),
        pd.DataFrame({"doc_id": [8, 7, 6], "text": ["epsilon doc", "epsilon doc", "alpha doc"]}),
    ]
    for i, b in enumerate(batches):
        p = f"{src}/b{i}.parquet"
        b.to_parquet(p)
        os.utime(p, (time.time() + i, time.time() + i))
    q = dedup_docs_stream(spark, src, str(tmp_path / "ck"), query_name="dedup_docs_t")
    q.awaitTermination(120)
    got = (
        spark.table("dedup_docs_t")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # keepers: alpha->0, beta->1, gamma->2, delta->5, epsilon->7 (min of 7,8)
    assert list(got["doc_id"]) == [0, 1, 2, 5, 7]
    full = pd.concat(batches, ignore_index=True)
    keep = full.assign(h=full["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest()))
    want = sorted(keep.groupby("h")["doc_id"].min())
    assert list(got["doc_id"]) == want
    assert set(got["text_hash"]) == set(keep["h"])


def test_windowed_agg_watermark_drops_late(spark, tmp_path):
    """Tumbling windows + watermark: windows emit exactly once after the
    watermark (max event time - 30s) passes their end; an event arriving
    later than the watermark is dropped, bounding state to open windows."""
    import os
    import time
    from datetime import datetime, timedelta

    import pandas as pd

    from pyrle_spark.streaming.windowed import windowed_event_counts

    src = str(tmp_path / "ev_src")
    os.makedirs(src)
    t0 = datetime(2026, 1, 1, 0, 0, 0)

    def ts(sec):
        return t0 + timedelta(seconds=sec)

    # batch 0: windows [0,10) and [10,20), plus t=100 advancing the
    # watermark to 70s -> both windows close and emit
    b0 = pd.DataFrame(
        {
            "ts": [ts(1), ts(4), ts(12), ts(100)],
            "event_type": ["click", "click", "view", "click"],
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    # batch 1: t=5 is LATE (watermark 70s > window [0,10) end) -> dropped;
    # t=200 advances the watermark to 170s -> closes window [100,110)
    b1 = pd.DataFrame(
        {
            "ts": [ts(5), ts(200)],
            "event_type": ["click", "view"],
            "value": [50.0, 6.0],
        }
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev_schema = pa.schema(
        [
            ("ts", pa.timestamp("us", tz="UTC")),
            ("event_type", pa.string()),
            ("value", pa.float64()),
        ]
    )

    def write(name, b):
        pq.write_table(
            pa.Table.from_pandas(b, preserve_index=False).cast(ev_schema),
            f"{src}/{name}.parquet",
        )

    ck = str(tmp_path / "ck")
    out = str(tmp_path / "win_out")

    def rows_of():
        got = spark.read.parquet(out).toPandas()
        keys = [
            (r.window_start.second + 60 * r.window_start.minute, r.event_type)
            for r in got.itertuples()
        ]
        assert len(keys) == len(set(keys)), "a window emitted twice"
        return {
            k: (int(r.n_events), float(r.sum_value))
            for k, r in zip(keys, got.itertuples())
        }

    # run 1: only b0 exists; end-of-run watermark = 100 - 30 = 70s, so
    # windows [0,10) and [10,20) close and emit
    write("b0", b0)
    q = windowed_event_counts(spark, src, ck, output_dir=out)
    q.awaitTermination(120)
    r1 = rows_of()
    assert r1[(0, "click")] == (2, 3.0)
    assert r1[(10, "view")] == (1, 3.0)
    assert (100, "click") not in r1  # still open at watermark 70
    # run 2 (same checkpoint → watermark 70s restored): the t=5 click in
    # b1 is LATE (< 70s) and must be dropped — if the watermark had not
    # persisted, window [0,10) would re-emit with the late row; t=200
    # advances the watermark to 170s, closing window [100,110)
    write("b1", b1)
    q2 = windowed_event_counts(spark, src, ck, output_dir=out)
    q2.awaitTermination(120)
    r2 = rows_of()  # also re-asserts no window emitted twice
    assert r2[(0, "click")] == (2, 3.0)  # unchanged: late row dropped
    assert r2[(10, "view")] == (1, 3.0)
    assert r2[(100, "click")] == (1, 4.0)
    # window [200,210) never closed (nothing advanced the watermark past
    # its end) -> not emitted in append mode
    assert (200, "view") not in r2


def test_streaming_neardup_lsh_index(spark, tmp_path):
    """Streaming near-dup dedup: the LSH bucket index accumulates across
    micro-batches; a later document colliding with any kept document's
    band bucket is dropped.  Expected set = a sequential replay of the
    same greedy rule over band_rows on the full input."""
    import os
    import time

    import pandas as pd

    from pyrle_spark.streaming.neardup_stream import band_rows, neardup_docs_stream

    base = "the quick brown fox jumps over the lazy dog today"
    nearA = base.replace("today", "tonight")  # shares 5/6 shingles with base
    other = "completely different words about spark shuffles and columnar codecs"
    src = str(tmp_path / "nd_src")
    os.makedirs(src)
    batches = [
        # batch 0: base kept; its exact copy (doc 1) dropped within-batch
        pd.DataFrame({"doc_id": [0, 1], "text": [base, base]}),
        # batch 1: exact re-crawl of base (doc 2) dropped cross-batch;
        # novel doc 3 kept
        pd.DataFrame({"doc_id": [2, 3], "text": [base, other]}),
        # batch 2: near-dup of base (doc 4) — replay decides; novel-ish
        # re-crawl of other (doc 5) dropped cross-batch
        pd.DataFrame({"doc_id": [4, 5], "text": [nearA, other]}),
    ]
    for i, b in enumerate(batches):
        p = f"{src}/b{i}.parquet"
        b.to_parquet(p)
        os.utime(p, (time.time() + i, time.time() + i))

    q = neardup_docs_stream(
        spark,
        src,
        str(tmp_path / "nd_ck"),
        str(tmp_path / "nd_idx"),
        str(tmp_path / "nd_sink"),
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "nd_sink")).distinct().collect()
    }

    # sequential replay with the same band_rows + greedy rule
    index: set = set()
    expect: set = set()
    for b in batches:
        rows = band_rows(spark.createDataFrame(b)).collect()
        by_doc: dict = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append((r["band"], r["ba"], r["bb"]))
        bucket_min: dict = {}
        for d, bks in by_doc.items():
            for bk in bks:
                bucket_min[bk] = min(bucket_min.get(bk, d), d)
        survivors = [
            d
            for d, bks in by_doc.items()
            if all(bucket_min[bk] == d for bk in bks)
            and not any(bk in index for bk in bks)
        ]
        for d in survivors:
            index.update(by_doc[d])
        expect.update(survivors)

    assert got == expect
    assert 0 in got and 3 in got          # first-seen docs kept
    assert {1, 2, 5}.isdisjoint(got)      # exact copies dropped both ways


def test_streaming_decode_tails_snapshots(spark, webtext, tmp_path):
    """The decode consumer: drain 1 sees every committed row; after a
    new snapshot appends, drain 2 (same checkpoint) delivers ONLY the
    newly added rows, already decoded."""
    from pyrle_spark.plans.encode_job import EncodeConfig, encode_table
    from pyrle_spark.streaming.decode_stream import decode_stream

    table = str(tmp_path / "dec_tail")
    cp = str(tmp_path / "dec_cp")
    cfg = EncodeConfig(columns=["lang", "url"], block_rows=500)
    half = webtext.filter(F.col("doc_seq") < 2000)
    encode_table(spark, half, table, cfg)

    got: dict = {}

    def collect_batch(df, epoch):
        for r in df.select("_order", "lang", "url").collect():
            got[r["_order"]] = (r["lang"], r["url"])

    q = decode_stream(spark, table, cp, collect_batch)
    q.awaitTermination(120)
    assert set(got) == set(range(2000))
    src = {
        r["doc_seq"]: (r["lang"], r["url"])
        for r in webtext.select("doc_seq", "lang", "url").collect()
    }
    n = len(src)  # this module's webtext fixture is 3000 rows
    assert got == {k: src[k] for k in range(2000)}
    # snapshot 2 appends the rest; the tail delivers only the new rows
    encode_table(spark, webtext, table, cfg)
    got.clear()
    q2 = decode_stream(spark, table, cp, collect_batch)
    q2.awaitTermination(120)
    assert set(got) == set(range(2000, n))
    assert got == {k: src[k] for k in range(2000, n)}


def test_streaming_merge_cdc_apply(spark, webtext, tmp_path):
    """CDC apply: upserts and delete markers fold into the encoded table
    per micro-batch; per-batch version collapse picks the latest change
    per key; the checkpoint skips already-applied files on restart."""
    from pyrle_spark.plans.encode_job import EncodeConfig, encode_table
    from pyrle_spark.streaming.merge_stream import merge_stream

    src = str(tmp_path / "cdc_src")
    table = str(tmp_path / "cdc_table")
    cp = str(tmp_path / "cdc_cp")
    cols = ["url", "lang", "n_chars"]
    base = webtext.filter(F.col("doc_seq") < 1000).select(
        "doc_seq", "url", "lang", F.length("text").alias("n_chars")
    )
    encode_table(
        spark, base, table,
        EncodeConfig(columns=cols, order_col="doc_seq", block_rows=250),
    )
    # batch 1: two versions for keys 900..949 (v2 must win: n_chars=-2),
    # inserts for 1000..1049, no deletes
    upd = webtext.filter(
        (F.col("doc_seq") >= 900) & (F.col("doc_seq") < 950)
    ).select("url", "lang")
    b1 = (
        upd.withColumn("n_chars", F.lit(-1)).withColumn("version", F.lit(1))
        .union(upd.withColumn("n_chars", F.lit(-2)).withColumn("version", F.lit(2)))
        .union(
            webtext.filter(
                (F.col("doc_seq") >= 1000) & (F.col("doc_seq") < 1050)
            )
            .select("url", "lang", F.length("text").alias("n_chars"))
            .withColumn("version", F.lit(1))
        )
        .withColumn("is_delete", F.lit(False))
    )
    b1.repartition(1).write.mode("append").parquet(src)
    q = merge_stream(
        spark, src, table, on="url", checkpoint_dir=cp,
        version_col="version", delete_col="is_delete",
    )
    q.awaitTermination(180)
    dec = decode_table(spark, table).cache()
    assert dec.count() == 1050
    assert dec.filter("n_chars = -2").count() == 50  # v2 won
    assert dec.filter("n_chars = -1").count() == 0
    dec.unpersist()
    # batch 2: delete keys 0..24, update key 900 again
    dels = (
        webtext.filter(F.col("doc_seq") < 25)
        .select("url", "lang")
        .withColumn("n_chars", F.lit(0))
        .withColumn("version", F.lit(3))
        .withColumn("is_delete", F.lit(True))
    )
    one_upd = (
        webtext.filter(F.col("doc_seq") == 900)
        .select("url", "lang")
        .withColumn("n_chars", F.lit(-7))
        .withColumn("version", F.lit(3))
        .withColumn("is_delete", F.lit(False))
    )
    dels.union(one_upd).repartition(1).write.mode("append").parquet(src)
    q2 = merge_stream(
        spark, src, table, on="url", checkpoint_dir=cp,
        version_col="version", delete_col="is_delete",
    )
    q2.awaitTermination(180)
    dec2 = decode_table(spark, table).cache()
    assert dec2.count() == 1025
    assert dec2.filter("n_chars = -7").count() == 1
    assert dec2.filter("n_chars = -2").count() == 49
    n_snaps = len(IceTable(table).snapshots())
    dec2.unpersist()
    # restart with nothing new: checkpoint replays no file, no new commit
    q3 = merge_stream(
        spark, src, table, on="url", checkpoint_dir=cp,
        version_col="version", delete_col="is_delete",
    )
    q3.awaitTermination(120)
    assert len(IceTable(table).snapshots()) == n_snaps
    assert decode_table(spark, table).count() == 1025


def test_streaming_merge_versionless_duplicates(spark, tmp_path):
    """Without a version column, a micro-batch carrying several changes
    for one key (availableNow coalesces files) must still collapse
    deterministically instead of failing MERGE's cardinality check."""
    import time as _time

    from pyrle_spark.plans.encode_job import (
        EncodeConfig,
        decode_table,
        encode_table,
    )
    from pyrle_spark.streaming.merge_stream import merge_stream

    tbl = str(tmp_path / "vless_tbl")
    src = str(tmp_path / "vless_src")
    ckpt = str(tmp_path / "vless_ckpt")
    base = spark.createDataFrame(
        [(i, f"k{i}", i * 10) for i in range(8)], "doc_seq long, k string, v long"
    )
    encode_table(
        spark, base, tbl, EncodeConfig(columns=["k", "v"], block_rows=4)
    )
    # two change FILES, both touching k3 — one batch under availableNow
    spark.createDataFrame([("k3", 111), ("k9", 900)], "k string, v long").coalesce(
        1
    ).write.mode("append").parquet(src)
    spark.createDataFrame([("k3", 222)], "k string, v long").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = merge_stream(spark, src, tbl, on="k", checkpoint_dir=ckpt)
    q.awaitTermination(120)
    rows = {
        r["k"]: r["v"]
        for r in decode_table(spark, tbl).select("k", "v").collect()
    }
    assert rows["k9"] == 900  # insert applied
    assert rows["k3"] == 222  # deterministic winner: max over content order
    assert len(rows) == 9


def test_decode_stream_resolves_renames_and_widening(spark, tmp_path):
    """The streaming decoder reads touched blocks from the committed
    table, so renamed columns resolve through their alias and mixed-width
    blocks deliver at the widest promoted type."""
    from pyrle_spark.plans.encode_job import (
        EncodeConfig,
        encode_table,
        rename_column,
    )
    from pyrle_spark.streaming.decode_stream import decode_stream

    tbl = str(tmp_path / "dsr_tbl")
    ckpt = str(tmp_path / "dsr_ckpt")
    cfg = EncodeConfig(columns=["v"], order_col="seq", block_rows=256)
    df32 = spark.range(0, 512).select(
        F.col("id").alias("seq"),
        F.col("id").cast("int").alias("v"),
    )
    encode_table(spark, df32, tbl, cfg)
    full = spark.range(0, 1024).select(
        F.col("id").alias("seq"), F.col("id").cast("long").alias("v")
    )
    encode_table(spark, full, tbl, cfg)  # widens v to int64
    rename_column(spark, tbl, "v", "w")

    got = []

    def sink(df, epoch):
        got.extend(df.collect())

    q = decode_stream(spark, tbl, ckpt, sink)
    q.awaitTermination(120)
    assert got, "stream delivered nothing"
    assert "w" in got[0].asDict()  # logical name, through the alias
    vals = sorted(r["w"] for r in got)
    assert vals == list(range(1024))  # both generations, widened


def test_salting_null_hot_key(spark):
    """A NULL key above the hot threshold gets salted like any other hot
    key, and its salted keys cannot collide with real keys."""
    from pyrle_spark.plans.salting import with_salted_key

    df = spark.range(0, 10_000).select(
        F.col("id").alias("seq"),
        F.when(F.col("id") % 2 == 0, None).otherwise(
            (F.col("id") % 3).cast("string")
        ).alias("k"),
    )
    salted = with_salted_key(df, "k", "seq", rows_per_task=1000)
    null_keys = (
        salted.filter(F.col("k").isNull()).select("_salted_key").distinct().count()
    )
    assert null_keys >= 5  # 5000 null rows / 1000 per task
    overlap = (
        salted.filter(F.col("k").isNull())
        .select("_salted_key")
        .intersect(salted.filter(F.col("k").isNotNull()).select("_salted_key"))
        .count()
    )
    assert overlap == 0


def test_neardup_stream_short_docs_kept(spark, tmp_path):
    """Docs with fewer than 5 words produce no shingles: they must
    neither crash the band builder (sequence(1,0) counts DOWN in Spark)
    nor vanish from the sink — they collide with nothing and are kept."""
    from pyrle_spark.streaming.neardup_stream import neardup_docs_stream

    src = str(tmp_path / "nd_src")
    ckpt = str(tmp_path / "nd_ckpt")
    idx = str(tmp_path / "nd_idx")
    sink = str(tmp_path / "nd_sink")
    long_text = " ".join(f"w{i}" for i in range(40))
    spark.createDataFrame(
        [(1, long_text), (2, "tiny doc"), (3, ""), (4, long_text + " extra" * 0)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    q = neardup_docs_stream(spark, src, ckpt, idx, sink, max_files_per_trigger=10)
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in spark.read.parquet(sink).distinct().collect()}
    # 4 duplicates 1 (same shingles) and is dropped; short docs kept
    assert kept == {1, 2, 3}


def test_encode_stream_misaligned_batches(spark, tmp_path):
    """Micro-batch boundaries need not align to blocks: a batch whose
    rows extend a block the table holds only partially re-encodes the
    WHOLE block (prior fragment unioned in), so decode returns every row
    at the right position."""
    from pyrle_spark.plans.encode_job import EncodeConfig, decode_table
    from pyrle_spark.streaming.encode_stream import encode_stream

    src = str(tmp_path / "es_src")
    tbl = str(tmp_path / "es_tbl")
    ckpt = str(tmp_path / "es_ckpt")
    # file 1: rows 0-299 (block 0 partial); file 2: rows 300-799
    spark.range(0, 300).select(
        F.col("id").alias("doc_seq"), (F.col("id") * 3).alias("v")
    ).coalesce(1).write.mode("append").parquet(src)
    spark.range(300, 800).select(
        F.col("id").alias("doc_seq"), (F.col("id") * 3).alias("v")
    ).coalesce(1).write.mode("append").parquet(src)
    cfg = EncodeConfig(columns=["v"], block_rows=500)
    # one file per trigger: the second batch EXTENDS block 0's fragment
    q = encode_stream(spark, src, tbl, cfg, ckpt, max_files_per_trigger=1)
    q.awaitTermination(180)
    got = [r["v"] for r in decode_table(spark, tbl).orderBy("_order").collect()]
    assert got == [i * 3 for i in range(800)]


def test_dedup_stream_null_text(spark, tmp_path):
    """NULL text folds to the empty document instead of crashing the
    stateful group function with int(NaN)."""
    from pyrle_spark.streaming.dedup_stream import dedup_docs_stream

    src = str(tmp_path / "dn_src")
    ckpt = str(tmp_path / "dn_ckpt")
    spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, ""), (4, None)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    q = dedup_docs_stream(
        spark, src, ckpt, query_name="dn_q", max_files_per_trigger=10
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from dn_q").collect()
    kept = {r["doc_id"] for r in rows}
    assert 1 in kept
    # null and "" are the same (empty) document: exactly one keeper
    assert len(kept & {2, 3, 4}) == 1 and min(kept & {2, 3, 4}) == 2


def test_stream_windowed_counts_matches_oracle(spark, ducks):
    """The oracle-certified streaming query (streaming/queries.py): the
    complete-mode windowed aggregate's final table equals the batch
    GROUP BY, bit-exact (integer count/sum columns)."""
    from pyrle_spark.streaming.queries import ORACLE_SQL, stream_windowed_counts
    from tests.conftest import SF_SMALL

    got = sorted(
        tuple(r)
        for r in stream_windowed_counts(spark, SF_SMALL).collect()
    )
    exp = sorted(
        tuple(r)
        for r in ducks.sql(ORACLE_SQL["stream_windowed_counts"]).fetchall()
    )
    assert got == exp


def test_streaming_dedup_ttl_evicts_and_reemits(spark, tmp_path):
    """TTL-bounded dedup state over ONE continuous query: hashes idle
    past the TTL evict (in a later batch) and a re-crawl then re-emits;
    a hash re-seen inside its TTL stays dropped.  Runs with the default
    trigger — with availableNow, pending processing-time timers keep
    scheduling no-data batches and the query never terminates (pinned
    here by NOT using it)."""
    import os
    import time

    import pandas as pd

    from pyrle_spark.streaming.dedup_stream import dedup_docs_stream

    src = str(tmp_path / "docs_src")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    os.makedirs(src)
    pd.DataFrame({"doc_id": [0, 1], "text": ["alpha", "beta"]}).to_parquet(
        f"{src}/b0.parquet"
    )
    q = dedup_docs_stream(
        spark, src, ckpt, ttl_ms=3000, sink_dir=out, available_now=False
    )

    def sink_rows(minimum, timeout=90):
        t0 = time.time()
        while time.time() - t0 < timeout:
            try:
                pdf = spark.read.parquet(out).toPandas()
                if len(pdf) >= minimum:
                    return pdf
            except Exception:
                pass
            time.sleep(0.5)
        raise AssertionError(f"sink never reached {minimum} rows")

    try:
        sink_rows(2)  # alpha, beta emitted
        time.sleep(4.5)  # > TTL: their timers expire
        # gamma's batch evicts the expired alpha/beta and emits gamma
        pd.DataFrame({"doc_id": [2], "text": ["gamma"]}).to_parquet(
            f"{src}/b1.parquet"
        )
        sink_rows(3)
        # inside gamma's TTL: alpha re-emits (state evicted), the gamma
        # re-crawl is still dropped (state alive)
        pd.DataFrame({"doc_id": [3, 4], "text": ["alpha", "gamma"]}).to_parquet(
            f"{src}/b2.parquet"
        )
        got = sink_rows(4)
    finally:
        q.stop()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == [0, 1, 2, 3], got
    # exactly one gamma: had its state been evicted early, doc 4 would
    # have re-emitted and the count above would be 5
