"""Kill/rerun resume test: SIGKILL a chunked encode mid-flight, rerun,
verify the table completes with no duplicate or missing blocks — the
north rule's 'resumable from checkpoint' property, exercised for real."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import sys
sys.path.insert(0, sys.argv[4])
from pyrle_spark.session import get_spark
from pyrle_spark.plans.encode_job import EncodeConfig, encode_table
from pyrle_spark.sources.webtext import generate_webtext

spark = get_spark("killme", cpus=4, shuffle_partitions=4)
wt = generate_webtext(spark, int(sys.argv[2]), n_hosts=20)
encode_table(spark, wt, sys.argv[1],
             EncodeConfig(columns=["url", "lang"], block_rows=500,
                          blocks_per_pass=int(sys.argv[3])))
print("WORKER_DONE", flush=True)
"""

N_ROWS = 6000  # 12 blocks of 500


@pytest.mark.slow
def test_kill_mid_encode_then_resume(tmp_path, spark):
    out = str(tmp_path / "enc")
    proc = subprocess.Popen(
        [sys.executable, "-c", WORKER, out, str(N_ROWS), "2", REPO],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    # wait until at least one snapshot committed, then SIGKILL
    meta = os.path.join(out, "metadata", "metadata.json")
    deadline = time.time() + 240
    while time.time() < deadline:
        if os.path.exists(meta):
            break
        if proc.poll() is not None:
            break
        time.sleep(0.5)
    killed = proc.poll() is None
    if killed:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    assert os.path.exists(meta), "no snapshot committed before kill"

    from pyrle_spark.plans.encode_job import (
        EncodeConfig,
        decode_table,
        encode_table,
        verify_checksums,
    )
    from pyrle_spark.sources.icetable import IceTable
    from pyrle_spark.sources.webtext import generate_webtext

    snaps_before = len(IceTable(out).snapshots())
    wt = generate_webtext(spark, N_ROWS, n_hosts=20)
    summary = encode_table(
        spark,
        wt,
        out,
        EncodeConfig(columns=["url", "lang"], block_rows=500, blocks_per_pass=2),
    )
    if killed:
        # the rerun must have skipped the committed blocks
        assert summary["resumed_committed_blocks"] >= snaps_before * 2 - 2
    dec = decode_table(spark, out)
    assert dec.count() == N_ROWS
    assert dec.select("_order").distinct().count() == N_ROWS
    assert verify_checksums(spark, out)["bad"] == 0


REWRITE_WORKER = """
import sys
sys.path.insert(0, sys.argv[4])
from pyrle_spark.session import get_spark
from pyrle_spark.plans.encode_job import rewrite_sorted

spark = get_spark("killme_rw", cpus=4, shuffle_partitions=4)
rewrite_sorted(spark, sys.argv[1], sys.argv[2], ["lang"],
               sub_rows=int(sys.argv[3]))
print("WORKER_DONE", flush=True)
"""


@pytest.mark.slow
def test_kill_mid_rewrite_then_resume(tmp_path, spark):
    """SIGKILL a layout rewrite mid-encode, then rerun it: the
    deterministic two-pass rank reproduces identical _seq values, so the
    encode resume completes the SAME sorted table — byte-identical to a
    never-killed rewrite."""
    from pyrle_spark.plans.encode_job import (
        EncodeConfig,
        decode_table,
        encode_table,
        rewrite_sorted,
        verify_checksums,
    )
    from pyrle_spark.sources.icetable import IceTable
    from pyrle_spark.sources.webtext import generate_webtext

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ref = str(tmp_path / "ref")
    wt = generate_webtext(spark, N_ROWS, n_hosts=20)
    encode_table(
        spark, wt, src, EncodeConfig(columns=["url", "lang"], block_rows=500)
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", REWRITE_WORKER, src, dst, "512", REPO],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    meta = os.path.join(dst, "metadata", "metadata.json")
    deadline = time.time() + 240
    while time.time() < deadline:
        if os.path.exists(meta) or proc.poll() is not None:
            break
        time.sleep(0.25)
    killed = proc.poll() is None
    if killed:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    # rerun the rewrite; a stale commit lock from the kill must break
    rewrite_sorted(spark, src, dst, ["lang"], sub_rows=512)
    # reference: the same rewrite, never killed
    rewrite_sorted(spark, src, ref, ["lang"], sub_rows=512)
    from pyrle_spark.plans.encode_job import dedup_blocks

    sig_of = lambda d: {  # noqa: E731
        (r["block_id"], r["column"]): (r["crc32"], r["n_rows"])
        for r in dedup_blocks(IceTable(d).read_table(spark))
        .select("block_id", "column", "crc32", "n_rows")
        .collect()
    }
    assert sig_of(dst) == sig_of(ref)
    assert decode_table(spark, dst).count() == N_ROWS
    assert verify_checksums(spark, dst)["bad"] == 0


STREAM_WORKER = """
import sys, time
sys.path.insert(0, sys.argv[3])
from pyrle_spark.session import get_spark
from pyrle_spark.sources.datasource import register
from pyrle_spark.streaming.mirror import mirror_encoded

spark = get_spark("killstream", cpus=4, shuffle_partitions=4)
register(spark)
q = mirror_encoded(spark, sys.argv[1], sys.argv[2],
                   sys.argv[2] + "_ck", available_now=False)
q.awaitTermination(600)
"""


@pytest.mark.slow
def test_kill_mid_stream_mirror_then_resume(tmp_path, spark):
    """SIGKILL the streaming mirror mid-flight, rerun on the same
    checkpoint: the mirror must converge to decode-identical with no
    duplicate micro-batch commits (exactly-once metadata through a real
    crash, not just the in-process replay path)."""
    from pyspark.sql import functions as F

    from pyrle_spark.sources.datasource import register
    from pyrle_spark.sources.icetable import IceTable
    from pyrle_spark.sources.webtext import generate_webtext
    from pyrle_spark.streaming.mirror import mirror_encoded

    register(spark)
    BR = 512
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    rows = generate_webtext(spark, 3 * BR, n_hosts=9, block_rows=BR)
    for lo in (0, BR, 2 * BR):  # three source snapshots
        (
            rows.filter((F.col("doc_seq") >= lo) & (F.col("doc_seq") < lo + BR))
            .repartition(1)
            .sortWithinPartitions("doc_seq")
            .write.format("pyrle")
            .option("order_col", "doc_seq")
            .option("block_rows", str(BR))
            .mode("append")
            .save(src)
        )

    proc = subprocess.Popen(
        [sys.executable, "-c", STREAM_WORKER, src, dst, REPO],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    # wait for the mirror's first commit, then SIGKILL the whole driver
    meta = os.path.join(dst, "metadata", "metadata.json")
    deadline = time.time() + 240
    while time.time() < deadline:
        if os.path.exists(meta) or proc.poll() is not None:
            break
        time.sleep(0.5)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    assert os.path.exists(meta), "no mirror snapshot committed before kill"

    # rerun on the SAME checkpoint: drains whatever the kill left behind
    q = mirror_encoded(spark, src, dst, dst + "_ck")
    q.awaitTermination(240)
    assert not q.isActive

    a = spark.read.format("pyrle").load(src).orderBy("_order").toPandas()
    b = spark.read.format("pyrle").load(dst).orderBy("_order").toPandas()
    assert len(b) == 3 * BR
    for c in a.columns:
        assert (a[c].values == b[c].values).all(), c

    # exactly-once metadata: every committed micro-batch id is unique
    t = IceTable(dst)
    ids = [
        t.properties(s["id"]).get("stream_batch_id")
        for s in t.snapshots()
    ]
    ids = [i for i in ids if i is not None]
    assert len(ids) == len(set(ids)), f"duplicate micro-batch commits: {ids}"
