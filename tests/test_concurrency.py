"""True multi-process concurrency for the table commit protocol.

The in-process tests exercise commit_lock's logic; these spawn real OS
processes contending on the same table directory — the shape two
uncoordinated Spark drivers (or a driver and a maintenance job) have in
production.  Verifies: (1) no lost updates under contention, (2) a
SIGKILLed lock holder cannot deadlock the table — exactly one waiter
breaks the stale lock and the rest proceed.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import signal
import time


def _contend(table_dir: str, idx: int, n_iters: int) -> None:
    from pyrle_spark.sources.icetable import commit_lock

    path = os.path.join(table_dir, "metadata", "counter.json")
    for _ in range(n_iters):
        with commit_lock(table_dir, timeout_s=60.0, stale_s=30.0):
            if os.path.exists(path):
                with open(path) as f:
                    cur = json.load(f)
            else:
                cur = {"n": 0, "by": {}}
            cur["n"] += 1
            cur["by"][str(idx)] = cur["by"].get(str(idx), 0) + 1
            tmp = f"{path}.tmp.{idx}"
            with open(tmp, "w") as f:
                json.dump(cur, f)
            os.replace(tmp, path)  # atomic publish, same as write_snapshot


def _hold_forever(table_dir: str, started) -> None:
    from pyrle_spark.sources.icetable import commit_lock

    with commit_lock(table_dir, timeout_s=60.0, stale_s=30.0):
        started.set()
        time.sleep(120)  # killed long before this returns


def test_commit_lock_no_lost_updates(tmp_path):
    """8 processes x 20 read-modify-write commits on one table: the
    counter must land at exactly 160 — a single lost update means two
    writers held the 'lock' at once."""
    table_dir = str(tmp_path / "t")
    os.makedirs(os.path.join(table_dir, "metadata"))
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_contend, args=(table_dir, i, 20)) for i in range(8)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    with open(os.path.join(table_dir, "metadata", "counter.json")) as f:
        cur = json.load(f)
    assert cur["n"] == 160
    assert sorted(cur["by"].items()) == [(str(i), 20) for i in range(8)]
    # the lock itself must be released (no leftover .commit.lock)
    assert not os.path.exists(
        os.path.join(table_dir, "metadata", ".commit.lock")
    )


def test_commit_lock_breaks_sigkilled_holder(tmp_path):
    """A holder killed with SIGKILL leaves a corpse lock; waiting
    committers must break it (after stale_s) instead of deadlocking,
    and still serialize correctly among themselves."""
    table_dir = str(tmp_path / "t")
    os.makedirs(os.path.join(table_dir, "metadata"))
    ctx = mp.get_context("spawn")
    started = ctx.Event()
    holder = ctx.Process(target=_hold_forever, args=(table_dir, started))
    holder.start()
    assert started.wait(timeout=60), "holder never acquired the lock"
    os.kill(holder.pid, signal.SIGKILL)
    holder.join(timeout=30)

    lock = os.path.join(table_dir, "metadata", ".commit.lock")
    assert os.path.exists(lock), "corpse lock should still be present"
    # age the corpse past the waiters' stale window
    old = time.time() - 3600
    os.utime(lock, (old, old))

    procs = [
        ctx.Process(target=_contend, args=(table_dir, i, 10)) for i in range(4)
    ]
    t0 = time.time()
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    assert time.time() - t0 < 110, "waiters took too long past a stale lock"
    with open(os.path.join(table_dir, "metadata", "counter.json")) as f:
        assert json.load(f)["n"] == 40


def test_concurrent_write_snapshot_appends(spark, tmp_path):
    """Two committers appending to the same table concurrently (separate
    threads, same contended file lock real drivers would use): both
    snapshots land on the main chain, no file list is lost, and the
    final read is the exact union of both writes."""
    from concurrent.futures import ThreadPoolExecutor

    from pyrle_spark.sources.icetable import IceTable

    t = IceTable(str(tmp_path / "t"))
    base = spark.range(0, 10).toDF("id")
    t.write_snapshot(base)

    def committer(lo: int) -> str:
        df = spark.range(lo, lo + 100).toDF("id")
        return t.write_snapshot(df, mode="append")

    with ThreadPoolExecutor(max_workers=2) as ex:
        f1 = ex.submit(committer, 1000)
        f2 = ex.submit(committer, 2000)
        s1, s2 = f1.result(timeout=120), f2.result(timeout=120)

    assert s1 != s2
    ids = [s["id"] for s in t.snapshots()]
    assert s1 in ids and s2 in ids and len(ids) == 3
    got = sorted(r[0] for r in t.read_table(spark).select("id").collect())
    assert got == sorted(
        list(range(0, 10)) + list(range(1000, 1100)) + list(range(2000, 2100))
    )
