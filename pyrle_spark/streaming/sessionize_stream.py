"""Stateful streaming sessionization with ARRIVAL-ORDER-INDEPENDENT
state, certified through Spark's state-store reader.

Gap-based sessionization looks inherently order-sensitive (a session is
"events until a 30-minute silence"), which is why naive streaming
implementations demand time-ordered input.  This module keeps, per
user, the set of gap-MERGEABLE SESSION FRAGMENTS ``(start_us, end_us,
n_events)`` instead: each micro-batch's events fold into fragments, and
two fragments merge whenever they sit within the gap of each other.
Fragment merging is associative and commutative — the sessionization
monoid — so the final state is identical no matter how the file stream
slices or reorders arrivals (the same idea behind Spark's own
``session_window`` state merge, rebuilt here on
``applyInPandasWithState`` where the merge rule is ours to define).

Certification closes the loop through the STATE STORE itself: the
query emits nothing downstream; after ``availableNow`` drains the
source, the final per-user fragment arrays are read back with
``spark.read.format("statestore")`` (Spark's state reader against the
checkpoint) and exploded into (user, session_seq, n_events, dur_us,
start_us) rows that must hash-equal the batch window-function oracle —
certifying the handler's merge algebra, the state encoding, and the
reader in one pass.

Scale shape: state per user is O(#sessions), the theoretical minimum
for exact sessionization under arbitrary arrival order; each batch
does one numpy sort + split per touched user, no per-row Python.  A
production deployment would emit-and-evict fragments older than the
watermark (they can never merge again once ``watermark - gap`` passes
their end); the certification configuration keeps everything so the
state reader sees the complete answer, and says so.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from pyrle_spark.functions.events import SESSION_GAP_US, _SESSIONIZE_SQL

_STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("ends", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
    ]
)
# the handler emits nothing — the answer lives in the state store
_OUT_SCHEMA = StructType([StructField("user_id", LongType())])


def _batch_fragments(ts_us: np.ndarray, gap_us: int) -> list[list[int]]:
    """One micro-batch's events → session fragments: sort, split where
    the inter-event gap exceeds ``gap_us``, emit (start, end, n) per
    segment — one vectorized pass, no per-row Python."""
    ts = np.sort(ts_us)
    cuts = np.flatnonzero(np.diff(ts) > gap_us) + 1
    bounds = np.concatenate(([0], cuts, [len(ts)]))
    return [
        [int(ts[a]), int(ts[b - 1]), int(b - a)]
        for a, b in zip(bounds[:-1], bounds[1:])
    ]


def _merge_fragments(frags: list[list[int]], gap_us: int) -> list[list[int]]:
    """Gap-tolerant interval union — the associative, commutative merge
    that makes the state arrival-order independent.  Fragments within
    ``gap_us`` of each other fuse (counts add); output sorted by start."""
    frags.sort()
    out: list[list[int]] = []
    for s, e, n in frags:
        if out and s <= out[-1][1] + gap_us:
            if e > out[-1][1]:
                out[-1][1] = e
            out[-1][2] += n
        else:
            out.append([s, e, n])
    return out


def _make_handler(gap_us: int):
    def handler(key, pdfs, state):
        frags: list[list[int]] = []
        if state.exists:
            st = state.get
            frags = [[a, b, c] for a, b, c in zip(st[0], st[1], st[2])]
        for pdf in pdfs:
            if len(pdf):
                ts_us = pdf["ts_us"].to_numpy(dtype=np.int64)
                frags.extend(_batch_fragments(ts_us, gap_us))
        frags = _merge_fragments(frags, gap_us)
        state.update(
            (
                [f[0] for f in frags],
                [f[1] for f in frags],
                [f[2] for f in frags],
            )
        )
        return iter(())  # nothing downstream; the state IS the result

    return handler


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events table as a multi-trigger file stream through
    the fragment-merging stateful handler, then read the final session
    state back via the state-store reader.  Must hash-equal the batch
    window-function sessionization (the shared duckdb oracle)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    src = tempfile.mkdtemp(prefix="sess_src_")
    ckpt = os.path.join(tempfile.mkdtemp(prefix="sess_ckpt_"), "cp")
    # time-sliced files are the realistic replay, but correctness does
    # NOT depend on it — the fragment merge is order-independent
    ev.repartitionByRange(4, "ts_us").write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts_us long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    grouped = stream.groupBy("user_id").applyInPandasWithState(
        _make_handler(SESSION_GAP_US),
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        grouped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    st = spark.read.format("statestore").load(ckpt)
    frag = st.select(
        F.col("key.user_id").alias("user_id"),
        F.posexplode(
            F.arrays_zip(
                F.col("value.groupState.starts").alias("start_us"),
                F.col("value.groupState.ends").alias("end_us"),
                F.col("value.groupState.ns").alias("n_events"),
            )
        ).alias("pos", "f"),
    )
    # fragments are stored start-sorted, so pos+1 is the session_seq the
    # batch oracle's cumulative is-new sum assigns
    return frag.select(
        "user_id",
        (F.col("pos") + 1).cast("long").alias("session_seq"),
        F.col("f.n_events").alias("n_events"),
        (F.col("f.end_us") - F.col("f.start_us")).alias("dur_us"),
        F.col("f.start_us").alias("start_us"),
    )


_STREAM_SESSIONIZE_SQL = _SESSIONIZE_SQL
