"""Streaming exact deduplication: emit each distinct document once,
across micro-batches, with O(1) state per distinct content hash.

The batch engine's ``dedup_exact`` (functions/dedup.py) groups the whole
corpus; a training-data INGEST pipeline instead sees documents arrive
continuously and must drop re-crawls immediately.  Structured-Streaming
shape: group by content hash, ``applyInPandasWithState`` keeps one
``seen`` flag (plus the keeper doc_id) per hash — a new hash emits its
first document (min doc_id within the batch, matching ``dedup_exact``'s
keeper convention) and flips the flag; every later arrival of the same
hash, in the same batch or any later one, is dropped.

State is the reason this scales: per KEY (distinct content), not per
document — the hot path (exact re-crawls) adds zero state.  Near-dup
streaming would bucket by a MinHash band instead of the full hash and
verify within the group; the plumbing is identical.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["dedup_docs_stream", "OUTPUT_SCHEMA", "STATE_SCHEMA"]

OUTPUT_SCHEMA = "text_hash string, doc_id long, n_chars long"
STATE_SCHEMA = "keep_doc_id long"


def _update_hash(key, pdfs, state):
    (text_hash,) = key
    best = None
    for pdf in pdfs:  # drain the iterator either way
        if not len(pdf):
            continue
        i = pdf["doc_id"].idxmin()
        row = (int(pdf["doc_id"].loc[i]), int(pdf["n_chars"].loc[i]))
        if best is None or row < best:
            best = row
    if state.exists or best is None:
        return  # hash already emitted in an earlier batch: drop everything
    state.update((best[0],))
    yield pd.DataFrame(
        {"text_hash": [text_hash], "doc_id": [best[0]], "n_chars": [best[1]]}
    )


def _make_update_ttl(ttl_ms: int):
    """TTL variant of the state function: every touch (emit or drop)
    re-arms a processing-time timeout; a key idle past the TTL is
    evicted in the next batch where it receives no data (Spark invokes
    timed-out keys only when they have no new rows — a duplicate
    arriving in the same batch as its expiry is therefore still
    dropped, which is the conservative side of the approximation)."""

    def _update(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        (text_hash,) = key
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            i = pdf["doc_id"].idxmin()
            row = (int(pdf["doc_id"].loc[i]), int(pdf["n_chars"].loc[i]))
            if best is None or row < best:
                best = row
        if state.exists:
            state.setTimeoutDuration(ttl_ms)  # sliding TTL: refresh on touch
            return
        if best is None:
            return
        state.update((best[0],))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "text_hash": [text_hash],
                "doc_id": [best[0]],
                "n_chars": [best[1]],
            }
        )

    return _update


def dedup_docs_stream(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "dedup_docs",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    ttl_ms: int | None = None,
    sink_dir: str | None = None,
):
    """Start the streaming deduper over a parquet file source of
    ``(doc_id long, text string)`` rows; first-seen documents land in the
    in-memory sink table ``query_name``.  Returns the StreamingQuery.

    ``ttl_ms``: optional sliding processing-time TTL on the per-hash
    state.  Unbounded ingest cannot keep O(distinct-ever) state; with a
    TTL the state is O(distinct within the window) and a re-crawl seen
    again after the window re-emits — the standard production trade
    (dedup exactness bounded by the TTL horizon).  Default None keeps
    the exact NoTimeout behavior.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    # NULL text folds to the empty document: md5(NULL) would make a NULL
    # hash group whose NULL n_chars turns into NaN in pandas and crashes
    # int() inside the state function
    text = F.coalesce(F.col("text"), F.lit(""))
    hashed = stream.select(
        F.md5(F.encode(text, "utf-8")).alias("text_hash"),
        "doc_id",
        F.length(text).cast("long").alias("n_chars"),
    )
    deduped = hashed.groupBy("text_hash").applyInPandasWithState(
        _update_hash if ttl_ms is None else _make_update_ttl(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
    if sink_dir is not None:
        # durable sink: unlike the memory sink it RECOVERS from the
        # checkpoint, so stop/restart cycles (TTL eviction tests, ops
        # restarts) accumulate output exactly-once across runs
        writer = (
            deduped.writeStream.format("parquet")
            .option("path", sink_dir)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
        )
    else:
        writer = (
            deduped.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
        )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
