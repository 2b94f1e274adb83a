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


def dedup_docs_stream(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "dedup_docs",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Start the streaming deduper over a parquet file source of
    ``(doc_id long, text string)`` rows; first-seen documents land in the
    in-memory sink table ``query_name``.  Returns the StreamingQuery.
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
        _update_hash,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
