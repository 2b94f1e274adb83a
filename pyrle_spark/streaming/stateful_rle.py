"""Stateful streaming RLE: run-length encode an unbounded keyed stream.

The reference is batch/eager only (SURVEY §2.11); this extends its core
encode kernel (find_runs, /root/reference/pyrle/rle.py:34-64) to
Structured Streaming with ``applyInPandasWithState``: per key, the open
(possibly still growing) trailing run is the GroupState, so a run that
spans micro-batch boundaries is emitted once, with its full length —
exactly what the batch encoder would produce on the concatenated input.

Protocol per key:
- input rows ``(key, pos, value)``; within a key, positions arrive in
  order and contiguously (the file-source test drives one ordered file
  per micro-batch; a production job would repartition+sort upstream or
  carry a sequence column the same way the batch encoder's block order
  column does);
- a NaN value is the **flush sentinel**: it closes and emits the open
  run and clears the key's state (end-of-stream marker);
- a position gap closes the open run and starts a new one at the gap
  (the stream analog of a new block).

State is O(1) per key — ``(value, run_len, start_pos, next_pos)`` —
regardless of stream length; batch work is the vectorized find_runs
kernel plus an O(runs) emission loop (runs ≪ rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyrle_spark.kernels.rlecore import find_runs

__all__ = ["rle_runs_stream", "OUTPUT_SCHEMA", "STATE_SCHEMA"]

OUTPUT_SCHEMA = "key string, start_pos long, run_len long, value double"
STATE_SCHEMA = "value double, run_len long, start_pos long, next_pos long"


def _update_key(key, pdfs, state):
    (key_,) = key
    if state.exists:
        s_val, s_run, s_start, s_next = state.get
        open_run = True
    else:
        s_val, s_run, s_start, s_next = 0.0, 0, 0, None
        open_run = False
    out_start: list = []
    out_run: list = []
    out_val: list = []

    def emit(start, run, val):
        out_start.append(start)
        out_run.append(run)
        out_val.append(val)

    # Concatenate ALL chunks of this batch before encoding: with
    # maxFilesPerTrigger > 1 a key's rows can arrive split across (and
    # interleaved between) pandas chunks, and per-chunk sorting would
    # mis-order them.  One sort over the whole batch restores the protocol.
    frames = [pdf for pdf in pdfs if len(pdf)]
    if frames:
        pdf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        pdf = pdf.sort_values("pos")
        pos = pdf["pos"].to_numpy(np.int64)
        vals = pdf["value"].to_numpy(np.float64)
        flush = np.isnan(vals)
        flushed = bool(flush.any())
        if flushed:
            # sentinel closes the stream for this key; ignore rows after it
            cut = int(np.argmax(flush))
            pos, vals = pos[:cut], vals[:cut]
        if len(vals):
            # A position gap INSIDE the batch also closes the open run
            # (docstring rule): split at non-contiguous steps and encode
            # each contiguous segment independently — same semantics as a
            # new-block boundary in the batch encoder.
            seg_bounds = np.flatnonzero(np.diff(pos) != 1) + 1
            for seg_pos, seg_vals in zip(
                np.split(pos, seg_bounds), np.split(vals, seg_bounds)
            ):
                runs, rvals = find_runs(seg_vals)
                starts = seg_pos[0] + np.concatenate(([0], np.cumsum(runs[:-1])))
                for i in range(len(runs)):
                    r, v, st = int(runs[i]), float(rvals[i]), int(starts[i])
                    if open_run and st == s_next and v == s_val:
                        s_run += r
                        s_next += r
                        continue
                    if open_run:
                        emit(s_start, s_run, s_val)
                    s_val, s_run, s_start, s_next = v, r, st, st + r
                    open_run = True
        if flushed:
            if open_run:
                emit(s_start, s_run, s_val)
            open_run = False
    if open_run:
        state.update((float(s_val), int(s_run), int(s_start), int(s_next)))
    else:
        if state.exists:
            state.remove()
    if out_start:
        yield pd.DataFrame(
            {
                "key": key_,
                "start_pos": out_start,
                "run_len": out_run,
                "value": out_val,
            }
        )


def rle_runs_stream(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "rle_runs",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Start the stateful streaming encoder over a parquet file source of
    ``(key string, pos long, value double)`` rows; completed runs land in
    the in-memory sink table ``query_name``.  Returns the StreamingQuery.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = "key string, pos long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    encoded = stream.groupBy("key").applyInPandasWithState(
        _update_key,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        encoded.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
