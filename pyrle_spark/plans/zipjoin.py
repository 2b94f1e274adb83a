"""Positional zip join of two encoded tables — co-located join in the
compressed domain.

Two tables encoded over the SAME order domain (e.g. the text table and
an embeddings/features table keyed by the same ``doc_seq``) are the
columnar analog of a bucketed co-located join: ``block_id`` is the
bucket, both sides are already laid out by it, and a positional
``JOIN ON a._order = b._order`` needs no row shuffle at all — only the
(pre-compressed) block buffers move, once, to meet their partner block.

Contrast with ``decode_table(a).join(decode_table(b), "_order")``: that
plan decodes BOTH tables to full-width rows, exchanges them on
``_order``, and sorts both sides for the merge join (or leans on AQE to
broadcast a narrow side).  Here the shuffle key is ``block_id`` (one
row per block×column, carrying the compressed buffers), each task
decodes one block of each side and zips the arrays by position — no
row-level exchange, no sort, no join-strategy gamble.  The shuffle is
bounded by the CODEC-compressed size; measured honestly (see
``BENCH/BASELINE.md``), the byte win over decode+join is modest on this
synthetic corpus because shuffle-level LZ4 also compresses the decoded
rows — the structural win is skipping the decode-before-shuffle and the
O(n log n) sort, and keeping parallelism = #blocks regardless of
cluster join heuristics.

Inner-join semantics on position: blocks present in only one table are
skipped, a shorter tail block truncates its partner, and merge-on-read
deletes of EITHER side exclude the position.  This generalizes the
reference's run-aligned "zip join" (SURVEY §2.3: two sorted run
sequences merged positionally, src/rle.pyx:41-72) from two Rles to two
whole tables.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pyrle_spark.codecs import Encoded, decode_array
from pyrle_spark.codecs.base import str_to_type
from pyrle_spark.plans.encode_job import (
    _delete_positions,
    _spark_type_of,
    _widest_type,
    dedup_blocks,
    physical_column,
)
from pyrle_spark.sources.icetable import IceTable

__all__ = ["zip_tables"]


def _side_plan(spark, table_dir, columns, snapshot_id):
    """(enc block rows tagged with physical→logical rename, logical cols,
    logical→widest-arrow-type map, block_rows) for one side."""
    table = IceTable(table_dir)
    props = table.properties(snapshot_id)
    cols = sorted(columns or props["columns"])
    unknown = [c for c in cols if c not in props["columns"]]
    if unknown:
        raise KeyError(
            f"{table_dir}: columns {unknown} not available "
            f"(have {sorted(props['columns'])})"
        )
    phys_of = {c: physical_column(table, c, snapshot_id) for c in cols}
    rename = {p: c for c, p in phys_of.items() if p != c}
    enc = dedup_blocks(
        table.read_table(spark, snapshot_id).filter(
            F.col("column").isin(sorted(phys_of.values()))
        )
    )
    type_rows = enc.select("column", "arrow_type").distinct().collect()
    by_col: dict = {}
    for r in type_rows:
        by_col.setdefault(rename.get(r["column"], r["column"]), set()).add(
            r["arrow_type"]
        )
    types = {c: _widest_type(c, ts) for c, ts in by_col.items()}
    missing = [c for c in cols if c not in types]
    if missing:
        raise KeyError(f"{table_dir}: columns {missing} have no blocks")
    return enc, cols, rename, types, int(props["block_rows"])


def zip_tables(
    spark: SparkSession,
    dir_a: str,
    dir_b: str,
    columns_a: list | None = None,
    columns_b: list | None = None,
    suffix_b: str = "_b",
    snapshot_a: str | None = None,
    snapshot_b: str | None = None,
) -> DataFrame:
    """``SELECT … FROM a JOIN b ON a._order = b._order`` with the
    shuffle carrying compressed block buffers instead of decoded rows.

    Both tables must share ``block_rows`` (same block span over the same
    order domain).  Output columns: ``_order`` + ``columns_a`` +
    ``columns_b`` (a b-column whose name collides with an a-column gets
    ``suffix_b``).  Rename aliases resolve per side; mixed-width blocks
    decode at their widest promoted type, as in ``decode_table``."""
    enc_a, cols_a, ren_a, types_a, br_a = _side_plan(
        spark, dir_a, columns_a, snapshot_a
    )
    enc_b, cols_b, ren_b, types_b, br_b = _side_plan(
        spark, dir_b, columns_b, snapshot_b
    )
    if br_a != br_b:
        raise ValueError(
            f"block_rows mismatch: {dir_a} has {br_a}, {dir_b} has {br_b}; "
            "positional zip needs identical block spans"
        )
    out_b = {c: (c + suffix_b if c in cols_a else c) for c in cols_b}
    if len({*cols_a, *out_b.values()}) != len(cols_a) + len(cols_b):
        raise ValueError("suffix_b still collides; pick another suffix")

    keep = ["block_id", "column", "codec", "arrow_type", "n_rows", "meta", "buffers"]
    tagged = enc_a.select(F.lit(0).alias("_side"), *keep).unionByName(
        enc_b.select(F.lit(1).alias("_side"), *keep)
    )
    # ONE hash shuffle on block_id moves compressed buffers to their
    # partner block; no row-level exchange exists anywhere in the plan
    tagged = tagged.repartition("block_id").sortWithinPartitions(
        "block_id", "_side", "column"
    )

    # logical name per (side, physical name); types per output name
    out_types = {c: types_a[c] for c in cols_a}
    out_types.update({out_b[c]: types_b[c] for c in cols_b})
    schema = ", ".join(
        ["_order long"]
        + [f"{c} {_spark_type_of(out_types[c])}" for c in cols_a]
        + [f"{out_b[c]} {_spark_type_of(out_types[out_b[c]])}" for c in cols_b]
    )
    n_a, n_b = len(cols_a), len(cols_b)
    block_rows = br_a

    def zip_stream(batches):
        cur = None
        pending: dict = {}

        def flush(bid, rows):
            sides: dict = {0: {}, 1: {}}
            for (side, pname), e in rows.items():
                ren = ren_a if side == 0 else ren_b
                logical = ren.get(pname, pname)
                if side == 1:
                    logical = out_b.get(logical, logical)
                arr = decode_array(e)
                target = out_types.get(logical)
                if target is not None and str(arr.type) != target:
                    arr = arr.cast(str_to_type(target))
                sides[side][logical] = arr
            if len(sides[0]) != n_a or len(sides[1]) != n_b:
                return None  # block missing from one side: inner join drops it
            # a shorter tail block truncates its partner (inner on position)
            n = min(
                len(a) for s in (sides[0], sides[1]) for a in s.values()
            )
            if n == 0:
                return None
            order = pa.array(np.arange(n, dtype=np.int64) + bid * block_rows)
            names = ["_order"] + cols_a + [out_b[c] for c in cols_b]
            arrays = [order]
            for c in cols_a:
                arrays.append(sides[0][c].slice(0, n))
            for c in cols_b:
                arrays.append(sides[1][out_b[c]].slice(0, n))
            return pa.RecordBatch.from_arrays(arrays, names=names)

        for batch in batches:
            for row in batch.to_pylist():
                bid = row["block_id"]
                if bid != cur:
                    if cur is not None and pending:
                        out = flush(cur, pending)
                        if out is not None:
                            yield out
                    cur = bid
                    pending = {}
                pending[(row["_side"], row["column"])] = Encoded(
                    codec=row["codec"],
                    arrow_type=row["arrow_type"],
                    n_rows=row["n_rows"],
                    meta=json.loads(row["meta"]),
                    buffers=dict(row["buffers"]),
                )
        if cur is not None and pending:
            out = flush(cur, pending)
            if out is not None:
                yield out

    out = tagged.mapInArrow(zip_stream, schema)
    # inner semantics under MoR: a position deleted on EITHER side drops
    deleted = set(_delete_positions(dir_a, snapshot_a)) | set(
        _delete_positions(dir_b, snapshot_b)
    )
    if deleted:
        dels = spark.createDataFrame(
            [(int(p),) for p in sorted(deleted)], "_order long"
        )
        out = out.join(F.broadcast(dels), "_order", "left_anti")
    return out
