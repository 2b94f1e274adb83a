"""Block-level inverted text index over an encoded table.

Keyword search is the one common webtext query the zone-map/bloom
pruning family can't serve: ``text`` zones are useless (every block's
[zmin, zmax] string range contains everything) and bloom digests hold
whole values, not words.  This module adds the classic IR answer,
shaped for the block store:

- **Granularity is the block, not the row.**  A posting list maps
  ``token → sorted block_ids``.  Blocks are the decode unit, so finer
  postings buy nothing; coarser postings keep the index a metadata-sized
  side table (vocabulary × a few bytes) instead of a second copy of the
  corpus.  This is the same data-skipping contract as
  ``prune_blocks``/``prune_blocks_eq`` — the index answers "which blocks
  can contain this word", decode answers the rest exactly.
- **Posting lists are compressed with the engine's own codecs**
  (``encode_payload_auto``: delta → frame-of-reference → bit-pack for
  sorted int64 runs — the textbook postings layout, e.g. Lucene's
  FOR-delta blocks), so the index exercises the codec suite on its own
  metadata.
- **Search = O(#terms) pushed-down index lookups + decode of surviving
  blocks.**  AND intersects driver-side (lists are tiny), OR unions; an
  exact row-level re-check runs on the decoded survivors, so results
  are exact even though the index is block-granular.
- **Staleness is conservative, never wrong**: the index records the
  snapshot it was built at; blocks that exist at query time but not in
  the indexed snapshot are ALWAYS candidates (new appends are searched
  by decode until the index is rebuilt), and row-level deletes apply at
  decode time as usual.

Tokenization is ``lower(text)`` split on ``[^a-z0-9]+`` — deliberately
simple and shared verbatim between build, query re-check, and the
duckdb oracle, so "match" means the same thing everywhere.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pyrle_spark.codecs import Encoded, decode_array, encode_payload_auto
from pyrle_spark.plans.encode_job import (
    decode_table,
    dedup_blocks,
    physical_column,
)
from pyrle_spark.sources.icetable import IceTable

__all__ = ["build_text_index", "search_text", "prune_blocks_text"]

_TOKEN_RE = "[^a-z0-9]+"

_POSTINGS_SPARK_SCHEMA = (
    "token string, codec string, arrow_type string, meta string, "
    "buffers map<string,binary>, n_blocks long"
)
_POSTINGS_PA_SCHEMA = pa.schema(
    [
        ("token", pa.string()),
        ("codec", pa.string()),
        ("arrow_type", pa.string()),
        ("meta", pa.string()),
        ("buffers", pa.map_(pa.string(), pa.binary())),
        ("n_blocks", pa.int64()),
    ]
)


def _tokens_col(column: str):
    return F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(column)), _TOKEN_RE),
            lambda t: F.length(t) > 0,
        )
    )


def _pack_postings(batches):
    """Arrow pass: one row per token in, one encoded posting list out.
    The per-token loop is over the VOCABULARY (not rows), and each
    posting list encodes vectorized (numpy delta/bitpack kernels)."""
    for batch in batches:
        tokens = batch.column("token").to_pylist()
        postings = batch.column("postings").to_pylist()
        rows = {k: [] for k in _POSTINGS_PA_SCHEMA.names}
        for tok, blocks in zip(tokens, postings):
            arr = np.asarray(sorted(blocks), dtype=np.int64)
            enc = encode_payload_auto("fixed", arr, None, "int64", len(arr))
            rows["token"].append(tok)
            rows["codec"].append(enc.codec)
            rows["arrow_type"].append(enc.arrow_type)
            rows["meta"].append(json.dumps(enc.meta))
            rows["buffers"].append(list(enc.buffers_as_bytes().items()))
            rows["n_blocks"].append(len(arr))
        yield pa.RecordBatch.from_pydict(rows, schema=_POSTINGS_PA_SCHEMA)


def build_text_index(
    spark: SparkSession, table_dir: str, column: str = "text"
) -> dict:
    """Build (or rebuild) the inverted index for ``column`` at the
    current snapshot.

    One distributed pass: decode the column (streaming mapInArrow —
    deletes NOT applied, the index is block-physical), tokenize in
    codegen, distinct ``(token, block_id)``, group to posting lists,
    encode each list with the codec auto-selector in an Arrow stage.
    Shuffle cost: one hash aggregation on token — the classic
    scale-out inverted-index build.

    Returns ``{"n_tokens", "n_postings", "snapshot_id", "path"}``."""
    table = IceTable(table_dir)
    snap = table.current_snapshot_id()
    props = table.properties()
    block_rows = int(props["block_rows"])
    dec = decode_table(spark, table_dir, columns=[column], apply_deletes=False)
    pairs = (
        dec.select(
            (F.col("_order") / block_rows).cast("long").alias("block_id"),
            F.explode(_tokens_col(column)).alias("token"),
        )
        .distinct()
    )
    grouped = pairs.groupBy("token").agg(
        F.sort_array(F.collect_set("block_id")).alias("postings")
    )
    packed = grouped.mapInArrow(_pack_postings, _POSTINGS_SPARK_SCHEMA)
    idx_dir = os.path.join(table_dir, "index", column)
    out_dir = os.path.join(idx_dir, f"v-{int(time.time() * 1000):x}-{uuid.uuid4().hex[:8]}")
    packed.write.mode("errorifexists").parquet(out_dir)
    stats = spark.read.parquet(out_dir).agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("n_blocks").alias("n_postings")
    ).first()
    manifest = {
        "column": column,
        "snapshot_id": snap,
        "block_rows": block_rows,
        "data_dir": out_dir,
        "n_tokens": int(stats["n_tokens"]),
        "n_postings": int(stats["n_postings"] or 0),
        "tokenizer": _TOKEN_RE,
    }
    # atomic pointer flip, same discipline as table metadata commits
    tmp = os.path.join(idx_dir, f".manifest.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(idx_dir, "manifest.json"))
    return {
        "n_tokens": manifest["n_tokens"],
        "n_postings": manifest["n_postings"],
        "snapshot_id": snap,
        "path": out_dir,
    }


def _read_index_manifest(table_dir: str, column: str) -> dict:
    p = os.path.join(table_dir, "index", column, "manifest.json")
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"no text index for column {column!r} in {table_dir}; "
            "run build_text_index first"
        )
    with open(p) as f:
        return json.load(f)


def _decode_postings(row) -> set[int]:
    enc = Encoded(
        codec=row["codec"],
        arrow_type=row["arrow_type"],
        n_rows=int(row["n_blocks"]),
        meta=json.loads(row["meta"]),
        buffers=dict(row["buffers"]),
    )
    return set(int(b) for b in decode_array(enc).to_pylist())


def prune_blocks_text(
    spark: SparkSession,
    table_dir: str,
    terms: list[str],
    mode: str = "all",
    column: str = "text",
) -> tuple[set[int], dict]:
    """Candidate block_ids for the term set via the index (superset
    contract) plus search metadata.  Terms are tokenized with the index
    tokenizer; a multi-word term contributes each of its words."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode={mode!r}")
    import re

    manifest = _read_index_manifest(table_dir, column)
    words = []
    for t in terms:
        words.extend(w for w in re.split(_TOKEN_RE, t.lower()) if w)
    if not words:
        raise ValueError("no searchable words in terms")
    idx = (
        spark.read.parquet(manifest["data_dir"])
        .filter(F.col("token").isin(words))  # pushed to the parquet scan
        .collect()
    )
    by_token = {r["token"]: _decode_postings(r) for r in idx}
    sets = [by_token.get(w, set()) for w in set(words)]
    if mode == "all":
        cand = set.intersection(*sets) if sets else set()
    else:
        cand = set.union(*sets) if sets else set()
    # staleness: blocks live NOW but unknown to the indexed snapshot are
    # always candidates (appends since the build must still be searched)
    table = IceTable(table_dir)
    cur = table.current_snapshot_id()
    if cur != manifest["snapshot_id"]:
        # block rows carry PHYSICAL names: resolve rename aliases per
        # snapshot, or a renamed column would look like zero blocks.
        # Staleness must compare block CONTENT, not just ids: an append
        # into a partial tail block re-encodes it under the SAME
        # block_id (with more rows / a new crc), and rows added that way
        # would otherwise be invisible to search.
        def _block_sigs(snap_id, phys):
            return {
                r["block_id"]: (r["n_rows"], r["crc32"])
                for r in dedup_blocks(table.read_table(spark, snap_id))
                .filter(F.col("column") == phys)
                .select("block_id", "n_rows", "crc32")
                .collect()
            }

        now_sigs = _block_sigs(None, physical_column(table, column))
        then_sigs = _block_sigs(
            manifest["snapshot_id"],
            physical_column(table, column, manifest["snapshot_id"]),
        )
        cand |= {
            b for b, sig in now_sigs.items() if then_sigs.get(b) != sig
        }
    return cand, {"words": sorted(set(words)), "manifest": manifest}


def search_text(
    spark: SparkSession,
    table_dir: str,
    terms: list[str],
    mode: str = "all",
    column: str = "text",
    extra_columns: list[str] | None = None,
) -> DataFrame:
    """Exact keyword search: index-pruned block decode + row re-check.

    ``mode="all"``: rows whose tokenized ``column`` contains EVERY word;
    ``"any"``: at least one.  Returns ``_order`` plus the text column
    (plus ``extra_columns``); deletes visible at the current snapshot
    are applied by decode as usual."""
    cand, info = prune_blocks_text(spark, table_dir, terms, mode, column)
    cols = [column] + list(extra_columns or [])
    # an empty candidate set still flows through decode: the semi-join
    # yields zero rows with the exact decoded schema
    blocks_df = spark.createDataFrame(
        [(int(b),) for b in sorted(cand)], "block_id long"
    )
    dec = decode_table(spark, table_dir, columns=cols, blocks=blocks_df)
    toks = _tokens_col(column)
    checks = [F.array_contains(toks, w) for w in info["words"]]
    pred = checks[0]
    for c in checks[1:]:
        pred = (pred & c) if mode == "all" else (pred | c)
    return dec.filter(pred)
