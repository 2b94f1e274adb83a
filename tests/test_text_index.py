"""Inverted text index: build, compressed postings, pruned search,
exactness vs naive scan, staleness and delete visibility."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pyrle_spark.plans.encode_job import (
    EncodeConfig,
    decode_table,
    delete_rows,
    encode_table,
)
from pyrle_spark.plans.text_index import (
    build_text_index,
    prune_blocks_text,
    search_text,
)
from pyrle_spark.sources.webtext import generate_webtext

N = 2000
BLOCK = 250


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tidx") / "t")
    web = generate_webtext(spark, N, n_hosts=20)
    # the generator's template vocabulary is dense (every word in every
    # block) — plant a rare marker in block 0 only so pruning can bite
    web = web.withColumn(
        "text",
        F.when(
            F.col("doc_seq").between(100, 105),
            F.concat(F.col("text"), F.lit(" zebraqux")),
        ).otherwise(F.col("text")),
    )
    encode_table(
        spark,
        web.select("doc_seq", "url", "text", "lang"),
        out,
        EncodeConfig(columns=["url", "text", "lang"], order_col="doc_seq",
                     block_rows=BLOCK),
    )
    info = build_text_index(spark, out)
    assert info["n_tokens"] > 0 and info["n_postings"] >= info["n_tokens"]
    return out


def _naive(spark, table, words, mode="all"):
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                 lambda t: F.length(t) > 0)
    )
    dec = decode_table(spark, table, columns=["text"])
    checks = [F.array_contains(toks, w) for w in words]
    pred = checks[0]
    for c in checks[1:]:
        pred = (pred & c) if mode == "all" else (pred | c)
    return dec.filter(pred)


def _pick_words(spark, table):
    """The planted rare word and a common word from the corpus."""
    dec = decode_table(spark, table, columns=["text"])
    toks = dec.select(
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                         lambda t: F.length(t) > 0)
            )
        ).alias("w")
    )
    common = toks.groupBy("w").count().orderBy(F.desc("count")).first()["w"]
    return "zebraqux", common


def test_search_exact_and_pruned(spark, table):
    rare, common = _pick_words(spark, table)
    for words, mode in [([rare], "all"), ([rare, common], "all"),
                        ([rare, common], "any")]:
        got = search_text(spark, table, words, mode=mode)
        exp = _naive(spark, table, words, mode=mode)
        assert sorted(r["_order"] for r in got.collect()) == sorted(
            r["_order"] for r in exp.collect()
        ), (words, mode)
    # the rare word must prune: candidate blocks < total blocks
    cand, _ = prune_blocks_text(spark, table, [rare])
    assert 0 < len(cand) < N // BLOCK


def test_search_no_hits_and_unknown_word(spark, table):
    got = search_text(spark, table, ["zzzzqqqqxxxx"])
    assert got.count() == 0
    cand, _ = prune_blocks_text(spark, table, ["zzzzqqqqxxxx"])
    assert cand == set()
    # AND with an unknown word short-circuits to empty even if the other
    # word is everywhere
    _, common = _pick_words(spark, table)
    assert search_text(spark, table, ["zzzzqqqqxxxx", common]).count() == 0


def test_stale_index_still_exact(spark, table, tmp_path):
    """Appends after the build are searched by decode (conservative)."""
    rare, _ = _pick_words(spark, table)
    web2 = generate_webtext(spark, N + 500, n_hosts=20).filter(
        F.col("doc_seq") >= N
    )
    encode_table(
        spark,
        web2.select("doc_seq", "url", "text", "lang"),
        table,
        EncodeConfig(columns=["url", "text", "lang"], order_col="doc_seq",
                     block_rows=BLOCK),
    )
    got = search_text(spark, table, [rare])
    exp = _naive(spark, table, [rare])
    assert sorted(r["_order"] for r in got.collect()) == sorted(
        r["_order"] for r in exp.collect()
    )
    # new blocks are candidates even though the index never saw them
    cand, _ = prune_blocks_text(spark, table, [rare])
    assert {b for b in cand if b >= N // BLOCK} == {
        b for b in range((N + 500) // BLOCK) if b >= N // BLOCK
    }
    # rebuild absorbs the appends: new blocks prune again
    build_text_index(spark, table)
    cand2, _ = prune_blocks_text(spark, table, [rare])
    assert cand2 <= cand


def test_deletes_apply_at_search(spark, table):
    rare, _ = _pick_words(spark, table)
    hits = sorted(r["_order"] for r in search_text(spark, table, [rare]).collect())
    assert hits
    delete_rows(spark, table, [hits[0]])
    after = sorted(r["_order"] for r in search_text(spark, table, [rare]).collect())
    assert after == hits[1:]


def test_stale_index_sees_reencoded_tail_block(spark, tmp_path):
    """Rows appended INTO a partial tail block (same block_id, new crc)
    after the index build must still be searchable: staleness compares
    block content signatures, not just block ids."""
    out = str(tmp_path / "tailidx")
    cfg = EncodeConfig(columns=["text"], order_col="seq", block_rows=256)
    base = spark.createDataFrame(
        [(i, f"common filler row {i}") for i in range(300)],
        "seq long, text string",
    )
    encode_table(spark, base, out, cfg)  # block 1 is partial (44 rows)
    build_text_index(spark, out, "text")
    # append rows that LAND IN block 1 (re-encoded under the same id),
    # carrying a word the old postings never saw
    more = base.unionByName(
        spark.createDataFrame(
            [(300 + i, f"zzyzx sentinel {i}") for i in range(20)],
            "seq long, text string",
        )
    )
    encode_table(spark, more, out, cfg)
    hits = search_text(spark, out, ["zzyzx"]).collect()
    assert len(hits) == 20
