"""rewrite_column_codec: in-place per-column codec swap.

The engine extension the reference cannot express (pyrle hard-codes one
run/value representation, /root/reference/pyrle/rle.py:146-147): an
encoded table's column representation is a per-snapshot property that a
maintenance rewrite can change without touching any other column —
decode must be bit-identical across the swap, time travel must still
read the old codec, and inapplicable codec/column pairs must fail
loudly before anything commits.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from pyrle_spark.plans.encode_job import (
    EncodeConfig,
    decode_table,
    encode_table,
    rewrite_column_codec,
    verify_checksums,
)
from pyrle_spark.sources.icetable import IceTable
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def enc_table(spark):
    from pyrle_spark.operators.relational import _fixture_ordered

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    ordered = _fixture_ordered(docs, ["lang", "n_chars"])
    out = tempfile.mkdtemp(prefix="recompress_t_")
    encode_table(
        spark,
        ordered,
        out,
        EncodeConfig(columns=["lang", "n_chars"], order_col="_seq", block_rows=64),
    )
    return out


def test_swap_is_bit_identical_and_time_travels(spark, enc_table):
    t = IceTable(enc_table)
    parent = t.current_snapshot_id()
    before = decode_table(spark, enc_table).orderBy("_order").toPandas()

    s = rewrite_column_codec(spark, enc_table, "n_chars", "rle+zstd")
    assert s["codec"] == "rle+zstd" and s["blocks"] > 0

    after = decode_table(spark, enc_table).orderBy("_order").toPandas()
    assert before.equals(after)
    # history is untouched: the parent snapshot still decodes (old codec)
    old = (
        decode_table(spark, enc_table, snapshot_id=parent)
        .orderBy("_order")
        .toPandas()
    )
    assert before.equals(old)
    assert verify_checksums(spark, enc_table)["bad"] == 0

    codecs = {
        r["column"]: r["codec"]
        for r in t.read_table(spark)
        .select("column", "codec")
        .distinct()
        .collect()
    }
    assert codecs["n_chars"] == "rle+zstd"
    # the OTHER column's cells moved verbatim (codec unchanged)
    assert not codecs["lang"].startswith("rle")
    # the pin is recorded for lineage
    assert t.properties()["column_codecs"]["n_chars"] == "rle+zstd"


def test_inapplicable_codec_fails_loudly(spark, enc_table):
    # rle is a fixed-width codec; lang is var-width strings
    with pytest.raises(Exception, match="not applicable to var-width"):
        rewrite_column_codec(spark, enc_table, "lang", "rle")
    # nothing committed: table still verifies green
    assert verify_checksums(spark, enc_table)["bad"] == 0


def test_unknown_codec_and_column_rejected(spark, enc_table):
    with pytest.raises(ValueError, match="unknown codec"):
        rewrite_column_codec(spark, enc_table, "lang", "lz4")
    with pytest.raises(KeyError, match="unknown column"):
        rewrite_column_codec(spark, enc_table, "nope", "dict")


@pytest.mark.parametrize(
    "colname,codec",
    [
        # fixed-width int column through every applicable codec
        ("n_chars", "rle"),
        ("n_chars", "rle+zstd"),
        ("n_chars", "dict"),
        ("n_chars", "for"),
        ("n_chars", "delta"),
        ("n_chars", "bitpack"),
        ("n_chars", "raw"),
        ("n_chars", "raw+zstd"),
        # var-width string column through every applicable codec
        ("lang", "dict"),
        ("lang", "dict+zstd"),
        ("lang", "fsst"),
        ("lang", "raw"),
        ("lang", "raw+zstd"),
    ],
)
def test_swap_matrix_roundtrips(spark, tmp_path, colname, codec):
    """Every (column kind, codec) pair a rewrite can pin must decode
    bit-identically after the swap — the per-cell crc assertion inside
    rewrite_column_codec does the proving; this drives it through the
    whole matrix."""
    from pyrle_spark.operators.relational import _fixture_ordered

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(256)
    ordered = _fixture_ordered(docs, [colname])
    t = str(tmp_path / f"m_{colname}_{codec.replace('+', '_')}")
    encode_table(
        spark,
        ordered,
        t,
        EncodeConfig(columns=[colname], order_col="_seq", block_rows=64),
    )
    before = decode_table(spark, t).orderBy("_order").toPandas()
    s = rewrite_column_codec(spark, t, colname, codec)
    assert s["blocks"] > 0
    after = decode_table(spark, t).orderBy("_order").toPandas()
    assert before.equals(after)
    assert verify_checksums(spark, t)["bad"] == 0


def test_compressed_ops_work_after_swap(spark, enc_table):
    from pyrle_spark.plans.compressed import count_by_value

    rewrite_column_codec(spark, enc_table, "lang", "fsst+zstd")
    got = {
        r["value"]: r["n_rows"]
        for r in count_by_value(spark, enc_table, "lang").collect()
    }
    exp = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp
