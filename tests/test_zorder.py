"""Z-order rewrite: decode equality, multi-column zone pruning synergy,
Morton key properties."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pyrle_spark.plans.encode_job import (
    EncodeConfig,
    decode_table,
    dedup_blocks,
    encode_table,
    prune_blocks,
    prune_blocks_eq,
)
from pyrle_spark.plans.zorder import rewrite_zorder, zorder_key
from pyrle_spark.sources.icetable import IceTable
from pyrle_spark.sources.webtext import generate_webtext

N = 4000
BLOCK = 250


def _survivors(spark, table, lang, lo):
    enc = dedup_blocks(IceTable(table).read_table(spark))
    by_range = {r["block_id"] for r in prune_blocks(enc, "n_chars", lo=lo).collect()}
    by_eq = {r["block_id"] for r in prune_blocks_eq(enc, "lang", lang).collect()}
    return by_range & by_eq


def test_zorder_key_locality(spark):
    """Neighbors in z-order are neighbors in both dimensions: the key of
    (x, y) differs from (x, y+1) less than from (x + span/2, y)."""
    df = spark.createDataFrame(
        [(i % 64, i // 64) for i in range(4096)], "x int, y int"
    )
    z = df.select("x", "y", zorder_key(df, ["x", "y"], bits=6).alias("z"))
    rows = {(r["x"], r["y"]): r["z"] for r in z.collect()}
    # interleave identity for 6-bit codes scaled to 6 bits (span 0..63)
    def interleave(a, b):
        out = 0
        for bit in range(6):
            out |= ((a >> bit) & 1) << (2 * bit)
            out |= ((b >> bit) & 1) << (2 * bit + 1)
        return out
    assert rows[(0, 0)] == 0
    assert rows[(63, 63)] == interleave(63, 63)
    assert rows[(5, 9)] == interleave(5, 9)


def test_rewrite_zorder_prunes_both_dims(spark, tmp_path):
    web = generate_webtext(spark, N, n_hosts=30).select(
        "doc_seq", "url", "lang", F.length("text").alias("n_chars")
    )
    src = str(tmp_path / "zsrc")
    out = str(tmp_path / "zout")
    cols = ["url", "lang", "n_chars"]
    encode_table(
        spark, web, src,
        EncodeConfig(columns=cols, order_col="doc_seq", block_rows=BLOCK),
    )
    # pick a mid-range threshold and a mid-frequency language
    lo = int(web.agg(F.expr("percentile(n_chars, 0.9)")).first()[0])
    lang = web.groupBy("lang").count().orderBy(F.desc("count")).collect()[2]["lang"]
    before = _survivors(spark, src, lang, lo)
    info = rewrite_zorder(spark, src, out, ["lang", "n_chars"])
    assert info["rows"] == N
    # decode equality: same row multiset (positions differ)
    a = decode_table(spark, src).select(*cols)
    b = decode_table(spark, out).select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # the rewrite must make the two-predicate zone intersection sharper
    after = _survivors(spark, out, lang, lo)
    assert len(after) < len(before), (len(after), len(before))
    # and the pruned decode stays exact
    blocks = spark.createDataFrame([(int(x),) for x in sorted(after)], "block_id long")
    got = (
        decode_table(spark, out, blocks=blocks)
        .filter((F.col("lang") == lang) & (F.col("n_chars") >= lo))
        .count()
    )
    exp = web.filter((F.col("lang") == lang) & (F.col("n_chars") >= lo)).count()
    assert got == exp


def test_zorder_errors(spark, tmp_path):
    df = generate_webtext(spark, 100, n_hosts=5)
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key(df, [])
    with pytest.raises(KeyError, match="not in"):
        zorder_key(df, ["nope"])
    with pytest.raises(ValueError, match="distinct"):
        zorder_key(df, ["url"], max_string_card=3)
    with pytest.raises(ValueError, match="overflows"):
        zorder_key(df, ["lang", "doc_seq"], bits=40)


def test_zorder_temporal_and_unique_keys(spark, tmp_path):
    """Z-ordering by a timestamp column must not crash on the driver
    (temporal min/max go through epoch seconds), and the range-ranked
    sequence is a dense permutation even when Morton keys are unique."""
    from pyrle_spark.plans.encode_job import EncodeConfig, decode_table, encode_table
    from pyrle_spark.plans.zorder import rewrite_zorder

    src = str(tmp_path / "zt_src")
    out = str(tmp_path / "zt_out")
    df = spark.range(0, 4096, 1, 8).select(
        F.col("id").alias("doc_seq"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") * 37) % 100000).alias("ts"),
        ((F.col("id") * 2654435761) % 100003).alias("v"),  # near-unique
    )
    encode_table(spark, df, src, EncodeConfig(columns=["ts", "v"], block_rows=512))
    res = rewrite_zorder(spark, src, out, ["ts", "v"])
    assert res["rows"] == 4096
    dec = decode_table(spark, out)
    orders = [r["_order"] for r in dec.select("_order").collect()]
    assert sorted(orders) == list(range(4096))  # dense permutation
    # content preserved
    assert dec.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_hilbert_key_is_a_space_filling_curve(spark):
    """Every (x, y) cell maps to a unique Hilbert distance, and
    consecutive distances are ADJACENT cells (the locality property
    Morton lacks) — verified exhaustively on an 8x8 grid."""
    import pyspark.sql.functions as F

    from pyrle_spark.plans.zorder import hilbert_key

    df = spark.range(64).select(
        (F.col("id") % 8).alias("x"), (F.col("id") / 8).cast("long").alias("y")
    )
    got = df.select("x", "y", hilbert_key(df, ["x", "y"], bits=3).alias("d")).collect()
    by_d = {r["d"]: (r["x"], r["y"]) for r in got}
    assert sorted(by_d) == list(range(64))  # bijection
    for d in range(63):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])


def test_rewrite_zorder_hilbert_prunes_like_morton(spark, tmp_path):
    """curve='hilbert' rewrite decodes identically to the source and
    zone-prunes at least as well as unclustered layout."""
    import pyspark.sql.functions as F

    from pyrle_spark.plans.encode_job import (
        EncodeConfig,
        decode_table,
        encode_table,
        prune_blocks,
    )
    from pyrle_spark.plans.zorder import rewrite_zorder
    from pyrle_spark.sources.icetable import IceTable

    src, dst = str(tmp_path / "s"), str(tmp_path / "h")
    df = spark.range(0, 4096, 1, 4).select(
        F.col("id").alias("doc_seq"),
        ((F.col("id") * 37) % 64).alias("a"),
        ((F.col("id") * 101) % 64).alias("b"),
    )
    encode_table(spark, df, src, EncodeConfig(columns=["a", "b"], block_rows=256))
    info = rewrite_zorder(spark, src, dst, ["a", "b"], curve="hilbert")
    assert info["rows"] == 4096

    before = decode_table(spark, src).select("a", "b").toPandas()
    after = decode_table(spark, dst).select("a", "b").toPandas()
    key = ["a", "b"]
    assert (
        before.sort_values(key).reset_index(drop=True)
        .equals(after.sort_values(key).reset_index(drop=True))
    )

    # both dimensions prune after the rewrite: a range on either column
    # touches a strict subset of blocks
    enc = IceTable(dst).read_table(spark)
    for c in ("a", "b"):
        kept = prune_blocks(enc, c, 0, 7).count()
        total = enc.filter(F.col("column") == c).select("block_id").distinct().count()
        assert kept < total, (c, kept, total)
