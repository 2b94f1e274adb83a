"""Unit coverage for the decode-late pair group-by and prefix probe
(`plans/compressed.py`): the rle×rle run-zip fast path against a naive
expanded histogram, mixed-codec factorization, null grouping, and the
prefix count's dict fast path / delete fallback / zonemap-prune superset
contract."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyrle_spark.codecs import encode_array, encode_with
from pyrle_spark.plans.compressed import (
    _block_prefix_count,
    _pair_hist,
)


def naive_hist(a: list, b: list):
    out: dict = {}
    for x, y in zip(a, b):
        out[(x, y)] = out.get((x, y), 0) + 1
    return out


def as_dict(va, vb, ns):
    return {(a, b): int(n) for a, b, n in zip(va, vb, ns)}


run_sets = st.lists(
    st.tuples(st.integers(1, 9), st.integers(-3, 3)), min_size=1, max_size=12
)


@settings(max_examples=60, deadline=None)
@given(run_sets, run_sets)
def test_pair_hist_rle_zip_matches_naive(runs_a, runs_b):
    a = [v for n, v in runs_a for _ in range(n)]
    b = [v for n, v in runs_b for _ in range(n)]
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    enc_a = encode_with("rle", pa.array(np.array(a, dtype=np.int64)))
    enc_b = encode_with("rle", pa.array(np.array(b, dtype=np.int64)))
    assert enc_a.codec.startswith("rle") and enc_b.codec.startswith("rle")
    va, vb, ns = _pair_hist(enc_a, enc_b, None)
    assert as_dict(va, vb, ns) == naive_hist(a, b)
    assert sum(ns) == n


def test_pair_hist_mixed_codecs_and_nulls():
    a = ["x", "y", None, "x", "x", "y", None, "x"] * 8  # dict w/ validity
    b = [1, 1, 1, 2, 2, None, 3, 3] * 8
    enc_a = encode_array(pa.array(a))
    enc_b = encode_array(pa.array(b, type=pa.int64()))
    va, vb, ns = _pair_hist(enc_a, enc_b, None)
    assert as_dict(va, vb, ns) == naive_hist(a, b)


def test_pair_hist_delete_mask():
    a = ["p", "p", "q", "q", "q", "p"]
    b = [10, 10, 10, 20, 20, 20]
    enc_a, enc_b = encode_array(pa.array(a)), encode_array(
        pa.array(b, type=pa.int64())
    )
    kill = np.array([1, 4], dtype=np.int64)
    keep = [i for i in range(6) if i not in (1, 4)]
    va, vb, ns = _pair_hist(enc_a, enc_b, kill)
    assert as_dict(va, vb, ns) == naive_hist(
        [a[i] for i in keep], [b[i] for i in keep]
    )


def test_pair_hist_misaligned_blocks_raise():
    enc_a = encode_array(pa.array(["x"] * 4))
    enc_b = encode_array(pa.array([1, 2, 3], type=pa.int64()))
    with pytest.raises(ValueError, match="misalign"):
        _pair_hist(enc_a, enc_b, None)


def test_block_prefix_count_dict_path_and_fallback():
    vals = ["src1", "src10", "src2", "src19", None, "other", "src1"] * 10
    enc = encode_array(pa.array(vals))
    want = sum(1 for v in vals if v is not None and v.startswith("src1"))
    assert _block_prefix_count(enc, "src1", None) == want
    # empty prefix matches every non-null row
    assert _block_prefix_count(enc, "", None) == sum(
        1 for v in vals if v is not None
    )


def test_block_prefix_count_delete_fallback():
    vals = ["aa", "ab", "ba", "ab"]
    enc = encode_array(pa.array(vals))
    kill = np.array([1], dtype=np.int64)
    assert _block_prefix_count(enc, "a", kill) == 2  # "aa" and idx-3 "ab"


def test_count_where_prefix_prunes_and_matches(spark, tmp_path):
    """End-to-end on a source-clustered table: the pruned count equals
    the naive scan and the zonemap filter keeps a SUPERSET of matching
    blocks (prune never drops a hit)."""
    import pyspark.sql.functions as F

    from pyrle_spark.plans.compressed import count_where_prefix
    from pyrle_spark.plans.encode_job import EncodeConfig, encode_table
    from pyrle_spark.sources.icetable import IceTable

    rows = [(i, f"src{i % 17}") for i in range(512)]
    df = (
        spark.createDataFrame(rows, "i long, source string")
        .orderBy("source", "i")
        .selectExpr("row_number() OVER (ORDER BY source, i) - 1 AS _seq", "source")
    )
    out = str(tmp_path / "pref")
    encode_table(
        spark,
        df,
        out,
        EncodeConfig(columns=["source"], order_col="_seq", block_rows=32),
    )
    got = count_where_prefix(spark, out, "source", "src1").first()["n_match"]
    want = sum(1 for _, s in rows if s.startswith("src1"))
    assert got == want
    # the clustered layout must actually prune: fewer blocks survive the
    # zonemap window than exist
    enc = IceTable(out).read_table(spark, None)
    n_blocks = enc.select("block_id").distinct().count()
    survivors = enc.filter(
        (F.col("zmax") >= "src1") & (F.col("zmin") < "src2")
    ).select("block_id").distinct().count()
    assert 0 < survivors < n_blocks


def test_group_sum_pair_end_to_end_with_deletes(spark, tmp_path):
    """Keys pair on codes, measure folds below decode, MoR deletes
    apply to keys and measure alike, float measures raise."""
    import pyspark.sql.functions as F

    from pyrle_spark.plans.compressed import group_sum_pair
    from pyrle_spark.plans.encode_job import (
        EncodeConfig,
        delete_rows,
        encode_table,
    )

    rows = [(i, f"k{i % 3}", f"g{i % 2}", i * 10) for i in range(200)]
    df = spark.createDataFrame(rows, "_seq long, a string, b string, m long")
    out = str(tmp_path / "pairsum")
    encode_table(
        spark,
        df,
        out,
        EncodeConfig(columns=["a", "b", "m"], order_col="_seq", block_rows=32),
    )
    delete_rows(spark, out, [5, 6, 7, 100])
    got = {
        (r["value_a"], r["value_b"]): (r["n_rows"], r["sum_m"])
        for r in group_sum_pair(spark, out, "a", "b", "m").collect()
    }
    keep = [r for r in rows if r[0] not in (5, 6, 7, 100)]
    want: dict = {}
    for _seq, a, b, m in keep:
        n, s = want.get((a, b), (0, 0))
        want[(a, b)] = (n + 1, s + m)
    assert got == want

    # float measure refuses loudly (exactness contract)
    df_f = df.withColumn("m", F.col("m").cast("double"))
    out_f = str(tmp_path / "pairsum_f")
    encode_table(
        spark,
        df_f,
        out_f,
        EncodeConfig(columns=["a", "b", "m"], order_col="_seq", block_rows=32),
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="integer measure"):
        group_sum_pair(spark, out_f, "a", "b", "m").collect()


def test_group_minmax_pair_nulls_and_deletes(spark, tmp_path):
    """MIN/MAX fold below decode: NULL measures count in n_rows but
    never into bounds (an all-NULL group yields NULL min/max), and MoR
    deletes mask keys and measure alike."""
    from pyrle_spark.plans.compressed import group_minmax_pair
    from pyrle_spark.plans.encode_job import (
        EncodeConfig,
        delete_rows,
        encode_table,
    )

    # group ("k2", "g0") gets ONLY null measures → NULL bounds
    rows = [
        (i, f"k{i % 3}", f"g{i % 2}", None if i % 3 == 2 else i * 7 - 100)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "_seq long, a string, b string, m long")
    out = str(tmp_path / "pairmm")
    encode_table(
        spark,
        df,
        out,
        EncodeConfig(columns=["a", "b", "m"], order_col="_seq", block_rows=32),
    )
    delete_rows(spark, out, [0, 1, 2, 150])
    got = {
        (r["value_a"], r["value_b"]): (r["n_rows"], r["min_m"], r["max_m"])
        for r in group_minmax_pair(spark, out, "a", "b", "m").collect()
    }
    keep = [r for r in rows if r[0] not in (0, 1, 2, 150)]
    want: dict = {}
    for _seq, a, b, m in keep:
        n, lo, hi = want.get((a, b), (0, None, None))
        if m is not None:
            lo = m if lo is None else min(lo, m)
            hi = m if hi is None else max(hi, m)
        want[(a, b)] = (n + 1, lo, hi)
    assert got == want
    # the all-NULL measure groups really exercise the NULL-bounds path
    assert any(v[1] is None for v in want.values())


def test_block_filter_mask_tiers():
    """The containment tier returns None (no row work); straddling rle
    blocks mask on run values; dict blocks mask on the dictionary."""
    import pyarrow as _pa

    from pyrle_spark.plans.compressed import _block_filter_mask

    vals = [5, 5, 5, 9, 9, 2, 2, 2, 2]
    enc = encode_with("rle", _pa.array(np.array(vals, dtype=np.int64)))
    # zone-contained: every run value inside the range → None
    assert _block_filter_mask(enc, 0, 100, None) is None
    # straddling: mask comes from run values, repeated per run
    m = _block_filter_mask(enc, 3, 6, None)
    assert m.tolist() == [v in (5, 6, 4, 3) for v in vals]
    # delete-affected: exact decode-and-mask, kill offsets removed first
    m = _block_filter_mask(enc, 3, 6, np.array([0, 1]))
    assert m.tolist() == [v in (3, 4, 5, 6) for v in vals[2:]]


def test_group_count_where_end_to_end(spark, tmp_path):
    """Zone prune + containment + mask tiers compose to the exact
    filtered GROUP BY, deletes applied."""
    from pyrle_spark.plans.compressed import group_count_where
    from pyrle_spark.plans.encode_job import (
        EncodeConfig,
        delete_rows,
        encode_table,
    )

    rows = [(i, f"k{i % 3}", i) for i in range(256)]  # m == _seq, clustered
    df = spark.createDataFrame(rows, "_seq long, a string, m long")
    out = str(tmp_path / "gwhere")
    encode_table(
        spark, df, out,
        EncodeConfig(columns=["a", "m"], order_col="_seq", block_rows=32),
    )
    delete_rows(spark, out, [40, 41, 200])
    got = {
        r["value_a"]: r["n_rows"]
        for r in group_count_where(spark, out, "a", "m", 30, 130).collect()
    }
    want: dict = {}
    for _seq, a, m in rows:
        if 30 <= m <= 130 and _seq not in (40, 41, 200):
            want[a] = want.get(a, 0) + 1
    assert got == want


def test_range_mask_int64_beyond_2_53():
    """Native-domain comparisons: float64 promotion would alias
    2^53 and 2^53+1; integer blocks must distinguish them at the bounds
    regardless of whether a bound is None (the ±inf stand-ins are
    floats too)."""
    from pyrle_spark.plans.compressed import _range_mask

    v = np.array([2**53, 2**53 + 1], dtype=np.int64)
    assert _range_mask(v, None, 2**53).tolist() == [True, False]
    assert _range_mask(v, 2**53 + 1, None).tolist() == [False, True]
    assert _range_mask(v, None, None).tolist() == [True, True]
    # bounds beyond the int64 domain: nothing / everything matches
    assert _range_mask(v, 2**70, None).tolist() == [False, False]
    assert _range_mask(v, None, 2**70).tolist() == [True, True]
