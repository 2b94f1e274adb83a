"""Extended RleFrame surface: shift, numbers_only, comparisons, getlocs,
strand padding — each differentially checked against the driver-side
compat layer (same kernels, different execution)."""

from __future__ import annotations

import numpy as np
import pytest

from pyrle_spark.operators.rleframe import RleFrame
from pyrle_spark.rle import Rle
from pyrle_spark.rledict import RleDict


@pytest.fixture(scope="module")
def rf_pair(spark):
    rd1 = RleDict({"chr1": Rle([3, 2, 4], [1, 5, 2]), "chr2": Rle([6], [3])})
    rd2 = RleDict({"chr1": Rle([4, 5], [2, 1]), "chr3": Rle([2], [9])})
    return (
        rd1,
        rd2,
        RleFrame.from_rledict(spark, rd1),
        RleFrame.from_rledict(spark, rd2),
    )


def test_shift(spark, rf_pair):
    rd1, _, rf1, _ = rf_pair
    assert rf1.shift(2).to_rledict() == rd1.shift(dist=2)
    assert rf1.shift(-3).to_rledict() == rd1.shift(dist=-3)


def test_numbers_only(spark):
    rd = RleDict({"chr1": Rle([1, 2, 1], [np.inf, 1, np.nan])})
    rf = RleFrame.from_rledict(spark, rd)
    assert rf.numbers_only().to_rledict() == rd.numbers_only()


@pytest.mark.parametrize("op", ["eq", "ne", "lt", "le", "gt", "ge"])
def test_comparisons(spark, rf_pair, op):
    rd1, rd2, rf1, rf2 = rf_pair
    got = rf1.compare(rf2, op).to_rledict()
    expected = RleDict(
        {
            kk: getattr(rd1[kk], f"__{op}__")(rd2[kk])
            for kk in set(rd1.keys()) | set(rd2.keys())
        }
    )
    # full-outer semantics: missing keys compare against zero-Rles; the
    # driver-side expected uses the RleDict missing-key defaults, so
    # compare only the shared keys exactly and check others exist
    for kk in ("chr1",):
        assert got[kk].equals(expected[kk]), (op, kk, got[kk], expected[kk])
    assert set(got.keys()) == {"chr1", "chr2", "chr3"}


def test_getlocs(spark, rf_pair):
    rd1, _, rf1, _ = rf_pair
    out = rf1.getlocs([0, 4, 8, 100]).toPandas()
    chr1 = out[out.Chromosome == "chr1"].sort_values("loc")
    expected = rd1["chr1"].getlocs([0, 4, 8, 100])
    assert np.allclose(chr1["value"].to_numpy(), expected)


def test_make_strands_same_length(spark):
    rd = RleDict({("chr1", "+"): Rle([5], [1]), ("chr1", "-"): Rle([2], [3])})
    rf = RleFrame.from_rledict(spark, rd)
    out = rf.make_strands_same_length().to_rledict()
    assert out == rd.make_strands_same_length()


def test_blocked_order_comparison_zero_extension(spark):
    """Order comparisons extend the shorter side with 0 (through
    __sub__'s equalize, rle.py:438/17-31) in BOTH layouts; only eq/ne
    use NaN.  A blocked tail block must not flip the answer."""
    rd_long = RleDict({"chr1": Rle([20], [-5.0])})
    rd_short = RleDict({"chr1": Rle([10], [-5.0])})
    expect = (rd_long["chr1"] < rd_short["chr1"])  # tail: -5 < 0 → 1.0
    fa = RleFrame.from_rledict(spark, rd_long)
    fb = RleFrame.from_rledict(spark, rd_short)
    assert fa.compare(fb, "lt").to_rledict()["chr1"] == expect
    fa_b = fa.rechunk(8)
    fb_b = fb.rechunk(8)
    got_b = fa_b.compare(fb_b, "lt").unchunk().to_rledict()["chr1"]
    assert got_b == expect
    # eq still NaN-extends in both layouts
    exp_eq = rd_long["chr1"] == rd_short["chr1"]
    assert (fa_b == fb_b).unchunk().to_rledict()["chr1"] == exp_eq


def test_ne_numpy_scalars_and_reflected_ops(spark, rf_pair):
    rd1, rd2, rf1, rf2 = rf_pair
    # __ne__ must be a comparison frame, not Python's derived bool
    got = (rf1 != rf2).to_rledict()
    assert isinstance(got, RleDict)
    assert got["chr1"] == (rd1["chr1"] != rd2["chr1"])
    # numpy scalars route to the scalar fast path
    assert (rf1 * np.int64(3)).to_rledict() == rd1 * 3
    # reflected scalar operands
    assert (2 + rf1).to_rledict() == rd1 + 2
    assert (3 * rf1).to_rledict() == rd1 * 3
    r = (10.0 - rf1).to_rledict()["chr1"]
    assert r == Rle([3, 2, 4], [9.0, 5.0, 8.0])


def test_read_parquet_numeric_key_stays_string(spark, tmp_path):
    """Hive partition-type inference must not turn chromosome '1' into
    an int: every Arrow stage declares the key as string."""
    rd = RleDict({"1": Rle([4], [2.0]), "22": Rle([3], [7.0])})
    rf = RleFrame.from_rledict(spark, rd)
    p = str(tmp_path / "numkeys")
    rf.write_parquet(p)
    back = RleFrame.read_parquet(spark, p)
    assert back.to_rledict() == rd
    # a binary op against a fresh string-keyed frame must align keys
    assert (back + rf).to_rledict() == rd + rd
