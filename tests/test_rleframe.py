"""RleFrame (distributed) vs RleDict (driver-side compat) differentials:
both layers share the kernels, so results must match exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyrle_spark.operators.rleframe import RleFrame
from pyrle_spark.rle import Rle
from pyrle_spark.rledict import RleDict


def _intervals_pdf(seed=0, n=200, chroms=("chr1", "chr2", "chr3")):
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, 1000, n)
    return pd.DataFrame(
        {
            "Chromosome": rng.choice(chroms, n),
            "Start": starts,
            "End": starts + rng.integers(1, 200, n),
        }
    )


@pytest.fixture(scope="module")
def interval_frames(spark):
    p1, p2 = _intervals_pdf(1), _intervals_pdf(2)
    return (p1, p2, spark.createDataFrame(p1), spark.createDataFrame(p2))


def test_coverage_matches_rledict(spark, interval_frames):
    p1, _, d1, _ = interval_frames
    rf = RleFrame.from_intervals(d1)
    rd = rf.to_rledict()
    expected = RleDict(p1)
    assert rd == expected


@pytest.mark.parametrize("op", ["add", "sub", "mul", "div"])
def test_binary_ops_match_rledict(spark, interval_frames, op):
    p1, p2, d1, d2 = interval_frames
    rf = RleFrame.from_intervals(d1)._apply_or_binary(
        RleFrame.from_intervals(d2), op
    )
    expected = RleDict(p1)._binary(RleDict(p2), op)
    assert rf.to_rledict() == expected


def test_missing_keys_full_outer(spark):
    d1 = spark.createDataFrame(
        pd.DataFrame({"Chromosome": ["chrA"] * 3, "Start": [0, 5, 8], "End": [4, 9, 12]})
    )
    d2 = spark.createDataFrame(
        pd.DataFrame({"Chromosome": ["chrB"] * 2, "Start": [1, 2], "End": [6, 7]})
    )
    out = (RleFrame.from_intervals(d1) + RleFrame.from_intervals(d2)).to_rledict()
    assert set(out.keys()) == {"chrA", "chrB"}


def test_scalar_ops(spark, interval_frames):
    p1, _, d1, _ = interval_frames
    rf = (RleFrame.from_intervals(d1) * 2.0).to_rledict()
    expected = RleDict(p1) * 2.0
    assert rf == expected


def test_to_ranges_matches_rledict(spark, interval_frames):
    p1, _, d1, _ = interval_frames
    got = (
        RleFrame.from_intervals(d1)
        .to_ranges()
        .toPandas()
        .sort_values(["Chromosome", "Start"])
        .reset_index(drop=True)
    )
    exp = (
        RleDict(p1)
        .to_ranges()
        .sort_values(["Chromosome", "Start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"Start": "int64", "End": "int64"}),
        exp.astype({"Start": "int64", "End": "int64"}),
        check_dtype=False,
    )


def test_getitems_matches_rle(spark, interval_frames):
    p1, _, d1, _ = interval_frames
    rf = RleFrame.from_intervals(d1)
    queries = pd.DataFrame(
        {
            "Chromosome": ["chr1", "chr1", "chr2"],
            "Start": [0, 100, 50],
            "End": [50, 300, 60],
            "ID": [0, 1, 2],
        }
    )
    got = (
        rf.getitems(spark.createDataFrame(queries))
        .toPandas()
        .sort_values(["ID", "Start", "Value"])
        .reset_index(drop=True)
    )
    rd = RleDict(p1)
    exp_frames = []
    for chrom, sub in queries.groupby("Chromosome"):
        res = rd[chrom][sub[["Start", "End"]].reset_index(drop=True)]
        res["ID"] = sub["ID"].to_numpy()[res["ID"]]
        res["Chromosome"] = chrom
        exp_frames.append(res)
    exp = (
        pd.concat(exp_frames)[["Chromosome", "Start", "End", "ID", "Run", "Value"]]
        .sort_values(["ID", "Start", "Value"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_stats_quirks(spark):
    rf = RleFrame.from_rledict(
        spark, RleDict({"chr1": Rle([1, 2, 1], [1, 2, 3])})
    )
    row = rf.stats().collect()[0]
    assert row["length"] == 4
    assert row["mean_quirk"] == 1.5  # sum(values)/length (rle.py:945-959)
    assert row["weighted_mean"] == 2.0
