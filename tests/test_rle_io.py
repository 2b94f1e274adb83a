"""Reference-compatible CSV/table interchange round trips."""

from __future__ import annotations

import numpy as np

from pyrle_spark.rle import Rle
from pyrle_spark.rledict import RleDict
from pyrle_spark.sources.rle_io import (
    from_csv,
    rledict_to_csv,
    rleframe_from_table,
    rleframe_to_table,
)


def _sample_rd():
    return RleDict(
        {
            ("chr1", "+"): Rle([3, 2], [1.0, 2.5]),
            ("chr1", "-"): Rle([5], [7.0]),
            ("chr2", "+"): Rle([1, 1, 1], [1.0, 2.0, 3.0]),
        }
    )


def test_csv_roundtrip(tmp_path):
    rd = _sample_rd()
    path = str(tmp_path / "rd.tsv")
    rledict_to_csv(rd, path)
    back = from_csv(path)
    assert back == rd


def test_rleframe_table_roundtrip(spark):
    from pyrle_spark.operators.rleframe import RleFrame

    rd = _sample_rd()
    rf = RleFrame.from_rledict(spark, rd)
    table = rleframe_to_table(rf)
    back = rleframe_from_table(spark, table, key_cols=["Chromosome", "Strand"])
    assert back.to_rledict() == rd
