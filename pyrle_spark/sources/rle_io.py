"""Reference-compatible RLE interchange I/O.

The reference's only file format is a (Chromosome[, Strand], Runs,
Values) separated-values table (``pyrle/__init__.py:13-29`` from_csv;
``rledict.py:744-758`` to_table/to_csv).  Both the driver-side RleDict
and the distributed RleFrame read/write it; parquet variants included
for the scale path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyrle_spark.rle import Rle
from pyrle_spark.rledict import RleDict

__all__ = ["from_csv", "rledict_to_csv", "rleframe_from_table", "rleframe_to_table"]


def from_csv(path: str, sep: str = "\t") -> RleDict:
    """Read a runs/values table into an RleDict (pyrle/__init__.py:13-29:
    group by Chromosome[, Strand], one Rle per group)."""
    df = pd.read_csv(path, sep=sep)
    keys = ["Chromosome", "Strand"] if "Strand" in df.columns else ["Chromosome"]
    out = {}
    for key, sub in df.groupby(keys, sort=False):
        key = key if len(keys) == 2 else (key[0] if isinstance(key, tuple) else key)
        out[key] = Rle(sub["Runs"].to_numpy(), sub["Values"].to_numpy())
    return RleDict(out)


def rledict_to_csv(rd: RleDict, path: str, sep: str = "\t") -> None:
    rd.to_table().to_csv(path, sep=sep, index=False)


def rleframe_from_table(spark: SparkSession, df: DataFrame, key_cols=None):
    """Tabular (key..., Runs, Values) rows → RleFrame: collect_list per
    key ordered by an implicit row sequence."""
    from pyrle_spark.operators.rleframe import RleFrame

    key_cols = key_cols or [
        c for c in df.columns if c not in ("Runs", "Values")
    ]
    seq = F.monotonically_increasing_id()
    with_seq = df.withColumn("_seq", seq)
    agg = (
        with_seq.groupBy(*key_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("_seq", "Runs", "Values"))
            ).alias("rv")
        )
        .select(
            *key_cols,
            F.col("rv.Runs").cast("array<bigint>").alias("runs"),
            F.col("rv.Values").cast("array<double>").alias("values"),
        )
    )
    return RleFrame(agg, key_cols)


def rleframe_to_table(rf) -> DataFrame:
    """RleFrame → tabular (key..., Runs, Values) rows (rledict.py:744-758)."""
    return rf.df.select(
        *rf.key_cols,
        F.posexplode(F.arrays_zip("runs", "values")).alias("idx", "rv"),
    ).select(
        *rf.key_cols,
        F.col("rv.runs").alias("Runs"),
        F.col("rv.values").alias("Values"),
    )
