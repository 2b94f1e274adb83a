"""Deterministic TPC-H fact scaling for multi-point benchmarking.

``scale_tpch`` synthesizes a ``factor``×-larger TPC-H-style directory
from an existing one by replicating the FACT tables (orders, lineitem)
with the order key remapped per replica — the webtext generator's
discipline applied to relational data: every output row is a pure
function of (source row, replica index), so two runs (or two engines)
build byte-identical logical content with no RNG and no clock.

Key remap: ``new_orderkey = old_orderkey * factor + replica``.  Each
replica carries a complete copy of every order WITH its full lineitem
group under the shared new key, so per-order aggregates (Q18's HAVING,
Q21's per-order supplier sets, Q4's EXISTS) replicate exactly and every
join stays referentially intact; dimension tables (customer, part,
supplier, nation, region) copy verbatim, which matches how a growing
warehouse actually scales — facts outgrow dims.

The result is written as parquet DIRECTORIES (one per table name, same
``<table>.parquet`` naming the flat files use); Spark reads those
transparently and DuckDB reads them with a ``/*.parquet`` glob — see
``bench.py``'s view registration.

Scale shape of the synthesis itself: one narrow projection + explode
per fact table, no shuffle, no driver materialization — at 100× it is
a single map-only pass."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FACT_KEYS = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    # webtext-analog facts: replicated under remapped ids so the RLE /
    # events operator families get the same 10× point as TPC-H (their
    # queries derive everything from ids/langs/timestamps, so replica
    # content stays deterministic and the SQL twins see identical data)
    "documents": "doc_id",
    "events": "event_id",
}
DIMS = ("region", "nation", "customer", "supplier", "part")


def scale_tpch(
    spark: SparkSession, src_dir: str, dst_dir: str, factor: int = 10
) -> dict:
    """Synthesize ``dst_dir`` as a ``factor``× fact-scaled copy of the
    TPC-H tables in ``src_dir``.  Idempotent: an existing complete
    destination (marker file present) is reused — the synthesis is
    deterministic, so reuse is exact."""
    marker = os.path.join(dst_dir, f"_SCALED_{factor}x_v2")
    tables = list(FACT_KEYS) + list(DIMS)
    if os.path.exists(marker):
        return {"dst": dst_dir, "factor": factor, "reused": True}
    os.makedirs(dst_dir, exist_ok=True)
    for tbl in tables:
        df = spark.read.parquet(os.path.join(src_dir, f"{tbl}.parquet"))
        key = FACT_KEYS.get(tbl)
        if key is not None:
            df = (
                df.withColumn(
                    "_rep",
                    F.explode(
                        F.sequence(F.lit(0), F.lit(int(factor) - 1))
                    ),
                )
                .withColumn(key, F.col(key) * factor + F.col("_rep"))
                .drop("_rep")
            )
        df.write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{tbl}.parquet")
        )
    with open(marker, "w") as f:
        f.write("ok")
    return {"dst": dst_dir, "factor": factor, "reused": False}
