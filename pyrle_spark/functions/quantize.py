"""Embedding quantization: per-vector symmetric int8.

Training pipelines ship embeddings at int8 to cut storage/bandwidth 4×;
the quantizer here is the standard symmetric per-vector scheme —
``scale = max|x| / 127``, ``q = round(x / scale)`` — expressed entirely
in built-in array expressions (no Python in the plan) and replayed
bit-for-bit by the DuckDB oracle:

- rounding is the explicit ``floor(x/scale + 0.5)`` on BOTH engines
  (engine-native ``round`` half-way policies differ);
- ``max|x|`` via array_max / list_max (order-independent, exact);
- the reconstruction-error fold is left-to-right in float64, the same
  discipline as the cosine oracles in functions/similarity.py.

At 100 TB this is one narrow projection pass over the embeddings table
— no shuffle, no UDF; the quantized vectors are 1/4 the bytes and the
emitted per-vector scale + L2 error are the quality audit a pipeline
stores alongside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DIM = 64

__all__ = ["embedding_int8_stats", "bss_roundtrip_embedding", "QUERIES", "ORACLE_SQL"]


def embedding_int8_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization audit: the scale and the L2
    reconstruction error (both rounded to 6 decimals).  All-zero
    vectors quantize to all-zero with scale 0 and error 0."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    max_abs = F.array_max(F.transform("v", lambda x: F.abs(x)))
    scale = max_abs / F.lit(127.0)
    q = F.transform(
        "v", lambda x: F.when(scale == 0, F.lit(0.0)).otherwise(
            F.floor(x / scale + F.lit(0.5)).cast("double")
        )
    )
    err2 = F.aggregate(
        F.zip_with("v", q, lambda x, c: (x - c * scale) * (x - c * scale)),
        F.lit(0.0),
        lambda a, e: a + e,
    )
    return emb.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.round(F.sqrt(err2), 6).alias("l2_err"),
    )


_INT8_SQL = f"""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
scaled AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM base
),
q AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0
                                     ELSE floor(x / scale + 0.5) END) AS qv
  FROM scaled
)
SELECT vec_id,
       round(scale, 6) AS scale,
       round(sqrt(list_sum(list_transform(generate_series(1, {DIM}),
                  k -> (v[k] - qv[k] * scale) * (v[k] - qv[k] * scale)))), 6)
         AS l2_err
FROM q
"""

def bss_roundtrip_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode(bss+zstd(encode)) over the flattened embedding floats,
    executed per Arrow batch inside the scan — the distributed proof that
    byte-stream split (codecs/bss.py) is bit-lossless on real float32
    data.  The oracle is the identity (elements straight off the table),
    so any bit the codec drops turns the cell red.

    Plan shape at scale: one narrow projection + posexplode, zero
    shuffle, Python only as an Arrow-batched pass (no per-row UDF)."""
    import pyarrow as pa

    flat = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.posexplode("embedding").alias("dim", "val"))
        .select("vec_id", F.col("dim").cast("long").alias("dim"), "val")
    )

    def _roundtrip(batches):
        from pyrle_spark.codecs import decode_array, encode_with

        for batch in batches:
            vals = batch.column("val")
            dec = decode_array(encode_with("bss", vals, zstd=True))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("vec_id"),
                    batch.column("dim"),
                    dec.cast(pa.float64()),
                ],
                names=["vec_id", "dim", "val"],
            )

    return flat.mapInArrow(_roundtrip, "vec_id long, dim long, val double")


_BSS_ROUNDTRIP_SQL = f"""
SELECT vec_id, k - 1 AS dim, CAST(embedding[k] AS DOUBLE) AS val
FROM embeddings, generate_series(1, {DIM}) AS t(k)
"""

QUERIES = {
    "embedding_int8_stats": embedding_int8_stats,
    "bss_roundtrip_embedding": bss_roundtrip_embedding,
}
ORACLE_SQL = {
    "embedding_int8_stats": _INT8_SQL,
    "bss_roundtrip_embedding": _BSS_ROUNDTRIP_SQL,
}
