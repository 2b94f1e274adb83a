"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched Pandas UDFs over ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is
stubbed (``decode_image`` raises ``NotImplementedError``; a deterministic
fake feature extractor stands in) — but the Spark-side plumbing is real
and tested: binary column in, schema-stable feature rows out, vectorized
batch processing, no per-row Python objects beyond the batch boundary.

``byte_histogram`` is the oracle-checked operator: the Pandas-UDF path
(text → utf-8 bytes → numpy bincount) must agree with a pure-relational
duckdb twin (explode positions + ascii()%16) — proving the binary batch
plumbing computes the same thing the SQL algebra does.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BINS = 16


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode requires an imaging library not present in this
    environment — the pipeline seam is here, clearly marked."""
    raise NotImplementedError(
        "image decoding needs an imaging library (e.g. Pillow); "
        "wire it in here — the surrounding Spark plumbing is ready"
    )


def fake_image_features(payload: bytes, n_bins: int = N_BINS) -> np.ndarray:
    """Deterministic stand-in feature extractor: histogram of byte values
    mod n_bins — vectorized, stable across runs and partitionings."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    return np.bincount(arr % n_bins, minlength=n_bins).astype(np.int64)


def byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 16-bin histogram of (codepoint % 16) over the text
    payload treated as an opaque binary column — computed in a Pandas UDF
    batch loop (the multimodal hot path shape)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = []
            bins = []
            counts = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                hist = fake_image_features(bytes(payload))
                nz = np.nonzero(hist)[0]
                ids.extend([doc_id] * len(nz))
                bins.extend(nz.tolist())
                counts.extend(hist[nz].tolist())
            yield pd.DataFrame({"doc_id": ids, "bin": bins, "cnt": counts})

    return docs.mapInPandas(extract, "doc_id long, bin int, cnt long")


_BYTE_HISTOGRAM_SQL = """
WITH pos AS (
  SELECT doc_id, unnest(generate_series(1, length(text))) AS i, text
  FROM documents
)
SELECT doc_id, CAST(ascii(substr(text, i, 1)) % 16 AS INT) AS bin, count(*) AS cnt
FROM pos GROUP BY doc_id, bin
"""


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata for an opaque binary column: byte length + a
    leading-byte tag (the magic-number sniff in real pipelines)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.ascii(F.decode(F.substring("payload", 1, 1), "utf-8")).alias("magic_byte"),
    )


_MULTIMODAL_META_SQL = """
SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       ascii(substr(text, 1, 1)) AS magic_byte
FROM documents
"""


QUERIES = {
    "byte_histogram": byte_histogram,
    "multimodal_meta": multimodal_meta,
}

ORACLE_SQL = {
    "byte_histogram": _BYTE_HISTOGRAM_SQL,
    "multimodal_meta": _MULTIMODAL_META_SQL,
}
