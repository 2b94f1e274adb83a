"""Deterministic sketches & sampling over the documents table.

Training-data pipelines need cardinality estimates and reproducible
subsamples at 100 TB; both are implemented here with HASH-DETERMINISTIC
algorithms so the DuckDB oracle can replay them bit-for-bit (the usual
HLL/reservoir operators are RNG- or merge-order-dependent and can't be
oracle-checked):

- **KMV (k-minimum-values) distinct sketch**: keep the k smallest
  md5-derived hash values per group; with the k-th smallest normalized
  to (0,1], ``est = (k-1)/kth``.  One groupBy with a bounded (k-sized)
  state per group — the same scale shape as a real theta/HLL sketch,
  and mergeable the same way (union of mins).  Groups with fewer than
  k distinct hashes report exactly.
- **Hash-priority sampling**: the k docs with the smallest
  ``md5(doc_id || salt)`` per group — a deterministic, seedable,
  uniform-without-replacement sample (the fixed-priority special case
  of the A-ES weighted-reservoir family).  Re-running at any
  parallelism, or incrementally on new data, keeps the sample stable
  for unchanged rows.

The shared hash primitive is the md5-prefix-as-int64 of
functions/dedup.py — identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

KMV_K = 64
SAMPLE_K = 5
SAMPLE_SALT = "r2-salt"
HASH_SPACE = float(1 << 32)  # md5-prefix hashes are uniform in [0, 2^32)

__all__ = ["distinct_kmv", "sample_hash_priority", "QUERIES", "ORACLE_SQL"]


# the cross-engine hash primitive is SHARED with the dedup/LSH pipeline
# (one definition — a prefix-width or encoding fix cannot drift)
from pyrle_spark.functions.dedup import _docs, _hash32, _hash32_sql  # noqa: E402


def distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-text estimate from the k smallest text-hash
    values.  est = (k-1) / (kth_min / 2^32); exact count when the group
    has < k distinct hashes.  Rounded to 3 decimals on both engines."""
    docs = _docs(spark, sf_dir).select(
        "source", _hash32(F.col("text")).alias("h")
    )
    dh = docs.distinct()
    # two-level top-k so no window ever sorts a whole source's distinct
    # hash set: per-(source, hash-bucket) k-mins first (32 parallel
    # subgroups), then the global k-mins over the ≤ 32·k survivors —
    # the k smallest overall are always inside the per-bucket k-mins
    wb = W.partitionBy("source", F.pmod("h", F.lit(32))).orderBy("h")
    pre = dh.select("source", "h", F.row_number().over(wb).alias("rkb")).filter(
        F.col("rkb") <= KMV_K
    )
    w = W.partitionBy("source").orderBy("h")
    ranked = pre.select(
        "source", "h", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= KMV_K)
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_mins"), F.max("h").alias("kth")
    )
    est = F.when(
        F.col("n_mins") < KMV_K, F.col("n_mins").cast("double")
    ).otherwise(
        (F.lit(float(KMV_K - 1))) / (F.col("kth") / F.lit(HASH_SPACE))
    )
    return agg.select("source", F.round(est, 3).alias("distinct_est"))


def _distinct_kmv_sql() -> str:
    return f"""
WITH dh AS (
  SELECT DISTINCT source, {_hash32_sql("text")} AS h FROM documents
),
ranked AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rk
  FROM dh QUALIFY rk <= {KMV_K}
),
agg AS (
  SELECT source, count(*) AS n_mins, max(h) AS kth FROM ranked GROUP BY source
)
SELECT source,
       round(CASE WHEN n_mins < {KMV_K} THEN CAST(n_mins AS DOUBLE)
                  ELSE {float(KMV_K - 1)} / (kth / {HASH_SPACE}) END, 3)
         AS distinct_est
FROM agg
"""


def sample_hash_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample: the SAMPLE_K docs with the smallest
    salted doc_id hash per source.  Ties (none with md5, but belt and
    braces) break on doc_id, so the result is a pure function of the
    data + salt — stable across parallelism and reruns."""
    docs = _docs(spark, sf_dir).select(
        "source",
        "doc_id",
        _hash32(F.concat(F.col("doc_id").cast("string"), F.lit(SAMPLE_SALT))).alias(
            "priority"
        ),
    )
    w = W.partitionBy("source").orderBy("priority", "doc_id")
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= SAMPLE_K)
    )


def _sample_sql() -> str:
    h = _hash32_sql(f"doc_id || '{SAMPLE_SALT}'")
    return f"""
SELECT source, doc_id,
       row_number() OVER (PARTITION BY source ORDER BY {h}, doc_id)
         AS sample_rank
FROM documents QUALIFY sample_rank <= {SAMPLE_K}
"""


QUANTILE_QS = (0.25, 0.5, 0.75, 0.9)


def _grouped_quantiles(spark, sf_dir, qs) -> DataFrame:
    """(lang, q, value) exact quantiles — see quantiles_by_lang."""
    docs = _docs(spark, sf_dir).select("lang", "n_chars")
    hist = docs.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy("lang").orderBy("n_chars")
    cum = hist.select("lang", "n_chars", F.sum("c").over(w).alias("cum"))
    tot = hist.groupBy("lang").agg(F.sum("c").alias("n"))
    qdf = spark.createDataFrame([(q,) for q in qs], "q double")
    return (
        cum.join(tot, "lang")
        .join(F.broadcast(qdf))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("lang", "q")
        .agg(F.min("n_chars").cast("long").alias("value"))
    )


def quantiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT grouped quantiles of ``n_chars`` per language, fully
    distributed — no sort of the data, no driver-side state, no
    approximation.

    Shape: (1) map-side-combined histogram ``groupBy(lang, value)`` —
    the only pass over the data; (2) cumulative counts over the
    HISTOGRAM (one window per lang, ≤ |value domain| rows per group —
    for unbounded/float domains the same two-level bucketed-cumsum
    trick as operators/relational._bucketed_fill applies); (3) each
    quantile q picks the smallest value whose cumulative count reaches
    ``ceil(q·n)`` — exactly DuckDB's ``quantile_disc`` rank rule, so
    the oracle can use DuckDB's OWN independent quantile implementation
    rather than a transliteration of this algorithm.  The 4 quantile
    constants broadcast."""
    return _grouped_quantiles(spark, sf_dir, QUANTILE_QS)


def _quantiles_sql() -> str:
    parts = [
        f"SELECT lang, CAST({q} AS DOUBLE) AS q, "
        f"CAST(quantile_disc(n_chars, {q}) AS BIGINT) AS value "
        f"FROM documents GROUP BY lang"
        for q in QUANTILE_QS
    ]
    return "\nUNION ALL\n".join(parts)


SPLIT_SALT = "split-v1"
SPLIT_BOUNDS = (80, 90)  # hash%100: <80 train, <90 val, else test


def dataset_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by salted content hash
    (hash%100 against fixed boundaries), reported as per-(source,
    split) counts.  The assignment is a pure function of doc_id + salt:
    stable across reruns, parallelism, and incremental appends — the
    property a training pipeline needs so yesterday's val doc can never
    silently migrate into today's train shard.  One map-side-combined
    groupBy; no shuffle of the corpus rows themselves."""
    docs = _docs(spark, sf_dir).select("source", "doc_id")
    bucket = (
        _hash32(F.concat(F.col("doc_id").cast("string"), F.lit(SPLIT_SALT)))
        % 100
    )
    split = (
        F.when(bucket < SPLIT_BOUNDS[0], "train")
        .when(bucket < SPLIT_BOUNDS[1], "val")
        .otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _split_sql() -> str:
    h = _hash32_sql(f"doc_id || '{SPLIT_SALT}'")
    return f"""
SELECT source,
       CASE WHEN {h} % 100 < {SPLIT_BOUNDS[0]} THEN 'train'
            WHEN {h} % 100 < {SPLIT_BOUNDS[1]} THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs
FROM documents
GROUP BY source, split
"""


def median_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition of the exact-quantile operator with a filter: per
    language, how many documents survive a keep-if-``n_chars`` ≥
    lang-median gate.  The median table is ≤ |langs| rows → broadcast
    back onto the corpus scan; one grouped count after."""
    med = _grouped_quantiles(spark, sf_dir, (0.5,)).select(
        "lang", F.col("value").alias("med_n_chars")
    )
    docs = _docs(spark, sf_dir).select("lang", "n_chars")
    return (
        docs.join(F.broadcast(med), "lang")
        .groupBy("lang", "med_n_chars")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                (F.col("n_chars") >= F.col("med_n_chars")).cast("long")
            ).alias("n_kept"),
        )
        .select(
            "lang",
            "med_n_chars",
            "n_total",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_total"), 6).alias("keep_frac"),
        )
    )


_MEDIAN_FILTER_SQL = """
WITH med AS (
  SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS med_n_chars
  FROM documents GROUP BY lang
)
SELECT d.lang, m.med_n_chars,
       count(*) AS n_total,
       sum(CASE WHEN d.n_chars >= m.med_n_chars THEN 1 ELSE 0 END) AS n_kept,
       round(sum(CASE WHEN d.n_chars >= m.med_n_chars THEN 1 ELSE 0 END)
             * 1.0 / count(*), 6) AS keep_frac
FROM documents d JOIN med m ON m.lang = d.lang
GROUP BY d.lang, m.med_n_chars
"""


QUERIES = {
    "distinct_kmv": distinct_kmv,
    "sample_hash_priority": sample_hash_priority,
    "quantiles_by_lang": quantiles_by_lang,
    "dataset_split_stratified": dataset_split_stratified,
    "median_length_filter": median_length_filter,
}

ORACLE_SQL = {
    "distinct_kmv": _distinct_kmv_sql(),
    "sample_hash_priority": _sample_sql(),
    "quantiles_by_lang": _quantiles_sql(),
    "dataset_split_stratified": _split_sql(),
    "median_length_filter": _MEDIAN_FILTER_SQL,
}
