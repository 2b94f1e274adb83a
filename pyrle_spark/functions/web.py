"""Web-pipeline scalar operators (SURVEY §2.9 string/json family):
JSON property extraction over the events stream and URL
canonicalization for crawl dedup.

Both are pure built-in-expression plans (JVM-side, whole-stage codegen,
zero shuffles before the final aggregate) with exact duckdb twins —
at 100 TB these run at scan speed with the parquet reader's column
pruning, no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the events table's ``props`` JSON column and aggregate the
    extracted integer property per event type — the semi-structured
    sidecar pattern (JSON column riding a typed table)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_JSON_PROPS_SQL = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for crawl dedup, on deterministically messy
    URLs derived from each document: mixed-case scheme+host, a default
    :443 port on every third URL, utm_* tracking params, and a trailing
    slash on every fourth.  Canonical form = lowercase scheme+host,
    default port dropped, utm_* params stripped (a dangling '?' too),
    trailing slash removed.  Emits the canonical URL per doc plus the
    per-host doc count — the canonical-key dedup shape."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    messy = F.concat(
        F.when(F.col("doc_id") % 2 == 0, "HTTPS://WWW.").otherwise("https://www."),
        F.col("source"),
        F.lit(".example.com"),
        F.when(F.col("doc_id") % 3 == 0, ":443").otherwise(""),
        F.lit("/a/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 4 == 0, "/").otherwise(""),
        F.lit("?utm_source=feed&utm_campaign=c"),
        (F.col("doc_id") % 5).cast("string"),
    )
    canon = messy
    # lowercase the scheme+host prefix only (paths are case-sensitive)
    head = F.regexp_extract(canon, r"^([^/]*//[^/]*)", 1)
    tail = F.expr("substring(url_messy, length(regexp_extract(url_messy, '^([^/]*//[^/]*)', 1)) + 1)")
    d = docs.select(
        "doc_id", "source", canon.alias("url_messy")
    ).select(
        "doc_id",
        "source",
        "url_messy",
        F.concat(F.lower(head), tail).alias("u1"),
    )
    u = F.regexp_replace(F.col("u1"), r":443(/|\?|$)", "$1")  # default port
    u = F.regexp_replace(u, r"(utm_[^&=]*=[^&]*&?)+", "")  # tracking params
    u = F.regexp_replace(u, r"\?$", "")  # dangling '?'
    u = F.regexp_replace(u, r"/$", "")  # trailing slash
    d = d.select("doc_id", "source", u.alias("url_canonical"))
    per_host = F.regexp_extract(F.col("url_canonical"), r"//([^/]*)", 1)
    return (
        d.select("doc_id", "url_canonical", per_host.alias("host"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("url_canonical").alias("n_urls"),
            F.min("url_canonical").alias("first_url"),
        )
    )


_URL_CANON_SQL = r"""
WITH m AS (
  SELECT doc_id, source,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://www.' END)
         || source || '.example.com'
         || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
         || '/a/' || CAST(doc_id AS VARCHAR)
         || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
         || '?utm_source=feed&utm_campaign=c' || CAST(doc_id % 5 AS VARCHAR)
         AS url_messy
  FROM documents
), lowered AS (
  SELECT doc_id, source,
         lower(regexp_extract(url_messy, '^([^/]*//[^/]*)', 1))
         || substr(url_messy,
                   length(regexp_extract(url_messy, '^([^/]*//[^/]*)', 1)) + 1)
         AS u1
  FROM m
), canon AS (
  SELECT doc_id, source,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(u1, ':443(/|\?|$)', '\1'),
               '(utm_[^&=]*=[^&]*&?)+', ''),
             '\?$', ''),
           '/$', '') AS url_canonical
  FROM lowered
)
SELECT regexp_extract(url_canonical, '//([^/]*)', 1) AS host,
       count(*) AS n_docs,
       count(DISTINCT url_canonical) AS n_urls,
       min(url_canonical) AS first_url
FROM canon
GROUP BY 1
"""


def url_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-crawl URL dedup — the recrawl pattern: the same URL
    appears once per crawl snapshot and only the newest capture is kept.
    URLs derived deterministically (source + doc_id%1000 → ~1000 urls
    per source, each crawled many times; doc_id is the monotone crawl
    order).  Per source: distinct urls, total captures, superseded
    captures, and ``sum_keep_ids`` — the sum of the kept doc_ids, which
    pins the exact per-url argmax row set, not just the counts.

    Scale shape: two partial-aggregate groupBys (url, then source) —
    max/count combine map-side, the shuffle carries one row per url; no
    window, no sort, no row ever compared pairwise."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    url = F.concat(
        F.col("source"), F.lit("/"), (F.col("doc_id") % 1000).cast("string")
    )
    per_url = (
        docs.select("source", url.alias("url"), "doc_id")
        .groupBy("source", "url")
        .agg(
            F.max("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_crawls"),
        )
    )
    return per_url.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum("n_crawls").alias("n_captures"),
        (F.sum("n_crawls") - F.count(F.lit(1))).alias("n_superseded"),
        F.sum("keep_doc_id").alias("sum_keep_ids"),
    )


_URL_DEDUP_LATEST_SQL = """
WITH per_url AS (
  SELECT source,
         source || '/' || CAST(doc_id % 1000 AS VARCHAR) AS url,
         max(doc_id) AS keep_doc_id,
         count(*) AS n_crawls
  FROM documents
  GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(n_crawls) AS BIGINT) AS n_captures,
       CAST(sum(n_crawls) - count(*) AS BIGINT) AS n_superseded,
       CAST(sum(keep_doc_id) AS BIGINT) AS sum_keep_ids
FROM per_url
GROUP BY source
"""


QUERIES = {
    "json_props_agg": json_props_agg,
    "url_canonicalize": url_canonicalize,
    "url_dedup_latest": url_dedup_latest,
}

ORACLE_SQL = {
    "json_props_agg": _JSON_PROPS_SQL,
    "url_canonicalize": _URL_CANON_SQL,
    "url_dedup_latest": _URL_DEDUP_LATEST_SQL,
}
