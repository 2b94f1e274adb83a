"""Deterministic synthetic Common-Crawl-style webtext.

Generates the exact input shape from BASELINE.json's input_hint —
``(url string, warc_ts timestamp, html binary, text string, lang string)``
— entirely with JVM-side built-in functions (no Python UDFs), seeded per
logical row id so the same rows come out **regardless of partition count
or parallelism level** (required for the N vs 4N identical-output check).

Realism properties carried from Common Crawl:
- hosts and langs are Zipf-skewed (hot-key skew for salting tests);
- warc_ts clusters per host inside a crawl window (frame-of-reference /
  delta friendly);
- text is deterministically extractable from html
  (``extract_text(html) == text`` byte-identical per url);
- rows are emitted in (host, ts) crawl order via the ``sort_key`` column,
  which gives lang/host columns long runs — like real WARC dumps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["generate_webtext", "extract_text", "LANGS"]

LANGS = (
    "en en en en en en zh es de fr ru pt ja it nl pl tr ar ko sv cs fi hu da no "
    "el he th vi id uk ro"
).split()  # repetition of 'en' skews the head further

_VOCAB = (
    "the of and to a in is it you that he was for on are with as his they be at "
    "one have this from or had by hot word but what some we can out other were "
    "all there when up use your how said an each she which do their time if will "
    "way about many then them write would like so these her long make thing see "
    "him two has look more day could go come did number sound no most people my "
    "over know water than call first who may down side been now find"
).split()


def generate_webtext(
    spark: SparkSession,
    n_rows: int,
    n_hosts: int = 1000,
    seed: int = 42,
    n_partitions: int | None = None,
    block_rows: int | None = None,
) -> DataFrame:
    """Build the webtext DataFrame, deterministic in ``(n_rows, seed)``.

    All columns are pure functions of the row id; the output carries the
    row id as ``doc_seq`` (the stable order/block key for the encoder).

    ``block_rows``: emit exactly one encoder block per partition — each
    partition holds ids [k·block_rows, (k+1)·block_rows) precisely, so a
    parquet write of this frame is block-aligned (one file per block) and
    the encoder can run shuffle-free (EncodeConfig.block_aligned).  Plain
    ``spark.range`` partition arithmetic does NOT give this (it splits
    n_rows/n_partitions, which rarely lands on block boundaries).
    """
    if block_rows:
        n_blocks = (n_rows + block_rows - 1) // block_rows
        df = spark.range(0, n_blocks, 1, n_blocks).select(
            F.explode(
                F.sequence(
                    F.col("id") * block_rows,
                    F.least(
                        F.lit(n_rows - 1), (F.col("id") + 1) * block_rows - 1
                    ),
                )
            ).alias("id")
        )
    else:
        df = spark.range(
            0, n_rows, 1, n_partitions or spark.sparkContext.defaultParallelism
        )
    h1 = F.abs(F.xxhash64("id", F.lit(seed)))
    h2 = F.abs(F.xxhash64("id", F.lit(seed + 1)))
    h3 = F.abs(F.xxhash64("id", F.lit(seed + 2)))
    # Zipf-ish skew: u^4 concentrates mass near rank 0
    u_host = (h1 % 1_000_000) / 1_000_000.0
    host_rank = F.floor(F.lit(n_hosts) * F.pow(u_host, F.lit(4.0))).cast("long")
    u_lang = (h2 % 1_000_000) / 1_000_000.0
    lang_idx = F.floor(F.lit(len(LANGS)) * F.pow(u_lang, F.lit(2.0))).cast("int")
    langs_arr = F.array(*[F.lit(x) for x in LANGS])
    vocab_arr = F.array(*[F.lit(w) for w in _VOCAB])
    n_words = (20 + h3 % 120).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab_arr, (F.pmod(F.xxhash64(F.col("id"), i), F.lit(len(_VOCAB))) + 1).cast("int")
        ),
    )
    text = F.concat_ws(" ", words)
    # crawl window: 30 days starting 2024-01-01; each host crawled in a
    # ~2h slice, jitter within it → per-host clustered timestamps
    base_us = F.lit(1_704_067_200_000_000)  # 2024-01-01 UTC in micros
    ts_us = (
        base_us
        + host_rank * F.lit(7_200_000_000)
        + (h2 % F.lit(7_200_000_000))
    )
    url = F.concat(
        F.lit("https://host"),
        host_rank.cast("string"),
        F.lit(".example.com/p/"),
        F.conv(F.format_string("%016x", h3), 16, 36),
        F.lit("-"),
        F.col("id").cast("string"),
    )
    title = F.concat(F.lit("Page "), F.col("id").cast("string"))
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>"),
            title,
            F.lit("</title></head><body><p>"),
            text,
            F.lit("</p></body></html>"),
        ),
        "utf-8",
    )
    out = df.select(
        F.col("id").alias("doc_seq"),
        url.alias("url"),
        F.timestamp_micros(ts_us).alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        F.element_at(langs_arr, lang_idx + 1).alias("lang"),
        host_rank.alias("host_rank"),
        (host_rank * F.lit(1) * F.lit(1_000_000_000_000) + F.col("id")).alias(
            "sort_key"
        ),
    )
    return out


def extract_text(html_col):
    """Recover the text column from html — byte-identical per url
    (the input_hint invariant). Pure JVM expression."""
    return F.regexp_extract(
        F.decode(html_col, "utf-8"), r"<p>(.*)</p>", 1
    )
