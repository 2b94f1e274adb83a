"""Streaming NEAR-duplicate deduplication: MinHash-LSH bucket index as
incremental state, fed by ``foreachBatch``.

The batch engine's ``minhash_lsh_pairs`` (functions/dedup.py) joins the
whole corpus's band buckets against themselves; an ingest pipeline sees
documents arrive continuously and must drop near-re-crawls against
EVERYTHING kept so far.  Stateful shape: the state is the **band-bucket
index** of every kept document — O(4 rows × kept docs), independent of
how many duplicates were dropped — persisted as a parquet table that
each micro-batch anti-joins against and appends to:

    batch bands  ──anti-join──▶ survivors ──append──▶ bucket index
         │                          ▲
         └── within-batch greedy:   │  (min doc_id per bucket kept,
             colliding higher ids dropped before the index grows)

Why ``foreachBatch`` and not ``applyInPandasWithState``: a document owns
4 band rows that hash to DIFFERENT groups, so no single group holds the
whole keep/drop decision — the decision is a join across buckets, which
is exactly what a per-batch plan expresses naturally (and the bucket
index doubles as a queryable artifact).  The exact-dedup stream
(dedup_stream.py) keys state by the full content hash, where one group
IS the decision — there ``applyInPandasWithState`` is the right tool.

Restart safety: the checkpoint replays the last uncommitted batch; the
sink commits BEFORE the index, so a crash between the two re-emits the
same kept docs on replay (the sink dedups by doc_id on read) instead of
anti-joining the batch's own buckets and losing them.  Dedup of the
index itself is not required for correctness, only for size;
``compact_index`` rewrites it when it grows.

Same hash family as the batch operator (md5-prefix int64, (a·x+b) mod p
mixing, 4 bands × 2 rows — functions/dedup.py:20-22), so a document the
batch pipeline would pair is exactly one the stream drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from pyrle_spark.functions.dedup import BANDS, MINHASH_FNS, MOD, _hash32

__all__ = ["band_rows", "neardup_docs_stream", "compact_index"]


def band_rows(df: DataFrame) -> DataFrame:
    """(doc_id, band, ba, bb) LSH band rows for a (doc_id, text) frame —
    the streaming twin of the batch signature pipeline (shingle → 8
    minhashes → 4 bands × 2), one explode, no per-band subtree copies."""
    words = F.split(F.trim(F.col("text")), r"\s+")
    # a doc with < 5 words has NO shingles: sequence(1, size-4) would
    # count DOWN to [1, 0] (Spark defaults step to -1 when start > stop)
    # and slice(ws, 0, 5) throws — emit an empty index array instead
    idxs = F.when(
        F.size("ws") >= 5, F.sequence(F.lit(1), F.size("ws") - 4)
    ).otherwise(F.array().cast("array<int>"))
    sh = (
        df.select("doc_id", words.alias("ws"))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    idxs,
                    lambda i: F.array_join(F.slice(F.col("ws"), i, 5), " "),
                )
            ).alias("shingle"),
        )
        .distinct()
        .select("doc_id", _hash32(F.col("shingle")).alias("code"))
    )
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("code") + F.lit(b)) % F.lit(MOD)).alias(f"h{j}")
            for j, (a, b) in enumerate(MINHASH_FNS)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.col(f"h{x}").alias("ba"),
                F.col(f"h{y}").alias("bb"),
            )
            for bi, (x, y) in enumerate(BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", "b.band", "b.ba", "b.bb"
    )


def _process_batch(index_dir: str, sink_dir: str):
    """foreachBatch body: greedy within-batch LSH dedup, then anti-join
    the survivors' buckets against the persistent index."""

    def inner(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bands = band_rows(batch_df).cache()
        # within-batch greedy keeper: per bucket the min doc_id wins; a
        # doc losing ANY of its buckets to a smaller id is dropped
        # (matches the batch pair convention d1 < d2 → d2 is the dup)
        keeper = bands.groupBy("band", "ba", "bb").agg(
            F.min("doc_id").alias("min_id")
        )
        in_batch_dropped = (
            bands.join(keeper, ["band", "ba", "bb"])
            .filter(F.col("doc_id") > F.col("min_id"))
            .select("doc_id")
            .distinct()
        )
        survivors = bands.join(in_batch_dropped, "doc_id", "left_anti")
        # cross-batch: any bucket already in the index kills the doc.
        # Probe by READING, not os.path (the index may live on object
        # storage the driver's local fs cannot see).
        try:
            idx = spark.read.parquet(index_dir)
            hit = (
                survivors.join(idx, ["band", "ba", "bb"], "left_semi")
                .select("doc_id")
                .distinct()
            )
            survivors = survivors.join(hit, "doc_id", "left_anti")
        except AnalysisException:
            pass  # first batch: no index yet
        # docs too short to shingle have no band rows: they collide with
        # nothing, so they are KEPT (the batch pipeline's dedup_keep_list
        # keeps them through the exact-hash fallback; exact re-crawl
        # dedup of such docs is dedup_stream's job)
        bandless = batch_df.select("doc_id").join(
            bands.select("doc_id").distinct(), "doc_id", "left_anti"
        )
        kept_ids = survivors.select("doc_id").unionByName(bandless).distinct()
        kept_docs = batch_df.join(kept_ids, "doc_id", "left_semi").select(
            "doc_id", F.length("text").cast("long").alias("n_chars")
        )
        # commit order: kept list FIRST, index second.  Crash between the
        # two → replay re-computes the same survivors (their buckets are
        # not yet indexed) and re-appends — the sink dedups by doc_id on
        # read.  The reverse order loses documents: a replay after an
        # index append but before the sink append anti-joins the batch's
        # own just-appended buckets and emits nothing.
        kept_docs.write.mode("append").parquet(sink_dir)
        survivors.write.mode("append").parquet(index_dir)
        bands.unpersist()

    return inner


def neardup_docs_stream(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    index_dir: str,
    sink_dir: str,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Start the streaming near-dup deduper over a parquet source of
    ``(doc_id long, text string)``.  Kept documents accumulate in
    ``sink_dir`` (read with ``.distinct()`` — replays may re-append);
    the LSH bucket index of every kept doc lives in ``index_dir``.
    Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    writer = stream.writeStream.foreachBatch(
        _process_batch(index_dir, sink_dir)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_index(spark, index_dir: str) -> None:
    """Rewrite the bucket index without duplicate rows (size maintenance;
    correctness never depends on it)."""
    import shutil
    import tempfile

    idx = spark.read.parquet(index_dir).distinct()
    tmp = tempfile.mkdtemp(prefix="lsh_index_compact_")
    idx.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(index_dir)
    shutil.rmtree(tmp, ignore_errors=True)
