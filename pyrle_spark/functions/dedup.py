"""Deduplication operators over the documents table.

- exact:          hash-groupBy on full text (md5)
- n-gram Jaccard: word-5-gram shingles, exact |∩|/|∪| over MinHash-LSH
                  candidate pairs (language-agnostic: near-dups across
                  langs are found, not excluded)
- MinHash + LSH:  8 hash functions over shingle codes, 4 bands of 2 →
                  band-bucket join produces candidate pairs
- SimHash:        16-bit fingerprint from shingle-hash bit votes

The cross-engine hash primitive is md5-prefix-as-int64 (identical in
Spark and duckdb); minhash mixing uses (a·x + b) mod p with a < 2^20 so
every product stays exact in int64 on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

MOD = 1_000_000_007
MINHASH_FNS = [(37 + 101 * j, 17 + 1_000_003 * j) for j in range(8)]
BANDS = [(0, 1), (2, 3), (4, 5), (6, 7)]  # 4 bands × 2 rows


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _hash32(col):
    """First 8 hex chars of md5 as int64 — identical in both engines."""
    return F.conv(F.substring(F.md5(F.encode(col, "utf-8")), 1, 8), 16, 10).cast(
        "long"
    )


def _hash32_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


# ------------------------------------------------------------------ exact


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content hash (hash-groupBy; at scale the
    natural two-phase aggregate with map-side combine)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", F.md5(F.encode("text", "utf-8")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .select("text_hash", "n_docs", "keep_doc_id")
    )


_DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keep_doc_id
FROM documents GROUP BY md5(text)
"""


# ------------------------------------------------------------------ shingles


def _gram_idx(ws, n: int):
    """1-based start indexes of the n-grams of word array ``ws`` — EMPTY
    for docs shorter than n words.  Spark's ``sequence(1, 0)`` counts
    DOWN to ``[1, 0]`` (step defaults to -1 when start > stop), so the
    naive ``sequence(1, greatest(size-n+1, 0))`` guard still emits index
    0 and ``slice(ws, 0, n)`` throws at runtime; DuckDB's
    ``generate_series(1, 0)`` is empty, which is the intended
    semantics."""
    return F.when(
        F.size(ws) >= n, F.sequence(F.lit(1), F.size(ws) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))


def _shingles(spark, sf_dir, distinct: bool = True) -> DataFrame:
    """Word-5-gram shingles per doc: (doc_id, shingle), deduplicated by
    default.  ``distinct=False`` skips the dedup — it is a full shuffle
    of the WIDEST relation in the dedup family (every exploded shingle
    string), and duplicate-insensitive consumers (MinHash's per-doc
    ``min``) get identical results from the raw stream while their
    groupBy's map-side combine collapses each partition to one row per
    doc before anything shuffles.  Duplicate-sensitive consumers
    (Jaccard set sizes, SimHash bit votes) keep the default."""
    docs = _docs(spark, sf_dir)
    words = F.split(F.trim(F.col("text")), r"\s+")
    d = docs.select("doc_id", words.alias("ws"))
    d = d.select(
        "doc_id",
        F.explode(
            F.transform(
                _gram_idx(F.col("ws"), 5),
                lambda i: F.array_join(F.slice(F.col("ws"), i, 5), " "),
            )
        ).alias("shingle"),
    )
    return d.distinct() if distinct else d


_SHINGLES_SQL = r"""
  SELECT DISTINCT doc_id,
         array_to_string(ws[i:i+4], ' ') AS shingle
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents),
       unnest(generate_series(1, greatest(len(ws) - 4, 0))) AS t(i)
"""


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by exact shingle-set Jaccard ≥ 0.5, computed
    ONLY over MinHash-LSH candidate pairs (the scale-safe shape: the
    shared-shingle self-join form is quadratic in per-shingle document
    frequency — one hot boilerplate shingle at web scale emits billions
    of pairs; LSH banding makes candidate generation an equi-join, and
    exact Jaccard is then two linear joins of the candidate list against
    the shingle table).  |∩| per candidate from the double join,
    |∪| = |A|+|B|−|∩|."""
    sh = _shingles(spark, sf_dir).cache()  # 4 consumers: sig, sizes, d1/d2 joins
    cand = minhash_lsh_pairs(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    x = sh.select(F.col("doc_id").alias("d1"), "shingle")
    y = sh.select(F.col("doc_id").alias("d2"), "shingle")
    inter = (
        cand.join(x, "d1")
        .join(y, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    return (
        inter.join(sa, "d1")
        .join(sb, "d2")
        .select(
            "d1",
            "d2",
            (
                F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


# ------------------------------------------------------------------ minhash


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-function MinHash signature per doc over shingle codes.

    Runs over the NON-distinct shingle stream: ``min`` is
    duplicate-insensitive, so skipping the shingle dedup removes the one
    shuffle whose width is the exploded shingle text — the per-doc
    groupBy's partial aggregation reduces every scan partition to 8
    int64s per doc before the only remaining exchange."""
    sh = _shingles(spark, sf_dir, distinct=False).select(
        "doc_id", _hash32(F.col("shingle")).alias("code")
    )
    aggs = [
        F.min((F.lit(a) * F.col("code") + F.lit(b)) % F.lit(MOD)).alias(f"h{j}")
        for j, (a, b) in enumerate(MINHASH_FNS)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _sig_select() -> str:
    """SELECT body for the signature CTE (expects a ``sh`` CTE in scope)."""
    cols = ",\n       ".join(
        f"min(({a} * {_hash32_sql('shingle')} + {b}) % {MOD}) AS h{j}"
        for j, (a, b) in enumerate(MINHASH_FNS)
    )
    return f"SELECT doc_id, {cols} FROM sh GROUP BY doc_id"


# Hot-bucket guard for the band-bucket self-join.  Identical signatures
# never reach the join (they collapse to one representative first — see
# minhash_lsh_pairs), so the cap bounds DISTINCT signatures per band
# bucket: a bucket beyond it is boilerplate-grade noise whose pairs are
# below the LSH precision floor anyway.  Skipped buckets are observable
# via minhash_lsh_overcap_buckets (the overflow flag).
LSH_BUCKET_CAP = 1024


def _cand_ctes() -> str:
    """CTE chain ending in ``cand(d1, d2)`` — the SQL mirror of the
    GUARDED Spark candidate join (expects ``sig`` in scope).  Encodes
    both skew guards so the certified contract is the capped semantics,
    not an uncapped superset that only agrees while no test corpus
    trips the cap: identical signatures collapse to min(doc_id)
    representatives before the band self-join, buckets beyond
    ``LSH_BUCKET_CAP`` distinct signatures drop, and the full pair set
    is reconstructed from the membership map afterwards."""
    hc = ", ".join(f"h{j}" for j in range(len(MINHASH_FNS)))
    per_band = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {bi} AS band, h{x} AS ba, h{y} AS bb "
        "FROM mem WHERE doc_id = rep"
        for bi, (x, y) in enumerate(BANDS)
    )
    return f"""mem AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY {hc}) AS rep, {hc} FROM sig
),
bands AS (
{per_band}
),
capped AS (
  SELECT doc_id, band, ba, bb FROM (
    SELECT *, count(*) OVER (PARTITION BY band, ba, bb) AS _n FROM bands
  ) WHERE _n <= {LSH_BUCKET_CAP}
),
rep_pairs AS (
  SELECT DISTINCT a.doc_id AS r1, b.doc_id AS r2
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.ba = b.ba AND a.bb = b.bb
       AND a.doc_id < b.doc_id
),
cand AS (
  SELECT least(x.doc_id, y.doc_id) AS d1,
         greatest(x.doc_id, y.doc_id) AS d2
  FROM rep_pairs p
  JOIN mem x ON x.rep = p.r1
  JOIN mem y ON y.rep = p.r2
  UNION ALL
  SELECT x.doc_id, y.doc_id
  FROM mem x JOIN mem y ON x.rep = y.rep AND x.doc_id < y.doc_id
)"""


def _minhash_sig_sql() -> str:
    return f"WITH sh AS ({_SHINGLES_SQL})\n{_sig_select()}"


def _ngram_jaccard_sql() -> str:
    """Oracle twin of the LSH-gated exact Jaccard."""
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
sig AS ({_sig_select()}),
{_cand_ctes()},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.d1, c.d2, count(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.d1
  JOIN sh y ON y.doc_id = c.d2 AND y.shingle = x.shingle
  GROUP BY c.d1, c.d2
)
SELECT d1, d2, i * 1.0 / (sa.n + sb.n - i) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = d1
JOIN sizes sb ON sb.doc_id = d2
WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
"""


def _minhash_groups(spark: SparkSession, sf_dir: str):
    """(membership, unique-signature) pair behind the LSH join: docs
    with byte-identical signatures — the thousands of boilerplate
    copies a web crawl plants in one bucket — collapse to min(doc_id)
    so a cluster of m docs costs the band join ONE row, not m² pairs.

    One window over the signature shuffle (rep = min(doc_id) per
    signature) instead of groupBy + back-join: half the shuffles, and
    the representative subset is a filter on the same relation.

    Deliberately NOT persisted: the windowed relation's consumers in
    :func:`minhash_lsh_pairs` produce identical exchange subtrees that
    whole-plan ReusedExchange already dedupes, and an A/B at sf0.1
    measured the explicit persist ~10% SLOWER (materialization cost for
    work the reuse got free)."""
    from pyspark.sql import Window as W

    sig = minhash_signatures(spark, sf_dir)
    hcols = [f"h{j}" for j in range(len(MINHASH_FNS))]
    mem = sig.withColumn(
        "rep", F.min("doc_id").over(W.partitionBy(*hcols))
    ).select("doc_id", "rep", *hcols)
    usig = mem.filter(F.col("doc_id") == F.col("rep")).select(
        "doc_id", *hcols
    )
    return mem.select("doc_id", "rep"), usig


def _lsh_band_rows(usig) -> DataFrame:
    # one explode, not a per-band union: a union would replicate the
    # whole signature subtree (shingle explode + groupBy) once per band
    # in the plan — 4× the shuffles for identical data
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
    return usig.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", "b.band", "b.ba", "b.bb"
    )


def minhash_lsh_overcap_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The overflow flag of the hot-bucket guard: band buckets whose
    DISTINCT-signature occupancy exceeds ``LSH_BUCKET_CAP`` (their pairs
    were skipped by :func:`minhash_lsh_pairs`).  Empty on healthy
    corpora; a monitoring/audit surface at web scale."""
    mem, usig = _minhash_groups(spark, sf_dir)
    return (
        _lsh_band_rows(usig)
        .groupBy("band", "ba", "bb")
        .agg(F.count(F.lit(1)).alias("n_signatures"))
        .filter(F.col("n_signatures") > LSH_BUCKET_CAP)
    )


def minhash_lsh_pairs(
    spark: SparkSession, sf_dir: str, expand_identical: bool = True
) -> DataFrame:
    """LSH candidate pairs: 4 bands of 2 minhash rows; docs sharing any
    band bucket are candidates (banding → bucket equi-join, never a
    pairwise scan).

    Two skew guards keep the join linear on real web corpora:

    1. identical signatures collapse to one representative BEFORE the
       band join (byte-identical boilerplate pages are the classic hot
       bucket) — their pairs are reconstructed afterwards from the
       membership map, so the emitted pair set is unchanged;
    2. band buckets holding more than ``LSH_BUCKET_CAP`` DISTINCT
       signatures are dropped from the join (flagged via
       :func:`minhash_lsh_overcap_buckets`) — m(m−1)/2 growth is
       bounded at the source.

    ``expand_identical=False`` emits identical-signature clusters as
    O(m) star edges (rep → member) instead of the m(m−1)/2 clique —
    component-equivalent for the downstream connected-components /
    keep-list consumers, and the right shape at 100 TB."""
    from pyspark.sql import Window as W

    mem, usig = _minhash_groups(spark, sf_dir)
    bands = _lsh_band_rows(usig)
    # bucket-size window over the same (band, ba, bb) partitioning the
    # self-join shuffles on — one exchange feeds both, vs the old
    # groupBy + semi-join's two extra shuffles
    bands = (
        bands.withColumn(
            "_n", F.count(F.lit(1)).over(W.partitionBy("band", "ba", "bb"))
        )
        .filter(F.col("_n") <= LSH_BUCKET_CAP)
        .drop("_n")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    rep_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.ba") == F.col("b.ba"))
            & (F.col("a.bb") == F.col("b.bb"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("r1"), F.col("b.doc_id").alias("r2"))
        .distinct()
    )
    # cross-group expansion: every member of r1's group pairs with every
    # member of r2's group (they share the band bucket by signature
    # equality); groups are disjoint so least/greatest normalizes
    m1 = mem.select(F.col("rep").alias("r1"), F.col("doc_id").alias("x1"))
    m2 = mem.select(F.col("rep").alias("r2"), F.col("doc_id").alias("x2"))
    cross = (
        rep_pairs.join(m1, "r1")
        .join(m2, "r2")
        .select(
            F.least("x1", "x2").alias("d1"), F.greatest("x1", "x2").alias("d2")
        )
    )
    if expand_identical:
        # intra-group pairs (identical signature ⇒ same buckets): the
        # m(m−1)/2 clique is the query's declared output, reconstructed
        # OUTSIDE the band join
        intra = (
            mem.alias("x")
            .join(mem.alias("y"), "rep")
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2")
            )
        )
    else:
        intra = mem.filter(F.col("doc_id") != F.col("rep")).select(
            F.col("rep").alias("d1"), F.col("doc_id").alias("d2")
        )
    # no final distinct: a doc pair maps to exactly one group pair
    # (doc→group is a function), rep_pairs is already distinct, and the
    # intra/cross sets are disjoint — the extra output-sized shuffle
    # would buy nothing
    return cross.unionByName(intra)


def _minhash_lsh_sql() -> str:
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
sig AS ({_sig_select()}),
{_cand_ctes()}
SELECT d1, d2 FROM cand
"""


# ------------------------------------------------------------------ simhash


def simhash16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per bit, vote +1/−1 by the shingle hash's bit;
    fingerprint assembles the sign bits."""
    sh = _shingles(spark, sf_dir).select(
        "doc_id", _hash32(F.col("shingle")).alias("code")
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("code"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(16)
    ]
    agg = sh.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(16):
        bit = F.when(F.col(f"v{b}") >= 0, F.lit(1 << b)).otherwise(0)
        fp = bit if fp is None else fp + bit
    return agg.select("doc_id", fp.cast("long").alias("simhash"))


def _simhash_sql() -> str:
    votes = ",\n       ".join(
        f"sum(CASE WHEN (({_hash32_sql('shingle')} >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(16)
    )
    bits = " + ".join(f"CASE WHEN v{b} >= 0 THEN {1 << b} ELSE 0 END" for b in range(16))
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
agg AS (SELECT doc_id, {votes} FROM sh GROUP BY doc_id)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM agg
"""


# ------------------------------------------------------------------ embeddings


# deterministic near-dup injection: the first N_DUP vectors reappear,
# scaled ×2, under vec_id + DUP_OFFSET — cosine(v, 2v) = 1.0 exactly, so
# the query is guaranteed non-vacuous at every sf (the r01 form returned
# 0 rows at sf0.01, a vacuous oracle) and the full bucket-gate → exact
# verify path is exercised end-to-end.
DUP_OFFSET = 1_000_000
N_DUP = 20


def embedding_cosine_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ 0.99 within (LSH bucket,
    label) candidate groups — never an all-pairs join.

    The r01 form joined all pairs within a label (quadratic in label
    group size — a 100 TB blocker).  Candidates now come from the shared
    random-hyperplane buckets (similarity.lsh_bucket): near-identical
    vectors land in the same bucket with overwhelming probability (a
    scaled duplicate has identical hyperplane signs, hence the same
    bucket), so the equi-join on (bucket, label) is linear in bucket
    occupancy and the exact cosine is only a verifier."""
    from pyrle_spark.functions.similarity import lsh_bucket

    raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    dups = raw.filter(F.col("vec_id") < N_DUP).select(
        (F.col("vec_id") + DUP_OFFSET).alias("vec_id"),
        "label",
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
    )
    base = raw.unionByName(dups).withColumn(
        "bucket", lsh_bucket(F.col("embedding"))
    )
    a = base.alias("a")
    b = base.alias("b")
    dot = F.aggregate(
        F.zip_with("a.embedding", "b.embedding", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(f"{side}.embedding", lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    cos = F.round(dot / (norm("a") * norm("b")), 6)
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.99)
    )


# explicit left-fold double cosine (matches the Spark fold order bit-for-bit)
_PAIR_COS_SQL = """
  list_sum(list_transform(generate_series(1, 64),
                          k -> CAST(a.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)))
  / (sqrt(list_sum(list_transform(generate_series(1, 64),
                                  k -> CAST(a.embedding[k] AS DOUBLE) * CAST(a.embedding[k] AS DOUBLE))))
     * sqrt(list_sum(list_transform(generate_series(1, 64),
                                    k -> CAST(b.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)))))
"""


def _emb_dups_sql() -> str:
    from pyrle_spark.functions.similarity import lsh_bucket_sql

    return f"""
WITH base AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + {DUP_OFFSET}, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)
  FROM embeddings WHERE vec_id < {N_DUP}
),
assigned AS (
  SELECT vec_id, label, embedding, {lsh_bucket_sql('embedding')} AS bucket
  FROM base
)
SELECT a.vec_id AS v1, b.vec_id AS v2,
       round({_PAIR_COS_SQL}, 6) AS cos_sim
FROM assigned a JOIN assigned b
  ON a.bucket = b.bucket AND a.label = b.label AND a.vec_id < b.vec_id
WHERE round({_PAIR_COS_SQL}, 6) >= 0.99
"""


# ------------------------------------------------------------- simhash pairs

SIMHASH_BANDS = 4  # 16 bits → 4 bands of 4; any pair with hamming ≤ 3
MAX_HAMMING = 2  # shares at least one untouched band → equi-join-complete


def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ 2 — the pair
    query the r01 fingerprint operator lacked.

    Scale shape mirrors MinHash LSH: the 16-bit fingerprint splits into
    4 bands of 4 bits; ≤2 differing bits can touch at most 2 bands, so
    every qualifying pair shares ≥2 identical bands and a band-bucket
    equi-join (never an all-pairs scan) generates a complete candidate
    set; ``bit_count(xor)`` then verifies the exact distance.

    Hot-bucket guard: docs collapse to their DISTINCT fingerprint before
    the band join (≤ 2¹⁶ fingerprints exist, so a band bucket holds at
    most 2¹² rows REGARDLESS of corpus size — the join side is
    corpus-size-independent by construction); doc pairs are expanded
    afterwards from the fingerprint membership map.  A boilerplate
    cluster of m identical pages costs the join one row, never m²."""
    sig = simhash16(spark, sf_dir)
    groups = sig.groupBy("simhash").agg(F.min("doc_id").alias("rep"))
    mem = sig.select("doc_id", "simhash")
    ufp = groups.select(F.col("rep").alias("doc_id"), "simhash")
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftright(F.col("simhash"), 4 * bi).bitwiseAND(15).alias("bv"),
            )
            for bi in range(SIMHASH_BANDS)
        ]
    )
    bands = ufp.select("doc_id", "simhash", F.explode(band_structs).alias("b")).select(
        "doc_id", "simhash", "b.band", "b.bv"
    )
    a = bands.alias("a")
    b = bands.alias("b")
    # fingerprint pairs at hamming ≤ MAX_HAMMING (hamming 0 pairs are
    # intra-fingerprint, handled by the expansion below)
    fp_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.simhash") < F.col("b.simhash")),
        )
        .select(
            F.col("a.simhash").alias("s1"), F.col("b.simhash").alias("s2")
        )
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).cast("long"),
        )
        .filter(F.col("hamming") <= MAX_HAMMING)
    )
    m1 = mem.select(F.col("simhash").alias("s1"), F.col("doc_id").alias("x1"))
    m2 = mem.select(F.col("simhash").alias("s2"), F.col("doc_id").alias("x2"))
    cross = (
        fp_pairs.join(m1, "s1")
        .join(m2, "s2")
        .select(
            F.least("x1", "x2").alias("d1"),
            F.greatest("x1", "x2").alias("d2"),
            "hamming",
        )
    )
    intra = (
        mem.alias("x")
        .join(mem.alias("y"), "simhash")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("d1"),
            F.col("y.doc_id").alias("d2"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    return cross.unionByName(intra)


def _simhash_hamming_sql() -> str:
    votes = ",\n       ".join(
        f"sum(CASE WHEN (({_hash32_sql('shingle')} >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(16)
    )
    bits = " + ".join(
        f"CASE WHEN v{b} >= 0 THEN {1 << b} ELSE 0 END" for b in range(16)
    )
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, simhash, {bi} AS band, (simhash >> {4 * bi}) & 15 AS bv FROM sig"
        for bi in range(SIMHASH_BANDS)
    )
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
agg AS (SELECT doc_id, {votes} FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM agg),
bands AS (
{band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
         a.simhash AS s1, b.simhash AS s2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(s1, s2)) <= {MAX_HAMMING}
"""


# --------------------------------------------------------------- components


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS, not just pairs: connected components over
    the MinHash-LSH candidate graph, ``keep_doc_id = min(component)`` —
    the keeper convention of :func:`dedup_exact`.  A training pipeline
    drops every doc whose ``doc_id != keep_doc_id``.

    Components come from the alternating large-star/small-star algorithm
    (:mod:`pyrle_spark.functions.graph`): O(log n) rounds on ANY graph
    shape — a chain of a million near-dups converges in ~20 rounds where
    min-label propagation would need a million — at the same
    one-aggregation-plus-one-join shuffle cost per round."""
    from pyrle_spark.functions.graph import connected_components

    # connected_components checkpoints the pair list on entry, so the
    # MinHash pipeline runs once regardless of the number of CC rounds
    return connected_components(
        minhash_lsh_pairs(spark, sf_dir), "d1", "d2"
    ).select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("keep_doc_id"),
    )


def _dedup_components_sql() -> str:
    """Recursive-CTE oracle: min reachable id per node over the
    undirected LSH candidate graph (UNION dedups, so the closure
    terminates)."""
    return f"""
WITH RECURSIVE
sh AS ({_SHINGLES_SQL}),
sig AS ({_sig_select()}),
{_cand_ctes()},
und AS (
  SELECT d1 AS src, d2 AS dst FROM cand
  UNION ALL
  SELECT d2, d1 FROM cand
),
reach(doc_id, r) AS (
  SELECT src, src FROM und
  UNION
  SELECT reach.doc_id, und.dst FROM reach JOIN und ON reach.r = und.src
)
SELECT doc_id, min(r) AS keep_doc_id FROM reach GROUP BY doc_id
"""


def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's final answer: per document, its canonical keeper
    and whether it survives dedup — near-dup components where the doc
    participates in the LSH graph (identical texts always share all
    MinHash bands, so exact dups are inside the graph too), exact
    content-hash keeper for docs too short to shingle.  A training run
    keeps ``WHERE kept``."""
    comp = dedup_components(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.md5(F.encode("text", "utf-8")).alias("text_hash")
    )
    we = W.partitionBy("text_hash")
    exact = docs.select("doc_id", F.min("doc_id").over(we).alias("ekeep"))
    return (
        exact.join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("keep_doc_id", "ekeep").alias("keeper"),
            (F.col("doc_id") == F.coalesce("keep_doc_id", "ekeep")).alias("kept"),
        )
    )


def _dedup_keep_list_sql() -> str:
    return f"""
WITH RECURSIVE
sh AS ({_SHINGLES_SQL}),
sig AS ({_sig_select()}),
{_cand_ctes()},
und AS (
  SELECT d1 AS src, d2 AS dst FROM cand
  UNION ALL
  SELECT d2, d1 FROM cand
),
reach(doc_id, r) AS (
  SELECT src, src FROM und
  UNION
  SELECT reach.doc_id, und.dst FROM reach JOIN und ON reach.r = und.src
),
comp AS (SELECT doc_id, min(r) AS keep_doc_id FROM reach GROUP BY doc_id),
exact AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS ekeep
  FROM documents
)
SELECT e.doc_id,
       coalesce(c.keep_doc_id, e.ekeep) AS keeper,
       e.doc_id = coalesce(c.keep_doc_id, e.ekeep) AS kept
FROM exact e LEFT JOIN comp c ON c.doc_id = e.doc_id
"""


# -------------------------------------------------------- decontamination


def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training documents sharing at least one
    word-4-gram with the benchmark set, with the distinct-span overlap
    count.  The benchmark stand-in is deterministic (doc_id < 50 — a
    real pipeline joins against the actual eval suites); training docs
    with high n_shared get dropped or flagged before training.

    Scale shape: the benchmark side is small by construction (eval
    suites are thousands of docs, not billions) → its distinct span set
    broadcasts; the training side streams through one equi-join on the
    span with NO shuffle of the corpus and a per-doc partial count-
    distinct.  Never the quadratic doc×doc form."""
    ws = F.split(F.trim(F.col("text")), r"\s+")
    spans = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(
            F.transform(
                _gram_idx(ws, 4),
                lambda i: F.array_join(F.slice(ws, i, 4), " "),
            )
        ).alias("span"),
    )
    bench = spans.filter(F.col("doc_id") < 50).select("span").distinct()
    train = spans.filter(F.col("doc_id") >= 50)
    return (
        train.join(F.broadcast(bench), "span")
        .groupBy("doc_id")
        .agg(F.countDistinct("span").alias("n_shared"))
    )


_CONTAMINATION_SQL = r"""
WITH spans AS (
  SELECT doc_id, array_to_string(ws[i:i+3], ' ') AS span
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
       unnest(generate_series(1, greatest(len(ws) - 3, 0))) AS t(i)
),
bench AS (SELECT DISTINCT span FROM spans WHERE doc_id < 50)
SELECT doc_id, count(DISTINCT span) AS n_shared
FROM spans JOIN bench USING (span)
WHERE doc_id >= 50
GROUP BY doc_id
"""


# ----------------------------------------- exact-substring span dedup
#
# Exact duplicated-SPAN detection (the "exact substring dedup" of
# training-data pipelines — Lee et al. 2022 use suffix arrays; a suffix
# array is a global sorted structure that does not shard, so at Spark
# scale the standard substitute is CONTENT-DEFINED anchoring, the same
# trick rsync/CDC chunking uses): a word n-gram is an anchor iff
# hash(gram) % ANCHOR_MOD == 0.  Because selection depends only on the
# gram's CONTENT, two copies of the same duplicated region select the
# SAME anchors regardless of their alignment/phase inside each document
# — a shared region of c·ANCHOR_MOD grams is detected with probability
# ≈ 1 - (1 - 1/ANCHOR_MOD)^(c·ANCHOR_MOD).  Per-doc work is linear,
# anchor volume is 1/ANCHOR_MOD of the gram stream, and pair generation
# is an equi-join on the anchor gram with a document-frequency cap as
# the skew guard (a boilerplate gram at web scale would otherwise emit
# df² pairs) — never the quadratic doc×doc form and never a global
# sorted structure.

ANCHOR_N = 8  # words per anchor gram
ANCHOR_MOD = 4  # content-defined selection rate: keep hash % 4 == 0
ANCHOR_DF_CAP = 64  # skew guard: anchors in > 64 docs are boilerplate
MIN_SHARED_ANCHORS = 2  # report pairs sharing ≥ 2 anchors


def _anchor_grams(spark, sf_dir) -> DataFrame:
    """Distinct content-defined anchor word-8-grams per doc."""
    docs = _docs(spark, sf_dir)
    ws = F.split(F.trim(F.col("text")), r"\s+")
    grams = docs.select("doc_id", ws.alias("ws")).select(
        "doc_id",
        F.explode(
            F.transform(
                _gram_idx(F.col("ws"), ANCHOR_N),
                lambda i: F.array_join(F.slice(F.col("ws"), i, ANCHOR_N), " "),
            )
        ).alias("gram"),
    )
    return grams.distinct().filter(
        _hash32(F.col("gram")) % ANCHOR_MOD == 0
    )


_ANCHORS_SQL = r"""
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS gram
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents),
       unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS t(i)
"""


def duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs with exact duplicated substrings, evidenced by ≥ 2
    shared content-defined anchor grams (see module comment above for
    the scale shape: linear anchoring, df-capped equi-join, no suffix
    array, no doc×doc join)."""
    a = _anchor_grams(spark, sf_dir)
    ok = (
        a.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= ANCHOR_DF_CAP)
        .select("gram")
    )
    aa = a.join(ok, "gram")
    return (
        aa.alias("x")
        .join(aa.alias("y"), "gram")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_anchors"))
        .filter(F.col("n_shared_anchors") >= MIN_SHARED_ANCHORS)
    )


_DUPLICATE_SPANS_SQL = rf"""
WITH grams AS ({_ANCHORS_SQL}),
anchors AS (
  SELECT doc_id, gram FROM grams
  WHERE {_hash32_sql('gram')} % {ANCHOR_MOD} = 0
),
ok AS (
  SELECT gram FROM anchors GROUP BY gram
  HAVING count(*) <= {ANCHOR_DF_CAP}
)
SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS n_shared_anchors
FROM anchors x
JOIN ok ON ok.gram = x.gram
JOIN anchors y ON y.gram = x.gram
WHERE x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id
HAVING count(*) >= {MIN_SHARED_ANCHORS}
"""


def span_dedup_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span exposure: of the doc's anchor grams,
    how many also occur in at least one OTHER document (the fraction a
    span-level dedup pass would cut).  Linear shapes only: the anchor
    stream joins its own per-gram document-frequency table (one row per
    gram — no pair explosion, so no df cap needed here); docs with zero
    anchors (shorter than ANCHOR_N words or no selected gram) drop out,
    same as the oracle's inner join."""
    a = _anchor_grams(spark, sf_dir)
    dfreq = a.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    return (
        a.join(dfreq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_anchors"),
            F.sum((F.col("df") >= 2).cast("long")).alias("n_dup_anchors"),
        )
        .select(
            "doc_id",
            "n_anchors",
            "n_dup_anchors",
            F.round(F.col("n_dup_anchors") / F.col("n_anchors"), 6).alias(
                "dup_frac"
            ),
        )
    )


_SPAN_DEDUP_FRAC_SQL = rf"""
WITH grams AS ({_ANCHORS_SQL}),
anchors AS (
  SELECT doc_id, gram FROM grams
  WHERE {_hash32_sql('gram')} % {ANCHOR_MOD} = 0
),
dfreq AS (SELECT gram, count(*) AS df FROM anchors GROUP BY gram)
SELECT a.doc_id,
       count(*) AS n_anchors,
       sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS n_dup_anchors,
       round(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*),
             6) AS dup_frac
FROM anchors a JOIN dfreq d ON d.gram = a.gram
GROUP BY a.doc_id
"""


# ---------------------------------------------------------------- winnowing

# Winnowing (Schleimer/Wilkerson/Aiken, MOSS): hash every WINNOW_K-word
# gram, slide a WINNOW_W-gram window, keep each window's minimum hash.
# Any exact shared run of ≥ WINNOW_K + WINNOW_W - 1 words is GUARANTEED
# to yield a shared fingerprint (the detection floor the anchor-gram
# scheme above lacks — hash%MOD selection can miss a span entirely);
# the price is a denser fingerprint stream.  Both schemes are linear
# per document and meet in the same df-capped equi-join.
WINNOW_K = 4  # words per gram
WINNOW_W = 3  # grams per window → guarantee floor = 6 shared words
WINNOW_DF_CAP = 64  # skew guard, same rationale as ANCHOR_DF_CAP


def _winnow_fps(spark, sf_dir) -> DataFrame:
    """Distinct winnowing fingerprints per doc: (doc_id, fp)."""
    docs = _docs(spark, sf_dir)
    ws = F.split(F.trim(F.col("text")), r"\s+")
    hs = F.transform(
        _gram_idx(ws, WINNOW_K),
        lambda i: _hash32(F.array_join(F.slice(ws, i, WINNOW_K), " ")),
    )
    d = docs.select("doc_id", hs.alias("hs"))
    fps = F.transform(
        _gram_idx(F.col("hs"), WINNOW_W),
        lambda j: F.array_min(F.slice(F.col("hs"), j, WINNOW_W)),
    )
    return d.select("doc_id", F.explode(fps).alias("fp")).distinct()


_WINNOW_FPS_SQL = rf"""
  SELECT DISTINCT doc_id, fp
  FROM (
    SELECT doc_id,
           list_transform(
             generate_series(1, greatest(len(ws) - {WINNOW_K - 1}, 0)),
             i -> CAST(('0x' || substr(md5(
                    array_to_string(ws[i:i + {WINNOW_K - 1}], ' ')), 1, 8))
                  AS BIGINT)) AS hs
    FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
          FROM documents)
  ),
  unnest(list_transform(
    generate_series(1, greatest(len(hs) - {WINNOW_W - 1}, 0)),
    j -> list_min(hs[j:j + {WINNOW_W - 1}]))) AS t(fp)
"""


def winnow_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing winnowing fingerprints, with the shared
    count as evidence strength.  One shared fingerprint already proves
    an exact ≥ ``WINNOW_K``-word match (it is the min-hash of a window
    of grams both documents contain verbatim), so the threshold is 1;
    consumers gate on ``n_shared_fps`` for stricter cuts.  Scale shape
    identical to ``duplicate_spans``: linear fingerprinting, df-capped
    fingerprint equi-join, never doc×doc."""
    f = _winnow_fps(spark, sf_dir)
    ok = (
        f.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= WINNOW_DF_CAP)
        .select("fp")
    )
    ff = f.join(ok, "fp")
    return (
        ff.alias("x")
        .join(ff.alias("y"), "fp")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )


_WINNOW_PAIRS_SQL = rf"""
WITH fps AS ({_WINNOW_FPS_SQL}),
ok AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {WINNOW_DF_CAP}
)
SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS n_shared_fps
FROM fps x
JOIN ok ON ok.fp = x.fp
JOIN fps y ON y.fp = x.fp
WHERE x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id
"""


QUERIES = {
    "winnow_dup_pairs": winnow_dup_pairs,
    "dedup_exact": dedup_exact,
    "dedup_keep_list": dedup_keep_list,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "minhash_signatures": minhash_signatures,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "simhash16": simhash16,
    "simhash_hamming_pairs": simhash_hamming_pairs,
    "dedup_components": dedup_components,
    "embedding_cosine_dups": embedding_cosine_dups,
    "contamination_overlap": contamination_overlap,
    "duplicate_spans": duplicate_spans,
    "span_dedup_frac": span_dedup_frac,
}

ORACLE_SQL = {
    "winnow_dup_pairs": _WINNOW_PAIRS_SQL,
    "dedup_exact": _DEDUP_EXACT_SQL,
    "dedup_keep_list": _dedup_keep_list_sql(),
    "ngram_jaccard_pairs": _ngram_jaccard_sql(),
    "minhash_signatures": _minhash_sig_sql(),
    "minhash_lsh_pairs": _minhash_lsh_sql(),
    "simhash16": _simhash_sql(),
    "simhash_hamming_pairs": _simhash_hamming_sql(),
    "dedup_components": _dedup_components_sql(),
    "embedding_cosine_dups": _emb_dups_sql(),
    "contamination_overlap": _CONTAMINATION_SQL,
    "duplicate_spans": _DUPLICATE_SPANS_SQL,
    "span_dedup_frac": _SPAN_DEDUP_FRAC_SQL,
}
