"""Language-model training-data operators over the documents table:
BPE merge statistics, bigram-LM novelty scoring, and GPT-style sequence
packing.

Like the rest of ``functions/``, every cross-row aggregate is
integer-only (counts, integer token budgets) so results are
parallelism-independent, and each query has an exact duckdb SQL twin.
The single per-row division producing a ratio happens once, at the end,
on already-aggregated integers — deterministic on both engines.

Reference lineage: these generalize the reference's corpus-statistics
role (pyrle's timing harness reads a genomics BED corpus,
``/root/reference/pyrle/rledict.py:764-798``); the operators themselves
are the standard web-scale pipeline stages (BPE vocabulary induction,
CCNet-style LM filtering, fixed-window sequence packing) re-expressed
as Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

TOP_PAIRS = 20
TRAIN_MOD = 5  # doc_id % TRAIN_MOD == 0 → held-out, else train
CHUNK_TOKENS = 2048
PACK_BUCKET = 64  # docs per prefix-sum bucket (two-pass packing scan)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _words_col():
    return F.split(F.trim(F.col("text")), r"\s+")


# --------------------------------------------------------- BPE pair counts


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies — the counting
    kernel of one BPE merge round — as the top-``TOP_PAIRS`` table.

    Scale shape: the pair explode is map-side only; the groupBy count
    combines partially before the shuffle; and the final ranking window
    runs over *distinct pairs* (bounded by charset², thousands of rows
    at any corpus size), never over the corpus.  Each further BPE merge
    round is one more identical pass with the learned merges applied
    map-side, so the whole induction is O(rounds) linear scans.
    """
    words = (
        _docs(spark, sf_dir)
        .select(F.explode(_words_col()).alias("w"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    rk = F.row_number().over(W.orderBy(F.desc("n"), F.asc("pair")))
    return (
        counts.withColumn("rk", rk)
        .filter(F.col("rk") <= TOP_PAIRS)
        .select("pair", "n", "rk")
    )


_BPE_PAIR_SQL = rf"""
WITH words AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents
),
pairs AS (
  SELECT substring(w, i, 2) AS pair
  FROM words, LATERAL unnest(generate_series(1, length(w) - 1)) AS t(i)
  WHERE length(w) >= 2
),
counts AS (SELECT pair, count(*) AS n FROM pairs GROUP BY pair)
SELECT pair, n, rk FROM (
  SELECT pair, CAST(n AS BIGINT) AS n,
         row_number() OVER (ORDER BY n DESC, pair ASC) AS rk
  FROM counts
) WHERE rk <= {TOP_PAIRS}
"""


# ------------------------------------------------------ bigram LM novelty


def lm_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM filtering signal with integer determinism: train a
    word-bigram table on the train split (``doc_id % TRAIN_MOD != 0``),
    then score every held-out document by how much of it the model has
    seen — ``n_unseen`` bigrams and total ``train_mass`` — plus the one
    terminal ratio ``seen_frac``.

    Counts replace the classical sum-of-log-probs because cross-row
    float sums are reduction-order-dependent (not bit-reproducible
    across engines or parallelism levels); the integer statistics carry
    the same filtering signal (a doc the model keeps predicting is
    in-distribution; a doc full of unseen bigrams is novel/noise).

    Scale shape: model building is one partially-aggregated groupBy;
    scoring is an equi-join on the bigram string (sort-merge at full
    vocabulary, broadcast once the model is count-thresholded, which is
    the standard pruning for web-scale LMs).
    """
    docs = _docs(spark, sf_dir).select("doc_id", _words_col().alias("ws"))
    bigrams = lambda df: (  # noqa: E731
        df.filter(F.size("ws") >= 2).select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
                )
            ).alias("bg"),
        )
    )
    model = (
        bigrams(docs.filter(F.col("doc_id") % TRAIN_MOD != 0))
        .groupBy("bg")
        .agg(F.count("*").alias("c12"))
    )
    held = bigrams(docs.filter(F.col("doc_id") % TRAIN_MOD == 0))
    scored = (
        held.join(model, "bg", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.when(F.col("c12").isNull(), 1).otherwise(0)).alias("n_unseen"),
            F.sum(F.coalesce("c12", F.lit(0))).alias("train_mass"),
        )
    )
    out = (
        docs.filter(F.col("doc_id") % TRAIN_MOD == 0)
        .select("doc_id")
        .join(scored, "doc_id", "left")
    )
    nb = F.coalesce("n_bigrams", F.lit(0))
    return out.select(
        "doc_id",
        nb.alias("n_bigrams"),
        F.coalesce("n_unseen", F.lit(0)).alias("n_unseen"),
        F.coalesce("train_mass", F.lit(0)).alias("train_mass"),
        F.when(nb == 0, F.lit(None).cast("double"))
        .otherwise((nb - F.col("n_unseen")).cast("double") / nb)
        .alias("seen_frac"),
    )


_LM_NOVELTY_SQL = rf"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
),
tb AS (
  SELECT concat(ws[i], ' ', ws[i + 1]) AS bg
  FROM d, LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE doc_id % {TRAIN_MOD} != 0 AND len(ws) >= 2
),
model AS (SELECT bg, count(*) AS c12 FROM tb GROUP BY bg),
hb AS (
  SELECT doc_id, concat(ws[i], ' ', ws[i + 1]) AS bg
  FROM d, LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE doc_id % {TRAIN_MOD} = 0 AND len(ws) >= 2
),
scored AS (
  SELECT hb.doc_id,
         count(*) AS n_bigrams,
         sum(CASE WHEN m.c12 IS NULL THEN 1 ELSE 0 END) AS n_unseen,
         sum(coalesce(m.c12, 0)) AS train_mass
  FROM hb LEFT JOIN model m USING (bg)
  GROUP BY hb.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(s.n_unseen, 0) AS BIGINT) AS n_unseen,
       CAST(coalesce(s.train_mass, 0) AS BIGINT) AS train_mass,
       CASE WHEN coalesce(s.n_bigrams, 0) = 0 THEN NULL
            ELSE CAST(s.n_bigrams - s.n_unseen AS DOUBLE) / s.n_bigrams
       END AS seen_frac
FROM d LEFT JOIN scored s USING (doc_id)
WHERE d.doc_id % {TRAIN_MOD} = 0
"""


# -------------------------------------------------------- sequence packing


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style packing layout: concatenate documents per ``lang`` in
    ``doc_id`` order and slice the token stream into fixed
    ``CHUNK_TOKENS`` windows; emit each document's token offset and the
    chunk range it lands in.  Token budget = the certified BPE-ish
    estimate (integer per row, so every offset is exact).

    The per-lang exclusive prefix sum is the two-pass bucketed scan —
    the same shape that replaced the engine's global encode windows
    (``operators/relational.py`` r02 audit): intra-bucket running sums
    are per-partition windows over ``PACK_BUCKET``-doc buckets, bucket
    base offsets come from a window over the tiny per-bucket summary
    table (O(#buckets) rows), never a single-partition window over the
    corpus.  The duckdb twin states the same semantics as one plain
    window.
    """
    toks = F.aggregate(
        F.transform(
            _words_col(),
            lambda w: F.greatest(F.lit(1), F.ceil(F.length(w) / 4.0)),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    t = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        toks.alias("toks"),
        (F.col("doc_id") / PACK_BUCKET).cast("long").alias("bkt"),
    )
    intra_w = (
        W.partitionBy("lang", "bkt")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    t = t.withColumn("intra", F.coalesce(F.sum("toks").over(intra_w), F.lit(0)))
    base_w = (
        W.partitionBy("lang").orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    )
    bases = (
        t.groupBy("lang", "bkt")
        .agg(F.sum("toks").alias("bkt_toks"))
        .withColumn("base", F.coalesce(F.sum("bkt_toks").over(base_w), F.lit(0)))
        .select("lang", "bkt", "base")
    )
    packed = t.join(F.broadcast(bases), ["lang", "bkt"]).withColumn(
        "tok_offset", F.col("base") + F.col("intra")
    )
    first_chunk = F.floor(F.col("tok_offset") / CHUNK_TOKENS)
    last_chunk = F.floor((F.col("tok_offset") + F.col("toks") - 1) / CHUNK_TOKENS)
    return packed.select(
        "doc_id",
        "lang",
        "toks",
        "tok_offset",
        first_chunk.alias("first_chunk"),
        last_chunk.alias("last_chunk"),
        (last_chunk - first_chunk + 1).alias("n_chunks"),
    )


_SEQ_PACK_SQL = rf"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
                 w -> greatest(1, CAST(ceil(length(w) / 4.0) AS BIGINT))))
              AS BIGINT) AS toks
  FROM documents
),
o AS (
  SELECT doc_id, lang, toks,
         CAST(coalesce(sum(toks) OVER (
            PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM t
)
SELECT doc_id, lang, toks, tok_offset,
       tok_offset // {CHUNK_TOKENS} AS first_chunk,
       (tok_offset + toks - 1) // {CHUNK_TOKENS} AS last_chunk,
       (tok_offset + toks - 1) // {CHUNK_TOKENS}
         - tok_offset // {CHUNK_TOKENS} + 1 AS n_chunks
FROM o
"""


QUERIES = {
    "bpe_pair_counts": bpe_pair_counts,
    "lm_bigram_novelty": lm_bigram_novelty,
    "sequence_packing": sequence_packing,
}

ORACLE_SQL = {
    "bpe_pair_counts": _BPE_PAIR_SQL,
    "lm_bigram_novelty": _LM_NOVELTY_SQL,
    "sequence_packing": _SEQ_PACK_SQL,
}


# ------------------------------------------------------- full BPE trainer


def _merge_fold(sym_col, a: str, b: str):
    """Apply one BPE merge (a, b) -> a+b to a symbol array, greedy
    left-to-right, as a pure built-in fold (no Python in the plan)."""
    merged = a + b
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_learn(spark: SparkSession, sf_dir: str, rounds: int = 4) -> list:
    """Learn ``rounds`` BPE merges over the corpus, the scalable way:
    ONE corpus pass builds the distinct-word frequency table, then every
    merge round runs on that vocab-sized table only (the standard
    trick of real BPE trainers — corpus size stops mattering after the
    first pass).  Pair counts are weighted by word frequency; ties
    break on lexicographic pair order so the result is deterministic at
    any parallelism.  Returns ``[(a, b), ...]`` in merge order.

    Per round: one partially-aggregated groupBy over the vocab and a
    single-row driver collect (the argmax merge) — O(rounds) tiny jobs
    after the one corpus scan.  The merge application is a built-in
    ``aggregate`` fold, so no Python touches the hot path.
    """
    words = (
        _docs(spark, sf_dir)
        .select(F.explode(_words_col()).alias("w"))
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    vocab = words.select(
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").alias(
            "sym"
        ),
        "freq",
    ).persist()
    vocab.count()
    merges: list = []
    for _ in range(rounds):
        pairs = (
            vocab.filter(F.size("sym") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(sym) - 1),"
                        " i -> struct(element_at(sym, i) AS a,"
                        "             element_at(sym, i + 1) AS b))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        new_vocab = vocab.select(
            _merge_fold(F.col("sym"), a, b).alias("sym"), "freq"
        ).persist()
        new_vocab.count()
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()
    return merges


def bpe_apply(df: DataFrame, text_col: str, merges: list) -> DataFrame:
    """Tokenize ``text_col`` with learned BPE merges: split to words,
    split words to characters, apply every merge in order (chained
    built-in folds — one map-side pass, no shuffle, no Python).
    Adds ``tokens: array<string>`` and ``n_tokens``."""
    # per-word character arrays (substring over a lambda var needs expr
    # form).  The length guard matters: Spark's sequence(1, 0) counts
    # DOWN (see _gram_idx in functions/dedup.py), so a zero-length word
    # must map to an empty array explicitly.
    sym = F.expr(
        f"transform(split(trim({text_col}), '\\\\s+'),"
        " w -> CASE WHEN length(w) >= 1 THEN"
        "   transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        "   ELSE CAST(array() AS array<string>) END)"
    )
    tokens = sym
    for a, b in merges:
        tokens = F.transform(tokens, lambda s: _merge_fold(s, a, b))
    flat = F.flatten(tokens)
    return df.withColumn("tokens", flat).withColumn("n_tokens", F.size(flat))


# ----------------------------------------------- fixed-merge tokenization

# A static merge table makes the tokenizer SQL-expressible, so the whole
# bpe_apply plumbing gets an oracle twin (the *learned* merge loop is
# differentially tested in pytest instead — its rules are data-dependent
# and cannot appear in a static SQL string).  'th'→'the' chains two
# rules through a produced token, exercising multi-level merging.
FIXED_MERGES = [("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n")]
_SEP = "\x1f"  # token separator for the duckdb string-fold twin


def bpe_tokenize_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the FIXED_MERGES table via
    ``bpe_apply`` (chained built-in folds, map-side only) and emit the
    per-doc token count plus the space-joined token stream."""
    out = bpe_apply(_docs(spark, sf_dir), "text", FIXED_MERGES)
    return out.select(
        "doc_id",
        "n_tokens",
        F.array_join("tokens", " ").alias("token_str"),
    )


def _bpe_fixed_sql() -> str:
    """duckdb twin: per word, fold characters into a SEP-joined token
    string; a merge (a, b) fires when the accumulator's last token is
    exactly ``a`` and the next symbol is ``b`` — concatenating without
    the separator IS the merge, because BPE tokens are literal
    concatenations of their parts."""
    cur = (
        "array_to_string(list_transform(generate_series(1, length(w)),"
        f" i -> substring(w, i, 1)), '{_SEP}')"
    )
    for a, b in FIXED_MERGES:
        lst = f"string_split({cur}, '{_SEP}')"
        cur = (
            f"list_reduce({lst}, (acc, s) -> CASE WHEN"
            f" (acc = '{a}' OR acc LIKE '%{_SEP}{a}') AND s = '{b}'"
            f" THEN acc || s ELSE acc || '{_SEP}' || s END)"
        )
    return rf"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
  FROM documents
)
SELECT doc_id,
       CAST(coalesce(list_sum(list_transform(ws,
              w -> CASE WHEN length(w) >= 1
                        THEN len(string_split({cur}, '{_SEP}'))
                        ELSE 0 END)), 0) AS BIGINT) AS n_tokens,
       array_to_string(list_transform(ws,
         w -> CASE WHEN length(w) >= 1
                   THEN replace({cur}, '{_SEP}', ' ')
                   ELSE NULL END), ' ') AS token_str
FROM d
"""


QUERIES["bpe_tokenize_fixed"] = bpe_tokenize_fixed
ORACLE_SQL["bpe_tokenize_fixed"] = _bpe_fixed_sql()
