"""Z-order (Morton-interleaved) layout rewrite for multi-column pruning.

``rewrite_sorted`` clusters one sort order perfectly and later columns
not at all; a table queried by BOTH ``lang = …`` AND ``n_chars >= …``
wants each block to cover a small rectangle in (lang, n_chars) space.
Z-ordering does that: map each clustering column to a fixed-width code,
interleave the code bits into one Morton key, sort by it (Iceberg's
``rewrite_data_files`` zorder strategy, Delta's ``OPTIMIZE ZORDER BY``).
Zone maps then prune on every clustered column at once.

Everything is Catalyst expressions:

- numeric columns code linearly between their (min, max) — one tiny agg;
- string columns code through a broadcast sorted-distinct dictionary
  (webtext clustering keys — lang, host — are bounded-cardinality; a
  high-cardinality string should be truncated/bucketed by the caller,
  and the build refuses past ``max_string_card`` rather than silently
  collecting a huge driver list);
- the Morton key is a sum of shift/mask terms (``bits × n_cols`` ≤ 63),
  whole-stage-codegen friendly, no Python anywhere;
- the sort is a range-partitioned rank (driver holds one count per
  PARTITION — Morton keys are near-unique, so the per-key-group counts
  of ``assign_row_order`` would be O(n) driver rows) — no global
  window — and the re-encode is the standard block pass, so the
  rewrite output is byte-identical at any parallelism, like every other
  encode in this engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W

from pyrle_spark.plans.encode_job import (
    EncodeConfig,
    IceTable,
    decode_table,
    dedup_blocks,
    encode_table,
)

__all__ = ["zorder_key", "hilbert_key", "rewrite_zorder"]


def _numeric_expr(col: str, dtype: str) -> Column:
    """The column as a double: temporal types go through epoch seconds
    (date/timestamp are natural clustering keys and must not crash the
    driver-side float() on their min/max)."""
    c = F.col(col)
    if dtype.startswith(("timestamp", "date")):
        c = c.cast("timestamp").cast("double")
    return c.cast("double")


def _numeric_code(col: str, dtype: str, lo, hi, bits: int) -> Column:
    if lo is None or hi == lo:
        return F.lit(0).cast("long")
    span = float(hi) - float(lo)
    scale = ((1 << bits) - 1) / span
    code = F.floor((_numeric_expr(col, dtype) - F.lit(float(lo))) * F.lit(scale))
    # clamp: float rounding at the max must not overflow the bit budget
    code = F.least(F.greatest(code, F.lit(0)), F.lit((1 << bits) - 1))
    return F.coalesce(code, F.lit(0)).cast("long")


def _string_code(
    df: DataFrame, col: str, bits: int, max_string_card: int
) -> Column:
    distinct = [
        r[0]
        for r in df.select(col).distinct().orderBy(col).limit(max_string_card + 1).collect()
    ]
    if len(distinct) > max_string_card:
        raise ValueError(
            f"zorder column {col!r} has more than {max_string_card} distinct "
            "strings; truncate or bucket it first"
        )
    n = max(len(distinct), 1)
    # spread dictionary ranks across the full code width so string and
    # numeric dimensions weigh equally in the interleave
    mapping = F.create_map(
        *[
            x
            for i, v in enumerate(distinct)
            if v is not None
            for x in (F.lit(v), F.lit(int(i * ((1 << bits) - 1) / max(n - 1, 1))))
        ]
    )
    if not distinct or all(v is None for v in distinct):
        return F.lit(0).cast("long")
    return F.coalesce(mapping[F.col(col)], F.lit(0)).cast("long")


def zorder_key(
    df: DataFrame,
    columns: list[str],
    bits: int | None = None,
    max_string_card: int = 10_000,
) -> Column:
    """The Morton key as one codegen expression over ``df``'s columns.

    ``bits`` defaults to the largest width that fits int64
    (``63 // len(columns)``, capped at 16 — finer makes zones no better
    than block granularity)."""
    if not columns:
        raise ValueError("zorder needs at least one column")
    if bits is None:
        bits = min(16, 63 // len(columns))
    if bits * len(columns) > 63:
        raise ValueError(f"{bits} bits × {len(columns)} columns overflows int64")
    dtypes = dict(df.dtypes)
    for c in columns:
        if c not in dtypes:
            raise KeyError(f"zorder column {c!r} not in {sorted(dtypes)}")
    # ONE combined agg collects every numeric column's (min, max) — not
    # one full scan per column
    nums = [c for c in columns if dtypes[c] != "string"]
    bounds = {}
    if nums:
        row = df.agg(
            *[
                a
                for c in nums
                for a in (
                    F.min(_numeric_expr(c, dtypes[c])).alias(f"_lo_{c}"),
                    F.max(_numeric_expr(c, dtypes[c])).alias(f"_hi_{c}"),
                )
            ]
        ).first()
        bounds = {c: (row[f"_lo_{c}"], row[f"_hi_{c}"]) for c in nums}
    codes = []
    for c in columns:
        if dtypes[c] == "string":
            codes.append(_string_code(df, c, bits, max_string_card))
        else:
            lo, hi = bounds[c]
            codes.append(_numeric_code(c, dtypes[c], lo, hi, bits))
    n = len(codes)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, code in enumerate(codes):
            z = z + F.shiftleft(
                F.shiftright(code, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return z


def hilbert_key(
    df: DataFrame,
    columns: list[str],
    bits: int | None = None,
    max_string_card: int = 10_000,
) -> Column:
    """The Hilbert-curve key over exactly TWO columns — the locality
    upgrade over Morton: a Hilbert walk never jumps across the space,
    so consecutive blocks cover adjacent rectangles and per-column zone
    spans shrink further than Z-order's (Morton's bit-interleave
    teleports at power-of-two boundaries).  Same per-column
    quantization as :func:`zorder_key`; the xy→d transform runs as one
    Arrow-vectorized pandas_udf (numpy bit ops, ``bits`` iterations —
    the classic rot/reflect walk), keeping Python out of the per-row
    path."""
    from pyspark.sql.functions import pandas_udf

    if len(columns) != 2:
        raise ValueError("hilbert_key is defined for exactly 2 columns")
    if bits is None:
        bits = 16
    if 2 * bits > 63:
        raise ValueError(f"{bits} bits x 2 overflows int64")
    dtypes = dict(df.dtypes)
    codes = []
    nums = [c for c in columns if dtypes[c] != "string"]
    bounds = {}
    if nums:
        row = df.agg(
            *[
                a
                for c in nums
                for a in (
                    F.min(_numeric_expr(c, dtypes[c])).alias(f"_lo_{c}"),
                    F.max(_numeric_expr(c, dtypes[c])).alias(f"_hi_{c}"),
                )
            ]
        ).first()
        bounds = {c: (row[f"_lo_{c}"], row[f"_hi_{c}"]) for c in nums}
    for c in columns:
        if dtypes[c] == "string":
            codes.append(_string_code(df, c, bits, max_string_card))
        else:
            lo, hi = bounds[c]
            codes.append(_numeric_code(c, dtypes[c], lo, hi, bits))

    n_bits = bits

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf's hint resolver can't see the local import
    @pandas_udf("long")
    def _xy2d(xs, ys):
        import numpy as np

        x = xs.to_numpy(dtype=np.int64, na_value=0).copy()
        y = ys.to_numpy(dtype=np.int64, na_value=0).copy()
        d = np.zeros(len(x), dtype=np.int64)
        s = np.int64(1) << np.int64(n_bits - 1)
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            # rotate/reflect the quadrant (vectorized branch-free form)
            swap = ry == 0
            refl = swap & (rx == 1)
            x_r = np.where(refl, s - 1 - x, x)
            y_r = np.where(refl, s - 1 - y, y)
            x, y = np.where(swap, y_r, x_r), np.where(swap, x_r, y_r)
            s >>= np.int64(1)
        import pandas as pd

        return pd.Series(d)

    return _xy2d(codes[0], codes[1])


def _assign_order_range(
    spark: SparkSession,
    df: DataFrame,
    key: str,
    tiebreak: str,
    out_col: str,
    n_parts: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dense global rank by ``(key, tiebreak)`` for HIGH-CARDINALITY
    keys: ``repartitionByRange`` splits the total order into ranges,
    each partition ranks locally (window partitioned by the Spark
    partition id — bounded at ~n/partitions rows), and the driver only
    ever holds one row count per partition.  Complements
    ``assign_row_order``, whose per-key-group counts are driver-bounded
    only when the key is low-cardinality.

    Returns ``(ranked, cached)`` — ``cached`` is the persisted
    range-partitioned scan the result is built on; the CALLER must
    ``cached.unpersist()`` once the result has been materialized, or a
    full copy of the table stays in executor memory for the session."""
    n_parts = n_parts or max(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        spark.sparkContext.defaultParallelism,
    )
    rp = (
        df.repartitionByRange(n_parts, F.col(key), F.col(tiebreak))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sizes = {
        r["_pid"]: r["n"]
        for r in rp.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off = F.create_map(
        *[x for pid, o in offsets.items() for x in (F.lit(pid), F.lit(o))]
    )
    w = W.partitionBy("_pid").orderBy(key, tiebreak)
    ranked = rp.withColumn(
        out_col,
        (F.row_number().over(w) - 1 + off[F.col("_pid")]).cast("long"),
    ).drop("_pid")
    return ranked, rp


def rewrite_zorder(
    spark: SparkSession,
    table_dir: str,
    out_dir: str,
    zorder_by: list[str],
    block_rows: int | None = None,
    bits: int | None = None,
    sub_rows: int = 1 << 16,
    shuffle_partitions: int | None = None,
    curve: str = "morton",
) -> dict:
    """Rewrite the live table clustered by the space-filling-curve key
    of ``zorder_by`` (deletes compacted, like :func:`rewrite_sorted`).
    ``curve``: ``"morton"`` (any #columns) or ``"hilbert"`` (exactly 2
    columns, tighter locality — see :func:`hilbert_key`).

    Returns before/after run totals plus per-column zone spans — the
    number the rewrite exists to shrink: the average fraction of each
    column's value range a block's [zmin, zmax] covers (smaller span =
    sharper pruning on that column)."""
    table = IceTable(table_dir)
    props = table.properties()
    cols = list(props["columns"])
    block_rows = int(block_rows or props["block_rows"])
    before = (
        dedup_blocks(table.read_table(spark))
        .agg(F.sum("bytes_out").alias("b"), F.sum("n_runs").alias("r"))
        .first()
    )
    # cache: the key build aggregates over dec (numeric bounds + string
    # dictionaries) and the rank + encode scan it again
    dec = decode_table(spark, table_dir).persist()
    if curve == "hilbert":
        z = hilbert_key(dec, zorder_by, bits=bits)
    elif curve == "morton":
        z = zorder_key(dec, zorder_by, bits=bits)
    else:
        raise ValueError(f"unknown curve {curve!r}")
    # Morton keys are near-UNIQUE for continuous dimensions, so the
    # group-counts rank (assign_row_order) would collect O(n) rows on
    # the driver.  Range-partition by (_z, _order) instead: the driver
    # holds one count per PARTITION, each partition ranks locally, and
    # broadcast offsets stitch the global sequence — bounded everywhere.
    ranked, rp_cache = _assign_order_range(
        spark, dec.withColumn("_z", z), "_z", "_order", "_seq"
    )
    summary = encode_table(
        spark,
        ranked.select("_seq", *cols),
        out_dir,
        EncodeConfig(
            columns=cols,
            order_col="_seq",
            block_rows=block_rows,
            shuffle_partitions=shuffle_partitions,
            properties={
                "rewrite_zorder_by": ",".join(zorder_by),
                "rewrite_zorder_curve": curve,
            },
        ),
    )
    rp_cache.unpersist()
    dec.unpersist()
    after = (
        dedup_blocks(IceTable(out_dir).read_table(spark))
        .agg(
            F.sum("bytes_out").alias("b"),
            F.sum("n_runs").alias("r"),
            F.sum(F.when(F.col("column") == cols[0], F.col("n_rows"))).alias("n"),
        )
        .first()
    )
    return {
        "rows": int(after["n"]),
        "zorder_by": list(zorder_by),
        "bytes_out_before": int(before["b"]),
        "bytes_out_after": int(after["b"]),
        "n_runs_before": int(before["r"]),
        "n_runs_after": int(after["r"]),
        "snapshot_id": summary["snapshot_id"],
    }
