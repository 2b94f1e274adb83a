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
- the sort is :func:`assign_row_order`'s bounded two-pass rank — no
  global window — and the re-encode is the standard block pass, so the
  rewrite output is byte-identical at any parallelism, like every other
  encode in this engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from pyrle_spark.plans.encode_job import (
    EncodeConfig,
    IceTable,
    assign_row_order,
    decode_table,
    dedup_blocks,
    encode_table,
)

__all__ = ["zorder_key", "rewrite_zorder"]


def _numeric_code(df: DataFrame, col: str, bits: int) -> Column:
    lo, hi = df.agg(F.min(col), F.max(col)).first()
    if lo is None or hi == lo:
        return F.lit(0).cast("long")
    span = float(hi) - float(lo)
    scale = ((1 << bits) - 1) / span
    code = F.floor((F.col(col).cast("double") - F.lit(float(lo))) * F.lit(scale))
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
    codes = []
    for c in columns:
        if c not in dtypes:
            raise KeyError(f"zorder column {c!r} not in {sorted(dtypes)}")
        if dtypes[c] == "string":
            codes.append(_string_code(df, c, bits, max_string_card))
        else:
            codes.append(_numeric_code(df, c, bits))
    n = len(codes)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, code in enumerate(codes):
            z = z + F.shiftleft(
                F.shiftright(code, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return z


def rewrite_zorder(
    spark: SparkSession,
    table_dir: str,
    out_dir: str,
    zorder_by: list[str],
    block_rows: int | None = None,
    bits: int | None = None,
    sub_rows: int = 1 << 16,
    shuffle_partitions: int | None = None,
) -> dict:
    """Rewrite the live table clustered by the Morton key of
    ``zorder_by`` (deletes compacted, like :func:`rewrite_sorted`).

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
    dec = decode_table(spark, table_dir)
    z = zorder_key(dec, zorder_by, bits=bits)
    ranked = assign_row_order(
        dec.withColumn("_z", z), ["_z"], "_order", sub_rows, "_seq"
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
            properties={"rewrite_zorder_by": ",".join(zorder_by)},
        ),
    )
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
