"""Concatenate two encoded tables WITHOUT decoding a row.

``UNION ALL`` of two 100 TB tables should not cost a decode + re-encode
of either side.  Both tables store per-block compressed buffers keyed
by ``block_id`` with row positions derived as ``block_id * block_rows +
i``, so appending ``src`` after ``dst`` is a pure block-id shift: copy
``src``'s live block rows with ``block_id += max(dst block) + 1``
(compressed buffers move VERBATIM — one scan+write of src's compressed
bytes, no codec work), commit them as one append snapshot on ``dst``,
and shift-carry src's visible position deletes.

The shifted region may start past a partial dst tail block, leaving a
position gap — which the engine already tolerates everywhere, because
merge-on-read deletes make ``_order`` non-dense by design: block math
(``pos // block_rows``) stays exact, zone maps and blooms are per-block,
``limit_scan`` counts actual ``n_rows``.  ``_order`` remains a total
order with dst strictly before src.

Differences the copy reconciles:
- column RENAMES on either side: src physical names rewrite to dst
  physical names during the copy (same trick as compaction);
- TYPE WIDTH: blocks keep their own arrow_type; decode promotes to the
  widest per Iceberg's int→long / float→double rule (existing path);
- src's merge-on-read deletes: carried as one delete-vector commit with
  every position shifted by ``shift_blocks * block_rows``, published
  BEFORE the snapshot but CONDITIONAL on it (``only_if_snapshot``) —
  no window where src's deleted rows are visible through dst, and no
  crash window where an orphaned vector could delete rows a later
  append allocates at those block ids.

Requires equal ``block_rows`` and equal live logical column sets —
anything else is a schema merge, not a concat, and raises.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pyrle_spark.plans.encode_job import (
    _delete_positions,
    _encoded_schema_json,
    dedup_blocks,
    delete_rows,
)
from pyrle_spark.sources.icetable import IceTable

__all__ = ["concat_tables"]

# Spark-type promotion families (jsonValue strings), mirroring decode's
# block-width rule: a column whose two sides disagree within a family
# records the WIDER type; disagreement across families is a broken table.
_WIDEN = {
    frozenset({"integer", "long"}): "long",
    frozenset({"float", "double"}): "double",
}


def _merge_source_schema(src: dict, dst: dict) -> dict:
    out = dict(src)
    for c, dt in dst.items():
        st = out.get(c)
        if st is None or st == dt:
            out[c] = dt
            continue
        wide = _WIDEN.get(frozenset({_s(st), _s(dt)}))
        if wide is None:
            raise ValueError(
                f"concat: column {c!r} has incompatible source types "
                f"src={st!r} dst={dt!r}"
            )
        out[c] = wide
    return out


def _s(t) -> str:
    # source_schema values are Spark jsonValue()s — strings for every
    # type this engine encodes; tolerate dicts defensively
    return t if isinstance(t, str) else str(t)


def concat_tables(spark: SparkSession, dst_dir: str, src_dir: str) -> dict:
    """Append the encoded table at ``src_dir`` to the one at ``dst_dir``
    (src is not modified).  Returns ``{"snapshot_id", "moved_blocks",
    "shift_blocks", "carried_deletes"}``; snapshot_id is None when src
    has no live blocks (no empty commit)."""
    dst, src = IceTable(dst_dir), IceTable(src_dir)
    dp, sp = dst.properties(), src.properties()
    if not dp or not sp:
        raise ValueError("both tables must have at least one snapshot")
    if int(dp["block_rows"]) != int(sp["block_rows"]):
        raise ValueError(
            f"block_rows differ: dst={dp['block_rows']} src={sp['block_rows']}"
        )
    block_rows = int(dp["block_rows"])
    d_cols = set(dp["columns"]) - set(dp.get("dropped_columns", []))
    s_cols = set(sp["columns"]) - set(sp.get("dropped_columns", []))
    if d_cols != s_cols:
        raise ValueError(
            f"live column sets differ: dst-only={sorted(d_cols - s_cols)} "
            f"src-only={sorted(s_cols - d_cols)}"
        )

    dst_enc = dedup_blocks(dst.read_table(spark))
    max_blk = dst_enc.agg(F.max("block_id")).first()[0]
    shift_blocks = int(max_blk) + 1 if max_blk is not None else 0

    s_alias = sp.get("column_aliases", {})
    d_alias = dp.get("column_aliases", {})
    src_enc = dedup_blocks(src.read_table(spark))
    src_phys_live = sorted(s_alias.get(c, c) for c in s_cols)
    src_enc = src_enc.filter(F.col("column").isin(src_phys_live))
    if src_enc.isEmpty():
        return {
            "snapshot_id": None,
            "moved_blocks": 0,
            "shift_blocks": shift_blocks,
            "carried_deletes": 0,
        }
    # physical-name reconciliation: src physical → logical → dst physical
    name_map = {
        s_alias.get(c, c): d_alias.get(c, c)
        for c in s_cols
        if s_alias.get(c, c) != d_alias.get(c, c)
    }
    moved = src_enc.withColumn(
        "block_id", F.col("block_id") + F.lit(shift_blocks)
    )
    if name_map:
        moved = moved.withColumn(
            "column",
            F.coalesce(
                F.element_at(
                    F.create_map(
                        *[F.lit(x) for kv in name_map.items() for x in kv]
                    ),
                    F.col("column"),
                ),
                F.col("column"),
            ),
        )

    snap_id = dst.new_snapshot_id()
    data_dir = os.path.join(dst.path, "data", snap_id)
    (
        moved.write.mode("errorifexists")
        .option("compression", "none")
        .option("parquet.block.size", str(16 * 1024 * 1024))
        .parquet(data_dir)
    )
    import pyarrow.parquet as pq

    files = []
    for root, _, names in os.walk(data_dir):
        for name in sorted(names):
            if name.endswith(".parquet"):
                full = os.path.join(root, name)
                # drop Spark's empty-partition stub files (same rule as
                # write_snapshot): one footer read per file
                if pq.ParquetFile(full).metadata.num_rows == 0:
                    os.remove(full)
                    continue
                files.append({"path": full, "bytes": os.path.getsize(full)})

    # carry src's visible deletes as a CONDITIONAL entry published before
    # the snapshot: as_of tags the pre-concat snapshot (so post-concat
    # reads apply it, pre-concat reads no-op), and only_if_snapshot pins
    # it to the concat commit — a crash between this publish and
    # commit_files leaves an entry that never applies, instead of an
    # orphan vector that would silently delete rows a later unrelated
    # append allocates at these block ids
    dels = _delete_positions(src_dir, None)
    if dels:
        delete_rows(
            spark,
            dst_dir,
            [p + shift_blocks * block_rows for p in dels],
            only_if_snapshot=snap_id,
        )

    props = dict(dp)
    # merge per column taking the WIDER Spark type (decode's int→long /
    # float→double promotion): src may carry a widened column whose moved
    # int64 blocks would contradict a dst-wins "integer", mistyping
    # DataSource reads that trust source_schema
    props["source_schema"] = _merge_source_schema(
        sp.get("source_schema", {}), dp.get("source_schema", {})
    )
    props["concat_from"] = f"{src_dir}@{src.current_snapshot_id()}"
    committed = dst.commit_files(
        snap_id, files, _encoded_schema_json(), mode="append", properties=props
    )
    n_moved = (
        dedup_blocks(dst.read_table(spark))
        .filter(F.col("block_id") >= shift_blocks)
        .select("block_id", "column")
        .distinct()
        .count()
    )
    return {
        "snapshot_id": committed,
        "moved_blocks": int(n_moved),
        "shift_blocks": shift_blocks,
        "carried_deletes": len(dels),
    }
