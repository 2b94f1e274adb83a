"""Spark Python Data Source (the DataSourceV2 user-defined-source API,
pyspark 4.x) for encoded-blocks tables: ``spark.read.format("pyrle")`` /
``df.write.format("pyrle")`` over the same Iceberg-style layout the rest
of the engine builds with :mod:`pyrle_spark.plans.encode_job`.

This is the engine surfaced through Spark's OWN extension point instead
of library calls — a user gets the full planner integration for free:

- **partition planning** is metadata-only on the driver: the snapshot
  manifest names the data files (zero I/O beyond the JSON), and one
  parquet-footer read per file yields its block-id span.  Files whose
  spans overlap (resume re-encodes, widen passes) are fused into one
  input partition so superseded partial blocks can be deduplicated
  task-side; everything else reads one file per task.  O(#files) driver
  work — the same budget Spark's parquet planning spends.
- **filter pushdown** (``pushFilters``, 4.1 API): =, <, <=, >, >=, IN on
  any encoded column prune *blocks* before any decode work — zone maps
  for ranges, bloom digests for equality/IN, evaluated task-side against
  the thin manifest columns of that task's files.  Every filter is also
  returned to Spark for re-evaluation, so pruning stays a pure superset
  optimization (the contract :func:`~pyrle_spark.plans.encode_job.
  prune_blocks` documents); a pruning bug can cost speed, never rows.
- **column pruning** via ``option("columns", "a,b")``: unrequested
  columns are never read from the encoded file (parquet column
  projection drops their buffers) and never decoded.
- **reads are merge-on-read**: position deletes visible at the chosen
  snapshot (``option("snapshot", <id-or-ref>)`` time-travels) are
  anti-masked out of the decoded batches; the delete set is O(deleted
  rows) driver state, like :func:`decode_table`'s broadcast.
- **writes speak the Iceberg commit protocol** through Spark's writer
  lifecycle: each task encodes its (pre-clustered, pre-sorted) rows and
  writes ONE uniquely named data file under ``.inprogress`` rename
  (kill-atomic), returns the file + lineage stats as its commit message,
  and the driver's ``commit()`` links exactly the reported files in one
  locked metadata transaction — task retries/speculation leave only
  vacuum()-able orphans, never phantom manifest entries.

Scale shape at 10^12 docs: the driver touches O(#files) footers and
O(deleted) positions; raw bytes move parquet → Python worker → parquet
exactly once in each direction (the file-direct discipline of
:func:`encode_parquet_dir`); block pruning and decode are embarrassingly
parallel per task.

Usage::

    from pyrle_spark.sources.datasource import register
    register(spark)                          # once per session
    df = (spark.read.format("pyrle")
          .option("columns", "lang,n_chars")
          .load("/path/to/table"))           # _order + requested columns
    df.filter("lang = 'fr'").groupBy("lang").count()   # blocks pruned

    (rows.repartition(F.floor(F.col("doc_seq") / 65536).cast("long"))
         .sortWithinPartitions("doc_seq")
         .write.format("pyrle").option("order_col", "doc_seq")
         .mode("append").save("/path/to/table"))

The writer requires block-clustered, sorted-within-partition input (the
recipe above; verified task-side and at commit — a block split across
two tasks fails the job loudly instead of losing a partial segment).
Arbitrary layouts should go through
:func:`pyrle_spark.plans.encode_job.encode_table`, which owns the
shuffle.  Generalizes the reference's single-process Rle construction
(reference ``pyrle/rledict.py:37-131``) to a planner-integrated
distributed source/sink.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

__all__ = ["PyrleDataSource", "register"]

_ORDER_FIELD = {"name": "_order", "type": "long", "nullable": False, "metadata": {}}


def _resolve_read_snapshot(table, options):
    """Read-time snapshot resolution: ``snapshot`` (id / tag / branch)
    wins, else ``timestampAsOf`` (epoch ms, FOR TIMESTAMP AS OF along
    the current parent chain), else the current snapshot (None)."""
    snap = options.get("snapshot")
    if snap:
        return table.resolve_ref(snap)
    ts = options.get("timestampasof") or options.get("timestampAsOf")
    if ts:
        return table.snapshot_as_of(int(ts))
    return None


def _path_from_schema(schema: StructType):
    """Recover the table path a catalog table was created with.

    Spark's catalog hands a Python data source READER an empty options
    dict (the CREATE-time options reach only ``schema()``), so
    ``schema()`` stamps the normalized path into the ``_order`` field's
    metadata — field metadata round-trips through the catalog intact —
    and the reader/writer fall back to it here.  This is what makes
    ``CREATE TABLE … USING pyrle OPTIONS (path '…')`` + ``SELECT``
    work end-to-end."""
    for f in schema.fields:
        md = f.metadata or {}
        if "pyrle.path" in md:
            return _norm_path(md["pyrle.path"])
    return None


def _norm_path(p):
    """Normalize a table path option.  The SQL surface (``CREATE TABLE …
    USING pyrle OPTIONS (path '…')``) hands the path through Hadoop's
    resolver as a ``file:`` URI; the DataFrame API hands it verbatim.
    Local ``file:`` URIs are unwrapped so both spell the same table."""
    if p and p.startswith("file:"):
        from urllib.parse import unquote, urlparse

        u = urlparse(p)
        if u.netloc not in ("", "localhost"):
            raise ValueError(f"non-local file URI not supported: {p}")
        return unquote(u.path)
    return p


def _decoded_schema(props: dict, columns: list | None) -> StructType:
    """Decoded-row schema from the snapshot's recorded source types —
    driver metadata only, no data read.  ``columns`` restricts (and the
    output keeps decode_table's ``_order`` + sorted-name layout)."""
    src = props.get("source_schema") or {}
    aliases = props.get("column_aliases", {})
    avail = sorted(props["columns"])
    cols = sorted(columns) if columns else avail
    unknown = [c for c in cols if c not in avail]
    if unknown:
        raise KeyError(f"columns {unknown} not in table (available: {avail})")
    fields = [dict(_ORDER_FIELD)]
    for c in cols:
        phys = aliases.get(c, c)
        if phys not in src:
            raise KeyError(
                f"snapshot records no source type for column {c!r}; "
                "re-encode with a current pyrle_spark to add source_schema"
            )
        fields.append(
            {"name": c, "type": src[phys], "nullable": True, "metadata": {}}
        )
    return StructType.fromJson({"type": "struct", "fields": fields})


# --------------------------------------------------------------- reader


@dataclass
class _FileGroup(InputPartition):
    """One read task: the data files whose block-id spans overlap (must
    be deduplicated together) — normally a single file."""

    paths: list
    value: int = 0


def _norm_filters(filters: list) -> list:
    """Typed V2 filters → the engine's ``(col, lo, hi, values)`` predicate
    tuples (the :func:`scan_encoded` normal form).  Only one-part column
    paths; anything else was never claimed as supported."""
    preds = []
    for f in filters:
        col = f.attribute[0]
        if isinstance(f, EqualTo):
            preds.append((col, f.value, f.value, None))
        elif isinstance(f, GreaterThan) or isinstance(f, GreaterThanOrEqual):
            preds.append((col, f.value, None, None))
        elif isinstance(f, LessThan) or isinstance(f, LessThanOrEqual):
            preds.append((col, None, f.value, None))
        elif isinstance(f, In):
            vs = [v for v in f.value if v is not None]
            if vs:
                lo, hi = min(vs), max(vs)
                preds.append((col, lo, hi, vs))
    return preds


def _zone_value(s, arrow_type: str):
    """Parse a stored zone-bound string back to a comparable value (the
    task-side mirror of prune_blocks' try_cast); None = unparseable →
    caller keeps the block (conservative superset contract)."""
    if s is None:
        return None
    try:
        if arrow_type in ("int8", "int16", "int32", "int64", "uint8",
                          "uint16", "uint32", "uint64"):
            return int(s)
        if arrow_type in ("float", "double", "halffloat"):
            return float(s)
        if arrow_type.startswith("timestamp"):
            import datetime as _dt

            return _dt.datetime.fromisoformat(s)
        if arrow_type in ("binary", "large_binary"):
            return bytes.fromhex(s)
        if arrow_type in ("string", "large_string"):
            return s
    except (ValueError, TypeError):
        return None
    return None


def _coerce_lit(v, zone):
    """Make a filter literal comparable with a parsed zone value; None =
    incomparable → keep the block."""
    try:
        if isinstance(zone, int) and not isinstance(v, bool):
            return int(v)
        if isinstance(zone, float):
            return float(v)
        if isinstance(zone, str):
            return v if isinstance(v, str) else None
        if isinstance(zone, bytes):
            return v if isinstance(v, (bytes, bytearray)) else None
        import datetime as _dt

        if isinstance(zone, _dt.datetime):
            if isinstance(v, _dt.datetime):
                if (v.tzinfo is None) != (zone.tzinfo is None):
                    v = v.replace(tzinfo=zone.tzinfo)
                return v
            return None
    except (ValueError, TypeError):
        return None
    return None


def _surviving_blocks(thin: pa.Table, preds: list):
    """Block ids that may satisfy every predicate, from the thin manifest
    columns (block_id, column, arrow_type, zmin, zmax, bloom) — the
    task-side analog of prune_blocks / prune_blocks_eq / prune_blocks_in.
    Returns None when nothing prunes (keep all)."""
    from pyrle_spark.plans.encode_job import _bloom_positions, _bloom_value_bytes

    cols = {n: thin.column(n).to_pylist() for n in
            ("block_id", "column", "arrow_type", "zmin", "zmax", "bloom")}
    survivors = None
    for colname, lo, hi, values in preds:
        keep = set()
        seen = False
        for i, c in enumerate(cols["column"]):
            if c != colname:
                continue
            seen = True
            bid = cols["block_id"][i]
            at = cols["arrow_type"][i]
            zmin = _zone_value(cols["zmin"][i], at)
            zmax = _zone_value(cols["zmax"][i], at)
            ok = True
            if lo is not None and zmax is not None:
                clo = _coerce_lit(lo, zmax)
                if clo is not None and zmax < clo:
                    ok = False
            if ok and hi is not None and zmin is not None:
                chi = _coerce_lit(hi, zmin)
                if chi is not None and zmin > chi:
                    ok = False
            # equality / IN additionally probe the bloom digest
            probe_vals = values if values is not None else (
                [lo] if ok and lo is not None and lo == hi else None
            )
            if ok and probe_vals is not None and cols["bloom"][i] is not None:
                bits = bytes.fromhex(cols["bloom"][i])
                any_hit = False
                for v in probe_vals:
                    data = _bloom_value_bytes(v)
                    if data is None:  # unprobeable value type: keep
                        any_hit = True
                        break
                    if all(
                        bits[p // 8] & (1 << (p % 8))
                        for p in set(_bloom_positions(data))
                    ):
                        any_hit = True
                        break
                ok = any_hit
            if ok:
                keep.add(bid)
        if not seen:
            continue  # no manifest rows for this column here: can't prune
        survivors = keep if survivors is None else (survivors & keep)
    return survivors


_THIN_COLS = ["block_id", "column", "arrow_type", "n_rows", "zmin", "zmax", "bloom"]


class PyrleReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        from pyrle_spark.plans.encode_job import _delete_positions
        from pyrle_spark.sources.icetable import IceTable

        self.path = _norm_path(options.get("path")) or _path_from_schema(
            schema
        )
        if not self.path:
            raise ValueError("pyrle reader requires .load(<table path>)")
        table = IceTable(self.path)
        self.snapshot_id = _resolve_read_snapshot(table, options)
        props = table.properties(self.snapshot_id)
        self.block_rows = int(props["block_rows"])
        aliases = props.get("column_aliases", {})
        self.cols = [f.name for f in schema.fields if f.name != "_order"]
        self.phys_of = {c: aliases.get(c, c) for c in self.cols}
        self.types = {
            c: f.dataType for f in schema.fields if f.name != "_order"
            for c in [f.name]
        }
        meta = table._read_meta()
        snap_id = self.snapshot_id or meta["current_snapshot_id"]
        self.files = (
            [f["path"] for f in table._manifest(snap_id)["files"]]
            if snap_id
            else []
        )
        # delete-application strategy (same threshold switch as
        # decode_table): small sets materialize once on the driver and
        # ship to every task as one array; past _DELETE_DRIVER_MAX the
        # driver ships only the vector FILE LIST and each task reads the
        # rows overlapping its own block span (vectors are
        # range-partitioned + sorted, so parquet row-group stats prune
        # the read) — a mass takedown cannot OOM the driver through the
        # DSv2 reader either.
        self.delete_files: list = []
        self.deleted = np.empty(0, dtype=np.int64)
        if str(options.get("apply_deletes", "true")).lower() != "false":
            import pyarrow.parquet as pq

            from pyrle_spark.plans.encode_job import (
                _DELETE_DRIVER_MAX,
                _visible_delete_files,
            )

            del_files = _visible_delete_files(self.path, self.snapshot_id)
            if del_files:
                n_del = sum(
                    pq.ParquetFile(f).metadata.num_rows for f in del_files
                )
                if n_del <= _DELETE_DRIVER_MAX:
                    self.deleted = np.asarray(
                        _delete_positions(self.path, self.snapshot_id),
                        dtype=np.int64,
                    )
                else:
                    self.delete_files = del_files
        self.preds: list = []

    def pushFilters(self, filters):
        """Record range/equality/IN filters for task-side block pruning;
        EVERY filter is handed back to Spark for re-evaluation, so the
        scan output is exact even if a zone or digest is missing."""
        self.preds = _norm_filters(
            [
                f
                for f in filters
                if isinstance(
                    f,
                    (EqualTo, GreaterThan, GreaterThanOrEqual,
                     LessThan, LessThanOrEqual, In),
                )
                and len(f.attribute) == 1
                and f.attribute[0] in self.cols
            ]
        )
        # map logical filter names to the physical manifest names
        self.preds = [
            (self.phys_of.get(c, c), lo, hi, vs) for c, lo, hi, vs in self.preds
        ]
        return filters

    def partitions(self):
        """One task per data file; files whose block-id spans overlap
        (resume/widen re-encodes) fuse into one task so superseded
        partial blocks dedup locally.  O(#files) footer reads."""
        import pyarrow.parquet as pq

        if not self.files:
            return [_FileGroup(paths=[])]
        spans = []
        for p in self.files:
            md = pq.ParquetFile(p).metadata
            if md.num_rows == 0:
                continue  # empty task file (vacuum fodder): nothing to read
            try:
                ci = md.schema.names.index("block_id")
            except ValueError:
                raise ValueError(f"{p} is not an encoded-blocks file") from None
            mn = mx = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    mn, mx = None, None
                    break
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            if mn is None:
                mn, mx = -(2**62), 2**62  # statless file: fuse with all
            spans.append((mn, mx, p))
        if not spans:
            return [_FileGroup(paths=[])]
        spans.sort()
        groups: list = []
        cur_paths, cur_hi = [spans[0][2]], spans[0][1]
        for mn, mx, p in spans[1:]:
            if mn <= cur_hi:  # overlap: same dedup domain
                cur_paths.append(p)
                cur_hi = max(cur_hi, mx)
            else:
                groups.append(_FileGroup(paths=cur_paths))
                cur_paths, cur_hi = [p], mx
        groups.append(_FileGroup(paths=cur_paths))
        return groups

    def read(self, partition: _FileGroup):
        yield from _decode_group(
            partition.paths,
            self.phys_of,
            self.types,
            self.block_rows,
            self.deleted,
            self.preds,
            delete_files=self.delete_files,
        )


def _decode_group(
    paths: list,
    phys_of: dict,
    spark_types: dict,
    block_rows: int,
    deleted: np.ndarray,
    preds: list,
    delete_files: list | None = None,
):
    """Task-side decode of one file group: thin-column pass for block
    pruning + resume dedup, then a buffers pass over surviving blocks
    only, decoded and cast to the declared Spark schema's arrow types.
    Shared by the batch and streaming readers.

    ``delete_files`` (mass-delete path): instead of a driver-shipped
    position array, the task reads the delete-vector rows overlapping
    ITS OWN block span from the listed files — position-filtered
    parquet reads that row-group stats prune, so per-task memory is
    O(deletes in span), never O(all deletes)."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_type

    from pyrle_spark.codecs import Encoded, decode_array

    if not paths:
        return
    phys_cols = sorted(set(phys_of.values()))
    rename = {p: c for c, p in phys_of.items()}
    # pass 1: thin manifest columns → block pruning + dedup winners
    thin = pa.concat_tables(
        pq.read_table(
            p,
            columns=_THIN_COLS,
            filters=[("column", "in", phys_cols)],
        )
        for p in paths
    )
    survivors = _surviving_blocks(thin, preds) if preds else None
    # dedup (resume semantics): per (block_id, column) the max-n_rows
    # row wins; ties broken by scan order for determinism
    win: dict = {}
    bids = thin.column("block_id").to_pylist()
    cnames = thin.column("column").to_pylist()
    nrs = thin.column("n_rows").to_pylist()
    for i in range(thin.num_rows):
        if survivors is not None and bids[i] not in survivors:
            continue
        k = (bids[i], cnames[i])
        if k not in win or nrs[i] > win[k][0]:
            win[k] = (nrs[i], i)
    want_bids = sorted({b for b, _ in win})
    if not want_bids:
        return
    if delete_files:
        # mass-delete path: fetch only the positions landing inside this
        # group's block span (row-group stats prune the filtered reads)
        lo = want_bids[0] * block_rows
        hi = (want_bids[-1] + 1) * block_rows - 1
        parts = [
            pq.read_table(
                f,
                columns=["_order"],
                filters=[("_order", ">=", lo), ("_order", "<=", hi)],
            )["_order"].to_numpy(zero_copy_only=False)
            for f in delete_files
        ]
        parts = [p for p in parts if len(p)]
        deleted = (
            np.unique(np.concatenate(parts))
            if parts
            else np.empty(0, dtype=np.int64)
        )
    # pass 2: full rows (buffers included) of surviving blocks only
    full = pa.concat_tables(
        pq.read_table(
            p,
            columns=["block_id", "column", "codec", "arrow_type",
                     "n_rows", "meta", "buffers"],
            filters=[
                ("column", "in", phys_cols),
                ("block_id", "in", want_bids),
            ],
        )
        for p in paths
    )
    # align pass-2 row indexing with pass-1 winners by re-keying
    rows_by_key: dict = {}
    fb = full.column("block_id").to_pylist()
    fc = full.column("column").to_pylist()
    fn = full.column("n_rows").to_pylist()
    for i in range(full.num_rows):
        k = (fb[i], fc[i])
        if k in win and fn[i] == win[k][0] and k not in rows_by_key:
            rows_by_key[k] = i
    tgt_type = {
        c: to_arrow_type(t, timestamp_utc=True) for c, t in spark_types.items()
    }
    codec_a = full.column("codec").to_pylist()
    at_a = full.column("arrow_type").to_pylist()
    meta_a = full.column("meta").to_pylist()
    buf_a = full.column("buffers")
    for bid in want_bids:
        arrays = {}
        n = None
        for pc_ in phys_cols:
            i = rows_by_key.get((bid, pc_))
            if i is None:
                raise ValueError(
                    f"block {bid} lacks column {pc_!r} in "
                    f"{paths} (corrupt or mid-widen table)"
                )
            enc = Encoded(
                codec=codec_a[i],
                arrow_type=at_a[i],
                n_rows=fn[i],
                meta=json.loads(meta_a[i]),
                buffers=dict(buf_a[i].as_py()),
            )
            arr = decode_array(enc)
            logical = rename.get(pc_, pc_)
            want = tgt_type[logical]
            if arr.type != want:
                arr = arr.cast(want, safe=False)
            arrays[logical] = arr
            n = len(arr)
        order = np.arange(n, dtype=np.int64) + bid * block_rows
        if len(deleted):
            mask = ~np.isin(order, deleted)
            if not mask.all():
                pmask = pa.array(mask)
                arrays = {c: a.filter(pmask) for c, a in arrays.items()}
                order = order[mask]
                if len(order) == 0:
                    continue
        yield pa.RecordBatch.from_arrays(
            [pa.array(order)] + [arrays[c] for c in sorted(arrays)],
            names=["_order"] + sorted(arrays),
        )


# --------------------------------------------------------------- writer


@dataclass
class _EncodeCommit(WriterCommitMessage):
    file: str
    bytes: int
    block_ids: list
    cells: list = field(default_factory=list)  # (part_id, column, codec) stats


def _encode_task(
    iterator,
    columns: list,
    order_col: str,
    block_rows: int,
    zstd_threshold: float,
    data_dir: str,
) -> "_EncodeCommit":
    """Task side of every V2 write (batch and streaming): derive block
    ids from the order column, verify global monotonicity (the encode
    kernel only checks within-block order; a block revisited after a
    different block would silently fork into two partial rows), stream
    through the shared encode kernel, and write ONE kill-atomic data
    file.  Returns the file + per-(column, codec) lineage cells."""
    import pyarrow.parquet as pq
    from pyspark import TaskContext

    from pyrle_spark.plans.encode_job import (
        _ENCODED_PA_SCHEMA,
        _make_encode_fn,
        _STAT_COLS,
    )

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx else 0
    inner = _make_encode_fn(list(columns), zstd_threshold, verify_order=True)
    state = {"last": None}

    def tagged(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            onp = (
                b.column(order_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
            )
            if state["last"] is not None and onp[0] <= state["last"]:
                raise ValueError(
                    "rows are not sorted by order_col within the "
                    "partition; write with .sortWithinPartitions"
                    f"({order_col!r}) after clustering by block"
                )
            if len(onp) > 1 and not bool(np.all(np.diff(onp) > 0)):
                raise ValueError(
                    f"duplicate or decreasing {order_col!r} values "
                    "within a batch; order values must be unique"
                )
            state["last"] = int(onp[-1])
            yield pa.RecordBatch.from_arrays(
                [pa.array(onp // block_rows), pa.array(onp)]
                + [b.column(c) for c in columns],
                names=["_block_id", "_order"] + list(columns),
            )

    os.makedirs(data_dir, exist_ok=True)
    final = os.path.join(
        data_dir, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.parquet"
    )
    tmp = final + ".inprogress"
    writer = None
    kept = []
    try:
        for enc_rb in inner(tagged(iterator)):
            if writer is None:
                writer = pq.ParquetWriter(
                    tmp, _ENCODED_PA_SCHEMA, compression="none"
                )
            writer.write_batch(enc_rb)
            kept.append(enc_rb.select(_STAT_COLS))
    finally:
        if writer is not None:
            writer.close()
    if writer is None:
        return _EncodeCommit(file="", bytes=0, block_ids=[])
    os.replace(tmp, final)
    stats = pa.Table.from_batches(kept)
    cells: dict = {}
    sb = stats.column("block_id").to_pylist()
    sc = stats.column("column").to_pylist()
    scod = stats.column("codec").to_pylist()
    snr = stats.column("n_rows").to_pylist()
    sbi = stats.column("bytes_in").to_pylist()
    sbo = stats.column("bytes_out").to_pylist()
    sen = stats.column("encode_ns").to_pylist()
    sruns = stats.column("n_runs").to_pylist()
    for i in range(stats.num_rows):
        k = (pid, sc[i], scod[i])
        c = cells.setdefault(
            k,
            {
                "part_id": pid, "column": sc[i], "codec": scod[i],
                "blocks": 0, "rows": 0, "bytes_in": 0, "bytes_out": 0,
                "encode_ns": 0, "runs_emitted": 0, "partial_blocks": 0,
            },
        )
        c["blocks"] += 1
        c["rows"] += snr[i]
        c["bytes_in"] += sbi[i]
        c["bytes_out"] += sbo[i]
        c["encode_ns"] += sen[i]
        c["runs_emitted"] += sruns[i]
        if snr[i] != block_rows:
            c["partial_blocks"] += 1
    return _EncodeCommit(
        file=final,
        bytes=os.path.getsize(final),
        block_ids=sorted(set(sb)),
        cells=list(cells.values()),
    )


def _check_disjoint_blocks(msgs: list) -> None:
    """A block written by two tasks means the input was not clustered by
    block — fail the commit instead of committing two partial rows that
    dedup-on-read would silently halve."""
    seen: dict = {}
    for m in msgs:
        for b in m.block_ids:
            if b in seen and seen[b] != m.file:
                raise ValueError(
                    f"block {b} was written by two tasks ({seen[b]} and "
                    f"{m.file}): the input was not clustered by block — "
                    "repartition by floor(order_col / block_rows) and "
                    "sortWithinPartitions(order_col) before writing"
                )
            seen[b] = m.file


class PyrleWriter(DataSourceArrowWriter):
    """Task side: encode pre-clustered batches and write one data file.
    Driver side (``commit``): verify no block spans two tasks, then link
    the reported files in one locked metadata commit."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        # Writes require an EXPLICIT path.  The reader falls back to the
        # path schema() stamps into field metadata (catalog SELECTs hand
        # readers empty options), but that metadata also survives
        # arbitrary transformations of a read DataFrame — a writer that
        # fell back to it would turn a forgotten ``.save(path)`` into a
        # silent append/overwrite of whatever table the data was READ
        # from.  Keep the forgotten-path case a loud error.
        self.path = _norm_path(options.get("path"))
        if not self.path:
            raise ValueError("pyrle writer requires .save(<table path>)")
        self.order_col = options.get("order_col", "doc_seq")
        self.block_rows = int(options.get("block_rows", 65536))
        self.zstd_threshold = float(options.get("zstd_threshold", 0.9))
        self.overwrite = overwrite
        if self.order_col not in schema.fieldNames():
            raise ValueError(
                f"order_col {self.order_col!r} not in the written columns "
                f"{schema.fieldNames()}; pass .option('order_col', ...)"
            )
        self.columns = sorted(
            f.name for f in schema.fields if f.name != self.order_col
        )
        self.src_schema_json = {
            f.name: f.dataType.jsonValue()
            for f in schema.fields
            if f.name != self.order_col
        }
        self.snap_id = None
        self.t0 = time.time()

    def write(self, iterator):
        if self.snap_id is None:
            # one snapshot id per job: planned on the driver, shipped in
            # the pickled writer, shared by every task's data dir
            raise RuntimeError("writer not initialized with a snapshot id")
        return _encode_task(
            iterator,
            list(self.columns),
            self.order_col,
            self.block_rows,
            self.zstd_threshold,
            os.path.join(self.path, "data", self.snap_id),
        )

    def commit(self, messages):
        from pyrle_spark.plans.encode_job import (
            EncodeConfig,
            _encoded_schema_json,
            _finish_snapshot,
            _prior_props_guarded,
            _snapshot_properties,
        )
        from pyrle_spark.sources.icetable import IceTable

        msgs = [m for m in messages if m is not None and m.file]
        _check_disjoint_blocks(msgs)
        table = IceTable(self.path)
        config = EncodeConfig(
            columns=list(self.columns),
            order_col=self.order_col,
            block_rows=self.block_rows,
            block_aligned=True,
            zstd_threshold=self.zstd_threshold,
        )
        prior = _prior_props_guarded(table, list(self.columns))
        table.commit_files(
            self.snap_id,
            [
                {"path": m.file, "bytes": m.bytes}
                for m in sorted(msgs, key=lambda m: m.file)
            ],
            _encoded_schema_json(),
            mode="overwrite" if self.overwrite else "append",
            properties=_snapshot_properties(
                config, list(self.columns), prior, self.src_schema_json
            ),
        )
        cells = [c for m in msgs for c in m.cells]
        _finish_snapshot(
            table, self.path, self.snap_id, cells, list(self.columns),
            config, 0, time.time() - self.t0,
        )

    def abort(self, messages):
        for m in messages or []:
            if m is not None and getattr(m, "file", ""):
                try:
                    os.remove(m.file)
                except OSError:
                    pass


# ------------------------------------------------------------ streaming


class PyrleStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("pyrle")`` — a CDC tail of the encoded
    table through Spark's streaming offset machinery.

    The offset is the length of the MAIN snapshot lineage (the parent
    chain from the current head): each micro-batch delivers the decoded
    rows of the data files ADDED by the snapshots in ``(start, end]`` —
    the same manifest diff as :func:`scan_incremental`, planned by the
    driver from O(metadata) and decoded one task per file group.

    Semantics match ``streaming/decode_stream.py``'s documented contract:
    at-least-once per block (a resume/widen/compaction re-adds files and
    their blocks are re-delivered with current content — exactly-once
    consumers key on ``_order`` and upsert); MoR deletes are not part of
    the append stream (diff them with ``incremental_deletes``); a
    rollback shortens the lineage and fails the stream loudly — restart
    it with a fresh checkpoint.  ``option("startingSnapshot", "latest")``
    begins at the current head instead of the table's beginning."""

    def __init__(self, options: dict, schema: StructType):
        from pyrle_spark.sources.icetable import IceTable

        self.path = _norm_path(options.get("path")) or _path_from_schema(
            schema
        )
        if not self.path:
            raise ValueError("pyrle stream reader requires .load(<table path>)")
        table = IceTable(self.path)
        props = table.properties()
        self.block_rows = int(props["block_rows"])
        aliases = props.get("column_aliases", {})
        self.cols = [f.name for f in schema.fields if f.name != "_order"]
        self.phys_of = {c: aliases.get(c, c) for c in self.cols}
        self.types = {
            f.name: f.dataType for f in schema.fields if f.name != "_order"
        }
        self._chain: list = []  # main-lineage snapshot ids, oldest first
        # Spark lowercases data source option keys
        start = options.get("startingsnapshot", options.get("startingSnapshot", ""))
        self.start_latest = str(start).lower() == "latest"

    def _main_chain(self) -> list:
        """Snapshot ids on the main lineage, oldest → head.  The chain is
        append-only for a healthy table; a rollback (shorter or diverged
        chain) raises — streaming offsets cannot regress."""
        from pyrle_spark.sources.icetable import IceTable

        table = IceTable(self.path)
        head = table._read_meta()["current_snapshot_id"]
        known = set(self._chain)
        suffix: list = []
        cur = head
        while cur is not None and cur not in known:
            suffix.append(cur)
            cur = table._manifest(cur).get("parent")
        suffix.reverse()
        if cur is None and known:
            raise RuntimeError(
                f"snapshot lineage of {self.path} no longer extends the "
                "streamed prefix (rollback or compaction rewrote history); "
                "restart the stream with a fresh checkpoint"
            )
        if known and cur != self._chain[-1]:
            raise RuntimeError(
                f"snapshot lineage of {self.path} diverged at {cur} "
                "(rollback?); restart the stream with a fresh checkpoint"
            )
        self._chain = self._chain + suffix
        return self._chain

    def initialOffset(self) -> dict:
        return {"idx": len(self._main_chain()) if self.start_latest else 0}

    def latestOffset(self) -> dict:
        return {"idx": len(self._main_chain())}

    def partitions(self, start: dict, end: dict):
        from pyrle_spark.sources.icetable import IceTable

        chain = self._main_chain()
        table = IceTable(self.path)
        added: list = []
        for snap_id in chain[int(start["idx"]):int(end["idx"])]:
            m = table._manifest(snap_id)
            n_added = int(m.get("added_files", 0))
            if n_added:
                added.extend(f["path"] for f in m["files"][-n_added:])
        if not added:
            return [_FileGroup(paths=[])]
        # fuse overlapping block spans (same dedup rationale as batch)
        import pyarrow.parquet as pq

        spans = []
        for p in added:
            md = pq.ParquetFile(p).metadata
            if md.num_rows == 0:
                continue  # empty task file: nothing to deliver
            ci = md.schema.names.index("block_id")
            mn = mx = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    mn, mx = -(2**62), 2**62
                    break
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            if mn is None:
                mn, mx = -(2**62), 2**62  # statless file: fuse with all
            spans.append((mn, mx, p))
        if not spans:
            return [_FileGroup(paths=[])]
        spans.sort()
        groups: list = []
        cur_paths, cur_hi = [spans[0][2]], spans[0][1]
        for mn, mx, p in spans[1:]:
            if mn <= cur_hi:
                cur_paths.append(p)
                cur_hi = max(cur_hi, mx)
            else:
                groups.append(_FileGroup(paths=cur_paths))
                cur_paths, cur_hi = [p], mx
        groups.append(_FileGroup(paths=cur_paths))
        return groups

    def read(self, partition: _FileGroup):
        yield from _decode_group(
            partition.paths,
            self.phys_of,
            self.types,
            self.block_rows,
            np.empty(0, dtype=np.int64),  # append stream: no delete masking
            [],
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; the table needs nothing


class PyrleStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("pyrle")`` — one snapshot per micro-batch
    through the same Iceberg commit protocol as the batch writer, with
    exactly-once METADATA: the batch id is recorded in the snapshot
    properties, and a replayed batch (failure between task success and
    checkpoint advance) finds its id already committed and skips the
    re-link — its re-written task files become vacuum()-able orphans,
    never duplicate manifest entries."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        if overwrite:
            # complete/truncate output modes would need a REPLACE snapshot
            # per micro-batch; the sink is append-only by design — fail at
            # plan time instead of silently appending
            raise ValueError(
                "the pyrle streaming sink is append-only; use "
                'outputMode("append")'
            )
        # reuse the batch writer's option parsing / schema bookkeeping
        self._w = PyrleWriter(options, schema, overwrite=False)
        self.path = self._w.path
        self.sink_id = options.get("checkpointlocation", options.get(
            "checkpointLocation", ""
        ))

    def write(self, iterator):
        return _encode_task(
            iterator,
            list(self._w.columns),
            self._w.order_col,
            self._w.block_rows,
            self._w.zstd_threshold,
            os.path.join(self.path, "data", "stream"),
        )

    def _last_committed_batch(self, table) -> int:
        """Largest micro-batch id this sink has committed, read by walking
        the parent chain from the head until this sink's newest snapshot
        (batch ids are monotone per query, so the first hit is the max).
        O(snapshots by OTHER writers since our last commit) manifest
        reads — normally one."""
        cur = table.current_snapshot_id()
        while cur is not None:
            m = table._manifest(cur)
            p = m.get("properties", {})
            if (
                p.get("stream_sink_id", "") == self.sink_id
                and "stream_batch_id" in p
            ):
                return int(p["stream_batch_id"])
            cur = m.get("parent")
        return -1

    def commit(self, messages, batchId: int) -> None:
        from pyrle_spark.plans.encode_job import (
            EncodeConfig,
            _encoded_schema_json,
            _finish_snapshot,
            _prior_props_guarded,
            _snapshot_properties,
        )
        from pyrle_spark.sources.icetable import IceTable

        msgs = [m for m in messages if m is not None and m.file]
        table = IceTable(self.path)
        if table.exists() and batchId <= self._last_committed_batch(table):
            # replayed micro-batch (failure between this commit and the
            # checkpoint advance): already in the snapshot log — drop the
            # re-written task files instead of committing duplicates
            self.abort(messages, batchId)
            return
        if not msgs:
            return
        _check_disjoint_blocks(msgs)
        w = self._w
        config = EncodeConfig(
            columns=list(w.columns),
            order_col=w.order_col,
            block_rows=w.block_rows,
            block_aligned=True,
            zstd_threshold=w.zstd_threshold,
        )
        prior = _prior_props_guarded(table, list(w.columns))
        props = _snapshot_properties(
            config, list(w.columns), prior, w.src_schema_json
        )
        props["stream_batch_id"] = batchId
        props["stream_sink_id"] = self.sink_id
        snap_id = table.new_snapshot_id()
        table.commit_files(
            snap_id,
            [
                {"path": m.file, "bytes": m.bytes}
                for m in sorted(msgs, key=lambda m: m.file)
            ],
            _encoded_schema_json(),
            mode="append",
            properties=props,
        )
        cells = [c for m in msgs for c in m.cells]
        _finish_snapshot(
            table, self.path, snap_id, cells, list(w.columns), config, 0, 0.0
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            if m is not None and getattr(m, "file", ""):
                try:
                    os.remove(m.file)
                except OSError:
                    pass


class PyrleDataSource(DataSource):
    """``spark.read.format("pyrle")`` / ``.write.format("pyrle")`` —
    see module docstring.  Register once per session with
    :func:`register`."""

    @classmethod
    def name(cls):
        return "pyrle"

    def schema(self):
        from pyrle_spark.sources.icetable import IceTable

        path = _norm_path(self.options.get("path"))
        if not path:
            raise ValueError("pyrle data source requires a path")
        table = IceTable(path)
        if not table.exists():
            raise FileNotFoundError(f"no encoded table at {path}")
        props = table.properties(_resolve_read_snapshot(table, self.options))
        cols_opt = self.options.get("columns")
        cols = (
            [c.strip() for c in cols_opt.split(",") if c.strip()]
            if cols_opt
            else None
        )
        sch = _decoded_schema(props, cols).jsonValue()
        # stamp the path into field metadata: catalog SELECTs hand the
        # reader empty options but DO hand it this schema (see
        # _path_from_schema)
        for f in sch["fields"]:
            if f["name"] == "_order":
                f["metadata"] = {**(f.get("metadata") or {}), "pyrle.path": path}
        return StructType.fromJson(sch)

    def reader(self, schema: StructType):
        return PyrleReader(dict(self.options), schema)

    def writer(self, schema: StructType, overwrite: bool):
        from pyrle_spark.sources.icetable import IceTable

        w = PyrleWriter(dict(self.options), schema, overwrite)
        w.snap_id = IceTable(w.path).new_snapshot_id()
        return w

    def streamReader(self, schema: StructType):
        return PyrleStreamReader(dict(self.options), schema)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return PyrleStreamWriter(dict(self.options), schema, overwrite)


def register(spark) -> None:
    """Idempotently register the ``pyrle`` format on a session (and turn
    on the Python-data-source filter-pushdown flag it relies on — a
    reader that implements ``pushFilters`` fails planning when the flag
    is off)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PyrleDataSource)
