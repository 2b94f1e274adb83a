"""Hidden partitioning for IceTable — Iceberg's partition-spec model.

Iceberg's core read-side win at warehouse scale is that the table, not
the user, owns the partition layout: a *partition spec* maps source
columns through transforms (``identity``, ``bucket[N]``,
``truncate[W]``, ``days``/``months``/``hours``) to partition values, the
manifest records each data file's partition tuple, and the reader
projects its *source-column* predicates through the transforms to prune
files before any data IO.  Queries never mention partition columns — at
10^12 documents a ``warc_ts BETWEEN …`` or ``lang = 'en'`` predicate
must prune to the matching partitions without the query author knowing
the layout (Iceberg spec §Partitioning; reference scope: pyrle has no
tables at all — this is engine infrastructure the north rule's "Iceberg
table … partitioning handled explicitly" demands).

Spark-first: partition values are computed as Catalyst column
expressions (``F.hash`` = murmur3 for bucket, ``F.date_trunc`` for time
transforms) and the physical layout is Spark's own
``DataFrameWriter.partitionBy`` hive-style directory fan-out, so the
write is one distributed pass with no per-partition driver loop.  The
partition tuple is recovered from the directory names (written by the
executors) into the manifest — driver-side metadata, O(#files).

File pruning evaluates predicates against manifest entries ONLY
(``prune`` below): conservative — a file is dropped only when its
partition tuple *cannot* contain a matching row; anything unknown is
kept.  That is the same always-a-superset contract as the block-level
zone maps in ``plans/encode_job.prune_blocks``; the two compose (files
first, blocks second).
"""

from __future__ import annotations

import os
import urllib.parse
from dataclasses import dataclass
from datetime import date, datetime, timezone

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from pyrle_spark.sources.icetable import IceTable

__all__ = ["PartitionField", "PartitionSpec", "PartitionedIceTable"]

_TIME_GRANULARITY = {"years": "year", "months": "month", "days": "day", "hours": "hour"}


@dataclass(frozen=True)
class PartitionField:
    """One spec entry: ``transform(source_column) AS name``.

    transform: ``identity`` | ``bucket[N]`` | ``truncate[W]`` |
    ``years`` | ``months`` | ``days`` | ``hours``.
    """

    source: str
    transform: str = "identity"
    name: str | None = None

    @property
    def field_name(self) -> str:
        if self.name:
            return self.name
        base = self.transform.split("[", 1)[0]
        # identity gets a p_ prefix: the partition directory is a MIRROR
        # of the data column (hidden partitioning keeps the source column
        # in the data files; reads never reconstruct values from paths)
        return f"p_{self.source}" if base == "identity" else f"{self.source}_{base}"

    def _param(self) -> int:
        inside = self.transform.split("[", 1)[1].rstrip("]")
        n = int(inside)
        if n <= 0:
            raise ValueError(f"{self.transform}: parameter must be positive")
        return n

    # ------------------------------------------------------------ Spark side

    def expr(self, dtype: str = "string") -> Column:
        """The transform as a Catalyst expression (runs in codegen on the
        executors — the write-side hot path has no Python).  ``dtype`` is
        the source column's Spark typeName (drives the truncate form)."""
        c = F.col(self.source)
        t = self.transform
        if t == "identity":
            return c
        if t.startswith("bucket["):
            # murmur3, like Iceberg's bucket transform; pmod keeps it
            # non-negative so directory names are stable
            return F.pmod(F.hash(c), F.lit(self._param()))
        if t.startswith("truncate["):
            w = self._param()
            if dtype == "string":
                return F.substring(c, 1, w)
            # int: floor to multiple of w (pmod keeps negatives correct)
            return c - F.pmod(c, F.lit(w))
        if t in _TIME_GRANULARITY:
            return F.date_format(
                F.date_trunc(_TIME_GRANULARITY[t], c),
                {
                    "years": "yyyy",
                    "months": "yyyy-MM",
                    "days": "yyyy-MM-dd",
                    "hours": "yyyy-MM-dd-HH",
                }[t],
            )
        raise ValueError(f"unknown transform {t!r}")

    # ----------------------------------------------------------- driver side

    def apply_literal(self, v):
        """The same transform on a Python literal — used to project a
        source-column predicate into partition space when pruning."""
        t = self.transform
        if v is None:
            return None
        if t == "identity":
            return v
        if t.startswith("bucket["):
            return _murmur3_spark(v) % self._param()
        if t.startswith("truncate["):
            w = self._param()
            if isinstance(v, str):
                return v[:w]
            return v - (v % w)
        if t in _TIME_GRANULARITY:
            dt = _as_datetime(v)
            fmt = {
                "years": "%Y",
                "months": "%Y-%m",
                "days": "%Y-%m-%d",
                "hours": "%Y-%m-%d-%H",
            }[t]
            return dt.strftime(fmt)
        raise ValueError(f"unknown transform {t!r}")

    @property
    def order_preserving(self) -> bool:
        """True when v1 <= v2 implies transform(v1) <= transform(v2) —
        the condition for projecting range predicates.  bucket[] is the
        only non-monotone transform (string truncate + the time
        transforms emit lexicographically ordered strings)."""
        return not self.transform.startswith("bucket[")


def _as_datetime(v) -> datetime:
    if isinstance(v, datetime):
        return v
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day)
    if isinstance(v, str):
        return datetime.fromisoformat(v)
    raise TypeError(f"cannot interpret {v!r} as a timestamp")


def _murmur3_spark(v) -> int:
    """Spark's F.hash (Murmur3_x86_32, seed 42) for int/long/string
    literals, reimplemented so pruning can bucket a predicate constant
    without a Spark job.  Covered by a differential test against
    F.hash."""
    if isinstance(v, bool):
        raise TypeError("bucket[] over boolean is not supported")
    if isinstance(v, int):
        data = int(v).to_bytes(8, "little", signed=True)
    elif isinstance(v, str):
        data = v.encode("utf-8")
    else:
        raise TypeError(f"bucket[] literal of type {type(v).__name__}")
    return _mm3_x86_32(data, 42)


def _mm3_x86_32(data: bytes, seed: int) -> int:
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n - (n % 4)
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    # Spark (like Guava, unlike the reference C impl) processes the tail
    # bytes one at a time, each as a full mixed round of k1
    for i in range(rounded, n):
        k = data[i] & 0xFF if data[i] < 0x80 else data[i] - 0x100
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    # Spark's hash() is a SIGNED int32
    return h - 0x100000000 if h >= 0x80000000 else h


@dataclass(frozen=True)
class PartitionSpec:
    fields: tuple[PartitionField, ...]

    def __init__(self, *fields: PartitionField):
        object.__setattr__(self, "fields", tuple(fields))
        names = [f.field_name for f in fields]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate partition field names: {names}")

    @property
    def names(self) -> list[str]:
        return [f.field_name for f in self.fields]

    def to_json(self) -> list[dict]:
        return [
            {"source": f.source, "transform": f.transform, "name": f.field_name}
            for f in self.fields
        ]

    @staticmethod
    def from_json(spec: list[dict]) -> "PartitionSpec":
        return PartitionSpec(
            *(
                PartitionField(e["source"], e["transform"], e["name"])
                for e in spec
            )
        )


class PartitionedIceTable:
    """IceTable + partition spec: partition-fanned writes, manifests that
    carry each file's partition tuple, transform-aware file pruning,
    queryable metadata tables, and PARTITION EVOLUTION (Iceberg spec
    §Partition Evolution): :meth:`evolve_spec` commits a new default spec
    as metadata only — existing files keep the spec id they were written
    under and continue to prune by it, new files are laid out and pruned
    by the new spec.  No data rewrite ever happens on a spec change."""

    def __init__(self, path: str, spec: PartitionSpec | None = None):
        self.table = IceTable(path)
        meta = self.table._read_meta()
        specs_json = meta.get("partition_specs")
        if specs_json is None and meta.get("partition_spec") is not None:
            # table written before evolution support: its single spec is
            # spec 0 and the default
            specs_json = [meta["partition_spec"]]
        default_id = meta.get("default_spec_id", 0)
        meta_spec = specs_json[default_id] if specs_json else None
        if spec is None:
            if meta_spec is None:
                raise ValueError(
                    f"{path}: no partition spec given and none recorded"
                )
            spec = PartitionSpec.from_json(meta_spec)
        elif meta_spec is not None and meta_spec != spec.to_json():
            raise ValueError(
                f"{path}: recorded default partition spec {meta_spec} "
                f"differs from the given one {spec.to_json()}; use "
                "evolve_spec() to change the layout of future writes"
            )
        self.spec = spec
        self._specs = (
            [PartitionSpec.from_json(sj) for sj in specs_json]
            if specs_json
            else [spec]
        )
        self._default_spec_id = default_id if specs_json else 0

    # -------------------------------------------------------------- evolution

    def evolve_spec(self, new_spec: PartitionSpec) -> int:
        """Change the partition layout of FUTURE writes — a metadata-only
        commit, like Iceberg's ``ALTER TABLE … REPLACE PARTITION FIELD``.
        Existing data files keep their spec id and still prune under the
        spec they were written with; readers evaluate every file against its
        own spec, so a query spanning both generations stays exact and
        still skips whatever each generation's layout can prove out.
        Returns the new default spec id (an identical spec just becomes
        the default again without growing the spec list)."""
        import json
        import uuid as _u

        from pyrle_spark.sources.icetable import commit_lock

        with commit_lock(self.path):
            meta = self.table._read_meta()
            specs_json = meta.get("partition_specs")
            if specs_json is None:
                specs_json = (
                    [meta["partition_spec"]]
                    if meta.get("partition_spec") is not None
                    else [self.spec.to_json()]
                )
            nj = new_spec.to_json()
            if nj in specs_json:
                new_id = specs_json.index(nj)
            else:
                specs_json.append(nj)
                new_id = len(specs_json) - 1
            meta["partition_specs"] = specs_json
            meta["default_spec_id"] = new_id
            meta["partition_spec"] = nj  # back-compat mirror of the default
            tmp = self.table._meta_path + f".tmp-{_u.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, self.table._meta_path)
        self.spec = new_spec
        self._specs = [PartitionSpec.from_json(sj) for sj in specs_json]
        self._default_spec_id = new_id
        return new_id

    def _spec_for_file(self, f: dict) -> PartitionSpec:
        sid = f.get("spec_id", 0)
        return self._specs[sid] if sid < len(self._specs) else self.spec

    @property
    def path(self) -> str:
        return self.table.path

    # ------------------------------------------------------------------ write

    def write_snapshot(self, df: DataFrame, mode: str = "append") -> str:
        """One distributed pass: compute the partition-value columns in
        codegen, fan out with ``partitionBy`` (executors write hive-style
        ``name=value`` dirs — no driver loop over partitions), then lift
        the partition tuple of every file off its directory path into
        the manifest."""
        import json
        import time as _t
        import uuid as _u

        from pyrle_spark.sources.icetable import commit_lock

        names = self.spec.names
        clash = set(names) & set(df.columns)
        if clash:
            raise ValueError(
                f"partition field names {sorted(clash)} collide with data "
                "columns; give the PartitionField an explicit name"
            )
        dtypes = {sf.name: sf.dataType.typeName() for sf in df.schema.fields}
        for f in self.spec.fields:
            if f.source not in dtypes:
                raise ValueError(f"partition source {f.source!r} not in schema")
        with_parts = df.select(
            "*",
            *[
                f.expr(dtypes[f.source]).cast("string").alias(f.field_name)
                for f in self.spec.fields
            ],
        )
        snap_id = f"{int(_t.time() * 1000):x}-{_u.uuid4().hex[:8]}"
        data_dir = os.path.join(self.path, "data", snap_id)
        with_parts.write.mode("errorifexists").partitionBy(*names).parquet(data_dir)
        files = []
        for root, _, fnames in os.walk(data_dir):
            for fname in sorted(fnames):
                if not fname.endswith(".parquet"):
                    continue
                full = os.path.join(root, fname)
                files.append(
                    {
                        "path": full,
                        "bytes": os.path.getsize(full),
                        "partition": _partition_of(full, data_dir, names),
                        "spec_id": self._default_spec_id,
                    }
                )
        with commit_lock(self.path):
            meta = self.table._read_meta()
            if meta.get("partition_spec") not in (None, self.spec.to_json()):
                raise RuntimeError(
                    "partition spec changed concurrently (evolve_spec raced "
                    "this write); re-open the table and retry"
                )
            # sharded manifest (same model as IceTable.commit_files):
            # this commit's entries land in one immutable shard; an
            # append references the parent's shard chain, so commit
            # metadata is O(added files), not a rewrite of the full list
            prev_shards: list = []
            if mode == "append" and meta["current_snapshot_id"]:
                parent_snap = meta["current_snapshot_id"]
                prev_shards = self.table._parent_shards(
                    self.table._manifest(parent_snap, materialize=False),
                    parent_snap,
                )
            manifest = {
                "snapshot_id": snap_id,
                "parent": meta["current_snapshot_id"],
                "timestamp_ms": int(_t.time() * 1000),
                "mode": mode,
                "schema": df.schema.json(),
                "properties": {},
                "partition_spec": self.spec.to_json(),
                "partition_specs": [s.to_json() for s in self._specs],
                "default_spec_id": self._default_spec_id,
                "manifest_shards": prev_shards + (
                    [self.table._write_shard(f"mf-{snap_id}.json", files)]
                    if files
                    else []
                ),
                "added_files": len(files),
                "added_bytes": sum(f["bytes"] for f in files),
            }
            snap_path = os.path.join(
                self.path, "metadata", f"snap-{snap_id}.json"
            )
            with open(snap_path, "w") as f:
                json.dump(manifest, f)
            meta["snapshots"].append(
                {
                    "id": snap_id,
                    "timestamp_ms": manifest["timestamp_ms"],
                    "mode": mode,
                }
            )
            meta["current_snapshot_id"] = snap_id
            meta["schema"] = df.schema.json()
            meta["partition_spec"] = self.spec.to_json()
            meta["partition_specs"] = [s.to_json() for s in self._specs]
            meta["default_spec_id"] = self._default_spec_id
            tmp = self.table._meta_path + f".tmp-{_u.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, self.table._meta_path)
        return snap_id

    # ------------------------------------------------------------------- read

    def read(
        self,
        spark: SparkSession,
        predicates: list[tuple] | None = None,
        snapshot_id: str | None = None,
    ) -> DataFrame:
        """Read with partition pruning.  ``predicates`` are simple
        source-column conjuncts ``(col, op, value)`` with op in
        ``= < <= > >= in``; they prune FILES here and are *also* returned
        as a DataFrame filter, so the result is exact even where a
        transform can't prune (the superset contract).  No predicates →
        full read."""
        manifest = self._manifest(snapshot_id)
        files = manifest["files"]
        # partition evolution: each file prunes under the spec it was
        # written with — a predicate an old layout can't prove keeps the
        # old files (superset contract) while still pruning the new ones
        kept = [
            f["path"]
            for f in files
            if _file_matches(
                self._spec_for_file(f), f.get("partition", {}), predicates or []
            )
        ]
        schema = _schema_of(manifest)
        if not kept:
            return _apply_filters(
                spark.createDataFrame([], schema=schema), predicates or []
            )
        df = spark.read.schema(schema).parquet(*kept)
        return _apply_filters(df, predicates or [])

    def prune(
        self, predicates: list[tuple], snapshot_id: str | None = None
    ) -> dict:
        """Pruning stats without reading data: how many files survive."""
        files = self._manifest(snapshot_id)["files"]
        kept = [
            f
            for f in files
            if _file_matches(
                self._spec_for_file(f), f.get("partition", {}), predicates
            )
        ]
        return {
            "total_files": len(files),
            "kept_files": len(kept),
            "kept_bytes": sum(f["bytes"] for f in kept),
            "total_bytes": sum(f["bytes"] for f in files),
        }

    def _manifest(self, snapshot_id: str | None) -> dict:
        snap = snapshot_id or self.table.current_snapshot_id()
        if snap is None:
            raise FileNotFoundError(f"no snapshot in {self.path}")
        return self.table._manifest(snap)

    # -------------------------------------------------------- metadata tables

    def files_df(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        """The ``table$files`` metadata relation: one row per live data
        file with its partition tuple — queryable layout introspection
        (`SELECT … FROM t$files` in Iceberg)."""
        manifest = self._manifest(snapshot_id)
        rows = [
            {
                "file_path": f["path"],
                "bytes": f["bytes"],
                "spec_id": f.get("spec_id", 0),
                **{
                    f"partition_{k}": v
                    for k, v in (f.get("partition") or {}).items()
                },
            }
            for f in manifest["files"]
        ]
        # after partition evolution files carry different tuples: the
        # relation is the union of every spec's fields, NULL where a file's
        # spec lacks the field
        all_names = sorted({n for s in self._specs for n in s.names})
        schema = "file_path string, bytes long, spec_id int, " + ", ".join(
            f"partition_{n} string" for n in all_names
        )
        return spark.createDataFrame(rows, schema=schema)

    def partitions_df(
        self, spark: SparkSession, snapshot_id: str | None = None
    ) -> DataFrame:
        """The ``table$partitions`` relation: per-partition file count and
        bytes (row counts come from the files' parquet footers at read
        time; the manifest stays O(#files) driver metadata)."""
        fdf = self.files_df(spark, snapshot_id)
        keys = ["spec_id"] + [
            c for c in fdf.columns if c.startswith("partition_")
        ]
        return fdf.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("file_count"),
            F.sum("bytes").alias("bytes"),
        )


def _partition_of(path: str, base: str, names: list[str]) -> dict:
    rel = os.path.relpath(os.path.dirname(path), base)
    out = {}
    for seg in rel.split(os.sep):
        if "=" not in seg:
            continue
        k, v = seg.split("=", 1)
        if k in names:
            # Spark URL-encodes special chars in partition dir names and
            # spells NULL as __HIVE_DEFAULT_PARTITION__
            out[k] = (
                None
                if v == "__HIVE_DEFAULT_PARTITION__"
                else urllib.parse.unquote(v)
            )
    missing = [n for n in names if n not in out]
    if missing:
        raise ValueError(f"{path}: partition dirs missing fields {missing}")
    return out


_UNKNOWN = object()  # coercion failed: comparison unknowable → keep the file


def _schema_of(manifest: dict):
    import json as _json

    from pyspark.sql.types import StructType

    return StructType.fromJson(_json.loads(manifest["schema"]))


def _coerce(lit, part_value: str | None):
    """Manifest partition values are strings (directory names); coerce
    them to the predicate literal's type for comparison.  Any literal
    type not explicitly handled returns _UNKNOWN (file kept): comparing
    the raw directory string against e.g. a datetime.date would either
    silently drop matching files ('=') or raise (range ops), breaking
    the always-a-superset contract."""
    import datetime as _dt
    import decimal as _dec

    if part_value is None:
        return None
    if isinstance(lit, bool):
        return part_value == "true"
    if isinstance(lit, int):
        try:
            return int(part_value)
        except ValueError:
            return _UNKNOWN
    if isinstance(lit, float):
        try:
            return float(part_value)
        except ValueError:
            return _UNKNOWN
    # datetime before date: datetime is a date subclass
    if isinstance(lit, _dt.datetime):
        if lit.tzinfo is not None:
            return _UNKNOWN  # naive dir value vs aware literal: unorderable
        try:
            # Spark spells timestamp partition dirs 'YYYY-MM-DD HH:MM:SS[.f]'
            return _dt.datetime.fromisoformat(part_value.replace(" ", "T", 1))
        except ValueError:
            return _UNKNOWN
    if isinstance(lit, _dt.date):
        try:
            return _dt.date.fromisoformat(part_value)
        except ValueError:
            return _UNKNOWN
    if isinstance(lit, _dec.Decimal):
        try:
            return _dec.Decimal(part_value)
        except _dec.InvalidOperation:
            return _UNKNOWN
    if isinstance(lit, str):
        return part_value
    return _UNKNOWN


def _file_matches(
    spec: PartitionSpec, partition: dict, predicates: list[tuple]
) -> bool:
    """Conservative transform-aware projection: drop the file only when a
    predicate provably excludes its partition value."""
    by_source = {f.source: f for f in spec.fields}
    for col, op, val in predicates:
        f = by_source.get(col)
        if f is None:
            continue  # not a partition source — cannot prune on it
        pv = partition.get(f.field_name)
        if pv is None:
            # NULL partition: only equality/IN/range on non-null literals
            # can exclude it... NULL never equals or compares — drop for
            # every op except nothing (predicates are null-rejecting)
            return False
        if op == "=":
            tv = f.apply_literal(val)
            cv = _coerce(tv, pv)
            if cv is not _UNKNOWN and cv != tv:
                return False
        elif op == "in":
            tvs = [f.apply_literal(v) for v in val]
            cvs = [_coerce(tv, pv) for tv in tvs]
            if _UNKNOWN not in cvs and all(cv != tv for cv, tv in zip(cvs, tvs)):
                return False
        elif op in ("<", "<=", ">", ">="):
            if not f.order_preserving:
                continue  # bucket[] can't prune ranges
            tv = f.apply_literal(val)
            cv = _coerce(tv, pv)
            if cv is _UNKNOWN:
                continue
            # partition value is transform(v) for every v in the file;
            # monotone transform ⇒ file's value range maps into [cv, cv]
            # at this granularity, so compare at transformed precision
            # with boundary slack: only strictly-outside files drop
            if op in ("<", "<=") and cv > tv:
                return False
            if op in (">", ">=") and cv < tv:
                return False
        else:
            raise ValueError(f"unknown predicate op {op!r}")
    return True


def _apply_filters(df: DataFrame, predicates: list[tuple]) -> DataFrame:
    for col, op, val in predicates:
        c = F.col(col)
        if op == "=":
            df = df.filter(c == F.lit(val))
        elif op == "in":
            df = df.filter(c.isin(list(val)))
        elif op == "<":
            df = df.filter(c < F.lit(val))
        elif op == "<=":
            df = df.filter(c <= F.lit(val))
        elif op == ">":
            df = df.filter(c > F.lit(val))
        elif op == ">=":
            df = df.filter(c >= F.lit(val))
    return df
