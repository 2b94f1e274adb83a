"""Incremental small-file compaction — Iceberg's ``rewrite_data_files``
*binpack* strategy for the encoded table.

``compact_table`` rewrites the WHOLE live set; at 100 TB that is a full
read+write of the table and you never want it for routine maintenance.
Binpack instead touches only files below a size floor, greedily packs
them into target-sized groups, rewrites each group's block rows
VERBATIM (no re-encode, no re-sort — the buffers are already
compressed, and ``dedup_blocks`` semantics are order-free), and commits
one overwrite snapshot whose file list is (untouched files + packed
files).  Decode output is bit-identical before and after; position
deletes key on the global ``_order`` and never notice the move; time
travel to the pre-binpack snapshot still reads the original files
(superseded files are reclaimed later by ``expire_snapshots`` +
``vacuum``, same as every other rewrite).

Scale shape: planning is O(#files) driver-side metadata (the same
manifest walk every Iceberg action does); the rewrite reads ONLY the
small files and writes them back as one Spark job per schema group —
rows route to their pack via a broadcast path→group map and a
``partitionBy`` write, so a million-file manifest compacts without a
driver loop over packs.  Files are grouped by their (field-id, type,
partition-spec) signature, so schema-evolved tables never union
incompatible files into one pack.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pyrle_spark.sources.icetable import IceTable

__all__ = ["rewrite_binpack"]


def _group_sig(fentry: dict) -> str:
    """Schema-compatibility signature: files pack together only when
    they agree on field ids, physical types, and partition tuple."""
    return json.dumps(
        {
            "field_ids": fentry.get("field_ids", {}),
            "types": fentry.get("types", {}),
            "partition": fentry.get("partition"),
            "spec_id": fentry.get("spec_id"),
        },
        sort_keys=True,
    )


def rewrite_binpack(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 << 20,
    min_file_bytes: int | None = None,
) -> dict:
    """Pack files smaller than ``min_file_bytes`` (default: half the
    target) into files of at most ``target_file_bytes``.  Returns
    ``{"snapshot_id", "rewritten_files", "new_files", "kept_files",
    "rewritten_bytes"}``; ``snapshot_id`` is None when fewer than two
    files qualify (nothing to gain — no empty commit)."""
    min_file_bytes = (
        target_file_bytes // 2 if min_file_bytes is None else min_file_bytes
    )
    table = IceTable(table_dir)
    parent = table.current_snapshot_id()
    manifest = table._manifest(parent)
    files = manifest["files"]
    small = [f for f in files if f["bytes"] < min_file_bytes]
    keep = [f for f in files if f["bytes"] >= min_file_bytes]

    # greedy first-fit-decreasing per schema group; single-file packs
    # gain nothing and pass through untouched
    groups: dict[str, list] = {}
    for f in small:
        groups.setdefault(_group_sig(f), []).append(f)
    packs: list[list] = []  # each: >=2 file entries of one group
    passthrough: list = []
    for sig_files in groups.values():
        bins: list[dict] = []
        for f in sorted(sig_files, key=lambda x: -x["bytes"]):
            for b in bins:
                if b["bytes"] + f["bytes"] <= target_file_bytes:
                    b["files"].append(f)
                    b["bytes"] += f["bytes"]
                    break
            else:
                bins.append({"files": [f], "bytes": f["bytes"]})
        for b in bins:
            if len(b["files"]) > 1:
                packs.append(b["files"])
            else:
                passthrough.extend(b["files"])
    if not packs:
        return {
            "snapshot_id": None,
            "rewritten_files": 0,
            "new_files": 0,
            "kept_files": len(files),
            "rewritten_bytes": 0,
        }

    snap_id = table.new_snapshot_id()
    out_root = os.path.join(table.path, "data", snap_id)
    new_entries: list = []
    rewritten = 0
    rewritten_bytes = 0
    pack_no = 0
    # one Spark job per schema group that has packs (almost always one):
    # rows route to their pack by a broadcast path→pack map, the
    # partitionBy write emits exactly one directory per pack, and
    # repartition('_pack') lands each pack's rows in one task → one file
    by_group: dict[str, list] = {}
    for p in packs:
        by_group.setdefault(_group_sig(p[0]), []).append(p)
    for sig, group_packs in by_group.items():
        path_to_pack = {}
        proto = group_packs[0][0]
        for p in group_packs:
            for f in p:
                path_to_pack[os.path.abspath(f["path"])] = pack_no
                rewritten += 1
                rewritten_bytes += f["bytes"]
            pack_no += 1
        paths = sorted(path_to_pack)
        mapping = F.create_map(
            *[F.lit(x) for kv in path_to_pack.items() for x in kv]
        )
        out_dir = os.path.join(out_root, f"group-{len(new_entries)}")
        (
            spark.read.parquet(*paths)
            .withColumn(
                "_pack",
                # input_file_name() is a percent-encoded file URI; the
                # map keys are os.path.abspath strings, so the path must
                # be URI-decoded or spaces/non-ASCII never match and the
                # row lands in the Hive default partition (grouping
                # silently degrades).  A literal '+' is raw in a URI
                # path but url_decode would turn it into a space —
                # re-escape it first.
                F.element_at(
                    mapping,
                    F.url_decode(
                        F.regexp_replace(
                            F.regexp_replace(
                                F.input_file_name(), "^file:/*", "/"
                            ),
                            "\\+",
                            "%2B",
                        )
                    ),
                ),
            )
            .repartition(len(group_packs), "_pack")
            .write.mode("errorifexists")
            .option("compression", "none")
            .option("parquet.block.size", str(16 * 1024 * 1024))
            .partitionBy("_pack")
            .parquet(out_dir)
        )
        for root, _, names in os.walk(out_dir):
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                full = os.path.join(root, name)
                entry = {
                    "path": full,
                    "bytes": os.path.getsize(full),
                    "field_ids": proto.get("field_ids", {}),
                    "types": proto.get("types", {}),
                }
                if proto.get("partition") is not None:
                    entry["partition"] = proto["partition"]
                if proto.get("spec_id") is not None:
                    entry["spec_id"] = proto["spec_id"]
                new_entries.append(entry)

    props = dict(table.properties())
    props["binpacked_from"] = parent
    committed = table.commit_files(
        snap_id,
        keep + passthrough + new_entries,
        manifest["schema"],
        mode="overwrite",
        properties=props,
    )
    return {
        "snapshot_id": committed,
        "rewritten_files": rewritten,
        "new_files": len(new_entries),
        "kept_files": len(keep) + len(passthrough),
        "rewritten_bytes": rewritten_bytes,
    }
