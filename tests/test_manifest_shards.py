"""Sharded snapshot manifests: commit metadata is O(added files), read
planning re-parses only new shards, expiry GCs unreferenced shards, and
clones copy the shards they reference (metadata-self-contained)."""

from __future__ import annotations

import json
import os

from pyrle_spark.sources.icetable import _SHARD_CACHE, IceTable, clone_table

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "block_id", "type": "long", "nullable": True, "metadata": {}}
        ],
    }
)


def _fake_files(lo: int, n: int) -> list:
    return [{"path": f"/nonexistent/f{lo + i}.parquet", "bytes": 100} for i in range(n)]


def test_manifest_commit_is_o_added_at_10k_files(tmp_path):
    """60 appends x 200 files = 12,000 file entries: every snap-*.json
    stays small (shard refs, never the inline list), the materialized
    view is complete, and a fresh commit parses no old shard."""
    t = str(tmp_path / "t")
    table = IceTable(t)
    n_commits, per = 60, 200
    snap_sizes = []
    for i in range(n_commits):
        sid = table.new_snapshot_id()
        table.commit_files(sid, _fake_files(i * per, per), SCHEMA_JSON)
        p = os.path.join(t, "metadata", f"snap-{sid}.json")
        snap_sizes.append(os.path.getsize(p))
    # the manifest document grows by ONE shard ref (~20 bytes) per
    # commit, not by the full file list (12k entries ≈ 700 KB inline)
    assert snap_sizes[-1] < 16_384, snap_sizes[-1]
    assert snap_sizes[-1] - snap_sizes[0] < n_commits * 64

    m = table._manifest(table.current_snapshot_id())
    assert len(m["files"]) == n_commits * per
    assert len(m["manifest_shards"]) == n_commits
    # shards are immutable + cached: a second materialization parses
    # nothing new (same list objects come back from the cache)
    key = os.path.join(t, "metadata", m["manifest_shards"][0])
    assert key in _SHARD_CACHE


def test_manifest_shard_gc_on_expire(tmp_path):
    t = str(tmp_path / "t")
    table = IceTable(t)
    for i in range(5):
        table.commit_files(table.new_snapshot_id(), _fake_files(i * 10, 10), SCHEMA_JSON)
    # overwrite drops the old chain
    table.commit_files(
        table.new_snapshot_id(), _fake_files(900, 10), SCHEMA_JSON, mode="overwrite"
    )
    md = os.path.join(t, "metadata")
    assert len([f for f in os.listdir(md) if f.startswith("mf-")]) == 6
    gc = table.expire_snapshots(keep_last=1)
    assert len(gc["expired_snapshots"]) == 5
    # only the overwrite's shard is still referenced
    left = [f for f in os.listdir(md) if f.startswith("mf-")]
    assert len(left) == 1
    assert len(table._manifest(table.current_snapshot_id())["files"]) == 10


def test_manifest_shared_shards_survive_partial_expiry(tmp_path):
    """An append chain shares shards: expiring old snapshots must keep
    every shard the retained chain still references."""
    t = str(tmp_path / "t")
    table = IceTable(t)
    for i in range(4):
        table.commit_files(table.new_snapshot_id(), _fake_files(i * 10, 10), SCHEMA_JSON)
    table.expire_snapshots(keep_last=1)  # head references all 4 shards
    m = table._manifest(table.current_snapshot_id())
    assert len(m["files"]) == 40
    md = os.path.join(t, "metadata")
    assert len([f for f in os.listdir(md) if f.startswith("mf-")]) == 4


def test_clone_copies_referenced_shards(tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    table = IceTable(src)
    for i in range(3):
        table.commit_files(table.new_snapshot_id(), _fake_files(i * 10, 10), SCHEMA_JSON)
    clone_table(src, dst)
    cl = IceTable(dst)
    assert len(cl._manifest(cl.current_snapshot_id())["files"]) == 30
    # metadata-self-contained: the clone resolves shards from ITS OWN dir
    md = os.path.join(dst, "metadata")
    assert len([f for f in os.listdir(md) if f.startswith("mf-")]) == 3


def test_legacy_inline_manifest_still_reads_and_wraps(tmp_path):
    """A pre-shard snapshot (inline "files") reads unchanged, and an
    append on top wraps it ONCE into a legacy shard so the chain goes
    O(added) from there."""
    t = str(tmp_path / "t")
    table = IceTable(t)
    sid = table.new_snapshot_id()
    table.commit_files(sid, _fake_files(0, 7), SCHEMA_JSON)
    # rewrite the snapshot into the legacy inline form
    p = os.path.join(t, "metadata", f"snap-{sid}.json")
    with open(p) as f:
        m = json.load(f)
    m["files"] = table._manifest(sid)["files"]
    m.pop("manifest_shards")
    with open(p, "w") as f:
        json.dump(m, f)
    os.remove(os.path.join(t, "metadata", f"mf-{sid}.json"))
    assert len(table._manifest(sid)["files"]) == 7  # inline read path

    sid2 = table.new_snapshot_id()
    table.commit_files(sid2, _fake_files(100, 3), SCHEMA_JSON)
    m2 = table._manifest(sid2, materialize=False)
    assert m2["manifest_shards"] == [f"mf-{sid}-legacy.json", f"mf-{sid2}.json"]
    assert len(table._manifest(sid2)["files"]) == 10
