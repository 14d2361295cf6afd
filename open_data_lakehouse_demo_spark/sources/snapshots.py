"""Snapshot tables — manifest-based versioned parquet with time travel.

The production table format is Iceberg (plans/ddl.py uses it when the
runtime jar is present): snapshots, `VERSION AS OF`, ACID commits all come
built in. This module provides the same *surface* on plain parquet for
runtimes without the jar — a minimal manifest-per-version table layout in
the spirit of Iceberg's metadata tree (ref lakehouse_part1_load_data.py:
346-409 inspects exactly this structure: table metadata → manifest →
data files):

    <table>/
      data/v00001-<uuid>/part-*.parquet      immutable data segments
      _snapshots/v00001.json                 manifest: segment list, schema,
      _snapshots/v00002.json                 parent, committed_at
      _snapshots/_latest                     pointer file (atomic rename)

Commit protocol (single-writer ACID):
  1. write new data segments (invisible until referenced);
  2. write manifest JSON to a temp name, fsync, rename into place;
  3. rename the _latest pointer — the atomic commit point. Readers resolve
     _latest (or an explicit version / as-of timestamp) then read ONLY the
     segments that manifest lists — a half-finished write is never visible.

Append reuses the parent's segments by reference (no rewrite — O(Δ) commit
cost like Iceberg's fast append). Overwrite starts a fresh segment set;
old versions stay readable until `expire_snapshots`.

Scale notes: manifests list segment DIRECTORIES, not files, so manifest
size is O(commits), not O(files); reads hand Spark a directory list and
parquet footer pruning/pushdown work unchanged. For object stores, rename
atomicity maps to conditional-put of the pointer object.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_SNAPDIR = "_snapshots"
_LATEST = "_latest"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _SNAPDIR, f"v{version:05d}.json")


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def current_version(table_dir: str) -> int | None:
    ptr = os.path.join(table_dir, _SNAPDIR, _LATEST)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def snapshots(table_dir: str) -> list[dict]:
    """Snapshot log, oldest first (Iceberg `table.snapshots` analogue)."""
    snapdir = os.path.join(table_dir, _SNAPDIR)
    if not os.path.isdir(snapdir):
        return []
    out = []
    for name in sorted(os.listdir(snapdir)):
        if name.endswith(".json"):
            with open(os.path.join(snapdir, name)) as f:
                out.append(json.load(f))
    return out


def _commit(table_dir: str, segments: list[str], operation: str, parent: int | None) -> int:
    version = (parent or 0) + 1
    manifest = {
        "version": version,
        "parent": parent,
        "operation": operation,
        "segments": segments,
        "committed_at": time.time(),
    }
    snapdir = os.path.join(table_dir, _SNAPDIR)
    os.makedirs(snapdir, exist_ok=True)
    mpath = _manifest_path(table_dir, version)
    tmp = mpath + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, mpath)
    ptr_tmp = os.path.join(snapdir, f".{_LATEST}.tmp-{uuid.uuid4().hex}")
    with open(ptr_tmp, "w") as f:
        f.write(str(version))
        f.flush()
        os.fsync(f.fileno())
    os.rename(ptr_tmp, os.path.join(snapdir, _LATEST))  # atomic commit point
    return version


def write_snapshot(df: DataFrame, table_dir: str, mode: str = "overwrite") -> int:
    """Commit ``df`` as a new version. ``mode``: 'overwrite' starts a fresh
    segment set; 'append' adds a segment and re-references the parent's
    (no data rewrite). Returns the committed version number."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    parent = current_version(table_dir)
    segment = f"data/v{(parent or 0) + 1:05d}-{uuid.uuid4().hex[:8]}"
    df.write.mode("errorifexists").parquet(os.path.join(table_dir, segment))
    segments = [segment]
    if mode == "append" and parent is not None:
        segments = _read_manifest(table_dir, parent)["segments"] + segments
    return _commit(table_dir, segments, mode, parent)


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    as_of_timestamp: float | None = None,
) -> DataFrame:
    """Read a table version (default latest). ``version`` = explicit
    `VERSION AS OF`; ``as_of_timestamp`` = `TIMESTAMP AS OF` (latest
    version committed at-or-before the given unix time)."""
    if version is not None and as_of_timestamp is not None:
        raise ValueError("pass version OR as_of_timestamp, not both")
    if as_of_timestamp is not None:
        eligible = [
            s["version"] for s in snapshots(table_dir) if s["committed_at"] <= as_of_timestamp
        ]
        if not eligible:
            raise ValueError(f"no snapshot at or before {as_of_timestamp}")
        version = max(eligible)
    if version is None:
        version = current_version(table_dir)
        if version is None:
            raise ValueError(f"{table_dir} has no snapshots")
    manifest = _read_manifest(table_dir, version)
    paths = [os.path.join(table_dir, seg) for seg in manifest["segments"]]
    return spark.read.parquet(*paths)


def expire_snapshots(table_dir: str, keep_last: int = 2) -> list[int]:
    """Iceberg-style maintenance: drop manifests older than the last
    ``keep_last`` and delete segments no surviving version references.
    Returns the expired version numbers."""
    import shutil

    snaps = snapshots(table_dir)
    if len(snaps) <= keep_last:
        return []
    keep, drop = snaps[-keep_last:], snaps[:-keep_last]
    live = {seg for s in keep for seg in s["segments"]}
    expired = []
    for s in drop:
        for seg in s["segments"]:
            if seg not in live:
                seg_path = os.path.join(table_dir, seg)
                if os.path.isdir(seg_path):
                    shutil.rmtree(seg_path)
        os.remove(_manifest_path(table_dir, s["version"]))
        expired.append(s["version"])
    return expired
