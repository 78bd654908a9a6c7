"""Snapshot isolation + time travel over plain parquet: a versioned
manifest log, the minimal form of the Delta/Iceberg commit-log design.

The reference tracks files in a mutable metadata.json it rewrites in place
on every flush (hepop.js:245-248, updateMetadata) — readers racing a writer
can see a half-updated index, and there is no history at all. The fix is
the lakehouse pattern:

  * data files are immutable, written once under `data/c{N}/` per commit;
  * a table VERSION is an immutable manifest `_snapshots/v{N}.json`
    listing exactly the files in that version (append = previous list +
    new files, overwrite = new files only);
  * the manifest is the commit point, published by atomic rename — a
    reader always resolves some fully-written version;
  * time travel = read any retained manifest; rollback = new version
    re-publishing an old file list (history is never rewritten).

Single-writer by design here; multi-writer needs the rename to become a
put-if-absent on v{N} (object-store conditional put) — same protocol,
different primitive. Scale: manifests hold file PATHS, so the data plane
stays fully parallel; listing is O(files-in-version) with no directory
walks, which is exactly what object stores need.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_SNAP_DIR = "_snapshots"


def _snap_path(base: str, v: int) -> str:
    return os.path.join(base, _SNAP_DIR, f"v{v}.json")


def versions(base: str) -> list[int]:
    d = os.path.join(base, _SNAP_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[1:-5]) for f in os.listdir(d) if f.startswith("v") and f.endswith(".json")
    )


def _manifest(base: str, v: int) -> dict:
    with open(_snap_path(base, v)) as f:
        return json.load(f)


def commit_snapshot(df: DataFrame, base: str, mode: str = "append") -> int:
    """Write df as a new commit and publish the next version. Returns the
    published version number."""
    if mode not in ("append", "overwrite"):
        raise ValueError(mode)
    vs = versions(base)
    v = (vs[-1] + 1) if vs else 1
    commit_dir = os.path.join(base, "data", f"c{v}")
    df.write.mode("error").parquet(commit_dir)
    new_files = sorted(
        os.path.join("data", f"c{v}", f)
        for f in os.listdir(commit_dir)
        if f.endswith(".parquet")
    )
    files = new_files
    if mode == "append" and vs:
        files = _manifest(base, vs[-1])["files"] + new_files
    _publish(base, v, files, mode)
    return v


def rollback(base: str, to_version: int) -> int:
    """Publish a NEW version whose file list is that of ``to_version`` —
    history stays intact (Delta RESTORE semantics)."""
    old = _manifest(base, to_version)
    vs = versions(base)
    v = vs[-1] + 1
    _publish(base, v, old["files"], f"rollback:{to_version}")
    return v


def _publish(base: str, v: int, files: list[str], mode: str) -> None:
    os.makedirs(os.path.join(base, _SNAP_DIR), exist_ok=True)
    tmp = _snap_path(base, v) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": v, "mode": mode, "files": files}, f)
    os.rename(tmp, _snap_path(base, v))  # atomic commit point


def read_snapshot(spark: SparkSession, base: str, version: int | None = None) -> DataFrame:
    """Read the table at ``version`` (default: latest)."""
    vs = versions(base)
    if not vs:
        raise FileNotFoundError(f"no snapshots under {base}")
    v = vs[-1] if version is None else version
    man = _manifest(base, v)
    if not man["files"]:
        raise ValueError(f"version {v} is empty")
    return spark.read.parquet(*[os.path.join(base, p) for p in man["files"]])


def vacuum(base: str, keep_last: int = 2) -> list[str]:
    """Drop manifests older than the last ``keep_last`` versions and delete
    commit directories no retained version references. Returns removed
    paths. (The time-travel horizon moves; current data is untouched.)"""
    vs = versions(base)
    keep, drop = vs[-keep_last:], vs[:-keep_last]
    referenced = {p for v in keep for p in _manifest(base, v)["files"]}
    removed: list[str] = []
    for v in drop:
        os.remove(_snap_path(base, v))
        removed.append(_snap_path(base, v))
    data_dir = os.path.join(base, "data")
    for c in os.listdir(data_dir) if os.path.isdir(data_dir) else []:
        prefix = os.path.join("data", c) + os.sep
        if not any(p.startswith(prefix) for p in referenced):
            shutil.rmtree(os.path.join(data_dir, c))
            removed.append(os.path.join(data_dir, c))
    return removed
