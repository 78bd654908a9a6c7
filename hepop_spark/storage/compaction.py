"""Compaction: merge many small flush files into few large ones.

Reference behavior (hepop.js:415-419, :494-785): every 60 s, per table, a
10m -> 1h -> 24h ladder; files are grouped by wall-clock hour, merged by
concatenation (sorted by file min_time, NOT globally re-sorted, no dedup),
written as `c_{seq}.parquet`, then source files are deleted and metadata
swapped atomically.

Spark-native design:
 - the unit of compaction is a partition directory (date/bucket), matching
   the writer layout;
 - a partition is eligible when it holds >= min_files files (reference:
   >= 2 raw or 1 raw + 1 compacted, hepop.js:670-677);
 - merge = read partition -> sortWithinPartitions(timestamp) -> coalesce ->
   write to a staging dir -> atomic directory swap. The within-partition
   sort *improves* on the reference's pure concat (better row-group stats,
   same query results — the reference's own invariant, hepop.js:703-785);
 - query equivalence before/after is the correctness contract
   (tests/test_storage.py).

At scale this is the classic OPTIMIZE small-files job: driver-side listing
chooses partitions; each rewrite is an independent distributed job.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# --- cross-process reader safety (r06 verdict item 4) ----------------------
# Serve-mode READERS live in other processes and list partition dirs with
# Spark's partition discovery while this process compacts. Two rules keep
# them safe without any reader-side coordination:
#  1. staging and trash directories are DOT-PREFIXED: Spark's file index
#     filters names starting with '.' or '_' at every listing level, so a
#     mid-write temp or a not-yet-deleted old copy can never surface as a
#     phantom `bucket=...` partition (double-read);
#  2. the live/new swap is ONE atomic renameat2(RENAME_EXCHANGE) where the
#     platform provides it, so there is no instant at which the partition
#     directory is missing; the two-rename fallback leaves only a
#     microsecond window, and the serve query path retries once on
#     missing-file (plans that captured the old file list get one fresh
#     re-discovery instead of an error).

_AT_FDCWD = -100
_RENAME_EXCHANGE = 2


def _exchange_dirs(a: str, b: str) -> bool:
    """Atomically swap two directories (Linux renameat2 RENAME_EXCHANGE).
    Returns False when unsupported — callers fall back to rename+rename."""
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        r = libc.renameat2(
            _AT_FDCWD, os.fsencode(a), _AT_FDCWD, os.fsencode(b),
            _RENAME_EXCHANGE,
        )
        return r == 0
    except (AttributeError, OSError):
        return False


def _hidden_sibling(path: str, tag: str) -> str:
    """A dot-prefixed sibling name: invisible to Spark partition discovery
    and to list_partitions, same filesystem (rename stays atomic)."""
    parent, leaf = os.path.split(path)
    return os.path.join(parent, f".{leaf}.{tag}_{uuid.uuid4().hex[:8]}")


def recover_orphans(base_path: str) -> dict[str, str]:
    """Crash recovery for interrupted swaps, run at the start of every
    sweep: hidden staging/trash dirs from a dead compaction are either
    RESTORED (they hold the only copy) or DELETED (their content is
    live), decided per class:

      .<leaf>.compact_tmp_* / .<leaf>.ladder_tmp_*  — incomplete staging:
        the source data is still live (or in a restorable trash), delete.
      .<leaf>.old_*  — the two-rename fallback's trash: if the live
        partition is MISSING the crash hit between the renames and the
        trash is the only copy -> restore; otherwise it is post-publish
        residue -> delete.
      .<leaf>.ladderold@<target_leaf>@_*  — a ladder-retired source: if
        the merge TARGET was published (exists in the same parent) its
        content is already inside the target -> delete; otherwise the
        publish never happened -> restore.

    Holds the table's append/compact mutex: a LIVE compaction's staging
    dir must never be classified as an orphan mid-swap (same-process
    sweeps and handle calls can overlap; cross-process writers are
    excluded by the single-writer-per-tree layout contract).

    Returns {orphan_path: action} for observability/tests."""
    from .writer import table_lock

    actions: dict[str, str] = {}
    if not os.path.isdir(base_path):
        return actions
    with table_lock(base_path):
        _recover_orphans_locked(base_path, actions)
    return actions


def _recover_orphans_locked(base_path: str, actions: dict[str, str]) -> None:
    for dpath in [base_path] + [
        os.path.join(base_path, d)
        for d in os.listdir(base_path)
        if d.startswith("date=")
    ]:
        if not os.path.isdir(dpath):
            continue
        for e in sorted(os.listdir(dpath)):
            if not e.startswith("."):
                continue
            full = os.path.join(dpath, e)
            if ".compact_tmp_" in e or ".ladder_tmp_" in e:
                shutil.rmtree(full, ignore_errors=True)
                actions[full] = "deleted-staging"
            elif ".ladderold@" in e:
                target_leaf = e.split(".ladderold@", 1)[1].rsplit("@_", 1)[0]
                src_leaf = e[1:].split(".ladderold@", 1)[0]
                if os.path.isdir(os.path.join(dpath, target_leaf)):
                    shutil.rmtree(full, ignore_errors=True)
                    actions[full] = "deleted-merged"
                else:
                    dst = os.path.join(dpath, src_leaf)
                    if not os.path.exists(dst):
                        os.rename(full, dst)
                        actions[full] = "restored"
                    else:
                        shutil.rmtree(full, ignore_errors=True)
                        actions[full] = "deleted-duplicate"
            elif ".old_" in e:
                leaf = e[1:].rsplit(".old_", 1)[0]
                dst = os.path.join(dpath, leaf)
                if not os.path.exists(dst):
                    os.rename(full, dst)
                    actions[full] = "restored"
                else:
                    shutil.rmtree(full, ignore_errors=True)
                    actions[full] = "deleted-stale-trash"


def list_partitions(base_path: str) -> list[str]:
    """Partition dirs `date=*/bucket=*` relative to base_path."""
    out = []
    if not os.path.isdir(base_path):
        return out
    for d in sorted(os.listdir(base_path)):
        if not d.startswith("date="):
            continue
        dpath = os.path.join(base_path, d)
        for b in sorted(os.listdir(dpath)):
            if b.startswith("bucket="):
                out.append(os.path.join(d, b))
    return out


def partition_files(base_path: str, rel: str) -> list[str]:
    full = os.path.join(base_path, rel)
    return [f for f in os.listdir(full) if f.endswith(".parquet")]


def compact_partition(spark: SparkSession, base_path: str, rel: str,
                      target_files: int = 1) -> int:
    """Rewrite one partition directory into ``target_files`` sorted files.
    Returns number of files removed. Atomic at the directory level:
    write to `<partition>.__compact_tmp`, then swap.

    Holds the table's append/compact mutex (storage.writer.table_lock) for
    the snapshot -> rewrite -> swap span: without it, a batch appended
    between the file snapshot and the directory swap rides into the trash
    dir and is DELETED — actual data loss, reproduced by the round-6
    concurrency soak (tests/test_round6.py). The lock scope is one
    process, which is exactly the layout contract: only the owning writer
    process appends to its tree (reference hepop.js:114-132), and its
    compactor is the same process (hepop.js:440-450)."""
    from .manifest import manifest_enabled
    from .writer import table_lock

    if manifest_enabled(base_path):
        return _compact_partition_manifest(spark, base_path, rel, target_files)
    full = os.path.join(base_path, rel)
    with table_lock(base_path):
        files = partition_files(base_path, rel)
        if len(files) <= target_files:
            return 0

        tmp = _hidden_sibling(full, "compact_tmp")
        (
            spark.read.parquet(full)
            .sortWithinPartitions("timestamp")
            .coalesce(target_files)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # swap: atomic exchange where the platform has it (no missing-dir
        # instant for cross-process readers); else old -> hidden trash,
        # tmp -> live. Either way the retired copy sits in a dot-prefixed
        # dir Spark never lists, then is deleted.
        if _exchange_dirs(full, tmp):
            trash = tmp  # tmp now holds the OLD files
        else:
            trash = _hidden_sibling(full, "old")
            os.rename(full, trash)
            os.rename(tmp, full)
        shutil.rmtree(trash)
        # drop _SUCCESS markers so partition listing stays clean
        for marker in ("_SUCCESS",):
            p = os.path.join(full, marker)
            if os.path.exists(p):
                os.remove(p)
        # replacement files enter every bloom sidecar in the same step
        # that retired their inputs (absence = must-scan, so skipping
        # this would silently degrade point lookups, never break them)
        from .bloom_index import bloom_reindex_files, sidecar_cols, zone_cols

        if sidecar_cols(base_path) or zone_cols(base_path):
            new_rels = [
                os.path.join(rel, f) for f in os.listdir(full)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            ]
            bloom_reindex_files(spark, base_path, new_rels)
        return len(files) - target_files


def _compact_partition_manifest(spark: SparkSession, base_path: str,
                                rel: str, target_files: int) -> int:
    """Manifest-mode partition rewrite (storage/manifest.py): read the
    partition's LIVE files (pinned by the manifest, never a listing),
    write the merged copy to hidden staging, then commit by moving it
    into the live tree under a fresh name and retiring the old paths in
    one manifest version. Old bytes stay on disk until vacuum, so a
    reader pinned to any prior version finishes cleanly — no retry
    envelope, no swap to race (r07 verdict item 1)."""
    from .manifest import live_files_by_partition, replace_files
    from .writer import table_lock

    full = os.path.join(base_path, rel)
    with table_lock(base_path):
        old_rels = live_files_by_partition(base_path).get(rel, [])
        if len(old_rels) <= target_files:
            return 0
        tmp = _hidden_sibling(full, "compact_tmp")
        (
            spark.read.parquet(*[os.path.join(base_path, r) for r in old_rels])
            .sortWithinPartitions("timestamp")
            .coalesce(target_files)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        parts = sorted(
            f for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        tag = uuid.uuid4().hex[:8]
        moves = [
            (os.path.join(tmp, f), os.path.join(full, f"c_{tag}_{i}.parquet"))
            for i, f in enumerate(parts)
        ]
        replace_files(base_path, moves, old_rels)
        shutil.rmtree(tmp, ignore_errors=True)
        from .bloom_index import bloom_reindex_files, sidecar_cols, zone_cols

        if sidecar_cols(base_path) or zone_cols(base_path):
            bloom_reindex_files(
                spark, base_path,
                [os.path.relpath(dst, base_path) for _src, dst in moves])
        return len(old_rels) - len(moves)


def compact(spark: SparkSession, base_path: str, min_files: int = 2,
            target_files: int = 1,
            grace_s: float | None = None) -> dict[str, int]:
    """One compaction sweep over all partitions (reference checkAndCompact,
    hepop.js:494-537: eligibility = enough small files). Returns
    {partition: files_removed} for the partitions rewritten.

    Manifest-mode tables additionally vacuum expired retired files first
    (grace ``grace_s``, default manifest.RETIRE_GRACE_S) and take
    eligibility from the manifest's live sets, not directory listings."""
    from .manifest import live_files_by_partition, manifest_enabled, vacuum

    recover_orphans(base_path)
    result = {}
    if manifest_enabled(base_path):
        vacuum(base_path, grace_s)
        for rel, lf in sorted(live_files_by_partition(base_path).items()):
            if len(lf) >= min_files:
                removed = compact_partition(spark, base_path, rel, target_files)
                if removed:
                    result[rel] = removed
        return result
    for rel in list_partitions(base_path):
        if len(partition_files(base_path, rel)) >= min_files:
            removed = compact_partition(spark, base_path, rel, target_files)
            if removed:
                result[rel] = removed
    return result


def compact_ladder(spark: SparkSession, base_path: str, level: str = "hour",
                   min_sources: int = 2) -> dict[str, int]:
    """The reference's re-bucketing ladder (hepop.js:415-419, :581-701):
    10-minute buckets merge into the hour bucket (compacted files always
    land at HH-00, hepop.js:687-701), hours into the day bucket.

    level='hour': within each date, merge all `bucket=HH-M0` partitions of
    one wall-clock hour into a single `bucket=HH-00` partition.
    level='day': merge ALL buckets of a date into `bucket=00-00`.

    Rows only move between partition directories — timestamp-based query
    results are invariant (the reference's own correctness contract); the
    derived `bucket` partition value coarsens exactly as in the reference.
    Eligibility mirrors checkAndCompact: at least ``min_sources`` source
    partitions (reference: >=2 raw or raw+compacted, hepop.js:670-677).
    Returns {target_partition: source_partitions_merged}."""
    from .manifest import manifest_enabled

    recover_orphans(base_path)
    if manifest_enabled(base_path):
        return _compact_ladder_manifest(spark, base_path, level, min_sources)
    result: dict[str, int] = {}
    by_target: dict[str, list[str]] = {}
    for rel in list_partitions(base_path):
        date_part, bucket_part = rel.split(os.sep)
        bucket = bucket_part.split("=", 1)[1]
        hh = bucket.split("-")[0]
        target_bucket = f"{hh}-00" if level == "hour" else "00-00"
        target = os.path.join(date_part, f"bucket={target_bucket}")
        by_target.setdefault(target, []).append(rel)

    for target, sources in by_target.items():
        if sources == [target]:
            continue  # already fully compacted at the target bucket
        if len(sources) < min_sources:
            continue  # not enough small partitions yet (reference ages raws)
        full_sources = [os.path.join(base_path, s) for s in sources]
        full_target = os.path.join(base_path, target)
        tmp = _hidden_sibling(full_target, "ladder_tmp")
        (
            spark.read.parquet(*full_sources)
            .sortWithinPartitions("timestamp")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # swap, reader-safe: retire every source into a hidden sibling
        # (fast renames — Spark never lists dot-dirs), publish the target,
        # THEN delete the retired copies. The rows-missing window is the
        # rename span, not a full rmtree of data.
        # trash names carry the merge TARGET so crash recovery can decide
        # restore-vs-delete by checking whether the target got published
        target_leaf = os.path.basename(full_target)
        trashes = []
        for s in full_sources:
            t = _hidden_sibling(s, f"ladderold@{target_leaf}@")
            os.rename(s, t)
            trashes.append(t)
        os.makedirs(os.path.dirname(full_target), exist_ok=True)
        os.rename(tmp, full_target)
        for t in trashes:
            shutil.rmtree(t)
        marker = os.path.join(base_path, target, "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)
        from .bloom_index import bloom_reindex_files, sidecar_cols, zone_cols

        if sidecar_cols(base_path) or zone_cols(base_path):
            bloom_reindex_files(spark, base_path, [
                os.path.join(target, f)
                for f in os.listdir(full_target)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            ])
        result[target] = len(sources)
    return result


def _compact_ladder_manifest(spark: SparkSession, base_path: str,
                             level: str, min_sources: int) -> dict[str, int]:
    """Manifest-mode re-bucketing: the merged copy lands in the target
    partition dir under a fresh name; ALL source files (including any
    already at the target bucket) are retired in the same manifest
    version and vacuumed later. Same eligibility as the listing path."""
    from .manifest import live_files_by_partition, replace_files, vacuum
    from .writer import table_lock

    result: dict[str, int] = {}
    with table_lock(base_path):
        vacuum(base_path)
        by_part = live_files_by_partition(base_path)
        by_target: dict[str, list[str]] = {}
        for rel in sorted(by_part):
            if os.sep not in rel or not os.path.basename(rel).startswith("bucket="):
                continue
            date_part, bucket_part = rel.split(os.sep)
            bucket = bucket_part.split("=", 1)[1]
            hh = bucket.split("-")[0]
            target_bucket = f"{hh}-00" if level == "hour" else "00-00"
            target = os.path.join(date_part, f"bucket={target_bucket}")
            by_target.setdefault(target, []).append(rel)
        for target, sources in sorted(by_target.items()):
            if sources == [target] or len(sources) < min_sources:
                continue
            old_rels = [f for s in sources for f in by_part[s]]
            full_target = os.path.join(base_path, target)
            tmp = _hidden_sibling(full_target, "ladder_tmp")
            (
                spark.read.parquet(
                    *[os.path.join(base_path, r) for r in old_rels])
                .sortWithinPartitions("timestamp")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            parts = sorted(
                f for f in os.listdir(tmp)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
            tag = uuid.uuid4().hex[:8]
            moves = [
                (os.path.join(tmp, f),
                 os.path.join(full_target, f"c_{tag}_{i}.parquet"))
                for i, f in enumerate(parts)
            ]
            replace_files(base_path, moves, old_rels)
            shutil.rmtree(tmp, ignore_errors=True)
            from .bloom_index import bloom_reindex_files, sidecar_cols, zone_cols

            if sidecar_cols(base_path) or zone_cols(base_path):
                bloom_reindex_files(
                    spark, base_path,
                    [os.path.relpath(dst, base_path) for _s, dst in moves])
            result[target] = len(sources)
    return result


def table_stats(base_path: str) -> dict:
    """File-count / byte totals per partition — the observability the
    reference kept in metadata.json (hepop.js:96-106), derived here from
    the directory tree (listing is ground truth; no self-heal needed,
    SURVEY §2 A13)."""
    parts = {}
    for rel in list_partitions(base_path):
        full = os.path.join(base_path, rel)
        files = [f for f in os.listdir(full) if f.endswith(".parquet")]
        parts[rel] = {
            "files": len(files),
            "bytes": sum(os.path.getsize(os.path.join(full, f)) for f in files),
        }
    return {
        "partitions": parts,
        "total_files": sum(p["files"] for p in parts.values()),
        "total_bytes": sum(p["bytes"] for p in parts.values()),
    }
