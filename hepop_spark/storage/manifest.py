"""Per-table file manifests: snapshot-pinned reads for serve tables.

Why (r07 verdict item 1): a cross-process reader that LISTS a table
directory races the owning writer's compaction — the plan captures a file
list, the swap retires those files, execution hits FileNotFound. Bounded
retries (plans/api.py) shrink the window but a zero-gap compaction storm
can straddle every retry. The fix is the lakehouse commit-log pattern
(the same design storage/snapshots.py uses for its versioned tables),
applied to the reference's writer layout:

  * every mutation of a manifest-enabled table publishes an immutable
    `_manifest/v{N}.json` naming exactly the LIVE data files (atomic
    rename — a reader always resolves a complete version);
  * compaction never renames or deletes a live path in place: the new
    compacted file is MOVED INTO the live tree under a fresh name and the
    old files are marked retired IN the manifest; their bytes stay on
    disk at their original paths for a grace period (`RETIRE_GRACE_S`),
    so any reader pinned to an older manifest finishes against intact
    paths;
  * `vacuum` physically deletes retired files once their grace expires —
    the Delta/Iceberg `VACUUM` split between logical delete (manifest)
    and physical delete (grace);
  * a WAL intent (`_manifest/intent_*.json`) brackets the
    move-files-then-publish span: recovery rolls a crashed replace back
    (new files not in the latest manifest -> delete them) or forward
    (manifest published -> drop the intent), so no crash can double-count
    a partition;
  * appends stay walk-based: the live set is (visible data files) minus
    (retired), so a flush that crashed between its parquet commit and its
    manifest publish is ADOPTED by the next publish — the same
    at-least-once window the ingest contract already documents.

The reference's "listing is truth" metadata policy (query.js:36-38)
becomes "manifest is truth" for serve tables; plain tables (no
`_manifest/`) keep the r07 RENAME_EXCHANGE swap semantics unchanged.

Scale: the manifest holds file PATHS — exactly what object stores need
(no listing), and what lets a 1000-executor reader plan against a
consistent snapshot while compaction runs at full cadence. The layout
contract keeps one writer per tree (hepop.js:114-132), but r09 makes a
SHARED tree safe too: version publish is a compare-and-swap — the
put-if-absent `os.link` on v{N} (a conditional put on an object store)
is the commit point, and on conflict the mutation re-reads the new
latest and re-applies itself (bounded retries). Appends and vacuums
recompute from (walk, latest) so any interleaving converges; a
compaction whose inputs were retired by a concurrent winner rolls back
instead of double-applying.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from . import objstore

MANIFEST_DIR = "_manifest"
# Bounded CAS attempts for a mutation racing concurrent writers. Each
# retry re-reads the latest version and re-derives the mutation, so the
# bound only matters under pathological contention — 16 writers landing
# in lock-step on one table tree.
CAS_RETRIES = 16


class ManifestConflict(RuntimeError):
    """A concurrent writer committed the version this mutation targeted.
    Raised by the CAS primitive (_publish); public mutations retry
    internally and raise only when CAS_RETRIES interleavings all lost
    (or when the mutation is no longer applicable — see replace_files)."""
# Seconds a retired file's bytes stay on disk after its manifest-level
# delete. Must exceed the longest reader plan->execute span; the serve
# default leaves 5 minutes, two orders of magnitude past the soak's
# query times and still prompt enough to bound disk amplification at the
# 60 s compaction cadence (<= ~5 retired generations live at once).
RETIRE_GRACE_S = float(os.environ.get("SPARK_GRAFT_RETIRE_GRACE_S", "300"))
KEEP_VERSIONS = 10  # manifest jsons retained past the latest


def _mdir(table_dir: str) -> str:
    return os.path.join(table_dir, MANIFEST_DIR)


def manifest_enabled(table_dir: str) -> bool:
    return os.path.isdir(_mdir(table_dir))


def _versions(table_dir: str) -> list[int]:
    return sorted(
        int(f[1:-5])
        for f in objstore.backend().list(_mdir(table_dir))
        if f.startswith("v") and f.endswith(".json") and f[1:-5].isdigit()
    )


def latest(table_dir: str) -> tuple[int, dict] | None:
    """(version, manifest) of the newest published version, or None.
    Reader-safe without locks: versions publish by atomic rename, and a
    version file, once listed, is complete."""
    io = objstore.backend()
    for v in reversed(_versions(table_dir)):
        raw = io.get(os.path.join(_mdir(table_dir), f"v{v}.json"))
        if raw is None:
            continue  # racing a prune of an old version: try the previous
        try:
            return v, json.loads(raw)
        except ValueError:
            continue
    return None


def live_files(table_dir: str) -> list[str] | None:
    """The pinned read face: relative paths of the files a reader should
    scan, or None when no version is published yet."""
    got = latest(table_dir)
    return None if got is None else got[1]["files"]


def _publish(table_dir: str, files: list[str], retired: dict[str, float],
             prev_version: int) -> int:
    """The CAS primitive: publish the next version PUT-IF-ABSENT
    (os.link fails with EEXIST instead of overwriting; on an object
    store this becomes a conditional put). A concurrent writer that
    committed v{N} first wins — the loser gets ManifestConflict and the
    public mutations re-derive against the new latest and retry. A
    committed version is never clobbered (pinned by the round-8 test:
    racing the SAME prev_version, in the single-writer sense, still
    raises)."""
    v = prev_version + 1
    doc = {"version": v, "ts": time.time(),
           "files": sorted(files), "retired": retired}
    md = _mdir(table_dir)
    final = os.path.join(md, f"v{v}.json")
    # conditional put (If-None-Match) on the versioned key — os.link on
    # the default local backend, a conditional PUT on an object store
    # (storage/objstore seam, r12; soaked over FakeObjectStore)
    if not objstore.backend().put_if_absent(
            final, json.dumps(doc).encode("utf-8")):
        raise ManifestConflict(
            f"manifest version v{v} already exists under {md}: a "
            "concurrent writer committed first (single-writer trees "
            "never see this; shared trees retry the mutation)"
        )
    return v


def _walk_data_files(table_dir: str) -> set[str]:
    """Visible *.parquet relpaths — hidden/underscore dirs and files are
    never data (Spark's own listing rule)."""
    out: set[str] = set()
    for root, dirs, files in os.walk(table_dir):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.add(os.path.relpath(os.path.join(root, f), table_dir))
    return out


def _table_lock(table_dir: str):
    from .writer import table_lock

    return table_lock(table_dir)


def enable_manifest(table_dir: str) -> None:
    """Turn a table directory into a manifest-mode table, adopting any
    existing visible files as version 1. Idempotent; a concurrent
    enabler losing the v1 race adopts its files through a normal append
    publish instead (same walk-minus-retired rule, so nothing is lost)."""
    with _table_lock(table_dir):
        if manifest_enabled(table_dir) and _versions(table_dir):
            return
        os.makedirs(_mdir(table_dir), exist_ok=True)
        try:
            _publish(table_dir, sorted(_walk_data_files(table_dir)), {}, 0)
        except ManifestConflict:
            publish_append(table_dir)


def recover(table_dir: str) -> dict[str, str]:
    """Roll crashed replace intents forward or back (see module doc).
    Runs before every publish/vacuum; cheap no-op when no intent exists.
    Returns {intent_path: action} for tests."""
    actions: dict[str, str] = {}
    md = _mdir(table_dir)
    try:
        intents = sorted(f for f in os.listdir(md) if f.startswith("intent_"))
    except OSError:
        return actions
    if not intents:
        return actions
    with _table_lock(table_dir):
        got = latest(table_dir)
        man_files = set(got[1]["files"]) if got else set()
        for name in intents:
            ipath = os.path.join(md, name)
            try:
                with open(ipath) as fh:
                    intent = json.load(fh)
            except (OSError, ValueError):
                os.remove(ipath)
                actions[ipath] = "dropped-unreadable"
                continue
            if all(n in man_files for n in intent["new"]):
                actions[ipath] = "committed"  # publish happened; drop WAL
            else:
                # crash between moving new files in and publishing: the
                # old files are still live in the manifest — delete any
                # new files that made it, restoring the pre-replace state
                for n in intent["new"]:
                    p = os.path.join(table_dir, n)
                    if os.path.exists(p):
                        os.remove(p)
                actions[ipath] = "rolled-back"
            os.remove(ipath)
    return actions


def publish_append(table_dir: str) -> int:
    """Publish a new version after an append: live = visible files minus
    retired. Adopts files landed by a flush that crashed pre-publish.
    CAS-safe on a shared tree: the (walk, latest) inputs are re-derived
    on every attempt, so losing a race to another appender simply folds
    both writers' files into the winner-plus-one version."""
    with _table_lock(table_dir):
        for attempt in range(CAS_RETRIES):
            recover(table_dir)
            got = latest(table_dir)
            prev_v, prev = (got if got else (0, {"files": [], "retired": {}}))
            on_disk = _walk_data_files(table_dir)
            retired = {r: t for r, t in prev.get("retired", {}).items()
                       if r in on_disk}
            files = sorted(on_disk - set(retired))
            try:
                return _publish(table_dir, files, retired, prev_v)
            except ManifestConflict:
                if attempt == CAS_RETRIES - 1:
                    raise
                time.sleep(0.002 * (attempt + 1))


def replace_files(table_dir: str, moves: list[tuple[str, str]],
                  old_rels: list[str]) -> int:
    """The compaction commit: move staged files into the live tree under
    their final names and publish a version that lists them and retires
    ``old_rels`` — whose bytes stay at their paths until vacuum. The WAL
    intent makes the move+publish span crash-atomic.

    CAS on a shared tree: the moves happen once; the publish re-derives
    against the new latest on conflict. A replace is only re-applied
    while EVERY old_rel is still live in the winner's version — if a
    concurrent compactor already replaced any of them, re-retiring would
    double-apply (rows present in both winners' outputs), so this loser
    rolls its moved files back out and raises ManifestConflict; the
    caller's inputs no longer exist and it must re-plan."""
    with _table_lock(table_dir):
        recover(table_dir)
        new_rels = [os.path.relpath(dst, table_dir) for _src, dst in moves]
        md = _mdir(table_dir)
        os.makedirs(md, exist_ok=True)
        ipath = os.path.join(md, f"intent_{uuid.uuid4().hex[:8]}.json")
        itmp = ipath + ".tmp"
        with open(itmp, "w") as fh:
            json.dump({"new": new_rels, "old": list(old_rels)}, fh)
        os.rename(itmp, ipath)
        for src, dst in moves:
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)

        def _roll_back(reason: str):
            for n in new_rels:
                p = os.path.join(table_dir, n)
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass
            os.remove(ipath)
            raise ManifestConflict(reason)

        for attempt in range(CAS_RETRIES):
            got = latest(table_dir)
            prev_v, prev = (got if got else (0, {"files": [], "retired": {}}))
            if not set(old_rels) <= set(prev.get("files", ())):
                _roll_back(
                    f"replace inputs retired by a concurrent writer under "
                    f"{table_dir}: re-plan the compaction")
            now = time.time()
            retired = dict(prev.get("retired", {}))
            retired.update({r: now for r in old_rels})
            files = sorted(
                (set(prev["files"]) - set(old_rels)) | set(new_rels))
            try:
                v = _publish(table_dir, files, retired, prev_v)
            except ManifestConflict:
                if attempt == CAS_RETRIES - 1:
                    _roll_back(
                        f"lost {CAS_RETRIES} consecutive publish races "
                        f"under {table_dir}")
                time.sleep(0.002 * (attempt + 1))
                continue
            os.remove(ipath)
            return v


def retire_files(table_dir: str, old_rels: list[str]) -> int:
    """Retire-only publish (no replacements) — the retention/expiry
    commit: publish a version WITHOUT ``old_rels``, marking them retired
    so their bytes persist through the vacuum grace (in-flight pinned
    reads keep working), then vacuum deletes them. CAS like the other
    mutations; unlike replace_files there is no double-apply hazard — a
    concurrent writer having already retired some of the inputs just
    shrinks this publish's work (retiring is idempotent), so conflicts
    re-derive and never roll back. Returns the published version, or 0
    when nothing was live to retire."""
    with _table_lock(table_dir):
        recover(table_dir)
        for attempt in range(CAS_RETRIES):
            got = latest(table_dir)
            prev_v, prev = (got if got else (0, {"files": [],
                                                 "retired": {}}))
            doomed = set(old_rels) & set(prev.get("files", ()))
            if not doomed:
                return 0
            now = time.time()
            retired = dict(prev.get("retired", {}))
            retired.update({r: now for r in doomed})
            files = sorted(set(prev["files"]) - doomed)
            try:
                return _publish(table_dir, files, retired, prev_v)
            except ManifestConflict:
                if attempt == CAS_RETRIES - 1:
                    raise
                time.sleep(0.002 * (attempt + 1))


def vacuum(table_dir: str, grace_s: float | None = None) -> list[str]:
    """Physically delete retired files whose grace expired, prune emptied
    partition directories and manifest versions past KEEP_VERSIONS.
    Returns the removed file relpaths."""
    grace = RETIRE_GRACE_S if grace_s is None else grace_s
    removed: list[str] = []
    with _table_lock(table_dir):
        recover(table_dir)
        got = latest(table_dir)
        if got is None:
            return removed
        prev_v, prev = got
        now = time.time()
        keep: dict[str, float] = {}
        for rel, t in prev.get("retired", {}).items():
            p = os.path.join(table_dir, rel)
            if now - t >= grace:
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass
                removed.append(rel)
            elif os.path.exists(p):
                keep[rel] = t
        if removed or len(keep) != len(prev.get("retired", {})):
            # CAS: the physical deletes above are idempotent facts; on a
            # publish race, re-derive the retired map against the new
            # latest (drop entries whose bytes this vacuum deleted)
            for attempt in range(CAS_RETRIES):
                try:
                    _publish(table_dir, prev["files"], keep, prev_v)
                    break
                except ManifestConflict:
                    if attempt == CAS_RETRIES - 1:
                        raise
                    time.sleep(0.002 * (attempt + 1))
                    prev_v, prev = latest(table_dir)
                    gone = set(removed)
                    keep = {
                        r: t for r, t in prev.get("retired", {}).items()
                        if r not in gone
                        and os.path.exists(os.path.join(table_dir, r))
                    }
        # rmdir partition dirs emptied by the deletes (bucket then date)
        for rel in removed:
            d = os.path.dirname(os.path.join(table_dir, rel))
            while os.path.abspath(d) != os.path.abspath(table_dir):
                try:
                    os.rmdir(d)
                except OSError:
                    break
                d = os.path.dirname(d)
        for v in _versions(table_dir)[:-KEEP_VERSIONS]:
            try:
                os.remove(os.path.join(_mdir(table_dir), f"v{v}.json"))
            except OSError:
                pass
    return removed


def live_files_by_partition(table_dir: str) -> dict[str, list[str]]:
    """Live files grouped by their partition directory (relpath), the
    eligibility input for manifest-mode compaction."""
    by_part: dict[str, list[str]] = {}
    for rel in live_files(table_dir) or []:
        by_part.setdefault(os.path.dirname(rel), []).append(rel)
    return by_part
