"""Sharded sidecar-index store: per-partition segments + CAS head pointer.

Why (r09 verdict item 1 + 4): the first sidecar cut kept one JSON per
(table, column) holding EVERY file's bitmap — a full-document rewrite under
an in-process lock per incremental update, the whole document in driver
memory per probe, and a read-modify-write race between two OS processes
publishing to one tree (the manifest got CAS in r09; the sidecars did
not). At 10^5-10^6 files and multi-GB compacted files the monolith becomes
a driver-memory and publish-latency term, and a lost sidecar update
silently degrades pruning. This module is the storage layer all three
sidecar kinds (_bloom value bitmaps, _zone min/max, _trigram bitmaps)
share; the probe/build math stays in bloom_index.py / trigram_index.py.

Layout (per table, kind, column)::

    {base}/_{kind}/{col}.d/
        head_v{N}.json   # {"version", "col", "meta", "segments":
                         #  {partition_relpath: "seg-<hex>.json"}}
        seg-<hex>.json   # {"part": partition_relpath,
                         #  "files": {file_relpath: entry}}

- Segments are IMMUTABLE: an update writes a fresh seg file per touched
  partition and publishes a new head that points at it. Readers cache
  parsed segments by filename forever — no mtime checks, no re-parse of
  untouched partitions.
- The head publish is the manifest's CAS primitive (storage/manifest.py
  _publish): put-if-absent `os.link` on head_v{N}. A losing writer
  re-reads the winner's head, re-merges its entries over the winner's
  segments, and retries — two processes indexing one tree converge with
  no lost update (entries are per-file derived facts; last-writer-wins
  per file is sound because data files are immutable).
- Update cost is proportional to the TOUCHED partitions (ingest hooks and
  compaction pass explicit file lists); probe cost is proportional to the
  partitions that survive earlier pruning — `load_entries(files=...)`
  opens only segments whose partition intersects the candidate list.
- Old heads past KEEP_HEADS are pruned and segments no kept head
  references are deleted (the vacuum-grace analogue: a reader pinned to a
  recent head never loses a segment under it).

Legacy: the r09 monolithic `{col}.json` is still READ (as the layer under
any segments) and is migrated into sharded form — then removed — by the
first update that runs against it; mixed trees never lose entries.

Scale: head size is O(partitions), segment size is O(files in one
partition x entry size), and entry size is capped by the layered-bloom
rule in bloom_index.py — all three bounded independently of table size.
On an object store the head CAS becomes a conditional put, exactly like
the manifest.

Reference parity note: the reference keeps ONE metadata.json per table
(query.js:22-63) rewritten in place by a single writer — fine at its
single-node scale; this store is what the same idea needs at 100 TB.
"""

from __future__ import annotations

import json
import os
import time
import uuid

KEEP_HEADS = 10
CAS_RETRIES = 16
# how long a .pending in-flight marker protects an unreferenced segment
# from _gc — generous vs the CAS worst case (16 retries x ms backoff);
# a marker older than this belongs to a writer that died mid-publish
PENDING_TTL = 900.0


class SidecarConflict(RuntimeError):
    """All CAS attempts lost to concurrent writers (pathological only)."""


def sidecar_dir(base_path: str, kind: str, col: str) -> str:
    return os.path.join(base_path, f"_{kind}", f"{col}.d")


def legacy_path(base_path: str, kind: str, col: str) -> str:
    return os.path.join(base_path, f"_{kind}", f"{col}.json")


def _head_versions(d: str) -> list[int]:
    try:
        return sorted(
            int(f[6:-5])
            for f in os.listdir(d)
            if f.startswith("head_v") and f.endswith(".json")
            and f[6:-5].isdigit()
        )
    except OSError:
        return []


def load_head(base_path: str, kind: str, col: str) -> tuple[int, dict] | None:
    """(version, head) of the newest complete head, or None. Lock-free:
    heads publish by link-into-place, so a listed head is complete; a
    version racing the prune of older heads falls back one version."""
    d = sidecar_dir(base_path, kind, col)
    for v in reversed(_head_versions(d)):
        try:
            with open(os.path.join(d, f"head_v{v}.json")) as fh:
                return v, json.load(fh)
        except (OSError, ValueError):
            continue
    return None


# Immutable-segment cache: segment files are content-frozen at creation,
# so (dir, filename) is a permanent key. Bounded by eviction of entries
# whose file no longer exists (checked lazily on miss-prone paths is
# unnecessary: GC'd segments simply stop being referenced by heads).
_SEG_CACHE: dict[str, dict] = {}
_SEG_CACHE_MAX = 4096


def _load_segment(d: str, name: str) -> dict:
    p = os.path.join(d, name)
    hit = _SEG_CACHE.get(p)
    if hit is not None:
        return hit
    try:
        with open(p) as fh:
            doc = json.load(fh)
    except (OSError, ValueError):
        return {}
    files = doc.get("files", {})
    if len(_SEG_CACHE) >= _SEG_CACHE_MAX:
        _SEG_CACHE.clear()  # simple full reset; refill cost is one probe
    _SEG_CACHE[p] = files
    return files


def _load_legacy(base_path: str, kind: str, col: str) -> dict | None:
    """Parsed monolithic doc (r09 layout) or None — mtime-cached via the
    bloom module's loader to keep one cache for both layouts."""
    from .bloom_index import _load_cached

    return _load_cached(legacy_path(base_path, kind, col))


def exists(base_path: str, kind: str, col: str) -> bool:
    return (os.path.isdir(sidecar_dir(base_path, kind, col))
            or os.path.isfile(legacy_path(base_path, kind, col)))


def list_cols(base_path: str, kind: str) -> list[str]:
    """Columns with a sidecar of `kind` on this table (either layout)."""
    d = os.path.join(base_path, f"_{kind}")
    out = set()
    try:
        for f in os.listdir(d):
            if f.endswith(".json") and ".tmp." not in f:
                out.add(f[: -len(".json")])
            elif f.endswith(".d") and os.path.isdir(os.path.join(d, f)):
                out.add(f[: -len(".d")])
    except OSError:
        pass
    return sorted(out)


def load_entries(base_path: str, kind: str, col: str,
                 files: list[str] | None = None) -> dict:
    """{file_relpath: entry} — ALL entries when `files` is None, else only
    the entries reachable from the partitions of `files` (lazy: segments
    for other partitions are never opened). Probe paths pass the
    already-pruned candidate list so driver memory tracks the QUERY's
    partition footprint, not the table's."""
    got = load_head(base_path, kind, col)
    legacy = _load_legacy(base_path, kind, col)
    out: dict = dict(legacy.get("files", {})) if legacy else {}
    if got is None:
        if files is not None and out:
            want = set(files)
            return {f: e for f, e in out.items() if f in want}
        return out
    _v, head = got
    d = sidecar_dir(base_path, kind, col)
    segments = head.get("segments", {})
    if files is None:
        parts = segments.keys()
    else:
        parts = {os.path.dirname(f) for f in files} & segments.keys()
    for part in parts:
        out.update(_load_segment(d, segments[part]))
    if files is not None:
        want = set(files)
        return {f: e for f, e in out.items() if f in want}
    return out


def load_doc(base_path: str, kind: str, col: str) -> dict | None:
    """Merged monolith-shaped view {"col", ..meta.., "files": {...}} —
    the back-compat read face (tests and introspection); probe paths use
    load_entries(files=...) instead."""
    got = load_head(base_path, kind, col)
    legacy = _load_legacy(base_path, kind, col)
    if got is None and legacy is None:
        return None
    meta = dict(legacy or {})
    meta.pop("files", None)
    if got is not None:
        meta.update(got[1].get("meta", {}))
        meta.setdefault("col", got[1].get("col", col))
    return {**meta, "files": load_entries(base_path, kind, col)}


def _publish_head(d: str, head: dict, prev_version: int) -> int:
    v = prev_version + 1
    head = {**head, "version": v, "ts": time.time()}
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".head_v{v}.tmp.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump(head, fh)
    final = os.path.join(d, f"head_v{v}.json")
    try:
        os.link(tmp, final)  # atomic create-if-absent: the commit point
    except FileExistsError:
        raise SidecarConflict(
            f"sidecar head v{v} already exists under {d}: a concurrent "
            "indexer committed first; the mutation re-merges and retries"
        ) from None
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass
    return v


def _write_segment(d: str, part: str, files: dict) -> str:
    os.makedirs(d, exist_ok=True)
    name = f"seg-{uuid.uuid4().hex[:12]}.json"
    # in-flight registration (r10 ADVICE): between this write and the
    # owning head publish the segment is unreferenced, and a writer
    # stalled past _gc's age bound (CAS retry storm, GC pause, slow
    # NFS) would otherwise have it reaped out from under its published
    # head — reads degrade to "unindexed, must scan" (correct but
    # silently unpruned). The marker makes _gc skip it until the
    # writer finishes (marker removed) or provably died (marker older
    # than PENDING_TTL).
    with open(os.path.join(d, name + ".pending"), "w"):
        pass
    tmp = os.path.join(d, f".{name}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"part": part, "files": files}, fh)
    os.rename(tmp, os.path.join(d, name))
    return name


def _clear_pending(d: str, names) -> None:
    for n in names:
        try:
            os.remove(os.path.join(d, n + ".pending"))
        except OSError:
            pass


def _gc(d: str) -> None:
    """Prune heads past KEEP_HEADS and segments no kept head references.
    Idempotent and safe concurrently (removals tolerate FileNotFound)."""
    versions = _head_versions(d)
    for v in versions[:-KEEP_HEADS]:
        try:
            os.remove(os.path.join(d, f"head_v{v}.json"))
        except OSError:
            pass
    referenced: set[str] = set()
    for v in _head_versions(d):
        try:
            with open(os.path.join(d, f"head_v{v}.json")) as fh:
                referenced.update(json.load(fh).get("segments", {}).values())
        except (OSError, ValueError):
            continue
    try:
        names = os.listdir(d)
    except OSError:
        return
    now = time.time()
    pending = {f for f in names if f.endswith(".pending")}
    for f in names:
        if f.startswith("seg-") and f.endswith(".json") \
                and f not in referenced:
            p = os.path.join(d, f)
            try:
                # age guard: a CONCURRENT writer's segment exists
                # unreferenced for the ms between its write and its head
                # publish — deleting it there would leave the winner's
                # head pointing at nothing (correctness survives: a
                # missing segment reads as "unindexed, must scan", but
                # pruning would silently degrade). A writer REGISTERS
                # in-flight segments with a .pending marker that is
                # removed only after its head publishes (or it gives
                # up), so a stall longer than the age bound can no
                # longer lose the race (r10 ADVICE); the age guard
                # stays as belt-and-braces for pre-marker segments.
                if f + ".pending" in pending \
                        or now - os.stat(p).st_mtime < 60.0:
                    continue
                os.remove(p)
            except OSError:
                pass
    # reap markers of writers that provably died mid-publish (their
    # segment is either referenced by now or will age out above)
    for f in pending:
        p = os.path.join(d, f)
        try:
            if now - os.stat(p).st_mtime > PENDING_TTL:
                os.remove(p)
        except OSError:
            pass


def update_entries(base_path: str, kind: str, col: str, new_entries: dict,
                   meta: dict | None = None, drop: set | None = None) -> None:
    """Merge `new_entries` ({file_relpath: entry}) into the store and
    remove `drop` relpaths, rewriting only the TOUCHED partitions'
    segments and CAS-publishing a new head. On a publish race the merge
    re-derives over the winner's head (per-file last-writer-wins — sound
    for derived facts about immutable files). Migrates a legacy monolith
    into sharded form on first contact, then removes it."""
    d = sidecar_dir(base_path, kind, col)
    drop = set(drop or ())
    legacy = _load_legacy(base_path, kind, col)
    written: list[str] = []  # segments this call wrote (all attempts)
    for attempt in range(CAS_RETRIES):
        got = load_head(base_path, kind, col)
        prev_v, head = got if got else (
            0, {"col": col, "meta": dict(meta or {}), "segments": {}})
        if meta:
            head = {**head, "meta": {**head.get("meta", {}), **meta}}
        segments = dict(head.get("segments", {}))
        by_part: dict[str, dict] = {}
        if legacy:  # one-time migration: fold monolith entries under ours
            for f, e in legacy.get("files", {}).items():
                by_part.setdefault(os.path.dirname(f), {})[f] = e
        for f, e in new_entries.items():
            by_part.setdefault(os.path.dirname(f), {})[f] = e
        for f in drop:
            by_part.setdefault(os.path.dirname(f), {})
        for part, ours in by_part.items():
            current = (_load_segment(d, segments[part])
                       if part in segments else {})
            merged = {**current, **ours}
            for f in drop:
                merged.pop(f, None)
            if merged:
                name = _write_segment(d, part, merged)
                segments[part] = name
                written.append(name)
            else:
                segments.pop(part, None)
        try:
            _publish_head(d, {**head, "col": col, "segments": segments},
                          prev_v)
            # head is live: drop the in-flight markers so _gc treats
            # these segments by reference-count alone. Losing attempts'
            # markers clear too — their segments are garbage and age
            # out normally.
            _clear_pending(d, written)
            break
        except SidecarConflict:
            if attempt == CAS_RETRIES - 1:
                _clear_pending(d, written)
                raise
            time.sleep(0.002 * (attempt + 1))
    if legacy:
        try:
            os.remove(legacy_path(base_path, kind, col))
        except OSError:
            pass
    _gc(d)
