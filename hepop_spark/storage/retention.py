"""Retention / age-out: drop date partitions past a cutoff.

A capture store rotates: the reference's operators keep N days of HEP
traffic and delete the rest out-of-band (the reference itself leaves this
to the operator — its metadata.json simply stops listing removed files,
query.js:22-63). Here expiry is a first-class storage mutation with the
same safety story as compaction:

- Manifest-mode tables RETIRE the expired partitions' live files
  (storage/manifest.retire_files): a new version stops listing them,
  in-flight pinned reads keep their bytes through the vacuum grace, and
  vacuum reclaims them — readers can never race an expiry.
- Legacy listing tables move the partition dir to a dot-prefixed trash
  name first (hidden from discovery walks mid-delete) and then remove it;
  in-flight plans fall under the same bounded vanished-file retry
  envelope as legacy compaction swaps.

Sidecar bitmaps/zones for dropped files become dead entries; the serve
sweep's refresh vacuums them (absence of a file in the live list already
makes them inert for correctness).

Scale: expiry cost is proportional to the number of DROPPED partitions
(file moves + one manifest publish), never to surviving data — the same
O(|mutation|) contract as every other storage operation here.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

_DATE_DIR_RE = re.compile(r"^date=(\d{4}-\d{2}-\d{2})$")


def expired_partitions(base_path: str, cutoff_date: str) -> list[str]:
    """date=YYYY-MM-DD partition dirs strictly OLDER than cutoff_date
    (ISO dates compare lexicographically)."""
    out = []
    try:
        entries = sorted(os.listdir(base_path))
    except OSError:
        return []
    for e in entries:
        m = _DATE_DIR_RE.match(e)
        if m and m.group(1) < cutoff_date and os.path.isdir(
                os.path.join(base_path, e)):
            out.append(e)
    return out


def apply_retention(base_path: str, cutoff_date: str,
                    grace_s: float | None = None) -> dict:
    """Drop every date partition older than ``cutoff_date``
    ('YYYY-MM-DD'). Returns {"dates_dropped": [...], "files_retired": n}.
    Manifest-mode: retire + vacuum(grace); listing-mode: hidden-rename +
    rmtree. A no-op when nothing is expired."""
    from .manifest import live_files, manifest_enabled, retire_files, vacuum
    from .writer import table_lock

    base_path = os.path.abspath(base_path)
    dropped = expired_partitions(base_path, cutoff_date)
    if not dropped:
        return {"dates_dropped": [], "files_retired": 0}
    n_files = 0
    with table_lock(base_path):
        if manifest_enabled(base_path):
            # expired dirs may persist on disk through the vacuum grace
            # after an earlier expiry — only partitions with LIVE files
            # count as dropped, so re-application reports a no-op
            prefixes = tuple(d + os.sep for d in dropped)
            doomed = [f for f in (live_files(base_path) or [])
                      if f.startswith(prefixes)]
            dropped = sorted({f.split(os.sep, 1)[0] for f in doomed})
            if doomed:
                retire_files(base_path, doomed)
                n_files = len(doomed)
            vacuum(base_path, grace_s=grace_s)
        else:
            # count and report ONLY partitions whose rename actually
            # landed: a concurrent writer/compactor winning the rename
            # must not inflate files_retired/dates_dropped (r09 ADVICE)
            renamed: list[str] = []
            for d in dropped:
                src = os.path.join(base_path, d)
                trash = os.path.join(
                    base_path, f".retired-{d}-{uuid.uuid4().hex[:8]}")
                n_here = sum(
                    len([f for f in fs if f.endswith(".parquet")])
                    for _r, _d, fs in os.walk(src))
                try:
                    os.rename(src, trash)
                except OSError:
                    continue  # a concurrent writer/compactor won; re-plan
                n_files += n_here
                renamed.append(d)
                shutil.rmtree(trash, ignore_errors=True)
            dropped = renamed
    return {"dates_dropped": dropped, "files_retired": n_files}
