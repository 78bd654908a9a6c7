"""Trigram-Bloom sidecar index: substring-search file skipping.

The reference's headline workload is finding a call in a capture store —
`payload LIKE '%<call-id fragment>%'` over the SIP payload column
(hepop.js keeps raw SIP messages per row; every troubleshooting session
starts with a substring grep). At 100 TB a LIKE '%x%' cannot use point
blooms (the probe is not a whole value) or zones (no ordering), so it
degenerates to scanning every file the time predicate leaves. This module
fixes that with the classic trigram posting trick (the design behind
Google Code Search and PostgreSQL pg_trgm): a row matching
`LIKE '%needle%'` must CONTAIN every 3-character substring of the needle,
so a per-file Bloom bitmap over the file's distinct trigrams prunes any
file whose bitmap misses one required trigram — no false negatives, the
predicate still runs on the survivors, results are invisible to the index
exactly like the point-bloom and zone sidecars it composes with.

Design (shared machinery with storage/bloom_index.py + storage/sidecar.py):
- Entries live in the sharded sidecar store (r10): per-partition segment
  files under `{base}/_trigram/{col}.d/` with a CAS-published head —
  update cost tracks the touched partitions, probes load only segments
  intersecting the candidate list, and two OS processes indexing one
  tree converge without lost updates.
- Bitmaps sized per file from its DISTINCT-trigram count (text saturates:
  a multi-GB shard still has ~10-100k distinct trigrams, so sidecars stay
  small while flush-sized segments round down to M_MIN). The same M_MAX
  layered cap as the value blooms guards adversarial high-entropy text.
- Hash positions are the repo's 48-bit md5 split with Kirsch-Mitzenmacher
  double hashing — identical JVM-side (build) and driver-side (probe).
- The build is one distributed pass: per-row `array_distinct` of the
  trigram window (cuts explode volume by the document's internal
  repetition), cross-row distinct per file, then the 61-bit-word
  OR-aggregation shared with the bloom build — the shuffle carries at
  most files x ceil(m/61) rows, never raw trigram occurrences.

Scale: the probe is driver-side bitmap math over the manifest-pinned live
list (no Spark job); the pruned read opens only files that contain every
needle trigram. Build cost is one narrow pass per newly landed file
(ingest hook / compaction re-index), never a rescan.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import sidecar
from .bloom_index import (
    M_MIN,
    _col_expr,
    _entry_layers,
    _hash_pair_py,
    _live_files,
    _or_aggregate_bitmaps,
    _size_for,
    _test_bits,
)

TRI_K = 2            # hash functions: probes AND many trigrams, so a
                     # higher per-trigram FPR still prunes sharply
BITS_PER_TRIGRAM = 12


def load_trigram(base_path: str, col: str) -> dict | None:
    return sidecar.load_doc(base_path, "trigram", col)


def trigrams_of(s: str) -> list[str]:
    """All 3-character substrings, in order (duplicates removed,
    first-seen order — determinism matters only for tests)."""
    seen: dict[str, None] = {}
    for i in range(len(s) - 2):
        seen.setdefault(s[i: i + 3])
    return list(seen)


def _positions_py(trigram: str, m: int) -> list[int]:
    h1, h2 = _hash_pair_py(trigram)
    return [(h1 + j * h2) % m for j in range(TRI_K)]


def trigram_cols(base_path: str) -> list[str]:
    """Columns with a trigram sidecar on this table."""
    return sidecar.list_cols(base_path, "trigram")


def trigram_index_update(spark: SparkSession, base_path: str, col: str,
                         files: list[str] | None = None) -> int:
    """Index `files` (relative paths; default: all live files not yet in
    the sidecar) and merge via the store's CAS publish. Incremental by
    design: ingest hooks pass just-landed files, compaction passes
    replacements."""
    from .writer import table_lock

    base_path = os.path.abspath(base_path)
    with table_lock(base_path):
        if files is None:
            known = sidecar.load_entries(base_path, "trigram", col)
            files = [f for f in _live_files(base_path) if f not in known]
        files = [f for f in files
                 if os.path.isfile(os.path.join(base_path, f))]
        if not files:
            return 0
        src = spark.read.option("basePath", base_path).parquet(
            *[os.path.join(base_path, f) for f in files])
        rows = (
            src.select(
                F.regexp_replace(F.input_file_name(), "^file:/+", "/")
                .alias("f"),
                _col_expr(src, col).cast("string").alias("v"),
            )
            .filter(F.col("v").isNotNull())
        )
        # per-row distinct window, then cross-row distinct per file —
        # sequence() must be guarded: Spark's sequence(1, 0) DESCENDS
        tgs = (
            rows.select(
                "f",
                F.explode(F.expr(
                    "CASE WHEN length(v) >= 3 THEN array_distinct("
                    "transform(sequence(1, length(v) - 2),"
                    " i -> substring(v, i, 3)))"
                    " ELSE array() END"
                )).alias("t"),
            )
            .distinct()
        )
        tgs.persist()
        try:
            counts = {os.path.relpath(r["f"], base_path): r["n"]
                      for r in tgs.groupBy("f")
                      .agg(F.count("*").alias("n")).collect()}
            sizes = {f: _size_for(n, BITS_PER_TRIGRAM)
                     for f, n in counts.items()}
            hx = F.md5(F.col("t"))
            hashed = tgs.select(
                "f",
                F.conv(F.substring(hx, 1, 12), 16, 10).cast("long")
                .alias("h1"),
                F.conv(F.substring(hx, 13, 12), 16, 10).cast("long")
                .alias("h2"),
            )
            bitmaps = _or_aggregate_bitmaps(
                spark, hashed, base_path, sizes, TRI_K)
        finally:
            tgs.unpersist()
        for f in files:  # empty / all-null / all-short: nothing matches
            bitmaps.setdefault(f, {"m": M_MIN, "bits": "0"})
        sidecar.update_entries(base_path, "trigram", col, bitmaps,
                               meta={"k": TRI_K})
        return len(files)


def trigram_candidates(base_path: str, col: str, needles: list[str],
                       within: list[str] | None = None
                       ) -> tuple[list[str], int, int]:
    """Live files that may contain rows where `col` contains EVERY needle
    as a substring: (candidates, n_live, n_pruned). A file survives only
    if its bitmap admits ALL trigrams of ALL needles (a matching row
    contains each needle, hence each of its trigrams). Needles shorter
    than 3 chars contribute nothing (no trigram to require). Files
    without a bitmap are kept — absence means must-scan. `within`
    restricts to an already-pruned candidate list (lazy segment loads).
    Pure driver-side bitmap math, no Spark job."""
    base_path = os.path.abspath(base_path)
    live = within if within is not None else _live_files(base_path)
    required: list[str] = []
    for n in needles:
        required.extend(trigrams_of(n))
    if not required or not sidecar.exists(base_path, "trigram", col):
        return list(live), len(live), 0
    entries = sidecar.load_entries(base_path, "trigram", col, files=live)
    pairs = [_hash_pair_py(t) for t in required]
    pos_by_m: dict[int, list[list[int]]] = {}
    kept: list[str] = []
    for f in live:
        e = entries.get(f)
        if e is None:
            kept.append(f)
            continue
        m = int(e["m"])
        if m not in pos_by_m:
            pos_by_m[m] = [
                [(h1 + j * h2) % m for j in range(TRI_K)]
                for h1, h2 in pairs
            ]
        L, layers = _entry_layers(e)
        if all(_test_bits(layers[h1 % L], ps)
               for (h1, _h2), ps in zip(pairs, pos_by_m[m])):
            kept.append(f)
    return kept, len(live), len(live) - len(kept)


def like_runs(pattern: str) -> list[str] | None:
    """Literal runs of a SQL LIKE pattern usable as required substrings:
    split on the `%` and `_` wildcards, keep runs of length >= 3 (shorter
    runs carry no trigram). Returns None when the pattern uses escape
    syntax (backslash) — escaped wildcards change run boundaries, so the
    conservative answer is "not analyzable" and the raw scan runs."""
    if "\\" in pattern:
        return None
    import re as _re

    return [r for r in _re.split(r"[%_]", pattern) if len(r) >= 3]
