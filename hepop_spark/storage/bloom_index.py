"""File-level Bloom sidecar index: point-lookup file skipping.

The reference writes parquet ROW-GROUP bloom filters (hepop.js:26-34 writer
option) — useful only after a file is already opened. At 100 TB the win is
skipping whole FILES at plan time: a `call_id = 'X'` lookup over years of
HEP traffic should open the handful of files whose bloom admits X, not
every file the time predicate leaves. This module maintains a per-table
sidecar (`{base}/_bloom/{col}.json`) holding one bloom bitmap per data
file; the query path intersects the table's live file list with the
bitmaps and reads only the survivors (plus any not-yet-indexed files —
absence means "must scan", so the index can only ever REMOVE work and
never changes results: blooms have no false negatives).

Design:
- Bitmaps are sized per file: m = next power of two >= BITS_PER_ROW * rows
  (>= M_MIN), so a 5M-row compacted file and a 1k-row flush segment both
  land near the same false-positive rate instead of saturating a fixed m.
- Hash positions are integer md5 math — h1 = first 48 bits, h2 = next 48
  bits, pos_j = (h1 + j*h2) mod m (Kirsch-Mitzenmacher double hashing,
  j < BLOOM_K) — computable identically JVM-side (build, vectorized
  conv/md5), driver-side (probe, hashlib) and in ANSI SQL (oracles).
- The build is ONE distributed pass: explode each row's k positions,
  distinct, collect_set per file — the driver receives at most
  files x m positions, never rows.
- Sidecar writes are atomic (tmp + rename) under the table lock; readers
  never see a partial index. Indexed-but-retired files are ignored by
  construction (candidates intersect the LIVE list); live-but-unindexed
  files are always scanned.

Scale: the sidecar is O(files x m bits). A 1000-executor deployment shards
it per partition directory exactly like the manifest; the probe stays a
driver-side bitmap test per candidate file — no Spark job until the
pruned read.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOOM_K = 4           # hash functions
BITS_PER_ROW = 16     # m/n ratio; ~0.24% FPR at k=4
M_MIN = 1024          # floor so tiny flush files still get a real bitmap
_H48 = 1 << 48


def _next_pow2(n: int) -> int:
    m = M_MIN
    while m < n:
        m <<= 1
    return m


def _hash_pair_cols(col):
    """(h1, h2) = first/second 48 bits of md5(value) — the same split the
    KMV sketches use (48-bit integers are exact in BIGINT and DOUBLE)."""
    hx = F.md5(col.cast("string"))
    h1 = F.conv(F.substring(hx, 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 13, 12), 16, 10).cast("long")
    return h1, h2


def _hash_pair_py(value) -> tuple[int, int]:
    hx = hashlib.md5(str(value).encode("utf-8")).hexdigest()
    return int(hx[0:12], 16), int(hx[12:24], 16)


def _positions_py(value, m: int) -> list[int]:
    h1, h2 = _hash_pair_py(value)
    return [(h1 + j * h2) % m for j in range(BLOOM_K)]


def _col_expr(df: DataFrame, col: str):
    """Column reference for a sidecar spec: a flat name, or `base.key`
    (dotted) for one key inside a nested column — map access when `base`
    is a map, JSON extraction when it is a string (the Line-Protocol
    tags storage, JSON-stringified per the reference's buffer rows:
    `tags.host` indexes the host tag either way)."""
    if "." in col:
        base, _, key = col.partition(".")
        t = dict(df.dtypes).get(base, "")
        if t.startswith("map<"):
            return F.col(base)[key]
        return F.get_json_object(F.col(base), f"$.{key}")
    return F.col(col)


def _sidecar_path(base_path: str, col: str) -> str:
    return os.path.join(base_path, "_bloom", f"{col}.json")


# parsed-sidecar cache keyed by (path, mtime, size): a serve process
# probes the same sidecar on every point lookup, and re-json.load-ing a
# multi-MB document per query was the measured scaling term of the probe
# (tools/sidecar_ab.py) — publishes are atomic renames, so (mtime, size)
# is a sound freshness key
_DOC_CACHE: dict[str, tuple[tuple, dict]] = {}


def _load_cached(path: str) -> dict | None:
    try:
        st = os.stat(path)
        key = (st.st_mtime_ns, st.st_size)
    except OSError:
        _DOC_CACHE.pop(path, None)
        return None
    hit = _DOC_CACHE.get(path)
    if hit is not None and hit[0] == key:
        return hit[1]
    try:
        with open(path) as fh:
            doc = json.load(fh)
    except (OSError, ValueError):
        return None
    _DOC_CACHE[path] = (key, doc)
    return doc


def load_sidecar(base_path: str, col: str) -> dict | None:
    return _load_cached(_sidecar_path(base_path, col))


def _test_bits(hexstr: str, positions: list[int]) -> bool:
    """All `positions` set in the hex-encoded bitmap — WITHOUT parsing
    the whole string (a compacted file's bitmap is hundreds of KB of
    hex; int(hex, 16) per probe per file was the other measured scaling
    term). Hex digit i from the right holds bits [4i, 4i+4)."""
    n = len(hexstr)
    for p in positions:
        i = p >> 2
        if i >= n:
            return False
        if not (int(hexstr[n - 1 - i], 16) >> (p & 3)) & 1:
            return False
    return True


def _live_files(base_path: str) -> list[str]:
    """The table's live data files, relative to base_path — manifest-pinned
    when the table is in manifest mode (the same rule as
    writer.read_table), directory walk otherwise."""
    from .manifest import live_files, manifest_enabled

    if manifest_enabled(base_path):
        pinned = live_files(base_path)
        if pinned is not None:
            return list(pinned)
    out: list[str] = []
    for root, dirs, files in os.walk(base_path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.relpath(os.path.join(root, f), base_path))
    return sorted(out)


def bloom_index_update(spark: SparkSession, base_path: str, col: str,
                       files: list[str] | None = None) -> int:
    """Index `files` (relative paths; default: all live files not yet in
    the sidecar) and merge the bitmaps into the sidecar atomically.
    Returns the number of files indexed. Incremental by design: ingest
    hooks pass just-landed files; compaction passes replacement files;
    a full rebuild passes files=_live_files(...)."""
    from .writer import table_lock

    base_path = os.path.abspath(base_path)
    with table_lock(base_path):
        doc = load_sidecar(base_path, col) or {
            "col": col, "k": BLOOM_K, "files": {}}
        if files is None:
            files = [f for f in _live_files(base_path)
                     if f not in doc["files"]]
        files = [f for f in files
                 if os.path.isfile(os.path.join(base_path, f))]
        if not files:
            return 0
        paths = [os.path.join(base_path, f) for f in files]
        src = spark.read.option("basePath", base_path).parquet(*paths)
        df = (
            src.select(
                # canonical absolute path: strip the file: scheme however
                # many slashes the runtime emits (file:/x vs file:///x)
                F.regexp_replace(F.input_file_name(), "^file:/+", "/")
                .alias("f"),
                _col_expr(src, col).alias("v"),
            )
            .filter(F.col("v").isNotNull())
        )
        counts = {os.path.relpath(r["f"], base_path): r["n"]
                  for r in df.groupBy("f").agg(F.count("*").alias("n")).collect()}
        ms = {f: _next_pow2(BITS_PER_ROW * n) for f, n in counts.items()}
        m_rows = [(os.path.abspath(os.path.join(base_path, f)), m)
                  for f, m in ms.items()]
        if not m_rows:
            # all-null or empty files: record empty bitmaps so they are
            # PRUNED for every probe (nothing can match)
            _merge_sidecar(base_path, col, doc,
                           {f: {"m": M_MIN, "bits": "0"} for f in files})
            return len(files)
        mdf = spark.createDataFrame(m_rows, "f string, m long")
        h1, h2 = _hash_pair_cols(F.col("v"))
        # OR-aggregate the bitmap DISTRIBUTEDLY as 61-bit words (the
        # repo's bigint-safe bit convention): shipping (word, bits) rows
        # to the driver is 61x less transfer than raw positions, and
        # bit_or is map-side combinable — the shuffle carries at most
        # files x ceil(m/61) rows regardless of row count. (The first
        # cut collect_set positions; at 20x that was ~8M driver-side
        # ints and the dominant cost of the whole build.)
        pos = (
            df.join(F.broadcast(mdf), "f")
            .select(
                "f",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(BLOOM_K - 1)),
                        lambda j: (h1 + j.cast("long") * h2) % F.col("m"),
                    )
                ).alias("p"),
            )
        )
        words = (
            pos.select(
                "f",
                (F.col("p") / 61).cast("long").alias("w"),
                F.expr(
                    "shiftleft(cast(1 as bigint), cast(p % 61 as int))"
                ).alias("b"),
            )
            .groupBy("f", "w")
            .agg(F.expr("bit_or(b)").alias("bits"))
        )
        acc: dict[str, int] = {}
        for r in words.collect():
            rel = os.path.relpath(r["f"], base_path)
            acc[rel] = acc.get(rel, 0) | (int(r["bits"]) << (61 * int(r["w"])))
        bitmaps: dict[str, dict] = {
            rel: {"m": ms[rel], "bits": format(v, "x")}
            for rel, v in acc.items()
        }
        for f in files:  # files whose rows were all NULL in col
            if f not in bitmaps:
                bitmaps[f] = {"m": M_MIN, "bits": "0"}
        _merge_sidecar(base_path, col, doc, bitmaps)
        return len(files)


def _merge_sidecar(base_path: str, col: str, doc: dict,
                   new_entries: dict) -> None:
    doc["files"].update(new_entries)
    path = _sidecar_path(base_path, col)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.rename(tmp, path)


def bloom_candidates(base_path: str, col: str,
                     values: list) -> tuple[list[str], int, int]:
    """Live files that may contain ANY of `values` in `col`:
    (candidates, n_live, n_pruned). Files without a bitmap are kept
    (absence = must scan); a file survives if its bitmap admits at least
    one probe value. Pure driver-side bitmap math — no Spark job."""
    base_path = os.path.abspath(base_path)
    live = _live_files(base_path)
    doc = load_sidecar(base_path, col)
    if doc is None:
        return live, len(live), 0
    entries = doc["files"]
    # probe hashes are per-m; memoize across files sharing one m
    pos_by_m: dict[int, list[list[int]]] = {}
    kept: list[str] = []
    for f in live:
        e = entries.get(f)
        if e is None:
            kept.append(f)
            continue
        m = int(e["m"])
        if m not in pos_by_m:
            pos_by_m[m] = [_positions_py(v, m) for v in values]
        bits = e["bits"]
        for ps in pos_by_m[m]:
            if _test_bits(bits, ps):
                kept.append(f)
                break
    return kept, len(live), len(live) - len(kept)


def bloom_point_read(spark: SparkSession, base_path: str, col: str,
                     values: list) -> tuple[DataFrame, dict]:
    """The pruned point-lookup read: scan only bloom-admitted files, with
    the IN/equality predicate still applied (bloom false positives are
    filtered by the scan; false negatives do not exist). Returns
    (DataFrame, stats) where stats carries the pruning accounting the
    caller can assert on."""
    kept, n_live, n_pruned = bloom_candidates(base_path, col, values)
    stats = {"files_live": n_live, "files_read": len(kept),
             "files_pruned": n_pruned}
    pred = F.col(col).isin(values) if len(values) > 1 \
        else (F.col(col) == values[0])
    if not kept:
        return (spark.read.parquet(base_path).limit(0).filter(pred), stats)
    df = spark.read.option("basePath", base_path).parquet(
        *[os.path.join(base_path, f) for f in kept])
    return df.filter(pred), stats


def sidecar_cols(base_path: str) -> list[str]:
    """Columns with a bloom sidecar on this table."""
    d = os.path.join(base_path, "_bloom")
    try:
        return sorted(
            f[:-len(".json")] for f in os.listdir(d)
            if f.endswith(".json") and ".tmp." not in f
        )
    except OSError:
        return []


def zone_cols(base_path: str) -> list[str]:
    """Columns with a min/max zone sidecar on this table."""
    d = os.path.join(base_path, "_zone")
    try:
        return sorted(
            f[:-len(".json")] for f in os.listdir(d)
            if f.endswith(".json") and ".tmp." not in f
        )
    except OSError:
        return []


def bloom_reindex_files(spark: SparkSession, base_path: str,
                        files: list[str]) -> int:
    """Index `files` (relative paths) in EVERY sidecar the table carries
    (bloom bitmaps AND min/max zones) — the compaction hook: replacement
    files must enter the index in the same step that retires their
    inputs, or point lookups degrade to scanning every compacted file
    (absence = must scan). Returns the number of (file, col) pairs
    indexed."""
    from .trigram_index import trigram_cols, trigram_index_update

    n = 0
    for col in sidecar_cols(base_path):
        n += bloom_index_update(spark, base_path, col, files=files)
    for col in zone_cols(base_path):
        n += zone_index_update(spark, base_path, col, files=files)
    for col in trigram_cols(base_path):
        n += trigram_index_update(spark, base_path, col, files=files)
    return n


def bloom_index_refresh(spark: SparkSession, base_path: str) -> dict:
    """Serve-sweep maintenance: per sidecar column, index any live files
    not yet indexed and drop entries for files no longer live (retired by
    compaction — inert for correctness since candidates intersect the
    live list, but dead weight in the sidecar). Returns
    {col: files_indexed}."""
    from .writer import table_lock

    base_path = os.path.abspath(base_path)
    out: dict = {}
    with table_lock(base_path):
        live = set(_live_files(base_path))
        for col in sidecar_cols(base_path):
            n = bloom_index_update(spark, base_path, col)
            doc = load_sidecar(base_path, col)
            dead = [f for f in doc["files"] if f not in live]
            if dead:
                for f in dead:
                    del doc["files"][f]
                _merge_sidecar(base_path, col, doc, {})
            if n or dead:
                out[col] = {"indexed": n, "vacuumed": len(dead)}
        for col in zone_cols(base_path):
            n = zone_index_update(spark, base_path, col)
            doc = load_zone(base_path, col)
            dead = [f for f in doc["files"] if f not in live]
            if dead:
                for f in dead:
                    del doc["files"][f]
                path = _zone_path(base_path, col)
                tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
                with open(tmp, "w") as fh:
                    json.dump(doc, fh)
                os.rename(tmp, path)
            if n or dead:
                out[f"zone:{col}"] = {"indexed": n, "vacuumed": len(dead)}
        from .trigram_index import (
            _publish as _tri_publish,
            load_trigram,
            trigram_cols,
            trigram_index_update,
        )

        for col in trigram_cols(base_path):
            n = trigram_index_update(spark, base_path, col)
            doc = load_trigram(base_path, col)
            dead = [f for f in doc["files"] if f not in live]
            if dead:
                for f in dead:
                    del doc["files"][f]
                _tri_publish(base_path, col, doc)
            if n or dead:
                out[f"trigram:{col}"] = {"indexed": n, "vacuumed": len(dead)}
    return out


# --- min/max zone sidecar: the RANGE sibling of the bloom bitmaps ----------
# Parquet footers already carry row-group min/max, but reading footers at
# plan time still opens every file; the zone sidecar lifts per-FILE min/max
# into the same _bloom/-style metadata dir so a range predicate prunes
# files driver-side with zero file opens — the generalization of the
# reference's metadata.json time index (query.js:22-63) to ANY column.


def _zone_path(base_path: str, col: str) -> str:
    return os.path.join(base_path, "_zone", f"{col}.json")


def load_zone(base_path: str, col: str) -> dict | None:
    return _load_cached(_zone_path(base_path, col))


def zone_index_update(spark: SparkSession, base_path: str, col: str,
                      files: list[str] | None = None) -> int:
    """Record per-file [min, max] for `col` (None default: live files not
    yet indexed). Same atomic-merge contract as the bloom sidecar."""
    from .writer import table_lock

    base_path = os.path.abspath(base_path)
    with table_lock(base_path):
        doc = load_zone(base_path, col) or {"col": col, "files": {}}
        if files is None:
            files = [f for f in _live_files(base_path)
                     if f not in doc["files"]]
        files = [f for f in files
                 if os.path.isfile(os.path.join(base_path, f))]
        if not files:
            return 0
        src = (
            spark.read.option("basePath", base_path)
            .parquet(*[os.path.join(base_path, f) for f in files])
        )
        df = src.select(
            F.regexp_replace(F.input_file_name(), "^file:/+", "/")
            .alias("f"),
            _col_expr(src, col).alias("v"),
        )
        agg = df.groupBy("f").agg(
            F.min("v").alias("lo"), F.max("v").alias("hi"))
        entries = {}
        for r in agg.collect():
            rel = os.path.relpath(r["f"], base_path)
            entries[rel] = {"lo": r["lo"], "hi": r["hi"]}
        for f in files:  # empty files: nothing can match any range
            entries.setdefault(f, {"lo": None, "hi": None})
        doc["files"].update(entries)
        path = _zone_path(base_path, col)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(doc, fh)
        os.rename(tmp, path)
        return len(files)


def zone_candidates(base_path: str, col: str, lo, hi) -> tuple[list[str], int, int]:
    """Live files whose [min, max] intersects [lo, hi] (None = open end).
    Files without an entry are kept (absence = must scan); all-null files
    carry (None, None) and are pruned — no value can satisfy a range."""
    base_path = os.path.abspath(base_path)
    live = _live_files(base_path)
    doc = load_zone(base_path, col)
    if doc is None:
        return live, len(live), 0
    entries = doc["files"]
    kept = []
    for f in live:
        e = entries.get(f)
        if e is None:
            kept.append(f)
            continue
        flo, fhi = e["lo"], e["hi"]
        if flo is None:  # all-null or empty
            continue
        if (lo is None or fhi >= lo) and (hi is None or flo <= hi):
            kept.append(f)
    return kept, len(live), len(live) - len(kept)
