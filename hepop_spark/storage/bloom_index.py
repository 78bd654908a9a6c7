"""File-level Bloom sidecar index: point-lookup file skipping.

The reference writes parquet ROW-GROUP bloom filters (hepop.js:26-34 writer
option) — useful only after a file is already opened. At 100 TB the win is
skipping whole FILES at plan time: a `call_id = 'X'` lookup over years of
HEP traffic should open the handful of files whose bloom admits X, not
every file the time predicate leaves. This module maintains per-file bloom
bitmaps in the SHARDED sidecar store (storage/sidecar.py — r10: per-
partition segment files + CAS head pointer, replacing the r09 monolithic
`_bloom/{col}.json`); the query path intersects the table's live file
list with the bitmaps and reads only the survivors (plus any
not-yet-indexed files — absence means "must scan", so the index can only
ever REMOVE work and never changes results: blooms have no false
negatives).

Design:
- Bitmaps are sized per file: m = next power of two >= BITS_PER_ROW * rows
  (>= M_MIN), so a 5M-row compacted file and a 1k-row flush segment both
  land near the same false-positive rate instead of saturating a fixed m.
- r10 cap: m never exceeds M_MAX (1 MiB of bits). A file whose rows would
  demand more is split into L LAYERS by value hash (layer = h1 mod L, so
  every distinct value lives in exactly ONE layer); each layer gets its
  own bitmap at the target bits-per-row, the probe tests only the value's
  layer, and no false negatives are introduced — a 100M-row compacted
  file carries L bounded bitmaps instead of one 200 MB monolith, and the
  per-probe cost stays O(k) bit tests.
- Hash positions are integer md5 math — h1 = first 48 bits, h2 = next 48
  bits, pos_j = (h1 + j*h2) mod m (Kirsch-Mitzenmacher double hashing,
  j < BLOOM_K) — computable identically JVM-side (build, vectorized
  conv/md5), driver-side (probe, hashlib) and in ANSI SQL (oracles).
- The build is ONE distributed pass: explode each row's k positions and
  OR-aggregate 61-bit words per (file, layer) — map-side combinable, the
  shuffle carries at most files x ceil(m/61) rows regardless of row count.
- Publishes go through the sidecar store's CAS head (put-if-absent), so
  two OS processes indexing one tree converge without lost updates —
  the same discipline the manifest got in r09. Indexed-but-retired files
  are ignored by construction (candidates intersect the LIVE list);
  live-but-unindexed files are always scanned.

Scale: probe memory is bounded by the partitions that survive earlier
pruning (`within` threads the already-pruned candidate list into
`sidecar.load_entries`, which opens only intersecting segments); update
cost is proportional to the touched partitions. The probe stays a
driver-side bitmap test per candidate file — no Spark job until the
pruned read.
"""

from __future__ import annotations

import hashlib
import json
import os

from ..catalog import local_result
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import sidecar

BLOOM_K = 4           # hash functions
BITS_PER_ROW = 16     # m/n ratio; ~0.24% FPR at k=4
M_MIN = 1024          # floor so tiny flush files still get a real bitmap
M_MAX = 1 << 23       # 1 MiB-of-bits cap per bitmap; beyond -> layers
_H48 = 1 << 48


def _next_pow2(n: int) -> int:
    m = M_MIN
    while m < n:
        m <<= 1
    return m


def _size_for(rows: int, bits_per_row: int) -> tuple[int, int]:
    """(m, L): bitmap bits and layer count for a file of `rows` values.
    L chosen so next_pow2 of the per-layer demand stays <= M_MAX."""
    want = bits_per_row * max(rows, 1)
    L = max(1, -(-want // (M_MAX // 2)))  # ceil-div against the half-cap
    m = _next_pow2(max(-(-want // L), 1))
    return m, L


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


def _entry_layers(e: dict) -> tuple[int, list[str]]:
    """(L, [hex bitmap per layer]) for either entry shape — the r09
    single-bitmap {"m","bits"} or the r10 layered {"m","L","bits":[..]}."""
    bits = e["bits"]
    if isinstance(bits, list):
        return int(e.get("L", len(bits))), bits
    return 1, [bits]


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


# parsed-document cache keyed by (path, mtime, size): used for LEGACY
# monolithic sidecars (r09 layout) and any other rewrite-in-place JSON;
# the sharded store caches its immutable segments by name instead.
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
    """Merged monolith-shaped view of the bloom sidecar (back-compat read
    face; probes use sidecar.load_entries with a candidate list)."""
    return sidecar.load_doc(base_path, "bloom", col)


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


def _or_aggregate_bitmaps(spark: SparkSession, hashed: DataFrame,
                          base_path: str, sizes: dict[str, tuple[int, int]],
                          k: int) -> dict[str, dict]:
    """The shared distributed build: OR-aggregate per-(file, layer)
    bitmaps as 61-bit words (the repo's bigint-safe bit convention).
    `hashed` carries one row per value occurrence: (f abs-path, h1, h2);
    `sizes` maps rel path -> (m, L). Shipping (file, layer, word, bits)
    rows to the driver is 61x less transfer than raw positions, and
    bit_or is map-side combinable — the shuffle carries at most
    files x ceil(m/61) rows regardless of row count. (The first cut
    collect_set positions; at 20x that was ~8M driver-side ints and the
    dominant cost of the whole build.)"""
    if not sizes:
        return {}
    mdf = local_result(spark, 
        [(os.path.abspath(os.path.join(base_path, f)), m, L)
         for f, (m, L) in sizes.items()],
        "f string, m long, L long")
    words = (
        hashed.join(F.broadcast(mdf), "f")
        .select(
            "f",
            F.pmod(F.col("h1"), F.col("L")).alias("lay"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda j: (F.col("h1") + j.cast("long") * F.col("h2"))
                    % F.col("m"),
                )
            ).alias("p"),
        )
        .select(
            "f", "lay",
            (F.col("p") / 61).cast("long").alias("w"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(p % 61 as int))"
            ).alias("b"),
        )
        .groupBy("f", "lay", "w")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )
    # r12: the collect here ships files x layers x ceil(m/61) rows — ~52k
    # at sf0.1 — and the old loop paid a per-ROW os.path.relpath plus Row
    # name lookups (profiled 1.3 s of relpath alone) and re-shifted the
    # whole accumulated bignum per word. Arrow toPandas + itertuples skips
    # the Row machinery, relpath is cached per distinct file, and each
    # bitmap is assembled ONCE in descending word order.
    word_lists: dict[tuple[str, int], dict[int, int]] = {}
    rel_cache: dict[str, str] = {}
    pdf = words.toPandas()
    for f_abs, lay, w, bits in pdf.itertuples(index=False, name=None):
        rel = rel_cache.get(f_abs)
        if rel is None:
            rel = rel_cache[f_abs] = os.path.relpath(f_abs, base_path)
        word_lists.setdefault((rel, int(lay)), {})[int(w)] = int(bits)
    seen = {rel for rel, _lay in word_lists}
    entries: dict[str, dict] = {}
    for rel, (m, L) in sizes.items():
        if rel not in seen:
            continue
        layers = []
        for lay in range(L):
            ws = word_lists.get((rel, lay), {})
            acc = 0
            for w in range(max(ws, default=0), -1, -1):
                acc = (acc << 61) | ws.get(w, 0)
            layers.append(format(acc, "x"))
        entries[rel] = ({"m": m, "L": L, "bits": layers} if L > 1
                        else {"m": m, "bits": layers[0]})
    return entries


def bloom_index_update(spark: SparkSession, base_path: str, col: str,
                       files: list[str] | None = None) -> int:
    """Index `files` (relative paths; default: all live files not yet in
    the sidecar) and merge the bitmaps into the sharded store via its CAS
    publish. Returns the number of files indexed. Incremental by design:
    ingest hooks pass just-landed files; compaction passes replacement
    files; a full rebuild passes files=_live_files(...)."""
    from .writer import table_lock

    base_path = os.path.abspath(base_path)
    with table_lock(base_path):
        if files is None:
            known = sidecar.load_entries(base_path, "bloom", col)
            files = [f for f in _live_files(base_path) if f not in known]
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
        sizes = {f: _size_for(n, BITS_PER_ROW) for f, n in counts.items()}
        h1, h2 = _hash_pair_cols(F.col("v"))
        hashed = df.select("f", h1.alias("h1"), h2.alias("h2"))
        bitmaps = _or_aggregate_bitmaps(spark, hashed, base_path, sizes,
                                        BLOOM_K)
        for f in files:  # all-null or empty files: record empty bitmaps
            # so they are PRUNED for every probe (nothing can match)
            bitmaps.setdefault(f, {"m": M_MIN, "bits": "0"})
        sidecar.update_entries(base_path, "bloom", col, bitmaps,
                               meta={"k": BLOOM_K})
        return len(files)


def bloom_candidates(base_path: str, col: str, values: list,
                     within: list[str] | None = None
                     ) -> tuple[list[str], int, int]:
    """Live files that may contain ANY of `values` in `col`:
    (candidates, n_live, n_pruned). Files without a bitmap are kept
    (absence = must scan); a file survives if its bitmap admits at least
    one probe value. `within` restricts the probe to an already-pruned
    candidate list — only sidecar segments for those files' partitions
    are opened. Pure driver-side bitmap math — no Spark job."""
    base_path = os.path.abspath(base_path)
    live = within if within is not None else _live_files(base_path)
    if not sidecar.exists(base_path, "bloom", col):
        return list(live), len(live), 0
    entries = sidecar.load_entries(base_path, "bloom", col, files=live)
    pairs = [_hash_pair_py(v) for v in values]
    # probe positions are per-m; memoize across files sharing one m
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
                [(h1 + j * h2) % m for j in range(BLOOM_K)]
                for h1, h2 in pairs
            ]
        L, layers = _entry_layers(e)
        for (h1, _h2), ps in zip(pairs, pos_by_m[m]):
            if _test_bits(layers[h1 % L], ps):
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
    return sidecar.list_cols(base_path, "bloom")


def zone_cols(base_path: str) -> list[str]:
    """Columns with a min/max zone sidecar on this table."""
    return sidecar.list_cols(base_path, "zone")


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
    zc = zone_cols(base_path)
    if zc:  # every zone column from one scan of the replacement files
        n += zone_index_update_multi(spark, base_path, zc, files=files)
    for col in trigram_cols(base_path):
        n += trigram_index_update(spark, base_path, col, files=files)
    return n


def bloom_index_refresh(spark: SparkSession, base_path: str) -> dict:
    """Serve-sweep maintenance: per sidecar column, index any live files
    not yet indexed and drop entries for files no longer live (retired by
    compaction — inert for correctness since candidates intersect the
    live list, but dead weight in the sidecar). Returns
    {col: files_indexed}."""
    from .trigram_index import trigram_cols, trigram_index_update
    from .writer import table_lock

    base_path = os.path.abspath(base_path)
    out: dict = {}
    with table_lock(base_path):
        live = set(_live_files(base_path))
        plans = (
            [(c, "bloom", bloom_index_update, c) for c in sidecar_cols(base_path)]
            + [(c, "zone", zone_index_update, f"zone:{c}")
               for c in zone_cols(base_path)]
            + [(c, "trigram", trigram_index_update, f"trigram:{c}")
               for c in trigram_cols(base_path)]
        )
        for col, kind, update_fn, label in plans:
            n = update_fn(spark, base_path, col)
            entries = sidecar.load_entries(base_path, kind, col)
            dead = [f for f in entries if f not in live]
            if dead:
                sidecar.update_entries(base_path, kind, col, {},
                                       drop=set(dead))
            if n or dead:
                out[label] = {"indexed": n, "vacuumed": len(dead)}
    return out


# --- min/max zone sidecar: the RANGE sibling of the bloom bitmaps ----------
# Parquet footers already carry row-group min/max, but reading footers at
# plan time still opens every file; the zone sidecar lifts per-FILE min/max
# into the same sharded metadata store so a range predicate prunes files
# driver-side with zero file opens — the generalization of the reference's
# metadata.json time index (query.js:22-63) to ANY column.


def load_zone(base_path: str, col: str) -> dict | None:
    return sidecar.load_doc(base_path, "zone", col)


def zone_index_update(spark: SparkSession, base_path: str, col: str,
                      files: list[str] | None = None) -> int:
    """Record per-file [min, max] for `col` (None default: live files not
    yet indexed). Same CAS-publish contract as the bloom sidecar."""
    return zone_index_update_multi(spark, base_path, [col], files=files)


def zone_index_update_multi(spark: SparkSession, base_path: str,
                            cols: list[str],
                            files: list[str] | None = None) -> int:
    """zone_index_update for SEVERAL columns in ONE scan (r12): per-file
    min/max of k columns is one grouped aggregation over the same file
    set, so indexing a z-ordered table's k dimensions (or a compaction
    batch's every zone column) pays one pass instead of k. Entries are
    byte-identical to k single-column calls — min/max ignore nulls per
    column, an all-null file still records (None, None), and each
    column's sidecar publishes under the same lock/CAS discipline.
    Returns the number of (file, col) pairs indexed."""
    from .writer import table_lock

    base_path = os.path.abspath(base_path)
    with table_lock(base_path):
        per_col: dict[str, list[str]] = {}
        if files is None:
            live = _live_files(base_path)
            for col in cols:
                known = sidecar.load_entries(base_path, "zone", col)
                per_col[col] = [f for f in live if f not in known
                                and os.path.isfile(
                                    os.path.join(base_path, f))]
        else:
            kept = [f for f in files
                    if os.path.isfile(os.path.join(base_path, f))]
            per_col = {col: list(kept) for col in cols}
        todo = sorted({f for fs in per_col.values() for f in fs})
        if not todo:
            return 0
        src = (
            spark.read.option("basePath", base_path)
            .parquet(*[os.path.join(base_path, f) for f in todo])
        )
        agg = (
            src.select(
                F.regexp_replace(F.input_file_name(), "^file:/+", "/")
                .alias("f"),
                *[_col_expr(src, col).alias(f"v{i}")
                  for i, col in enumerate(cols)],
            )
            .groupBy("f")
            .agg(*[a for i in range(len(cols))
                   for a in (F.min(f"v{i}").alias(f"lo{i}"),
                             F.max(f"v{i}").alias(f"hi{i}"))])
        )
        rows = agg.collect()
        n = 0
        for i, col in enumerate(cols):
            wanted = set(per_col[col])
            if not wanted:
                continue
            entries = {}
            for r in rows:
                rel = os.path.relpath(r["f"], base_path)
                if rel in wanted:
                    entries[rel] = {"lo": r[f"lo{i}"], "hi": r[f"hi{i}"]}
            for f in wanted:  # empty files: nothing can match any range
                entries.setdefault(f, {"lo": None, "hi": None})
            sidecar.update_entries(base_path, "zone", col, entries)
            n += len(wanted)
        return n


def zone_candidates(base_path: str, col: str, lo, hi,
                    within: list[str] | None = None
                    ) -> tuple[list[str], int, int]:
    """Live files whose [min, max] intersects [lo, hi] (None = open end).
    Files without an entry are kept (absence = must scan); all-null files
    carry (None, None) and are pruned — no value can satisfy a range.
    `within` restricts to an already-pruned candidate list (lazy segment
    loads, same as bloom_candidates)."""
    base_path = os.path.abspath(base_path)
    live = within if within is not None else _live_files(base_path)
    if not sidecar.exists(base_path, "zone", col):
        return list(live), len(live), 0
    entries = sidecar.load_entries(base_path, "zone", col, files=live)
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


def zone_complement_candidates(base_path: str, col: str, lo, hi,
                               within: list[str] | None = None
                               ) -> tuple[list[str], int, int]:
    """Live files that may hold a row OUTSIDE the closed interval
    [lo, hi] — the zone probe for NEGATED leaves (r11 verdict item 2:
    `NOT (x BETWEEN a AND b)`, `x != c`, `NOT x = c`). A file is
    skipped only when its zone PROVES every row fails the negated
    predicate: all non-null values inside [lo, hi] (zone containment),
    or all values NULL (`NOT (NULL op ...)` is NULL — never true, so an
    all-null file cannot contribute either). Files without an entry are
    kept (absence = must scan). Bloom/trigram have no complement
    analogue — may-contain proves nothing under negation — so this is
    the ONLY sidecar kind the planner consults for NOT leaves. Both
    bounds must be finite: an open end would make the complement
    one-sided, which the planner expresses as a plain range instead."""
    base_path = os.path.abspath(base_path)
    live = within if within is not None else _live_files(base_path)
    if lo is None or hi is None or not sidecar.exists(
            base_path, "zone", col):
        return list(live), len(live), 0
    entries = sidecar.load_entries(base_path, "zone", col, files=live)
    kept = []
    for f in live:
        e = entries.get(f)
        if e is None:
            kept.append(f)
            continue
        flo, fhi = e["lo"], e["hi"]
        if flo is None:  # all-null or empty: NOT(NULL ...) is never true
            continue
        if flo >= lo and fhi <= hi:  # provably contained: no row escapes
            continue
        kept.append(f)
    return kept, len(live), len(live) - len(kept)
