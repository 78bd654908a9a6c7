"""Table/view registration over parquet directories.

The reference resolves `FROM hep_(\\d+)` to an integer HEP type and any other
name to a Line-Protocol measurement, then reads the matching parquet file set
(reference: query.js:71-84, 144-172).  Here every logical table is simply a
Spark view over a parquet path; Catalyst's file index + footer statistics
replace the hand-rolled metadata.json zone maps (reference: hepop.js:96-106).

Also provides the *documented* virtual-field surface (reference README.md:
138-147): `time` aliases the timestamp and `src_ip`/`dst_ip`/`src_port`/
`dst_port` are extracted from the JSON protocol-header column at query time.
The shipped reference never implemented this explosion (SURVEY §1.2); we
implement the documented semantics as a view so both layers are honest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ALL_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Runtime session confs every query path depends on. These are ALSO set in
# session.get_spark(), but the driver (and any embedding application) builds
# its own SparkSession — so the load path must self-heal rather than assume a
# tuned session. All four are runtime-settable (verified on pyspark 4.1).
_QUERY_CONFS = (
    # timestamps collected/compared against the ANSI oracle assume UTC
    ("spark.sql.session.timeZone", "UTC"),
    # tz-less TIMESTAMP(MICROS) must read as session-TZ TimestampType, not
    # TIMESTAMP_NTZ: unix_micros()/window math reject NTZ inputs
    ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    # TIMESTAMP(NANOS) columns read as long; normalize_nanos converts
    ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    # LP tag/field repeated keys follow the reference's JS-object semantics
    # (last assignment wins, lineproto.js:70-80); Spark default THROWS
    ("spark.sql.mapKeyDedupPolicy", "LAST_WIN"),
    # Arrow-columnar driver transfers (guide §6): toPandas in the sidecar
    # index builders moves k-word bitmap rows orders of magnitude faster
    # than the pickled-Row path; purely a transport setting, results
    # identical. get_spark sets it too — this self-heals vanilla sessions.
    ("spark.sql.execution.arrow.pyspark.enabled", "true"),
)


import weakref


def ensure_query_confs(spark: SparkSession) -> None:
    """Set the runtime confs the query surface depends on, tolerating
    sessions/builds where a conf is missing or locked — but never silently:
    a load-bearing conf that fails to apply surfaces as a warning naming
    the key (r02 advisor finding: a bare pass moves the failure far from
    its cause), and the applied value is read back to catch sessions that
    accept the set but pin a different effective value.

    r12: repeated calls take a GET-only fast path — when every conf
    already reads back right, nothing is set. The self-heal contract is
    unchanged (an unset/clobbered conf is re-applied on the next
    load_table, pinned by tests/test_vanilla_session.py), but a healthy
    session pays 5 reads instead of 10 read+writes per table load —
    measurable in plan-construction time on multi-table joins."""
    import warnings

    try:
        if all(
            (got := spark.conf.get(key, None)) is not None
            and got.lower() == val.lower()
            for key, val in _QUERY_CONFS
        ):
            return
    except Exception:
        pass  # odd session stand-in: fall through to the healing path

    for key, val in _QUERY_CONFS:
        try:
            spark.conf.set(key, val)
            got = spark.conf.get(key, None)
        except Exception as exc:  # missing/locked conf in this build
            warnings.warn(
                f"query conf {key}={val!r} could not be applied ({exc}); "
                "queries depending on it may fail or mismatch the oracle",
                RuntimeWarning,
                stacklevel=2,
            )
            continue
        if got is not None and got.lower() != val.lower():
            warnings.warn(
                f"query conf {key} pinned to {got!r} (wanted {val!r})",
                RuntimeWarning,
                stacklevel=2,
            )


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# --- adaptive scan spread (r12 optimization round) ---------------------------
#
# The testdata tables are single-file, SINGLE-ROW-GROUP parquet: Spark cannot
# split them, so every scan is one task and every scan-fused operator chain
# (shingle explode + 8x md5 partial aggregation, Arrow UDF encode, ...) runs
# serially on one core while the rest idle — measured 2.1 s of a 2.8 s query
# inside one task (tools/profile_bench.py, dedup_minhash_lsh). This is the
# optimization guide's unsplittable-input case (§2.5): "fix at the source if
# you can; otherwise repartition immediately after the read."
#
# The spread is SCALE-ADAPTIVE, not a local[32] constant: it fires only when
# the file is too small to reach the session's parallelism at the session's
# own split size (spark.sql.files.maxPartitionBytes), i.e. exactly when the
# scan would otherwise under-parallelize. At production scale (multi-file,
# multi-row-group tables, splits >= cores) the condition is false and the
# plan is byte-identical to before. The exchange hashes on the table's
# primary key only — column pruning and filter pushdown both survive a
# RepartitionByExpression that references a single already-read column
# (verified in plans/r12/*_after.txt), and a pk hash cannot skew.
#
# The spread is OPT-IN per call site (load_table(..., spread=True)): the
# same-window A/B showed it pays ONLY where consumers multiply each row into
# hundreds of shingle/ngram rows and hash every one (dedup_minhash_lsh
# 3.29 s -> 2.09 s, winnowing 2.91 -> 1.41, skewed_band 3.79 -> 2.40 median),
# while light consumers pay more for the exchange than the serial partial
# aggregation it removes (text_token_stats 0.29 -> 0.60, q1 0.55 -> 1.05,
# ann_ivf 1.50 -> 1.74 when it was blanket). The shuffle write still runs
# inside the single scan task, so spreading only wins when downstream work
# per input byte is extreme. Measured, not assumed — keep it opt-in.
_SPREAD_KEYS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
}
_SPREAD_MIN_BYTES = 256 * 1024  # below this the single task is already cheap


def _max_partition_bytes(spark: SparkSession) -> int:
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    digits = "".join(ch for ch in raw if ch.isdigit())
    mult = 1
    low = raw.lower()
    if low.endswith(("k", "kb")):
        mult = 1024
    elif low.endswith(("m", "mb")):
        mult = 1024 ** 2
    elif low.endswith(("g", "gb")):
        mult = 1024 ** 3
    return int(digits or "134217728") * mult


def _spread_input_splits(spark: SparkSession, path: str,
                         cores: int) -> tuple[int, int]:
    """(estimated scan splits, total bytes seen) for a table path —
    file or directory. Directories are walked with an EARLY EXIT once
    either the file count or the accumulated bytes already guarantee
    >= cores scan splits, so the listing cost is O(cores) entries at
    scale, not O(files). r13: the old heuristic read os.path.getsize on
    a DIRECTORY (the inode size, a few KB) and concluded every directory
    table "splits naturally" — false for the single-large-part-file
    layout a 1-task writer produces (the 20x probe's replicated tables),
    which then ran the whole signing chain on ONE task."""
    mpb = _max_partition_bytes(spark)
    if not os.path.isdir(path):
        size = os.path.getsize(path)
        return max(1, -(-size // mpb)), size
    # Spark packs files into splits charging openCostInBytes per file
    # (default 4 MB), so estimate splits the way the scan planner does
    open_cost = 4 * 1024 * 1024
    charged = 0
    total = 0
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.startswith(("_", ".")):
                continue
            try:
                sz = os.path.getsize(os.path.join(root, f))
            except OSError:
                continue
            total += sz
            charged += sz + open_cost
            if charged >= cores * mpb:
                return cores, total
    return max(1, -(-charged // mpb)), total


def _maybe_spread(spark: SparkSession, df: DataFrame, name: str,
                  path: str) -> DataFrame:
    if os.environ.get("SPARK_GRAFT_NO_SPREAD") == "1":
        return df
    key = _SPREAD_KEYS.get(name)
    if key is None:
        return df
    cores = spark.sparkContext.defaultParallelism
    try:
        est_splits, size = _spread_input_splits(spark, path, cores)
    except OSError:
        return df
    if size < _SPREAD_MIN_BYTES:
        return df
    if est_splits >= cores:
        return df
    return df.repartition(cores, F.col(key))


def normalize_nanos(df: DataFrame, cols=("ts",)) -> DataFrame:
    """Parquet TIMESTAMP(NANOS) columns arrive as long (nanosAsLong config);
    convert to microsecond TimestampType with integer division (floor-trunc,
    matching DuckDB's ns->us read). Integer `div`, not `/`: double math loses
    precision above 2^53 ns.

    Also casts TIMESTAMP_NTZ -> TIMESTAMP (equivalent under the UTC session
    timezone) as a second line of defense for sessions where the
    inferTimestampNTZ conf was applied after a plan was cached."""
    dtypes = dict(df.dtypes)
    for c in cols:
        if c not in dtypes:
            continue
        if dtypes[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes[c] == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# Logical-plan memo for load_table: per-session (weak) map of
# (path, file identity, spread) -> the immutable DataFrame handle.
# DataFrames are immutable logical plans, so handing the same object to
# every consumer is safe and skips the per-call parquet footer read +
# schema analysis + normalize_nanos py4j traffic (measured ~50-80 ms per
# table per query at r12; a 6-table join paid it six times per
# construction). NO DATA is cached — every action still scans the parquet
# files; the memo key carries (mtime, size) so a rewritten file gets a
# fresh plan, and the weak session key drops dead sessions' plans.
_TABLE_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str,
               spread: bool = False) -> DataFrame:
    ensure_query_confs(spark)
    path = table_path(sf_dir, name)
    try:
        st = os.stat(path)
        ident: tuple = (st.st_mtime_ns, st.st_size)
    except OSError:
        ident = ()
    key = (path, ident, spread)
    try:
        per_session = _TABLE_MEMO.setdefault(spark, {})
    except TypeError:
        per_session = {}  # unweakrefable session stand-in: no memo
    hit = per_session.get(key)
    if hit is not None:
        return hit
    df = normalize_nanos(spark.read.parquet(path))
    if spread:
        df = _maybe_spread(spark, df, name, path)
    per_session[key] = df
    return df


def read_parquet_memo(spark: SparkSession, path: str) -> DataFrame:
    """Memoized plan handle for a PUBLISHED index/store directory — the
    load_table memo policy applied to the persisted-index readers (r12):
    NO DATA is cached, every action still scans the files; the key
    carries the directory identity (mtime_ns, size), and every store in
    this repo publishes by rename INTO the directory (segments, batch=N
    dirs, tombstone sets) or atomic-swaps the directory itself — both
    update the keyed mtime, so any publish/compact/GC yields a fresh
    plan. Saves the per-call footer read + schema analysis (~50-130 ms
    per store dir per query construction)."""
    ensure_query_confs(spark)
    try:
        st = os.stat(path)
        ident: tuple = (st.st_mtime_ns, st.st_size)
    except OSError:
        ident = ()
    key = ("store", path, ident)
    try:
        per_session = _TABLE_MEMO.setdefault(spark, {})
    except TypeError:
        per_session = {}
    hit = per_session.get(key)
    if hit is None:
        hit = per_session[key] = spark.read.parquet(path)
    return hit


def local_result(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Pinned local result via the Arrow driver path (guide §6 "Arrow for
    driver transfers", r13): the lifecycle entries return their already-
    collected, plan-asserted rows as a DataFrame, and the plain
    createDataFrame(list, schema) spelling builds a 32-slice parallelize
    RDD whose schema application runs row-at-a-time through Python
    workers — measured 7-15 executor-seconds and 0.3-0.7 s of wall PER
    BENCH COLLECT for a handful of rows. Routing the same rows through a
    dtype=object pandas frame uses the Arrow conversion (driver-side
    columnar encode, no Python workers at action time): 0.39 -> 0.03 s
    per construct+collect.

    The Arrow arrays are built directly from the Python values with
    from_pandas=False, so None stays a true null, NaN stays a NaN double
    (pandas' object->Arrow conversion would fold NaN into null), and
    ints/floats/strings are unchanged — values bit-identical to the list
    spelling, pinned by tests/test_round13.py across None, NaN, -0.0,
    unicode and int64-boundary rows."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import _parse_datatype_string

    rows = [tuple(r) for r in rows]
    st = _parse_datatype_string(schema) if isinstance(schema, str) else schema
    if not rows:
        return spark.createDataFrame([], st)
    cols = list(zip(*rows))
    tbl = pa.Table.from_arrays(
        [
            pa.array(list(c), type=to_arrow_type(f.dataType),
                     from_pandas=False)
            for c, f in zip(cols, st.fields)
        ],
        names=[f.name for f in st.fields],
    )
    return spark.createDataFrame(tbl, st)


def register_views(spark: SparkSession, sf_dir: str, tables=ALL_TABLES) -> None:
    """Register each parquet table as a temp view named after the table."""
    ensure_query_confs(spark)
    for name in tables:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def hep_virtual_view(df: DataFrame, rcinfo_col: str = "rcinfo",
                     ts_col: str = "timestamp") -> DataFrame:
    """Documented HEP query surface (reference README.md:138-147).

    `get_json_object` stays JVM-side (Jackson, codegen'd) — no Python UDF in
    the hot path; at 100 TB this runs inside whole-stage codegen right after
    the parquet scan, and unreferenced virtual columns are pruned by Catalyst.
    """
    return df.select(
        F.col(ts_col).alias("time"),
        F.get_json_object(F.col(rcinfo_col), "$.srcIp").alias("src_ip"),
        F.get_json_object(F.col(rcinfo_col), "$.dstIp").alias("dst_ip"),
        F.get_json_object(F.col(rcinfo_col), "$.srcPort").cast("int").alias("src_port"),
        F.get_json_object(F.col(rcinfo_col), "$.dstPort").cast("int").alias("dst_port"),
        "*",
    )


def register_hep_view(spark: SparkSession, parquet_glob: str, name: str) -> None:
    """Register a HEP table (fixed 3-column schema, reference hepop.js:20-24)
    with its documented virtual fields."""
    hep_virtual_view(spark.read.parquet(parquet_glob)).createOrReplaceTempView(name)


def discover_table(spark: SparkSession, data_dir: str, name: str,
                   hep_type: int | None = None,
                   merge_schema: bool = True,
                   cache: dict[str, str] | None = None,
                   bloom_probe: tuple[str, list] | None = None,
                   view_name: str | None = None,
                   file_filter=None) -> bool:
    """Serve-mode FRESH-METADATA table resolution (reference query.js:22-63:
    the table's file set is re-listed on EVERY query, re-read at :36-38, so
    a measurement first written milliseconds ago is immediately queryable).

    Federates ALL writer directories under the data root — the reference
    iterates `{data}/*/dbs` (query.js:24-33), so N HEPop instances sharing
    storage answer as ONE table; each writer's tree is read separately and
    union'd by name with missing columns null-filled (writers may have
    frozen different first-row schemas).

    Registers/refreshes `name` as a temp view; returns False (and leaves
    any existing view untouched) when no writer has the table yet.

    ``cache`` (a caller-owned dict) turns the per-query cost into a
    directory WALK only: the table's file state (relpaths + sizes +
    mtimes) is fingerprinted, and re-registration — the expensive part,
    parquet footer reads at plan time — is skipped while the fingerprint
    is unchanged. Freshness semantics are identical (file state IS the
    ground truth, exactly the reference's metadata re-read), but a hot
    serve loop pays the footer reads only when data actually landed.

    ``bloom_probe`` = (col, values): each writer dir's file list is
    intersected with its Bloom sidecar's admitted files for the probe
    values (storage/bloom_index.bloom_candidates — dirs without a
    sidecar keep their full list, so pruning is result-invisible for
    any query whose WHERE implies col ∈ values). ``file_filter`` is the
    general form: a callable (writer_dir) -> kept relative files
    (already intersected with whatever sidecars apply) or None for "no
    pruning in this dir". The pruned view is registered under
    ``view_name`` (required with either; pruned views are per-query, so
    the fingerprint cache is bypassed and the CALLER owns dropping the
    view).
    """
    import glob as _glob

    from .storage.manifest import latest as _manifest_latest
    from .storage.manifest import manifest_enabled

    ensure_query_confs(spark)
    # (dir, pinned_files_or_None, fingerprint_token): manifest-mode writer
    # dirs (storage/manifest.py) resolve their file list from the latest
    # published version — a compaction swap can never invalidate the plan
    # because retired files stay on disk through the vacuum grace (r07
    # verdict item 1). Plain dirs keep the listing semantics.
    dirs: list[tuple[str, list[str] | None, str | None]] = []
    for d in sorted(
        p
        for p in _glob.glob(os.path.join(data_dir, "*", "dbs", name))
        if os.path.isdir(p)
    ):
        got = _manifest_latest(d) if manifest_enabled(d) else None
        if got is not None:
            if got[1]["files"]:
                dirs.append((d, got[1]["files"], f"{d}@v{got[0]}"))
            # an empty published live set is a real (empty) table state
        elif any(
            f.endswith(".parquet") for _r, _d, fs in os.walk(d) for f in fs
        ):
            # tolerate a writer dir that exists but has no data files yet
            # (a registry-only placeholder would make spark.read throw).
            # Also covers a manifest dir with NO published version (crash
            # between enable_manifest's mkdir and its first publish):
            # listing stays truth rather than hiding live data (r08 ADVICE)
            dirs.append((d, None, None))
    if bloom_probe is not None or file_filter is not None:
        from .storage.bloom_index import bloom_candidates

        assert view_name is not None, "pruned reads require view_name"
        if file_filter is None:
            col, values = bloom_probe
            file_filter = lambda d: bloom_candidates(d, col, values)[0]  # noqa: E731
        pruned_dirs: list[tuple[str, list[str] | None, str | None]] = []
        for d, pinned, _t in dirs:
            kept = file_filter(d)
            if kept is None:
                pruned_dirs.append((d, pinned, None))
                continue
            if pinned is not None:
                kept = [f for f in kept if f in set(pinned)]
            if kept:
                pruned_dirs.append((d, kept, None))
        if not pruned_dirs:
            # every file pruned: pin emptiness with the table's schema
            if not dirs:
                return False
            d0, pinned0, _ = dirs[0]
            rd = spark.read.option("mergeSchema", str(merge_schema).lower())
            base = (rd.parquet(d0) if pinned0 is None else
                    rd.option("basePath", d0)
                    .parquet(*[os.path.join(d0, f) for f in pinned0]))
            df = base.limit(0)
            if hep_type is not None:
                df = hep_virtual_view(df)
            elif "timestamp" in df.columns and "time" not in df.columns:
                df = df.withColumn("time", F.col("timestamp"))
            df.createOrReplaceTempView(view_name)
            return True
        dirs = pruned_dirs
        cache = None  # per-query view: never poison the table cache
    if not dirs:
        # maintained aggregate projections (storage/rollup.py): a store
        # published under {data}/{writer}/rollups/{name} with a _meta.json
        # descriptor is queryable as table {name} — the API-layer face of
        # the streaming-maintained rollups (r06 verdict item 5). Same
        # fresh-discovery + fingerprint-cache policy as raw tables;
        # multi-writer stores federate by monoid re-merge.
        return _discover_rollup(spark, data_dir, name, cache)
    fp = None
    if cache is not None:
        from .operators.pq_index import source_fingerprint

        listed = [d for d, pinned, _t in dirs if pinned is None]
        tokens = [t for _d, pinned, t in dirs if pinned is not None]
        fp = ";".join(tokens) + "|" + (
            source_fingerprint(*listed) if listed else ""
        )
        if cache.get(name) == fp:
            return True  # view already reflects this exact file state
        # do NOT store fp yet: if registration below throws (e.g. a writer
        # mid-append leaves a partial parquet file), a pre-stored fingerprint
        # would mark the STALE previous view as fresh until file state
        # changes again (r05 ADVICE). The cache is updated only after the
        # view registration succeeds.
    parts = []
    for d, pinned, _t in dirs:
        reader = spark.read.option("mergeSchema", str(merge_schema).lower())
        if pinned is None:
            parts.append(reader.parquet(d))
        else:
            # basePath keeps date/bucket partition-column inference (and
            # therefore pruning) identical to the directory read
            parts.append(
                reader.option("basePath", d)
                .parquet(*[os.path.join(d, f) for f in pinned])
            )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    if hep_type is not None:
        df = hep_virtual_view(df)
    elif "timestamp" in df.columns and "time" not in df.columns:
        # documented LP query surface calls the timestamp column `time`
        df = df.withColumn("time", F.col("timestamp"))
    df.createOrReplaceTempView(view_name or name)
    if cache is not None:
        cache[name] = fp
    return True


def _discover_rollup(spark: SparkSession, data_dir: str, name: str,
                     cache: dict[str, str] | None) -> bool:
    """Register a maintained aggregate projection as a query view: every
    writer's `{data}/{writer}/rollups/{name}` store is scanned through its
    self-description (keys + sum columns) and the writers' grids are
    monoid-merged — the same federation rule as raw tables, applied to
    pre-aggregated state."""
    import glob as _glob

    from .storage.rollup import projection_meta, projection_scan

    stores = sorted(
        s
        for s in _glob.glob(os.path.join(data_dir, "*", "rollups", name))
        if os.path.isdir(s) and projection_meta(s) is not None
    )
    if not stores:
        return False
    fp = None
    if cache is not None:
        from .operators.pq_index import source_fingerprint

        fp = source_fingerprint(*stores)
        if cache.get(name) == fp:
            return True
    from .storage.rollup import merge_aggs

    meta = projection_meta(stores[0])
    keys, sums = meta["keys"], meta["sums"]
    mins, maxs = meta.get("mins", []), meta.get("maxs", [])
    kmvs, kmv_k = meta.get("kmvs", []), meta.get("kmv_k")
    hists = meta.get("hists", [])
    df = None
    for s in stores:
        scan = projection_scan(spark, s, keys, sums, mins, maxs, kmvs, kmv_k,
                               hists)
        df = scan if df is None else df.unionByName(scan)
    if len(stores) > 1:
        df = df.groupBy(*keys).agg(
            *merge_aggs(sums, mins, maxs, kmvs, kmv_k, hists))
    df.createOrReplaceTempView(name)
    if cache is not None:
        cache[name] = fp
    return True
