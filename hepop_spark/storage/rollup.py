"""Incrementally-maintained hourly rollup (continuous aggregation).

The reference's compaction ladder (hepop.js:415-419, 581-785) rewrites raw
files into coarser time buckets but never pre-aggregates — every query
re-scans rows. This module adds the layer the reference lacks: a rollup
table of per-(hour, key) aggregates maintained incrementally as data
arrives, so dashboard-style queries read O(hours × keys) rows instead of
O(events).

Correctness rests on count/sum/min/max being commutative monoids: the
merge of a batch's partial aggregate with the stored rollup is associative
and order-independent, so the rollup equals the direct aggregate of all
ingested data after every batch (the equivalence test pins this). avg is
derived at read time as sum/count — never stored, since avg is not a
monoid.

Scale: each batch touches only the hour partitions present in the batch
(dynamic partition overwrite); the merge reads those partitions only. A
1000-executor deployment shards the merge by the same (hour_bucket) key the
storage layout uses — no global state, no read-modify-write wider than the
arriving hours.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_AGGS = ("n", "sum_v", "min_v", "max_v")

# Files per projection segment/fold write (r12 optimization). A segment is a
# PRE-AGGREGATED partial — bounded by the grid's key domain, never by
# ingested rows — but the aggregation that produced it still carries the
# session's shuffle fan-out (32 partitions locally), so every append wrote
# up to 32 near-empty files and every scan re-listed and re-opened them
# (guide §6: small files hurt twice). Coalescing to a bounded file count
# keeps segments in the intended one-file-per-batch shape; deployments with
# genuinely huge grids (many GB per segment) raise the env knob instead of
# editing call sites.
_SEGMENT_FILES = int(os.environ.get("SPARK_GRAFT_SEGMENT_FILES", "1"))


def _grid_write(df: DataFrame):
    """Writer for grid-sized frames: bounded file count via coalesce (no
    extra exchange — the tiny final-agg partitions merge in place)."""
    return df.coalesce(max(1, _SEGMENT_FILES)).write


def _batch_partial(batch: DataFrame, ts_col: str, key_col: str,
                   val_col: str) -> DataFrame:
    return (
        batch.withColumn("hour_bucket", F.date_format(ts_col, "yyyy-MM-dd-HH"))
        .groupBy("hour_bucket", F.col(key_col).alias("k"))
        .agg(
            F.count("*").alias("n"),
            F.sum(val_col).alias("sum_v"),
            F.min(val_col).alias("min_v"),
            F.max(val_col).alias("max_v"),
        )
    )


def merge_rollup(spark: SparkSession, rollup_dir: str, partial: DataFrame) -> None:
    """Merge a partial aggregate into the stored rollup: monoid-merge rows
    for hours present in the partial, leave other hours untouched."""
    hours = [r["hour_bucket"] for r in partial.select("hour_bucket").distinct().collect()]
    if not hours:
        return
    if os.path.isdir(rollup_dir) and any(
        not e.startswith(("_", ".")) for e in os.listdir(rollup_dir)
    ):
        existing = spark.read.parquet(rollup_dir).filter(
            F.col("hour_bucket").isin(hours)
        )
        merged_src = existing.unionByName(partial)
    else:
        merged_src = partial
    merged = (
        merged_src.groupBy("hour_bucket", "k")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )
    # The merge reads the same partitions the write replaces — materialize
    # the merged result BEFORE overwriting so the scan cannot race the
    # commit (self-overwrite is undefined behavior otherwise).
    merged = merged.persist()
    merged.count()
    # dynamic partition overwrite: only the arriving hours are rewritten
    (
        merged.repartition("hour_bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("hour_bucket")
        .parquet(rollup_dir)
    )
    merged.unpersist()


def rollup_sink(events: DataFrame, rollup_dir: str, checkpoint_dir: str,
                ts_col: str = "ts", key_col: str = "event_type",
                val_col: str = "value", available_now: bool = True):
    """Streaming sink: maintain the rollup incrementally per micro-batch."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        merge_rollup(spark, rollup_dir, _batch_partial(batch, ts_col, key_col, val_col))

    writer = events.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rollup_batch(spark: SparkSession, rollup_dir: str, batch: DataFrame,
                 ts_col: str = "ts", key_col: str = "event_type",
                 val_col: str = "value") -> None:
    """Batch-mode ingest into the same rollup (backfills share the path)."""
    merge_rollup(spark, rollup_dir, _batch_partial(batch, ts_col, key_col, val_col))


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Serve the rollup with derived avg — the read-time face of the table."""
    return spark.read.parquet(rollup_dir).select(
        "hour_bucket",
        "k",
        "n",
        "sum_v",
        "min_v",
        "max_v",
        (F.col("sum_v") / F.col("n")).alias("avg_v"),
    )


# ---------------------------------------------------------------------------
# Generic maintained aggregate projection (r06 verdict item 5)
# ---------------------------------------------------------------------------
#
# merge_rollup above rewrites the touched partitions in place — fine for the
# hourly shape, but NOT idempotent under foreachBatch redelivery (a replayed
# batch double-counts). The projection store below is the generalization
# that serves any sum-monoid grid (the cents-percentile rollup, per-key
# token counts, ...) with EXACTLY-ONCE effects through the same contract the
# MinHash/IVF-PQ stores use: each micro-batch's partial aggregate is
# published as an immutable `seg_<batch_id>/` directory (hidden-staged,
# atomic rename, redelivered ids no-op), the read face re-merges segments on
# scan, and a compaction folds segments into `base/` behind the same
# reader-safe RENAME_EXCHANGE swap the partition compactor uses. An LSM
# tree, with sum-monoid merge instead of key shadowing.
#
# Scale: every segment saturates at the grid's key domain (it is already
# aggregated), so scan cost is |grid| x live segments — bounded by the
# compaction cadence, never by ingested rows.


def projection_append(spark: SparkSession, store: str, partial: DataFrame,
                      batch_id: str,
                      keys: list[str] | None = None,
                      sums: list[str] | None = None,
                      source: dict | None = None,
                      mins: list[str] | None = None,
                      maxs: list[str] | None = None,
                      kmvs: list[str] | None = None,
                      kmv_k: int | None = None,
                      hists: list[str] | None = None) -> bool:
    """Publish one micro-batch's partial aggregate as an immutable
    segment. No-op (False) when the batch id is already published — safe
    under foreachBatch redelivery.

    When `keys`/`sums` are given, a `_meta.json` descriptor is written
    once alongside the segments, making the store SELF-DESCRIBING: the
    serve catalog (catalog.discover_table) can then register the merged
    scan as a query table without out-of-band schema knowledge.
    ``mins``/``maxs`` (r09) name columns merged with the MIN/MAX monoid
    instead of SUM — count/sum/min/max are all commutative monoids, so
    the exactly-once segment contract carries over unchanged; avg stays
    derived (sum/count) and is never stored.

    ``source`` additionally records the ROUTING contract (r07 verdict
    item 3): {"table": raw_table, "keys": {store_col: raw_expr},
    "sums": {store_col: raw_agg_expr}, "mins": {...}, "maxs": {...}} —
    enough for the API layer (plans/api.py rollup routing) to rewrite a
    user's matching aggregate over the RAW table onto this grid."""
    import json
    import shutil

    from .writer import table_lock

    dest = os.path.join(store, f"seg_{batch_id}")
    # cheap redelivery no-op BEFORE the (expensive) segment write: the seg
    # dir and _folded.json are both atomic-rename-published, so an unlocked
    # read is safe; the authoritative re-check still happens under the lock
    if os.path.isdir(dest) or batch_id in _folded_ids(store):
        return False
    # r12: the Spark job that materializes the partial runs OUTSIDE the
    # store lock (the tmp name is unique per attempt, so concurrent appends
    # cannot collide) — before this, concurrent micro-batch appends to one
    # store serialized on the lock for the whole write, not just the
    # publish. Only the metadata write + rename stay locked.
    tmp = os.path.join(store, ".tmp", f"seg_{batch_id}.{uuid.uuid4().hex[:8]}")
    try:
        _grid_write(partial).mode("overwrite").parquet(tmp)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        return os.path.isdir(dest)
    with table_lock(store):
        if os.path.isdir(dest) or batch_id in _folded_ids(store):
            shutil.rmtree(tmp, ignore_errors=True)  # lost the publish race
            return False
        try:
            os.makedirs(store, exist_ok=True)
            meta = os.path.join(store, "_meta.json")
            if keys is not None and sums is not None and not os.path.exists(meta):
                doc = {"keys": list(keys), "sums": list(sums)}
                if mins:
                    doc["mins"] = list(mins)
                if maxs:
                    doc["maxs"] = list(maxs)
                if kmvs:
                    doc["kmvs"] = list(kmvs)
                    doc["kmv_k"] = int(kmv_k)
                if hists:
                    doc["hists"] = list(hists)
                if source is not None:
                    doc["source"] = source
                mtmp = meta + f".tmp.{uuid.uuid4().hex[:8]}"
                with open(mtmp, "w") as fh:
                    json.dump(doc, fh)
                os.rename(mtmp, meta)
            os.rename(tmp, dest)
            return True
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            return os.path.isdir(dest)


def _folded_ids(store: str) -> set[str]:
    """Batch ids whose segments were folded into base/ by
    projection_compact — they must keep no-oping in projection_append
    forever (the exactly-once contract outlives the fold)."""
    import json

    try:
        with open(os.path.join(store, "_folded.json")) as fh:
            return set(json.load(fh))
    except (OSError, ValueError):
        return set()


def _record_folded_ids(store: str, batch_ids: set[str]) -> None:
    """Atomically extend the folded-ids manifest. Written BEFORE the fold
    retires any segment: if the fold then crashes and the segments are
    restored, the manifest is merely redundant (the seg dirs still no-op
    appends); written after, a crash window would lose the markers."""
    import json

    merged = sorted(_folded_ids(store) | batch_ids)
    tmp = os.path.join(store, f"_folded.json.tmp.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump(merged, fh)
    os.rename(tmp, os.path.join(store, "_folded.json"))


def _read_head(store: str) -> dict | None:
    """The fold pointer (_head.json): {"base": dir_name|None,
    "folded": [batch_ids], "retired": {dir_name: ts}}. Published by
    atomic rename — a reader always resolves a complete view."""
    import json

    try:
        with open(os.path.join(store, "_head.json")) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def _write_head(store: str, doc: dict) -> None:
    import json

    tmp = os.path.join(store, f"_head.json.tmp.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.rename(tmp, os.path.join(store, "_head.json"))


def _projection_segments(store: str) -> list[str]:
    """The LIVE segment view. With a fold pointer (_head.json): the
    head's base generation plus every seg dir NOT folded into it — folds
    never rename or delete a path a reader may hold (retired generations
    persist through a vacuum grace), so one head read gives a consistent
    old-plus-delta view under any concurrent fold; without one (legacy
    store or never folded): `base/` + all seg dirs by listing."""
    head = _read_head(store)
    segs: list[str] = []
    if head is not None:
        if head.get("base"):
            b = os.path.join(store, head["base"])
            if os.path.isdir(b):
                segs.append(b)
        folded = set(head.get("folded", ()))
        try:
            segs += sorted(
                os.path.join(store, e)
                for e in os.listdir(store)
                if e.startswith("seg_") and e[len("seg_"):] not in folded
            )
        except OSError:
            pass
        return segs
    base = os.path.join(store, "base")
    if os.path.isdir(base):
        segs.append(base)
    try:
        segs += sorted(
            os.path.join(store, e)
            for e in os.listdir(store)
            if e.startswith("seg_")
        )
    except OSError:
        pass
    return segs


def projection_scan(spark: SparkSession, store: str, keys: list[str],
                    sums: list[str],
                    mins: list[str] = (), maxs: list[str] = (),
                    kmvs: list[str] = (),
                    kmv_k: int | None = None,
                    hists: list[str] = ()) -> DataFrame:
    """The merged projection: base + all published segments, monoid-merged
    per key (SUM / MIN / MAX / KMV-sketch per column class). Returns
    None-equivalent empty only if the store has no segments; callers that
    built at least one batch always get the full monoid merge."""
    segs = _projection_segments(store)
    if not segs:
        raise FileNotFoundError(f"empty projection store: {store}")
    # ONE multi-path read instead of per-segment read + unionByName (r12):
    # parquet binds columns BY NAME per file, so column order may differ
    # across generations (verified), and segment dirs are flat (never
    # partitioned), so there is no partition-discovery base-path hazard —
    # unlike pq_index's cell-partitioned code segments, which keep
    # per-root reads. Cold-store A/B (every fold and routed read sees a
    # fresh store): construct 0.34 -> 0.09 s at 4 segments; warm repeat
    # construction is within noise either way.
    df = spark.read.parquet(*segs)
    return df.groupBy(*keys).agg(
        *merge_aggs(sums, mins, maxs, kmvs, kmv_k, hists))


def scan_with_meta(spark: SparkSession, store: str) -> DataFrame:
    """projection_scan driven by the store's own _meta.json — the one
    call sites should prefer so a store's column classes can evolve
    without touching readers."""
    meta = projection_meta(store)
    if meta is None:
        raise FileNotFoundError(f"projection store has no _meta.json: {store}")
    return projection_scan(
        spark, store, meta["keys"], meta["sums"], meta.get("mins", []),
        meta.get("maxs", []), meta.get("kmvs", []), meta.get("kmv_k"),
        meta.get("hists", []))


def merge_aggs(sums: list[str], mins: list[str] = (),
               maxs: list[str] = (), kmvs: list[str] = (),
               kmv_k: int | None = None,
               hists: list[str] = ()) -> list:
    """The monoid re-merge expressions for a projection's value columns —
    shared by scan, fold and multi-writer federation so the three can
    never disagree on a column's merge function.

    ``kmvs`` columns are KMV (k-minimum-values / theta) distinct-count
    sketches: each stored value is the sorted array of the group's k
    smallest DISTINCT hash values. The merge — union, dedup, keep the k
    smallest — is itself the bottom-k monoid (every element of the
    merged bottom-k is in some input's bottom-k), so sketches fold and
    federate exactly like sums do, with k*8 bytes of state per
    (key, column) regardless of ingested rows. Deterministic
    (integer hashes, total order), so a maintained sketch replays
    bit-for-bit in ANSI SQL.

    ``hists`` columns are bucket-counter histograms (the DDSketch /
    HDR-histogram shape): map<bigint,bigint> from bucket index to count.
    The merge is key-wise counter addition — the free-commutative-monoid
    product of the sum monoid — so a maintained histogram is EXACTLY the
    one-shot histogram of everything ingested (no approximation enters
    at merge time; only the bucket width bounds quantile error). State
    per (key, column) is O(distinct buckets), ~log(max)*sub_buckets
    counters regardless of ingested rows."""
    out = ([F.sum(c).alias(c) for c in sums]
           + [F.min(c).alias(c) for c in mins]
           + [F.max(c).alias(c) for c in maxs])
    for c in kmvs:
        merged = F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(F.col(c)))))
        out.append(F.slice(merged, 1, int(kmv_k)).alias(c))
    for c in hists:
        # r12: one parsed SQL string instead of 3 nested lambda builds of
        # py4j round-trips per column per merge — identical expression
        # (pinned in tests/test_round12d.py)
        merged = F.expr(
            f"aggregate(collect_list({c}), "
            "CAST(map() AS MAP<BIGINT,BIGINT>), "
            "(acc, m) -> map_zip_with(acc, m, "
            "(_k, v1, v2) -> coalesce(v1, CAST(0 AS BIGINT)) "
            "+ coalesce(v2, CAST(0 AS BIGINT))))"
        )
        out.append(merged.alias(c))
    return out


def projection_meta(store: str) -> dict | None:
    """The store's self-description ({keys, sums}), or None."""
    import json

    try:
        with open(os.path.join(store, "_meta.json")) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def projection_compact(spark: SparkSession, store: str, keys: list[str],
                       sums: list[str],
                       mins: list[str] = (), maxs: list[str] = (),
                       kmvs: list[str] = (),
                       kmv_k: int | None = None,
                       hists: list[str] = ()) -> bool:
    """Fold the live segments into a NEW base generation and switch the
    fold pointer (r08 redesign): the fold never renames or deletes a
    path a reader may hold — the merged result lands under a fresh
    `base_v<hex>` name, `_head.json` switches to it atomically, and the
    retired generation + folded seg dirs stay on disk until a vacuum
    grace expires (manifest.RETIRE_GRACE_S, the same discipline as the
    table manifests). Before this, projection_scan rode the serve retry
    envelope because a fold could retire `base/` mid-scan; now ANY scan
    that resolved a head finishes against intact paths. Scan results are
    invariant across the fold; compaction only bounds the live segment
    count.

    Serialized per store against appends and OTHER FOLDS via table_lock:
    the r08 chaos soak caught the serve sweep timer and a manual
    compact_once folding the same store concurrently."""
    from .writer import table_lock

    with table_lock(store):
        return _projection_compact_locked(spark, store, keys, sums,
                                          mins, maxs, kmvs, kmv_k, hists)


def projection_vacuum(store: str, grace_s: float | None = None) -> list[str]:
    """Delete retired fold generations whose grace expired, plus orphan
    base_v* dirs from a fold that crashed before its head publish.
    Returns removed dir names. Folds run this first, so a serve loop
    needs no extra scheduling."""
    from .writer import table_lock

    with table_lock(store):
        return _projection_vacuum_locked(store, grace_s)


def _projection_vacuum_locked(store: str,
                              grace_s: float | None = None) -> list[str]:
    import shutil
    import time as _time

    from .manifest import RETIRE_GRACE_S

    grace = RETIRE_GRACE_S if grace_s is None else grace_s
    head = _read_head(store)
    if head is None:
        return []
    now = _time.time()
    removed: list[str] = []
    retired = dict(head.get("retired", {}))
    for name, ts in list(retired.items()):
        if now - ts >= grace:
            shutil.rmtree(os.path.join(store, name), ignore_errors=True)
            removed.append(name)
            del retired[name]
    try:
        entries = os.listdir(store)
    except OSError:
        entries = []
    for e in entries:
        if (e.startswith("base_v") and e != head.get("base")
                and e not in retired):
            p = os.path.join(store, e)
            try:
                orphan_age = now - os.path.getmtime(p)
            except OSError:
                continue
            if orphan_age >= grace:
                shutil.rmtree(p, ignore_errors=True)
                removed.append(e)
    if removed:
        _write_head(store, {**head, "retired": retired})
    return removed


def _projection_compact_locked(spark: SparkSession, store: str,
                               keys: list[str], sums: list[str],
                               mins: list[str] = (),
                               maxs: list[str] = (),
                               kmvs: list[str] = (),
                               kmv_k: int | None = None,
                               hists: list[str] = ()) -> bool:
    import shutil
    import time as _time

    _projection_vacuum_locked(store)
    segs = _projection_segments(store)
    if len(segs) <= 1:
        return False
    merged = projection_scan(spark, store, keys, sums, mins, maxs,
                             kmvs, kmv_k, hists)
    new_base = f"base_v{uuid.uuid4().hex[:8]}"
    tmp = os.path.join(store, f".{new_base}.tmp")
    try:
        _grid_write(merged).mode("overwrite").parquet(tmp)
        os.rename(tmp, os.path.join(store, new_base))
    except OSError:
        # nothing was mutated: the live view is untouched by construction
        shutil.rmtree(tmp, ignore_errors=True)
        return False
    head = _read_head(store) or {"base": None, "folded": [], "retired": {}}
    folded_now = {
        os.path.basename(s)[len("seg_"):]
        for s in segs if os.path.basename(s).startswith("seg_")
    }
    # appends must keep no-oping on folded ids forever; written BEFORE the
    # head switch (the seg dirs still exist, so this is never premature)
    _record_folded_ids(store, folded_now)
    now = _time.time()
    retired = dict(head.get("retired", {}))
    for s in segs:
        retired[os.path.basename(s)] = now
    _write_head(store, {
        "base": new_base,
        "folded": sorted(set(head.get("folded", ())) | folded_now),
        "retired": retired,
    })
    return True
