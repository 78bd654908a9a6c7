"""Time-partitioned parquet writer.

Reference layout (hepop.js:114-132): one file per flush under
`{base}/{writerId}/dbs/hep-{db}/{table}/{YYYY-MM-DD}/{HH-M0}/{seq}.parquet`
with a 10-minute bucket (`minute = floor(m/10)*10`).

Spark-native equivalent: `partitionBy(date, bucket)` directory partitioning
over the same two derived columns. This buys, for free, what the reference
hand-rolled: partition pruning on time predicates (their metadata.json
min/max scan, query.js:22-63) and append atomicity (output committer).
At 100 TB the 10-minute bucket column keeps partitions bounded; row-group
min/max on `timestamp` handles pruning inside a bucket.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- per-table append/compact serialization -------------------------------
# The round-6 concurrency soak exposed a loss window: the compactor
# snapshots a partition's files, rewrites them, then swaps the DIRECTORY —
# a batch appended between snapshot and swap rides into the trash dir and
# is deleted. Appends and compaction of one table are therefore mutually
# exclusive WITHIN the owning process. That scope is correct by the storage
# layout contract: every writer process appends only to its own
# {data}/{writer_id}/dbs tree (reference hepop.js:114-132, federation
# query.js:24-33), and its compactor runs in the same process
# (hepop.js:440-450 — the reference's is the same event loop, so it cannot
# race itself; a multi-threaded engine must add the lock the JS model got
# for free). Cross-process READERS are lock-free and safe by construction.
# Manifest-mode tables (storage/manifest.py, the serve default) pin reads
# to a published file-list version while retired bytes persist through a
# vacuum grace — nothing to race, proven by the ZERO-GAP two-process soak
# in tests/test_round7.py. Legacy tables keep the r07 envelope: compaction
# stages and retires in dot-prefixed dirs Spark never lists, swaps with an
# atomic RENAME_EXCHANGE (storage/compaction.py), and a plan that captured
# the pre-swap file list gets bounded retries in the serve path
# (plans/api.py).
_TABLE_LOCKS: dict[str, threading.RLock] = {}
_TABLE_LOCKS_META = threading.Lock()


def table_lock(base_path: str) -> threading.RLock:
    """The append/compact mutex for one table directory."""
    key = os.path.abspath(base_path)
    with _TABLE_LOCKS_META:
        return _TABLE_LOCKS.setdefault(key, threading.RLock())


def with_time_partitions(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Add the reference's two-level time partition columns:
    date (YYYY-MM-DD) and 10-minute bucket (HH-M0), hepop.js:116-126."""
    ts = F.col(ts_col)
    bucket = F.concat(
        F.lpad(F.hour(ts).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((F.floor(F.minute(ts) / 10) * 10).cast("string"), 2, "0"),
    )
    return df.withColumn("date", F.to_date(ts)).withColumn("bucket", bucket)


def write_partitioned(df: DataFrame, base_path: str, ts_col: str = "timestamp",
                      mode: str = "append",
                      bloom_cols: tuple[str, ...] = (),
                      manifest: bool | None = None) -> None:
    """Append rows under date/bucket partition directories.

    ``bloom_cols`` writes parquet bloom filters for the named columns —
    the counterpart of the reference's writer bloom option (hepop.js:26-34).
    The reference blooms its `timestamp` column, which is a range column
    where row-group min/max stats already prune; blooms only pay off on
    high-cardinality POINT-lookup columns (session ids, call ids), so the
    column choice is the caller's, defaulting to none. Deliberate
    improvement over the reference, documented in SURVEY §4.

    ``manifest``: True puts the table in manifest mode (snapshot-pinned
    reads, storage/manifest.py) and publishes a new version after this
    append; None (default) auto-publishes only if the table is ALREADY in
    manifest mode; False never publishes. Serve-mode sinks pass True so a
    brand-new measurement's first flush enables pinning."""
    from .manifest import enable_manifest, manifest_enabled, publish_append

    w = with_time_partitions(df, ts_col).write.mode(mode)
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
    with table_lock(base_path):
        w.partitionBy("date", "bucket").parquet(base_path)
        if manifest or (manifest is None and manifest_enabled(base_path)):
            if not manifest_enabled(base_path):
                enable_manifest(base_path)
            else:
                publish_append(base_path)


def read_table(spark: SparkSession, base_path: str) -> DataFrame:
    """Read a partitioned table back; partition columns become `date` and
    `bucket`, prunable by Catalyst.

    Manifest-mode tables (storage/manifest.py) are read through their
    latest published file list — a plain directory read would see BOTH
    retired (grace-deferred) and replacement compacted files and
    double-count rows for up to RETIRE_GRACE_S after every compaction
    (r08 ADVICE, medium). `basePath` keeps date/bucket partition-column
    inference (and pruning) identical to the directory read — the same
    pinned-read shape as catalog.discover_table."""
    from .manifest import live_files, manifest_enabled

    if manifest_enabled(base_path):
        pinned = live_files(base_path)
        if pinned:
            return (
                spark.read.option("basePath", base_path)
                .parquet(*[os.path.join(base_path, f) for f in pinned])
            )
        if pinned is not None:
            # published live set is EMPTY (everything retired, grace not
            # yet expired): the directory still holds retired bytes, so a
            # plain read would resurrect deleted rows — pin emptiness.
            return spark.read.parquet(base_path).limit(0)
        # manifest dir exists but no version published (crash between
        # enable_manifest's mkdir and its first publish): listing is truth
    return spark.read.parquet(base_path)
