"""SparkSession factory.

Configured for the 100 TB design point, not the local test harness:
 - AQE on (runtime coalesce, skew-join splitting) so the same plan adapts
   from sf0.001 to a 1000-executor cluster.
 - Parquet filter pushdown + vectorized reader (zone-map pruning: the
   reference's metadata.json min/max file pruning, query.js:22-63, is
   replaced by footer row-group statistics).
 - UTC session timezone so timestamp semantics match the ANSI/DuckDB oracle.
 - Arrow enabled for the (rare) Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "hepop_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local rule-of-thumb: ~1 shuffle partition per core. On a real
        # cluster this would be sized by data volume (AQE coalesces down).
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # AQE partition COALESCING is off for the local design point, by
        # measurement (r07, 3-pass A/B over the 42-query suite at sf0.1):
        # shuffle.partitions is already pre-sized to the core count, so
        # every coalesce below it strictly loses parallelism on the
        # CPU-bound md5/shingle stages — suite median-sum 43.5 s with
        # coalesce off vs 50.7 s parallelism-first vs 50.0 s size-first,
        # and pass-total variance collapses from +/-10% to +/-1.5% (the
        # r05/r06 'flapping' regressions were this knob). On a REAL
        # cluster, where shuffle.partitions is sized to data volume and
        # far exceeds cores, coalescing merges genuinely tiny partitions
        # and should be on: export SPARK_GRAFT_AQE_COALESCE=1 at deploy.
        .config(
            "spark.sql.adaptive.coalescePartitions.enabled",
            "true" if os.environ.get("SPARK_GRAFT_AQE_COALESCE") == "1" else "false",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # LP tag/field sections with a repeated key follow the reference's
        # JS-object semantics (last assignment wins, lineproto.js:70-80);
        # Spark's default map policy THROWS on duplicates instead
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # testdata events.ts is TIMESTAMP(NANOS); read as long and convert
        # (catalog.normalize_nanos) — Spark has no native nanos type.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # testdata may also carry tz-less TIMESTAMP(MICROS); read those as
        # session-TZ (UTC) TimestampType, not TIMESTAMP_NTZ, so unix_micros/
        # window math works and collect() matches the DuckDB oracle's naive
        # reading of the same column.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # opt-in event logging (profiling / cluster history server): UI stays
    # off locally, so the event log is the one way to attribute time to
    # stages (tools/profile_bench.py parses it per job description)
    ev_dir = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR")
    if ev_dir:
        os.makedirs(ev_dir, exist_ok=True)
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", f"file://{ev_dir}")
            # plain-text single file so stdlib tooling can parse it
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.rolling.enabled", "false")
        )
    return builder.getOrCreate()
