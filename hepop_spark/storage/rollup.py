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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_AGGS = ("n", "sum_v", "min_v", "max_v")


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
