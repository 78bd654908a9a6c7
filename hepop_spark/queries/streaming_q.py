"""Streaming operators exposed to the ORACLE gate via bounded replay: the
same Structured Streaming code that runs unbounded (streaming/ingest.py)
is driven over a finite replay of the events table with availableNow, and
its final state must hash-match the batch SQL computing the identical
aggregate. This upgrades streaming correctness from pytest-only to the
driver's DuckDB value-hash gate — micro-batching must be result-invisible.

(The reference has no streaming aggregation at all — its ingest loop only
buffers and flushes rows, hepop.js:134-157.)

Scale: a watermarked streaming window at 100 TB/day holds state only for
open windows; the bounded replay exercises the same operator with
`complete` output (memory sink) so EVERY window is emitted for comparison
— replay is a test harness shape, not the production sink.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec
from .reference_surface import TS_FMT_DUCK, fmt_ts


def _replay(spark: SparkSession, sf: str, transform, out_schema: str,
            post=None) -> DataFrame:
    """Write a bounded events slice, stream it back with availableNow
    through `transform`, collect the complete-mode result. `post` (batch
    DataFrame -> DataFrame) runs over the memory-sink table — a stream may
    hold only ONE stateful aggregation, so any rollup above it is batch."""
    d = tempfile.mkdtemp(prefix="stream_replay_")
    table = f"replay_{uuid.uuid4().hex[:8]}"
    try:
        src_dir = os.path.join(d, "src")
        (
            load_table(spark, sf, "events")
            .select("event_id", "ts", "user_id", "event_type", "value")
            .write.parquet(src_dir)
        )
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
            .parquet(src_dir)
        )
        q = (
            transform(stream)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        result = spark.table(table)
        if post is not None:
            result = post(result)
        rows = result.collect()
        return spark.createDataFrame(rows, out_schema)
    finally:
        spark.catalog.dropTempView(table) if table in [
            t.name for t in spark.catalog.listTables()
        ] else None
        shutil.rmtree(d, ignore_errors=True)


def streaming_window_replay(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked 1-hour tumbling windows run AS A STREAM over a bounded
    replay (multiple micro-batches via maxFilesPerTrigger) — final window
    counts/sums must equal the batch date_trunc aggregation exactly."""

    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .select(
                fmt_ts(F.col("w.start"), "win_start"),
                "event_type",
                "n",
                "sum_value",
            )
        )

    return _replay(
        spark, sf, transform,
        "win_start string, event_type string, n bigint, sum_value double",
    )


STREAMING_WINDOW_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS win_start,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


def streaming_session_replay(spark: SparkSession, sf: str) -> DataFrame:
    """F.session_window (30-min gap) sessionization run as a stream over
    the bounded replay — per-user session count and event total must match
    the batch islands computation (lag > gap → new session)."""

    def transform(stream: DataFrame) -> DataFrame:
        # the ONE stateful aggregation the stream may hold
        return (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
            .agg(F.count("*").alias("n_events"))
        )

    def post(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )

    return _replay(
        spark, sf, transform,
        "user_id bigint, n_sessions bigint, n_events bigint", post=post,
    )


STREAMING_SESSION_SQL = """
WITH o AS (
    SELECT user_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
),
marked AS (
    SELECT user_id,
           CASE WHEN prev IS NULL
                     OR epoch_us(ts) - epoch_us(prev) > 30 * 60 * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM o
)
SELECT user_id,
       CAST(sum(new_session) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM marked
GROUP BY user_id
"""


QUERIES: dict[str, QuerySpec] = {
    "streaming_window_replay": QuerySpec(streaming_window_replay, STREAMING_WINDOW_SQL),
    "streaming_session_replay": QuerySpec(streaming_session_replay, STREAMING_SESSION_SQL),
}
