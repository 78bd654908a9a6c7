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

from ..catalog import local_result, load_table
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
        return local_result(spark, rows, out_schema)
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


def streaming_dedup_replay(spark: SparkSession, sf: str) -> DataFrame:
    """The CUSTOM STATEFUL operator (applyInPandasWithState first-arrival
    dedup, streaming/stateful.py) under the oracle gate. Two
    deterministic micro-batches (one file each, maxFilesPerTrigger=1):

      batch 1 = events < 5000, plus in-batch duplicate copies of
                event_id % 7 = 0  → emitted once with n_dups = 1;
      batch 2 = events ≥ 5000, plus CROSS-BATCH copies of batch-1 keys
                (event_id % 11 = 0) → fully suppressed by state.

    Every key's payload is identical across its copies, so first-arrival
    is value-deterministic; the oracle enumerates exactly one row per key
    with the planted in-batch dup count. Suppression of the cross-batch
    replays is what proves state survives micro-batch boundaries."""
    import glob

    from ..streaming.stateful import streaming_dedup

    d = tempfile.mkdtemp(prefix="sdedup_replay_")
    try:
        ev = load_table(spark, sf, "events").select(
            F.md5(F.col("event_id").cast("string")).alias("h"),
            F.col("event_type").alias("payload"),
            "event_id",
        )
        b1 = ev.filter(F.col("event_id") < 5000)
        b1 = b1.unionAll(b1.filter(F.col("event_id") % 7 == 0))
        b2 = ev.filter(F.col("event_id") >= 5000).unionAll(
            ev.filter((F.col("event_id") < 5000) & (F.col("event_id") % 11 == 0))
        )
        src = os.path.join(d, "src")
        os.makedirs(src)
        for i, b in enumerate((b1, b2)):
            tmp = os.path.join(d, f"w{i}")
            b.select("h", "payload").coalesce(1).write.parquet(tmp)
            (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
            os.rename(part, os.path.join(src, f"{i:02d}.parquet"))

        stream = (
            spark.readStream.schema("h string, payload string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        table = f"replay_{uuid.uuid4().hex[:8]}"
        q = (
            streaming_dedup(stream, ttl_ms=None)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table(table).collect()
        return local_result(spark, rows, "h string, payload string, n_dups bigint")
    finally:
        shutil.rmtree(d, ignore_errors=True)


STREAMING_DEDUP_SQL = """
SELECT md5(CAST(event_id AS VARCHAR)) AS h,
       event_type AS payload,
       CAST(CASE WHEN event_id % 7 = 0 AND event_id < 5000 THEN 1 ELSE 0 END
            AS BIGINT) AS n_dups
FROM events
"""


def exactly_once_replay(spark: SparkSession, sf: str) -> DataFrame:
    """The exactly-once sink (streaming/exactly_once.py) under the oracle
    gate: events stream through the commit-marker foreachBatch sink in
    multiple micro-batches, then batch 0 is RE-DELIVERED verbatim (the
    at-least-once hazard) and must be a marker-gated no-op. The committed
    read has to aggregate to exactly the batch SQL over the source — any
    duplicate or loss from the retry layer breaks the hash. (Torn-write
    repair is pinned separately in tests/test_exactly_once.py.)"""
    from ..streaming.exactly_once import (
        exactly_once_sink,
        read_committed,
        write_batch_exactly_once,
    )

    d = tempfile.mkdtemp(prefix="e1_replay_")
    try:
        src = os.path.join(d, "src")
        ev = load_table(spark, sf, "events").select("event_id", "event_type", "value")
        ev.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema("event_id long, event_type string, value double")
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        out = os.path.join(d, "out")
        q = exactly_once_sink(stream, out, os.path.join(d, "ckpt")).start()
        q.awaitTermination(120)
        # simulate the at-least-once hazard: re-deliver batch 0 verbatim —
        # the marker must make it a no-op
        b0 = spark.read.parquet(os.path.join(out, "batch_id=0"))
        assert write_batch_exactly_once(b0, 0, out) is False
        rows = (
            read_committed(spark, out)
            .groupBy("event_type")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.round(F.sum("value"), 2).alias("sum_v"),
            )
            .collect()
        )
        return local_result(spark, rows, "event_type string, n bigint, sum_v double")
    finally:
        shutil.rmtree(d, ignore_errors=True)


EXACTLY_ONCE_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_v
FROM events
GROUP BY event_type
"""


def streaming_late_drop_replay(spark: SparkSession, sf: str) -> DataFrame:
    """WATERMARK SEMANTICS under the oracle gate — the strongest streaming
    proof in the inventory. Three pinned micro-batches:

      batch 1: the real events (watermark still at epoch DURING the batch
               — Spark applies a batch's max event time one batch later);
      batch 2: copies of the LAST hour's rows — they advance nothing
               visible (their window's end exceeds the final watermark,
               so it never emits) but they make the Jan-30 watermark
               EFFECTIVE, evicting + emitting every closed window;
      batch 3: copies of the FIRST hour's rows — textbook late data.
               Their windows were already emitted and evicted; the rows
               must vanish (watermark drop / evict-without-reemit).

    Append mode then emitted exactly: original rows only, windows whose
    end ≤ max(ts) - 1h — which is precisely what the oracle computes from
    the base table. Any late-row leak, double emission, or missed
    eviction changes a count and breaks the hash."""
    import glob
    import time as _time

    d = tempfile.mkdtemp(prefix="late_replay_")
    table = f"replay_{uuid.uuid4().hex[:8]}"
    try:
        ev = load_table(spark, sf, "events").select("ts", "event_type", "value")
        first_hour = ev.agg(F.date_trunc("hour", F.min("ts")).alias("h0")).first()["h0"]
        last_hour = ev.agg(F.date_trunc("hour", F.max("ts")).alias("hl")).first()["hl"]
        late = ev.filter(F.date_trunc("hour", F.col("ts")) == first_hour)
        advance = ev.filter(F.date_trunc("hour", F.col("ts")) == last_hour)
        src = os.path.join(d, "src")
        os.makedirs(src)
        now = _time.time()
        for i, b in enumerate((ev, advance, late)):
            tmp = os.path.join(d, f"w{i}")
            b.coalesce(1).write.parquet(tmp)
            (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
            dst = os.path.join(src, f"{i:02d}.parquet")
            os.rename(part, dst)
            # FileStreamSource orders batches by modification time — pin it
            os.utime(dst, (now - 300 + i * 100, now - 300 + i * 100))

        stream = (
            spark.readStream.schema("ts timestamp, event_type string, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = (
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
        q = (
            agg.writeStream.format("memory")
            .queryName(table)
            .outputMode("append")  # append: only watermark-closed windows emit
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table(table).collect()
        return local_result(spark, 
            rows, "win_start string, event_type string, n bigint, sum_value double"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


STREAMING_LATE_DROP_SQL = f"""
WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events)
SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS win_start,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events, wm
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm.w
GROUP BY 1, 2
"""


QUERIES: dict[str, QuerySpec] = {
    "streaming_window_replay": QuerySpec(streaming_window_replay, STREAMING_WINDOW_SQL),
    "streaming_session_replay": QuerySpec(streaming_session_replay, STREAMING_SESSION_SQL),
    "streaming_dedup_replay": QuerySpec(streaming_dedup_replay, STREAMING_DEDUP_SQL),
    "exactly_once_replay": QuerySpec(exactly_once_replay, EXACTLY_ONCE_SQL),
    "streaming_late_drop_replay": QuerySpec(
        streaming_late_drop_replay, STREAMING_LATE_DROP_SQL
    ),
    "streaming_join_replay": QuerySpec(None, None),  # bound below
}


def streaming_join_replay(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream interval join (streaming/joins.stream_stream_join)
    under the oracle gate: clicks and purchases run as two real streams,
    inner-joined on user within [click_ts, click_ts + 10 min]. On a
    bounded replay an inner interval join must emit EXACTLY the batch
    join's pairs — state buffering and eviction are result-invisible. The
    oracle is the plain SQL interval self-join."""
    from ..streaming.joins import stream_stream_join

    d = tempfile.mkdtemp(prefix="sjoin_replay_")
    table = f"replay_{uuid.uuid4().hex[:8]}"
    try:
        ev = load_table(spark, sf, "events")
        sides = {}
        for name, et in (("l", "click"), ("r", "purchase")):
            path = os.path.join(d, name)
            (
                ev.filter(F.col("event_type") == et)
                .select(
                    F.col("user_id").cast("string").alias("h"),
                    "ts",
                    F.col("event_id").cast("string").alias("payload"),
                )
                .write.parquet(path)
            )
            sides[name] = spark.readStream.schema(
                "h string, ts timestamp, payload string"
            ).parquet(path)
        joined = stream_stream_join(
            sides["l"], sides["r"], max_skew="10 minutes", watermark="1 hour"
        ).select(
            "h",
            fmt_ts(F.col("l_ts"), "click_ts"),
            F.col("l_payload").alias("click_id"),
            fmt_ts(F.col("r_ts"), "purchase_ts"),
            F.col("r_payload").alias("purchase_id"),
        )
        q = (
            joined.writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table(table).collect()
        return local_result(spark, 
            rows,
            "h string, click_ts string, click_id string, "
            "purchase_ts string, purchase_id string",
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


STREAMING_JOIN_SQL = f"""
SELECT CAST(c.user_id AS VARCHAR) AS h,
       strftime(c.ts, '{TS_FMT_DUCK}') AS click_ts,
       CAST(c.event_id AS VARCHAR) AS click_id,
       strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
       CAST(p.event_id AS VARCHAR) AS purchase_id
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""

QUERIES["streaming_join_replay"] = QuerySpec(streaming_join_replay, STREAMING_JOIN_SQL)


def streaming_enrich_replay(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static enrichment (streaming/joins.stream_static_enrich)
    under the oracle gate: the events stream left-joins a broadcast static
    user-segment dim per micro-batch; on a bounded replay the per-segment
    rollup must equal the batch left join. The stream side never shuffles
    — the audit story is the broadcast, pinned here by the hash."""
    from ..streaming.joins import stream_static_enrich

    d = tempfile.mkdtemp(prefix="enrich_replay_")
    table = f"replay_{uuid.uuid4().hex[:8]}"
    try:
        src = os.path.join(d, "src")
        ev = load_table(spark, sf, "events").select(
            F.col("user_id").cast("string").alias("h"), "value"
        )
        ev.write.parquet(src)
        dim = spark.range(0, 2000).select(
            F.col("id").cast("string").alias("h"),
            F.concat(F.lit("seg_"), (F.col("id") % 5).cast("string")).alias("segment"),
        )
        stream = spark.readStream.schema("h string, value double").parquet(src)
        enriched = stream_static_enrich(stream, dim).groupBy("segment").agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_v")
        )
        q = (
            enriched.writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table(table).collect()
        return local_result(spark, rows, "segment string, n bigint, sum_v double")
    finally:
        shutil.rmtree(d, ignore_errors=True)


STREAMING_ENRICH_SQL = """
WITH dim AS (
    SELECT CAST(i AS VARCHAR) AS h, 'seg_' || CAST(i % 5 AS VARCHAR) AS segment
    FROM range(2000) r(i)
)
SELECT d.segment, CAST(count(*) AS BIGINT) AS n, round(sum(e.value), 2) AS sum_v
FROM events e LEFT JOIN dim d ON CAST(e.user_id AS VARCHAR) = d.h
GROUP BY d.segment
"""

QUERIES["streaming_enrich_replay"] = QuerySpec(
    streaming_enrich_replay, STREAMING_ENRICH_SQL
)


def streaming_wm_dedup_replay(spark: SparkSession, sf: str) -> DataFrame:
    """Spark's built-in dropDuplicatesWithinWatermark under the oracle
    gate: batch 1 = all events (keyed md5(event_id)); batch 2 = copies of
    the LAST hour's rows — inside the 1-hour watermark horizon, so their
    keys are still in state and every copy must be suppressed. Output =
    exactly one row per event, which is the oracle's SELECT DISTINCT."""
    import glob
    import time as _time

    d = tempfile.mkdtemp(prefix="wmdedup_replay_")
    table = f"replay_{uuid.uuid4().hex[:8]}"
    try:
        from ..streaming.joins import watermark_dedup

        ev = load_table(spark, sf, "events").select(
            F.md5(F.col("event_id").cast("string")).alias("h"),
            F.col("ts"),
            F.col("event_type").alias("payload"),
        )
        last_hour = ev.agg(F.date_trunc("hour", F.max("ts")).alias("hl")).first()["hl"]
        dups = ev.filter(F.date_trunc("hour", F.col("ts")) == last_hour)
        src = os.path.join(d, "src")
        os.makedirs(src)
        now = _time.time()
        for i, b in enumerate((ev, dups)):
            tmp = os.path.join(d, f"w{i}")
            b.coalesce(1).write.parquet(tmp)
            (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
            dst = os.path.join(src, f"{i:02d}.parquet")
            os.rename(part, dst)
            os.utime(dst, (now - 200 + i * 100, now - 200 + i * 100))
        stream = (
            spark.readStream.schema("h string, ts timestamp, payload string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        deduped = watermark_dedup(stream, key="h", watermark="1 hour").select(
            "h", "payload"
        )
        q = (
            deduped.writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table(table).collect()
        return local_result(spark, rows, "h string, payload string")
    finally:
        shutil.rmtree(d, ignore_errors=True)


STREAMING_WM_DEDUP_SQL = """
SELECT md5(CAST(event_id AS VARCHAR)) AS h, event_type AS payload
FROM events
"""

QUERIES["streaming_wm_dedup_replay"] = QuerySpec(
    streaming_wm_dedup_replay, STREAMING_WM_DEDUP_SQL
)


def streaming_counter_rate_replay(spark: SparkSession, sf: str) -> DataFrame:
    """The NUMERIC custom-stateful operator (streaming/stateful.py
    streaming_counter_rate) under the oracle gate: counter-increase with
    reset detection whose per-user state (last sample, running totals)
    must survive THREE micro-batch boundaries. The source is sliced into
    three time-ordered files (maxFilesPerTrigger=1 → three batches), so
    ~every user's stream is split across batches and the first delta of
    each later batch is computable only from carried state. The latest
    update-mode emission per user must hash-match the batch window+agg
    twin (analytics2.counter_rate's oracle)."""
    import glob

    from pyspark.sql import Window  # noqa: F811 — local to keep module header lean

    from ..streaming.stateful import streaming_counter_rate

    d = tempfile.mkdtemp(prefix="scrate_replay_")
    try:
        ev = load_table(spark, sf, "events").select(
            "user_id",
            "value",
            F.row_number()
            .over(Window.orderBy("ts", "event_id"))
            .cast("long")
            .alias("seq"),
        )
        n_total = ev.count()
        cut = n_total // 3
        slices = (
            ev.filter(F.col("seq") <= cut),
            ev.filter((F.col("seq") > cut) & (F.col("seq") <= 2 * cut)),
            ev.filter(F.col("seq") > 2 * cut),
        )
        src = os.path.join(d, "src")
        os.makedirs(src)
        for i, b in enumerate(slices):
            tmp = os.path.join(d, f"w{i}")
            b.select("user_id", "seq", "value").coalesce(1).write.parquet(tmp)
            (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
            os.rename(part, os.path.join(src, f"{i:02d}.parquet"))

        stream = (
            spark.readStream.schema("user_id long, seq long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        table = f"replay_{uuid.uuid4().hex[:8]}"
        q = (
            streaming_counter_rate(stream)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        wlast = Window.partitionBy("user_id").orderBy(F.col("n_samples").desc())
        rows = (
            spark.table(table)
            .withColumn("rk", F.row_number().over(wlast))
            .filter(F.col("rk") == 1)
            .select(
                "user_id",
                F.round("total_increase", 2).alias("total_increase"),
                "n_resets",
                "n_samples",
            )
            .collect()
        )
        return local_result(spark, 
            rows,
            "user_id long, total_increase double, n_resets long, n_samples long",
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


STREAMING_COUNTER_RATE_SQL = """
WITH d AS (
  SELECT user_id,
         value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT user_id,
       round(sum(CASE WHEN prev IS NULL THEN 0
                      WHEN value >= prev THEN value - prev
                      ELSE value END), 2) AS total_increase,
       CAST(sum(CASE WHEN prev IS NOT NULL AND value < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
       count(*) AS n_samples
FROM d GROUP BY user_id
"""

QUERIES["streaming_counter_rate_replay"] = QuerySpec(
    streaming_counter_rate_replay, STREAMING_COUNTER_RATE_SQL
)


def streaming_topk_replay(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming top-k (the live-dashboard staple): hourly event-type
    counts as the ONE stateful streaming aggregation, then the top-3
    types per window ranked batch-side over the memory sink (a rank
    cannot live inside the stream above an aggregation — Spark allows a
    single stateful operator per streaming query, so the production shape
    is exactly this: windowed counts in the stream, rank in the serving
    layer). Final ranking must hash-match the batch twin."""
    from pyspark.sql import Window

    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(fmt_ts(F.col("w.start"), "win_start"), "event_type", "n")
        )

    def post(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("win_start").orderBy(
            F.col("n").desc(), F.col("event_type")
        )
        return (
            df.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= 3)
        )

    return _replay(
        spark, sf, transform,
        "win_start string, event_type string, n bigint, rk bigint",
        post=post,
    )


STREAMING_TOPK_SQL = f"""
WITH hourly AS (
  SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS win_start,
         event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT win_start, event_type, n, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY win_start
                               ORDER BY n DESC, event_type) AS rk
  FROM hourly)
WHERE rk <= 3
"""

QUERIES["streaming_topk_replay"] = QuerySpec(
    streaming_topk_replay, STREAMING_TOPK_SQL
)


def streaming_m4_replay(spark: SparkSession, sf: str) -> DataFrame:
    """M4 downsampling AS A STREAM (round-3 downsample_m4's streaming
    twin): first/last/min/max per hourly window per event_type are all
    monoid aggregates, so the dashboard downsample runs incrementally
    under a watermark with bounded state — final values must hash-match
    the batch M4 table. The live-charting shape: the sink holds 4 points
    per (type, hour) whatever the ingest volume."""

    def transform(stream: DataFrame) -> DataFrame:
        cents = F.round(F.col("value") * 100).cast("long")
        tkey = (F.unix_micros("ts") % 3_600_000_000) * 2_097_152 + F.col("event_id")
        return (
            stream.select(
                "event_type", "ts", cents.alias("cents"), tkey.alias("tkey")
            )
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").cast("long").alias("n_raw"),
                F.min_by("cents", "tkey").cast("long").alias("first_cents"),
                F.max_by("cents", "tkey").cast("long").alias("last_cents"),
                F.min("cents").cast("long").alias("min_cents"),
                F.max("cents").cast("long").alias("max_cents"),
            )
            .select(
                fmt_ts(F.col("w.start"), "win_start"), "event_type", "n_raw",
                "first_cents", "last_cents", "min_cents", "max_cents",
            )
        )

    return _replay(
        spark, sf, transform,
        "win_start string, event_type string, n_raw bigint, first_cents bigint, "
        "last_cents bigint, min_cents bigint, max_cents bigint",
    )


STREAMING_M4_SQL = f"""
WITH base AS (
  SELECT event_type, strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS win_start,
         CAST(round(value * 100) AS BIGINT) AS cents,
         (epoch_us(ts) % 3600000000) * 2097152 + event_id AS tkey
  FROM events
)
SELECT win_start, event_type,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(min_by(cents, tkey) AS BIGINT) AS first_cents,
       CAST(max_by(cents, tkey) AS BIGINT) AS last_cents,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents
FROM base
GROUP BY win_start, event_type
"""

QUERIES["streaming_m4_replay"] = QuerySpec(
    streaming_m4_replay, STREAMING_M4_SQL,
    "M4 downsample as a watermarked stream == batch M4 table",
)


def streaming_cdc_latest_replay(spark: SparkSession, sf: str) -> DataFrame:
    """CDC keep-latest AS A STREAM (analytics13.cdc_keep_latest's
    streaming twin): per (user_id, event_type) the latest version under
    the unique (ts, event_id) order, maintained incrementally as max_by
    over a packed version key — a monoid, so the stream needs ONE
    stateful aggregation and state stays one row per key. The change
    stream every CDC consumer materializes."""

    def transform(stream: DataFrame) -> DataFrame:
        cents = F.round(F.col("value") * 100).cast("long")
        # one BIGINT version key on the ms grid with a 2020 epoch base:
        # raw us * 2^21 overflows BIGINT; (ms - base) * 1e7 + event_id
        # stays < 2^61 for decades of data and 10M events/ms-tie
        vkey = (
            F.unix_millis("ts") - F.lit(1_577_836_800_000)
        ) * 10_000_000 + F.col("event_id")
        return (
            stream.select(
                "user_id", "event_type", "event_id", cents.alias("cents"),
                vkey.alias("vkey"),
            )
            .groupBy("user_id", "event_type")
            .agg(
                F.max_by("event_id", "vkey").cast("long").alias("latest_event_id"),
                F.max_by("cents", "vkey").cast("long").alias("latest_cents"),
                F.count("*").cast("long").alias("n_versions"),
            )
        )

    return _replay(
        spark, sf, transform,
        "user_id long, event_type string, latest_event_id long, "
        "latest_cents long, n_versions long",
    )


STREAMING_CDC_SQL = """
SELECT user_id, event_type,
       CAST(max_by(event_id, (epoch_ms(ts) - 1577836800000) * 10000000 + event_id) AS BIGINT) AS latest_event_id,
       CAST(max_by(CAST(round(value * 100) AS BIGINT), (epoch_ms(ts) - 1577836800000) * 10000000 + event_id) AS BIGINT) AS latest_cents,
       CAST(count(*) AS BIGINT) AS n_versions
FROM events
GROUP BY user_id, event_type
"""

QUERIES["streaming_cdc_latest_replay"] = QuerySpec(
    streaming_cdc_latest_replay, STREAMING_CDC_SQL,
    "CDC keep-latest as one monoid streaming aggregation",
)


def streaming_sip_asr_replay(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's real-time promise delivered: live SIP
    answer-seizure-ratio per trunk (voip_q.sip_response_class_rates as a
    stream) — planted final codes folded into per-trunk counters, all
    monoid, one stateful aggregation, ASR computed at the sink. The
    capture store's live dashboard over the same frames it persists
    (hepop.js:996-1014 receives; this is the analytics it never had)."""

    def transform(stream: DataFrame) -> DataFrame:
        codes = [200, 200, 200, 200, 486, 503, 200, 404, 480, 200]
        code = F.element_at(
            F.array(*[F.lit(c) for c in codes]),
            (F.col("event_id") % 10 + 1).cast("int"),
        )
        return (
            stream.filter(F.col("event_id") < 3000)
            .select((F.col("user_id") % 20).alias("trunk"), code.alias("final_code"))
            .groupBy("trunk")
            .agg(
                F.count("*").cast("long").alias("calls"),
                F.sum(F.when(F.col("final_code") == 200, 1).otherwise(0))
                .cast("long").alias("answered"),
            )
        )

    def post(df: DataFrame) -> DataFrame:
        return df.select(
            F.col("trunk").cast("long").alias("trunk"), "calls", "answered",
            F.round(F.col("answered") / F.col("calls"), 6).alias("asr"),
        )

    return _replay(
        spark, sf, transform,
        "trunk long, calls long, answered long, asr double",
        post=post,
    )


STREAMING_ASR_SQL = """
WITH d AS (
  SELECT user_id % 20 AS trunk,
         ([200, 200, 200, 200, 486, 503, 200, 404, 480, 200])[CAST(event_id % 10 + 1 AS INTEGER)] AS final_code
  FROM events WHERE event_id < 3000
)
SELECT CAST(trunk AS BIGINT) AS trunk,
       CAST(count(*) AS BIGINT) AS calls,
       CAST(sum(CASE WHEN final_code = 200 THEN 1 ELSE 0 END) AS BIGINT) AS answered,
       round(sum(CASE WHEN final_code = 200 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS asr
FROM d GROUP BY trunk
"""

QUERIES["streaming_sip_asr_replay"] = QuerySpec(
    streaming_sip_asr_replay, STREAMING_ASR_SQL,
    "live per-trunk SIP ASR as a monoid streaming aggregation",
)
