"""Time-series operators over the `events` stream table (FIXTURES.md F4 —
the HEP-shaped fixture). The reference's only time-series machinery is
10-minute bucket routing (hepop.js:114-132) and time-range pruning
(query.js:22-63); windowed aggregation, sessionization and as-of joins are
north-star extensions, expressed so the same DataFrame code runs under
Structured Streaming with watermarks (see hepop_spark/streaming/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import local_result, load_table
from . import QuerySpec
from .reference_surface import TS_FMT_DUCK, fmt_ts

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour event-time windows via F.window — same operator the
    streaming pipeline uses with a watermark; aligned to epoch so it equals
    date_trunc('hour')."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            fmt_ts(F.col("w.start"), "win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


TUMBLING_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS win_start,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


def sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes: F.window explodes each event
    into the 2 windows covering it. The oracle reproduces the explosion with
    a UNION ALL of the two candidate window starts."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        # grid-stabilized avg: round(sum,2) lands on the 0.01 grid (stable
        # under summation-order noise), then the division is bit-identical
        # in both engines — a raw avg() of 2^k values can sit exactly on a
        # rounding midpoint and flip the last digit per engine.
        .agg(
            F.count("*").alias("n"),
            (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
        )
        .select(fmt_ts(F.col("w.start"), "win_start"), "n", "avg_value")
    )


SLIDING_SQL = f"""
WITH starts AS (
  SELECT ts, value,
         to_timestamp(floor(epoch(ts) / 1800) * 1800) AS s0
  FROM events
), exploded AS (
  SELECT s0 AS win_start, value FROM starts
  UNION ALL
  SELECT s0 - INTERVAL 30 MINUTE AS win_start, value FROM starts
)
SELECT strftime(win_start, '{TS_FMT_DUCK}') AS win_start,
       count(*) AS n, (round(sum(value), 2) / count(*)) AS avg_value
FROM exploded
GROUP BY 1
"""


def session_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) as gaps-and-islands: a lag()
    to mark session starts, a running sum to number sessions, then a
    per-session rollup. Batch twin of streaming session_window(); both
    shuffles are on user_id, so the operator scales with user cardinality."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.col("ts_us") - F.lag("ts_us").over(w)
    marked = ev.withColumn("ts_us", F.unix_micros("ts")).withColumn(
        "new_sess",
        F.when(gap_us.isNull() | (gap_us > SESSION_GAP_US), 1).otherwise(0),
    )
    numbered = marked.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        numbered.groupBy("user_id", "sess_id")
        .agg(
            fmt_ts(F.min("ts"), "sess_start"),
            F.count("*").alias("n_events"),
            ((F.max("ts_us") - F.min("ts_us")) / 1_000_000.0).alias("dur_s_raw"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sess_id").cast("long").alias("sess_id"),
            "sess_start",
            "n_events",
            F.round("dur_s_raw", 3).alias("dur_s"),
            "sum_value",
        )
    )


SESSION_SQL = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM marked
)
SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
       strftime(min(ts), '{TS_FMT_DUCK}') AS sess_start,
       count(*) AS n_events,
       round((max(ts_us) - min(ts_us)) / 1000000.0, 3) AS dur_s,
       round(sum(value), 2) AS sum_value
FROM numbered
GROUP BY user_id, sess_id
"""


def asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: for each purchase, the most recent click by the same user
    at or before the purchase time. Spark lacks a native ASOF join; the
    scalable composition is a union of both sides ordered by time with
    last(..., ignorenulls) — one shuffle on user_id, no range cross-join.
    The oracle uses DuckDB's native ASOF LEFT JOIN."""
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_p")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_p")
    )
    both = purchases.unionByName(clicks).withColumn(
        "click_ts", F.when(F.col("is_p") == 0, F.col("ts"))
    )
    # clicks sort before purchases at identical ts (is_p ascending), so an
    # equal-timestamp click is visible to the purchase — ASOF's `>=` bound.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        both.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .select(
            "event_id",
            "user_id",
            fmt_ts(F.col("ts"), "purchase_ts"),
            fmt_ts(F.col("last_click_ts"), "click_ts"),
        )
    )


ASOF_SQL = f"""
SELECT p.event_id AS event_id, p.user_id AS user_id,
       strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
       strftime(c.ts, '{TS_FMT_DUCK}') AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def time_bucket_10min(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's 10-minute bucket routing (hepop.js:114-132:
    `minute = floor(m/10)*10`) expressed as a query-time rollup — the same
    expression the partitioned writer uses for directory layout."""
    ev = load_table(spark, sf, "events")
    bucket = F.date_trunc("hour", F.col("ts")) + F.make_interval(
        mins=(F.floor(F.minute("ts") / 10) * 10).cast("int")
    )
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(fmt_ts(F.col("bucket"), "bucket"), "n")
    )


TIME_BUCKET_SQL = f"""
SELECT strftime(date_trunc('hour', ts) + INTERVAL (floor(minute(ts) / 10) * 10) MINUTE,
                '{TS_FMT_DUCK}') AS bucket,
       count(*) AS n
FROM events
GROUP BY 1
"""


def first_last_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user first/last event by time (min_by/max_by ordering agg) — the
    standard latest-state-per-key operator for log/metric tables."""
    ev = load_table(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", "ts").alias("first_type"),
        F.max_by("event_type", "ts").alias("last_type"),
        fmt_ts(F.min("ts"), "first_ts"),
        fmt_ts(F.max("ts"), "last_ts"),
    )


FIRST_LAST_SQL = f"""
SELECT user_id,
       min_by(event_type, ts) AS first_type,
       max_by(event_type, ts) AS last_type,
       strftime(min(ts), '{TS_FMT_DUCK}') AS first_ts,
       strftime(max(ts), '{TS_FMT_DUCK}') AS last_ts
FROM events
GROUP BY user_id
"""


def histogram_fixed_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width value histogram (width 5) — single shuffle on bin id."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 5).cast("long").alias("bin"))
        .agg(F.count("*").alias("n"))
    )


HISTOGRAM_SQL = """
SELECT CAST(floor(value / 5) AS BIGINT) AS bin, count(*) AS n
FROM events GROUP BY 1
"""


def resample_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-filled hourly resample: a dense hour × event_type grid built with
    sequence()/explode, left-joined against the hourly aggregate, missing
    cells zero-filled — the hypertable `time_bucket_gapfill` operator.
    The grid is tiny (hours × types) and broadcast; the fact side aggregates
    before the join, so the shuffle is on the small aggregate."""
    ev = load_table(spark, sf, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_v"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = (
        bounds.select(
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h")
        )
        .crossJoin(ev.select("event_type").distinct())
    )
    return (
        grid.join(hourly, ["h", "event_type"], "left")
        .select(
            fmt_ts(F.col("h"), "hour"),
            "event_type",
            F.coalesce("cnt", F.lit(0)).alias("n"),
            F.coalesce("sum_v", F.lit(0.0)).alias("sum_value"),
        )
    )


RESAMPLE_GAPFILL_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS cnt, round(sum(value), 2) AS sum_v
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1 FROM events
), grid AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
), full_grid AS (
  SELECT g.h, t.event_type FROM grid g CROSS JOIN (SELECT DISTINCT event_type FROM events) t
)
SELECT strftime(fg.h, '{TS_FMT_DUCK}') AS hour, fg.event_type,
       coalesce(cnt, 0) AS n, coalesce(sum_v, 0.0) AS sum_value
FROM full_grid fg
LEFT JOIN hourly ON fg.h = hourly.h AND fg.event_type = hourly.event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "resample_gapfill": QuerySpec(resample_gapfill, RESAMPLE_GAPFILL_SQL),
    "tumbling_window": QuerySpec(tumbling_window, TUMBLING_SQL),
    "sliding_window": QuerySpec(sliding_window, SLIDING_SQL),
    "session_windows": QuerySpec(session_windows, SESSION_SQL),
    "asof_join": QuerySpec(asof_join, ASOF_SQL),
    "time_bucket_10min": QuerySpec(time_bucket_10min, TIME_BUCKET_SQL),
    "first_last_agg": QuerySpec(first_last_agg, FIRST_LAST_SQL),
    "histogram_fixed_bins": QuerySpec(histogram_fixed_bins, HISTOGRAM_SQL),
}


def rollup_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """The incremental rollup (storage/rollup.py) exercised through the
    judged inventory: ingest the events table in two batch halves into a
    fresh rollup directory, then serve it back. Because count/sum/min/max
    are monoids, the two-batch incremental result must hash-match the
    oracle's DIRECT single-pass aggregation — the equivalence IS the
    contract being judged."""
    import shutil
    import tempfile

    from ..storage.rollup import read_rollup, rollup_batch

    # Bounded slice (1 day = 24 hour-partitions): the incremental merge
    # is built for micro-batches touching few hours; a full-corpus backfill
    # through per-hour dynamic overwrite would write hundreds of tiny
    # partitions twice and benchmark the filesystem, not the operator.
    ev = load_table(spark, sf, "events").filter(
        F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp")
    )
    rdir = tempfile.mkdtemp(prefix="rollup_q_")
    shutil.rmtree(rdir, ignore_errors=True)
    # two batches split by event id parity: every hour gets data from both
    rollup_batch(spark, rdir, ev.filter(F.col("event_id") % 2 == 0))
    rollup_batch(spark, rdir, ev.filter(F.col("event_id") % 2 == 1))
    out = read_rollup(spark, rdir).select(
        "hour_bucket",
        F.col("k").alias("event_type"),
        F.col("n").cast("long").alias("n"),
        F.round("sum_v", 2).alias("sum_v"),
        F.round("min_v", 2).alias("min_v"),
        F.round("max_v", 2).alias("max_v"),
    )
    # materialize before returning: the temp dir must outlive lazy execution,
    # so pin the result (small: hours x types) and drop the files
    rows = out.collect()
    shutil.rmtree(rdir, ignore_errors=True)
    return local_result(spark, rows, out.schema)


ROLLUP_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d-%H') AS hour_bucket,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_v,
       round(min(value), 2) AS min_v,
       round(max(value), 2) AS max_v
FROM events
WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
GROUP BY 1, 2
"""


QUERIES["rollup_hourly"] = QuerySpec(rollup_hourly, ROLLUP_HOURLY_SQL)
