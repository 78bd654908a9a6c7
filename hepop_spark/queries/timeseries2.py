"""Round-3 time-series/ops batch two: M4 visualization downsampling,
seasonal decomposition residuals, and a partition-skew audit — the
operational views a time-series store (the reference's domain) serves to
dashboards and to its own capacity planner.

Engine-parity rules as established: exact cents grid, min_by/max_by under
unique BIGINT keys, integer sums with one terminal division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# downsample_m4 — M4 min/max/first/last per pixel-bucket
# ---------------------------------------------------------------------------


def downsample_m4(spark: SparkSession, sf: str) -> DataFrame:
    """M4 downsampling (the visualization-lossless aggregation: per time
    bucket keep first, last, min, max — what a dashboard needs to render
    the exact same pixel line from 4 points per bucket instead of
    thousands): per event_type per hour on the cents grid, every selector
    under a unique BIGINT (us-into-hour, event_id) key so ties are
    engine-identical.

    Scale: ONE partial-aggregated groupBy — min/max/min_by/max_by are all
    monoid aggregates; no window, no sort, no per-group collect."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    us_into_hour = (
        F.unix_micros("ts") % 3_600_000_000
    )
    tkey = us_into_hour * 2_097_152 + F.col("event_id")  # << 21 packs id
    vkey = cents * 2_097_152 + F.col("event_id")
    base = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        cents.alias("cents"),
        tkey.alias("tkey"),
        vkey.alias("vkey"),
    )
    return (
        base.groupBy("event_type", "hour")
        .agg(
            F.count("*").cast("long").alias("n_raw"),
            F.min_by("cents", "tkey").cast("long").alias("first_cents"),
            F.max_by("cents", "tkey").cast("long").alias("last_cents"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
        .orderBy("event_type", "hour")
    )


M4_SQL = """
WITH base AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(round(value * 100) AS BIGINT) AS cents,
         (epoch_us(ts) % 3600000000) * 2097152 + event_id AS tkey
  FROM events
)
SELECT event_type, hour,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(min_by(cents, tkey) AS BIGINT) AS first_cents,
       CAST(max_by(cents, tkey) AS BIGINT) AS last_cents,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents
FROM base
GROUP BY event_type, hour
ORDER BY event_type, hour
"""


# ---------------------------------------------------------------------------
# seasonal_residual_stats — seasonal-naive decomposition residuals
# ---------------------------------------------------------------------------


def seasonal_residual_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal-naive decomposition: residual = value − hour-of-day mean
    (the seasonal component) per event_type; per (event_type, date) report
    integer-exact residual mean and the count of |residual| > 2·global-std
    outliers — the "is today unusual, net of time-of-day?" panel.

    All on the cents grid: hourly means are exact-integer ratios carried
    as (sum, n) pairs so the residual sum stays a single-division exact
    quantity: sum(cents·n_h − sum_h)/(n·n_h) per group needs per-row
    denominators — instead residuals are computed per hour-slot group
    where n_h is constant, then combined as exact fractions over a common
    e6 grid (floor to micro-cents, deterministic).

    Scale: two bounded-key aggregations (24·|types| slots; |types|·days
    output) with a broadcast of the slot means."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    base = ev.select(
        "event_type",
        F.hour("ts").alias("hod"),
        F.to_date("ts").alias("date"),
        cents.alias("cents"),
    )
    slot = base.groupBy("event_type", "hod").agg(
        F.sum("cents").alias("sum_h"), F.count("*").alias("n_h")
    )
    # residual in micro-cents, floored: exact integer on both engines
    resid_e6 = F.floor(
        (F.col("cents") * F.col("n_h") - F.col("sum_h")) * 1_000_000 / F.col("n_h")
    )
    joined = base.join(F.broadcast(slot), ["event_type", "hod"]).withColumn(
        "r_e6", resid_e6
    )
    return (
        joined.groupBy("event_type", "date")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("r_e6").cast("long").alias("sum_resid_e6"),
            F.max("r_e6").cast("long").alias("max_resid_e6"),
            F.min("r_e6").cast("long").alias("min_resid_e6"),
        )
        .orderBy("event_type", "date")
    )


SEASONAL_SQL = """
WITH base AS (
  SELECT event_type, hour(ts) AS hod, CAST(ts AS DATE) AS date,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), slot AS (
  SELECT event_type, hod, sum(cents) AS sum_h, count(*) AS n_h
  FROM base GROUP BY 1, 2
), joined AS (
  SELECT b.event_type, b.date,
         CAST(floor((b.cents * s.n_h - s.sum_h) * 1000000.0 / s.n_h) AS BIGINT) AS r_e6
  FROM base b JOIN slot s ON b.event_type = s.event_type AND b.hod = s.hod
)
SELECT event_type, date, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(r_e6) AS BIGINT) AS sum_resid_e6,
       CAST(max(r_e6) AS BIGINT) AS max_resid_e6,
       CAST(min(r_e6) AS BIGINT) AS min_resid_e6
FROM joined
GROUP BY event_type, date
ORDER BY event_type, date
"""


# ---------------------------------------------------------------------------
# partition_skew_stats — shuffle/storage skew audit
# ---------------------------------------------------------------------------


def partition_skew_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-skew audit over the natural partition keys a time-series
    store shards by (date, and the 10-minute bucket inside it): rows per
    date, each date's share, and the skew factor (date rows / mean rows
    per date) — the table that decides salting and AQE thresholds before
    a backfill. Exact integers, single divisions.

    Scale: one bounded-key aggregate + a broadcast scalar; this audit is
    itself the cheap pre-pass a planner runs before the expensive job."""
    ev = load_table(spark, sf, "events")
    per_date = ev.groupBy(F.to_date("ts").alias("date")).agg(
        F.count("*").alias("n")
    )
    tot = per_date.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_dates")
    )
    return (
        per_date.crossJoin(F.broadcast(tot))
        .select(
            "date",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(F.col("n") * F.col("n_dates") / F.col("total"), 4).alias("skew_factor"),
        )
        .orderBy("date")
    )


SKEW_SQL = """
WITH per_date AS (
  SELECT CAST(ts AS DATE) AS date, count(*) AS n FROM events GROUP BY 1
), tot AS (SELECT sum(n) AS total, count(*) AS n_dates FROM per_date)
SELECT date, CAST(n AS BIGINT) AS n,
       round(n * 1.0 / total, 6) AS share,
       round(n * 1.0 * n_dates / total, 4) AS skew_factor
FROM per_date, tot
ORDER BY date
"""


QUERIES: dict[str, QuerySpec] = {
    "downsample_m4": QuerySpec(
        downsample_m4, M4_SQL,
        "M4 first/last/min/max per bucket — dashboard-lossless downsample",
    ),
    "seasonal_residual_stats": QuerySpec(
        seasonal_residual_stats, SEASONAL_SQL,
        "seasonal-naive residuals per day on an exact micro-cents grid",
    ),
    "partition_skew_stats": QuerySpec(
        partition_skew_stats, SKEW_SQL,
        "partition-skew audit: per-date share and skew factor",
    ),
}
