"""Round-4 closing analytics trio: conversion-delay distributions,
order-fulfillment SLA accounting, and sessionized bounce rates — the
three remaining product/ops report shapes (time-to-event, SLA
attainment, engagement quality) the earlier funnel/session entries
count but do not time.

Reference scope: the reference (hepop.js) delegates SQL and ships no
analytics; these are the graduated surface per SURVEY §2's negative
space. Engine-parity rules as established: exact integer second/day
deltas, DISCRETE order-statistic percentiles under unique total orders,
one terminal division, no float rounding before comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# funnel_time_to_convert — signup -> first purchase delay distribution
# ---------------------------------------------------------------------------


def funnel_time_to_convert(spark: SparkSession, sf: str) -> DataFrame:
    """Time-to-convert: per signup cohort month, the DISCRETE p50/p90 of
    (first purchase − first signup) in whole seconds, over users who
    converted after signing up — the report that turns the funnel COUNT
    (funnel_signup_purchase) into a latency distribution. Discrete
    percentiles are the value at rank ceil(q*n) under the unique
    (delay_s, user_id) order, so both engines agree exactly.

    Scale: two per-user min-aggregations share one user_id shuffle; the
    percentile window partitions on the bounded cohort-month key over
    converted users only."""
    ev = load_table(spark, sf, "events")
    first = (
        ev.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s_ts"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
                "p_ts"
            ),
        )
        .filter(F.col("s_ts").isNotNull() & (F.col("p_ts") > F.col("s_ts")))
    )
    conv = first.select(
        "user_id",
        F.date_format("s_ts", "yyyy-MM").alias("cohort"),
        ((F.unix_micros("p_ts") - F.unix_micros("s_ts")) / 1_000_000)
        .cast("long")
        .alias("delay_s"),
    )
    w = Window.partitionBy("cohort").orderBy("delay_s", "user_id")
    wn = Window.partitionBy("cohort")
    ranked = conv.withColumn("i", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    pick = lambda q: F.min(  # noqa: E731
        F.when(F.col("i") * 100 >= F.ceil(F.col("n") * q * 100), F.col("delay_s"))
    ).cast("long")
    return (
        ranked.groupBy("cohort")
        .agg(
            F.count("*").cast("long").alias("n_converted"),
            pick(0.5).alias("p50_delay_s"),
            pick(0.9).alias("p90_delay_s"),
        )
        .orderBy("cohort")
    )


TIME_TO_CONVERT_SQL = """
WITH first AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
  FROM events
  WHERE event_type IN ('signup', 'purchase')
  GROUP BY user_id
),
conv AS (
  SELECT user_id, strftime(s_ts, '%Y-%m') AS cohort,
         (epoch_us(p_ts) - epoch_us(s_ts)) // 1000000 AS delay_s
  FROM first
  WHERE s_ts IS NOT NULL AND p_ts > s_ts
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY cohort ORDER BY delay_s, user_id) AS i,
         count(*) OVER (PARTITION BY cohort) AS n
  FROM conv
)
SELECT cohort, CAST(count(*) AS BIGINT) AS n_converted,
       CAST(min(CASE WHEN i * 100 >= ceil(n * 0.5 * 100) THEN delay_s END) AS BIGINT) AS p50_delay_s,
       CAST(min(CASE WHEN i * 100 >= ceil(n * 0.9 * 100) THEN delay_s END) AS BIGINT) AS p90_delay_s
FROM ranked
GROUP BY cohort
ORDER BY cohort
"""


# ---------------------------------------------------------------------------
# order_fulfillment_sla — order -> last ship lag SLA attainment
# ---------------------------------------------------------------------------

SLA_DAYS = (30, 60, 90)


def order_fulfillment_sla(spark: SparkSession, sf: str) -> DataFrame:
    """Fulfillment SLA: per order priority, the share of orders fully
    shipped (LAST line shipped) within 30/60/90 days of order date, plus
    the exact integer mean lag in days — the operations panel behind
    TPC-H q4's count. Day arithmetic via datediff is exact; the share is
    emitted as an integer basis-point value (one terminal div) so no
    float rounding can flip.

    Scale: one orders↔lineitem join shuffling on the order key with the
    lineitem side pre-aggregated (max per order — partial-combinable),
    then a groupBy on the 5-value priority key."""
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    last_ship = (
        load_table(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    lag = F.datediff(F.col("last_ship"), F.col("o_orderdate"))
    joined = orders.join(
        last_ship, orders.o_orderkey == last_ship.l_orderkey
    ).select("o_orderpriority", lag.alias("lag_d"))
    aggs = [
        F.sum(F.when(F.col("lag_d") <= d, 1).otherwise(0)).alias(f"w{d}")
        for d in SLA_DAYS
    ]
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("lag_d").alias("sum_lag"), *aggs)
        .select(
            "o_orderpriority",
            F.col("n").cast("long").alias("n_orders"),
            *[
                F.expr(f"w{d} * 10000 div n").cast("long").alias(f"bp_within_{d}d")
                for d in SLA_DAYS
            ],
            F.expr("sum_lag div n").cast("long").alias("mean_lag_days_floor"),
        )
        .orderBy("o_orderpriority")
    )


FULFILLMENT_SLA_SQL = f"""
WITH last_ship AS (
  SELECT l_orderkey, max(l_shipdate) AS last_ship FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o.o_orderpriority,
         datediff('day', o.o_orderdate, s.last_ship) AS lag_d
  FROM orders o JOIN last_ship s ON o.o_orderkey = s.l_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       {", ".join(f"CAST(sum(CASE WHEN lag_d <= {d} THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS bp_within_{d}d" for d in SLA_DAYS)},
       CAST(sum(lag_d) // count(*) AS BIGINT) AS mean_lag_days_floor
FROM j
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# sessionized_bounce_rate — single-event-session share per day
# ---------------------------------------------------------------------------

BOUNCE_GAP_US = 30 * 60 * 1_000_000


def sessionized_bounce_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Bounce rate: sessionize (30-min gap, the session_windows device),
    then per session-start DATE report sessions, bounces (single-event
    sessions), and the bounce share in integer basis points — the
    engagement-quality line every product dashboard pairs with traffic
    counts.

    Scale: the sessionization windows partition on user_id (the same one
    shuffle session_windows uses); the daily rollup is a bounded-key
    groupBy with map-side combine."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    sess = (
        ev.withColumn("ts_us", F.unix_micros("ts"))
        .withColumn(
            "new_sess", F.when(gap.isNull() | (gap > BOUNCE_GAP_US), 1).otherwise(0)
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.to_date(F.min("ts")).alias("d"),
    )
    return (
        per_sess.groupBy("d")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias("n_bounces"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("n_sessions").cast("long").alias("n_sessions"),
            F.col("n_bounces").cast("long").alias("n_bounces"),
            F.expr("n_bounces * 10000 div n_sessions").cast("long").alias("bounce_bp"),
        )
        .orderBy("day")
    )


BOUNCE_SQL = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {BOUNCE_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM marked
),
per_sess AS (
  SELECT user_id, sess_id, count(*) AS n_events, CAST(min(ts) AS DATE) AS d
  FROM sess GROUP BY user_id, sess_id
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS bounce_bp
FROM per_sess
GROUP BY d
ORDER BY day
"""


QUERIES: dict[str, QuerySpec] = {
    "funnel_time_to_convert": QuerySpec(
        funnel_time_to_convert, TIME_TO_CONVERT_SQL,
        "signup -> first-purchase delay distribution per cohort month",
    ),
    "order_fulfillment_sla": QuerySpec(
        order_fulfillment_sla, FULFILLMENT_SLA_SQL,
        "order -> last-ship SLA attainment in basis points per priority",
    ),
    "sessionized_bounce_rate": QuerySpec(
        sessionized_bounce_rate, BOUNCE_SQL,
        "single-event-session share per day in basis points",
    ),
}
