"""Round-2 time-series + data-quality operators over `events` and the TPC-H
star schema. The reference's only time-series machinery is 10-minute bucket
routing (hepop.js:114-132) and time-range pruning (query.js:22-63); the
operators here are the north-star analytics a HEPop user would run on SIP/
metric streams at scale — concurrency sweeps (concurrent calls), counter
rates with reset detection (RTP packet counters), time-weighted averages
(gauge integrals), rolling z-score anomaly flags, EWMA smoothing, and
gaps-and-islands activity streaks — plus a Deequ-style single-scan data-
quality suite and a referential-integrity audit.

Every operator is expressed so the shuffle keys and window partitions stay
bounded per user/type (scales with key cardinality, not row count); the one
inherently sequential sweep is decomposed into a per-day local pass plus a
tiny per-day carry join, so no single task ever sees more than a day of one
event_type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# concurrency_sweep — interval overlap / peak concurrency (sweep line)
# ---------------------------------------------------------------------------


def concurrency_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Peak concurrency per event_type: each event opens an interval of
    `value` minutes; classic sweep line (+1 at start, -1 at end, running
    sum). Scale shape: a single global ordered sweep would serialize one
    task per event_type, so the sweep is two-pass — (1) running sum WITHIN
    each (event_type, day) partition, (2) a per-day carry-in computed from
    the tiny per-day delta totals — giving identical results with
    parallelism = types x days.
    """
    ev = load_table(spark, sf, "events")
    base = ev.select(
        "event_type",
        F.unix_micros("ts").alias("t0"),
        (
            F.unix_micros("ts")
            + F.round(F.col("value") * 60, 0).cast("long") * 1_000_000
        ).alias("t1"),
        "event_id",
    )
    starts = base.select(
        "event_type",
        F.col("t0").alias("t_us"),
        F.lit(1).alias("delta"),
        (F.col("event_id") * 2).alias("uid"),
    )
    ends = base.select(
        "event_type",
        F.col("t1").alias("t_us"),
        F.lit(-1).alias("delta"),
        (F.col("event_id") * 2 + 1).alias("uid"),
    )
    pts = starts.unionAll(ends).withColumn(
        "day", F.floor(F.col("t_us") / F.lit(86_400_000_000))
    )
    w_local = (
        Window.partitionBy("event_type", "day")
        .orderBy("t_us", "delta", "uid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pts.withColumn("run", F.sum("delta").over(w_local))
    per_day = local.groupBy("event_type", "day").agg(
        F.sum("delta").alias("tot"), F.max("run").alias("local_peak")
    )
    w_carry = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = per_day.withColumn(
        "carry", F.coalesce(F.sum("tot").over(w_carry), F.lit(0))
    )
    return carried.groupBy("event_type").agg(
        F.max(F.col("carry") + F.col("local_peak")).cast("long").alias("peak_concurrency")
    )


CONCURRENCY_SQL = """
WITH base AS (
  SELECT event_type,
         epoch_us(ts) AS t0,
         epoch_us(ts) + CAST(round(value * 60, 0) AS BIGINT) * 1000000 AS t1,
         event_id
  FROM events
), pts AS (
  SELECT event_type, t0 AS t_us, 1 AS delta, event_id * 2 AS uid FROM base
  UNION ALL
  SELECT event_type, t1 AS t_us, -1 AS delta, event_id * 2 + 1 AS uid FROM base
), swept AS (
  SELECT event_type,
         sum(delta) OVER (PARTITION BY event_type ORDER BY t_us, delta, uid
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM pts
)
SELECT event_type, CAST(max(run) AS BIGINT) AS peak_concurrency
FROM swept GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# counter_rate — monotonic-counter increase with reset detection
# ---------------------------------------------------------------------------


def counter_rate(spark: SparkSession, sf: str) -> DataFrame:
    """PromQL-`increase`-style counter semantics per user: delta to the
    previous sample, a drop is a counter reset (the post-reset value counts
    in full). One shuffle on user_id; the lag window and the final rollup
    share that partitioning so Catalyst plans a single exchange."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    inc = (
        F.when(prev.isNull(), F.lit(0.0))
        .when(F.col("value") >= prev, F.col("value") - prev)
        .otherwise(F.col("value"))
    )
    reset = F.when(prev.isNotNull() & (F.col("value") < prev), 1).otherwise(0)
    return (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn("inc", inc)
        .withColumn("reset", reset)
        .groupBy("user_id")
        .agg(
            F.round(F.sum("inc"), 2).alias("total_increase"),
            F.sum("reset").cast("long").alias("n_resets"),
            F.count("*").alias("n_samples"),
        )
    )


COUNTER_RATE_SQL = """
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


# ---------------------------------------------------------------------------
# time_weighted_avg — gauge integral (trapezoid-left) per user
# ---------------------------------------------------------------------------


def time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Time-weighted average of `value` per user (left-step integral over
    the observation span) — the InfluxDB/TimescaleDB `time_weight` analog.
    Each sample holds until the next one; users with a single sample are
    excluded (zero span). Same single user_id shuffle as counter_rate."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead(F.unix_micros("ts")).over(w)
    seg = F.col("value") * (nxt - F.unix_micros("ts")) / 1_000_000.0
    return (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn("seg", seg)
        .groupBy("user_id")
        .agg(
            F.sum("seg").alias("area"),
            ((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 1_000_000.0).alias(
                "span_s"
            ),
            F.count("*").alias("n_samples"),
        )
        .filter(F.col("span_s") > 0)
        .select(
            "user_id",
            F.round(F.col("area") / F.col("span_s"), 3).alias("twa"),
            F.round("span_s", 3).alias("span_s"),
            "n_samples",
        )
    )


TWA_SQL = """
WITH d AS (
  SELECT user_id, value,
         epoch_us(ts) AS t_us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_us
  FROM events
), agg AS (
  SELECT user_id,
         sum(value * (nxt_us - t_us) / 1000000.0) AS area,
         (max(t_us) - min(t_us)) / 1000000.0 AS span_s,
         count(*) AS n_samples
  FROM d GROUP BY user_id
)
SELECT user_id, round(area / span_s, 3) AS twa,
       round(span_s, 3) AS span_s, n_samples
FROM agg WHERE span_s > 0
"""


# ---------------------------------------------------------------------------
# rolling_zscore — trailing-window anomaly flags
# ---------------------------------------------------------------------------


def rolling_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling z-score outlier detection: each sample scored against the
    trailing 20 samples of the same user (needs >= 10 history rows). The
    ROWS frame keeps state bounded regardless of time density, so the
    operator survives bursty streams; count of |z| > 2.5 per event_type."""
    ev = load_table(spark, sf, "events")
    w20 = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-20, -1)
    )
    m = F.avg("value").over(w20)
    s = F.stddev_samp("value").over(w20)
    c = F.count("value").over(w20)
    z = F.when((c >= 10) & (s > 0.001), (F.col("value") - m) / s)
    return (
        ev.select("user_id", "ts", "event_id", "event_type", "value")
        .withColumn("z", z)
        .groupBy("event_type")
        .agg(
            F.count("z").alias("n_scored"),
            F.sum(F.when(F.round(F.abs(F.col("z")), 6) > 2.5, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
    )


ROLLING_Z_SQL = """
WITH scored AS (
  SELECT event_type,
         CASE WHEN count(value) OVER w >= 10 AND stddev_samp(value) OVER w > 0.001
              THEN (value - avg(value) OVER w) / stddev_samp(value) OVER w
         END AS z
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, count(z) AS n_scored,
       CAST(sum(CASE WHEN round(abs(z), 6) > 2.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM scored GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# ewma_smooth — exponentially weighted moving average, closed form
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.2


def ewma_smooth(spark: SparkSession, sf: str) -> DataFrame:
    """Final EWMA state per user (alpha=0.2). The recursion s_i = a*x_i +
    (1-a)*s_{i-1} is re-expressed as a closed-form weighted sum
    (w_i = a*(1-a)^(n-i), first row gets (1-a)^(n-1)), which turns a
    sequential scan into one window pass + one aggregation — the trick that
    makes EWMA distributable. Weights underflow harmlessly for old rows."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    rn = F.row_number().over(w)
    n = F.count("*").over(wn)
    a = F.lit(EWMA_ALPHA)
    wgt = F.when(rn == 1, F.pow(1 - a, n - 1)).otherwise(
        a * F.pow(1 - a, n - rn)
    )
    return (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn("wgt", wgt)
        .groupBy("user_id")
        .agg(
            F.round(F.sum(F.col("wgt") * F.col("value")), 3).alias("ewma"),
            F.count("*").alias("n_samples"),
        )
    )


EWMA_SQL = f"""
WITH d AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT user_id,
       round(sum(CASE WHEN rn = 1 THEN power(1 - {EWMA_ALPHA}, n - 1)
                      ELSE {EWMA_ALPHA} * power(1 - {EWMA_ALPHA}, n - rn) END * value), 3) AS ewma,
       count(*) AS n_samples
FROM d GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# activity_streaks — gaps-and-islands on active days
# ---------------------------------------------------------------------------


def activity_streaks(spark: SparkSession, sf: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (gaps-and-islands:
    active-day date minus its row_number is constant within a streak).
    Pre-aggregating to distinct (user, day) first keeps the window input at
    users x days, not raw events — the standard cardinality reduction that
    makes streaks cheap at any event volume."""
    ev = load_table(spark, sf, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn("rn", F.row_number().over(w)).withColumn(
        "k", F.date_sub(F.col("d"), F.col("rn"))
    )
    streaks = islands.groupBy("user_id", "k").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.max("len").cast("long").alias("longest_streak"),
        F.count("*").cast("long").alias("n_streaks"),
    )


STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), islands AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS k
  FROM days
), streaks AS (
  SELECT user_id, k, count(*) AS len FROM islands GROUP BY user_id, k
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM streaks GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# dq_constraint_suite — Deequ-style single-scan quality metrics
# ---------------------------------------------------------------------------


def dq_constraint_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality constraint suite over `events` computed in ONE scan
    (Deequ's analyzer pattern): row count, null counts, domain-range
    violations, primary-key duplication, type-domain cardinality, and
    JSON-parseability of the props column — emitted long-form
    (metric, value) so downstream alerting can diff runs. A single
    aggregation node means the 100 TB scan cost is paid once for the whole
    suite, not per check."""
    ev = load_table(spark, sf, "events")
    agg = ev.agg(
        F.count("*").alias("row_count"),
        F.sum(F.col("value").isNull().cast("int")).alias("value_nulls"),
        F.sum((~F.col("value").between(0, 1000)).cast("int")).alias(
            "value_range_violations"
        ),
        (F.count("*") - F.countDistinct("event_id")).alias("dup_event_ids"),
        F.countDistinct("event_type").alias("distinct_event_types"),
        F.sum(F.get_json_object("props", "$.k").isNull().cast("int")).alias(
            "props_json_bad"
        ),
    )
    return agg.selectExpr(
        "stack(6, "
        "'row_count', CAST(row_count AS DOUBLE), "
        "'value_nulls', CAST(value_nulls AS DOUBLE), "
        "'value_range_violations', CAST(value_range_violations AS DOUBLE), "
        "'dup_event_ids', CAST(dup_event_ids AS DOUBLE), "
        "'distinct_event_types', CAST(distinct_event_types AS DOUBLE), "
        "'props_json_bad', CAST(props_json_bad AS DOUBLE)"
        ") AS (metric, value)"
    )


DQ_SQL = """
WITH a AS (
  SELECT count(*) AS row_count,
         sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS value_nulls,
         sum(CASE WHEN value NOT BETWEEN 0 AND 1000 THEN 1 ELSE 0 END) AS value_range_violations,
         count(*) - count(DISTINCT event_id) AS dup_event_ids,
         count(DISTINCT event_type) AS distinct_event_types,
         sum(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS props_json_bad
  FROM events
)
SELECT 'row_count' AS metric, CAST(row_count AS DOUBLE) AS value FROM a
UNION ALL SELECT 'value_nulls', CAST(value_nulls AS DOUBLE) FROM a
UNION ALL SELECT 'value_range_violations', CAST(value_range_violations AS DOUBLE) FROM a
UNION ALL SELECT 'dup_event_ids', CAST(dup_event_ids AS DOUBLE) FROM a
UNION ALL SELECT 'distinct_event_types', CAST(distinct_event_types AS DOUBLE) FROM a
UNION ALL SELECT 'props_json_bad', CAST(props_json_bad AS DOUBLE) FROM a
"""


# ---------------------------------------------------------------------------
# fk_orphan_audit — referential-integrity audit via anti joins
# ---------------------------------------------------------------------------


def fk_orphan_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for each FK edge of the
    star schema (orders->customer, lineitem->part, lineitem->supplier) plus
    one deliberately-restricted dimension (customers with non-negative
    balance) that surfaces real orphans. Anti joins broadcast the dimension
    key set; at 100 TB the same plan degrades gracefully to shuffle-hash
    anti join (AQE decides), and each audit row is an independent job."""
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    cust = load_table(spark, sf, "customer")
    part = load_table(spark, sf, "part")
    supp = load_table(spark, sf, "supplier")

    def audit(name: str, fact: DataFrame, key: str, dim: DataFrame, dim_key: str):
        dim_keys = dim.select(dim_key)
        orphans = fact.join(
            F.broadcast(dim_keys),
            fact[key] == F.col(dim_key),
            "left_anti",
        )
        return orphans.agg(
            F.lit(name).alias("relation"), F.count("*").alias("orphans")
        )

    pos_cust = cust.filter(F.col("c_acctbal") >= 0)
    return (
        audit("orders->customer", orders, "o_custkey", cust, "c_custkey")
        .unionAll(audit("lineitem->part", li, "l_partkey", part, "p_partkey"))
        .unionAll(audit("lineitem->supplier", li, "l_suppkey", supp, "s_suppkey"))
        .unionAll(
            audit("orders->customer_nonneg", orders, "o_custkey", pos_cust, "c_custkey")
        )
    )


FK_ORPHAN_SQL = """
SELECT 'orders->customer' AS relation,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS orphans
UNION ALL
SELECT 'lineitem->part',
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem->supplier',
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'orders->customer_nonneg',
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey AND c.c_acctbal >= 0))
"""


QUERIES: dict[str, QuerySpec] = {
    "concurrency_sweep": QuerySpec(
        concurrency_sweep, CONCURRENCY_SQL, "peak interval concurrency, 2-pass sweep"
    ),
    "counter_rate": QuerySpec(
        counter_rate, COUNTER_RATE_SQL, "counter increase with reset detection"
    ),
    "time_weighted_avg": QuerySpec(
        time_weighted_avg, TWA_SQL, "left-step time-weighted gauge average"
    ),
    "rolling_zscore": QuerySpec(
        rolling_zscore, ROLLING_Z_SQL, "trailing-window z-score outlier flags"
    ),
    "ewma_smooth": QuerySpec(
        ewma_smooth, EWMA_SQL, "closed-form distributable EWMA"
    ),
    "activity_streaks": QuerySpec(
        activity_streaks, STREAKS_SQL, "gaps-and-islands consecutive-day streaks"
    ),
    "dq_constraint_suite": QuerySpec(
        dq_constraint_suite, DQ_SQL, "single-scan Deequ-style quality metrics"
    ),
    "fk_orphan_audit": QuerySpec(
        fk_orphan_audit, FK_ORPHAN_SQL, "referential-integrity orphan audit"
    ),
}
