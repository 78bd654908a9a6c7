"""Round-3 batch 1 — market/ops time-series shapes: OHLC bars, Markov
transition matrices, cohort retention matrices, PSI drift, CUSUM shift
detection, Apdex scoring, seasonal hour-of-day profiles.

All entries follow the engine-parity rules pinned by earlier rounds:
integer-cents arithmetic wherever an average/sum of 2-decimal doubles
feeds an output (exact in any summation order), single-division doubles
for rates (deterministic), BIGINT total-order keys for argmin/argmax
selection (no float or timestamp ties), and `round(..., k)` only on
terminal values whose error bound is orders below the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# ohlc_bars — open/high/low/close + VWAP per (hour, event_type)
# ---------------------------------------------------------------------------


def ohlc_bars(spark: SparkSession, sf: str) -> DataFrame:
    """OHLC candlesticks + VWAP per (hour, series): the financial/monitoring
    downsample shape. One hash aggregation (partial -> final, no window):
    open/close are min_by/max_by under a BIGINT (us_into_hour<<31 | event_id)
    total-order key — collision-free and tie-free, unlike raw-timestamp
    argmin — and VWAP is exact integer price-cents x volume, divided once
    at the end. Scales as a plain groupBy: state per group is O(1), the
    shuffle carries one row per (hour, series) per map task.

    Key invariant: ordering only matters WITHIN a (hour, series) group, so
    the timestamp is rebased to its own hour (us_into_hour < 3.6e9 < 2^32,
    so us_into_hour * 2^31 < 2^63 for any calendar span), and event_id must
    be < 2^31 (~2.1e9 rows, i.e. valid to roughly sf2000) for uniqueness —
    far past the 2^20 bound of the old days-since-epoch key."""
    ev = load_table(spark, sf, "events")
    us_into_hour = F.unix_micros("ts") - F.unix_micros(F.date_trunc("hour", "ts"))
    key = us_into_hour * F.lit(2_147_483_648) + F.col("event_id")
    vol = (F.col("user_id") % 10 + 1).cast("long")
    pv_cents = F.round(F.col("value") * 100).cast("long") * vol
    return (
        ev.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
            F.col("value"),
            key.alias("k"),
            vol.alias("vol"),
            pv_cents.alias("pv_cents"),
        )
        .groupBy("hour", "event_type")
        .agg(
            F.min_by("value", "k").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "k").alias("close"),
            F.sum("vol").alias("volume"),
            # unrounded single division of exact integer sums: bit-identical
            # across engines (never round a double ratio at a reachable
            # midpoint — sum(pv)/sum(vol*100) hits exact 4-decimal grid
            # points, where HALF_UP vs binary rounding diverge)
            (F.sum("pv_cents") / (F.sum("vol") * 100.0)).alias("vwap"),
        )
    )


OHLC_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       event_type,
       arg_min(value, (epoch_us(ts) - epoch_us(date_trunc('hour', ts)))
                      * 2147483648 + event_id) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, (epoch_us(ts) - epoch_us(date_trunc('hour', ts)))
                      * 2147483648 + event_id) AS close,
       CAST(sum(user_id % 10 + 1) AS BIGINT) AS volume,
       sum(CAST(round(value * 100) AS BIGINT) * (user_id % 10 + 1))
             / (sum(user_id % 10 + 1) * 100.0) AS vwap
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# markov_transitions — event-type transition matrix
# ---------------------------------------------------------------------------


def markov_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next_state | state) from lead() under the (ts, event_id) total order.
    The window shuffles once on user_id (bounded partitions — one user's
    history); the probability normalization is a second small aggregation
    over at most |states|^2 rows, broadcast-joinable at any scale. Counts
    are integers; each probability is one double division."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("to_state", F.lead("event_type").over(w))
        .filter(F.col("to_state").isNotNull())
        .groupBy(F.col("event_type").alias("from_state"), "to_state")
        .agg(F.count("*").alias("n"))
    )
    tot = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"),
    )


MARKOV_SQL = """
WITH pairs AS (
  SELECT event_type AS from_state,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_state
  FROM events
), counts AS (
  SELECT from_state, to_state, count(*) AS n
  FROM pairs WHERE to_state IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_state, to_state, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY from_state), 6) AS p
FROM counts
"""


# ---------------------------------------------------------------------------
# cohort_matrix — weekly signup-cohort retention
# ---------------------------------------------------------------------------


def cohort_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Classic cohort-retention matrix: cohort = Monday of each user's first
    active week, cell (cohort, week_offset) = distinct users active that
    week, rate = cell / cohort size. Two aggregations (per-user min, then
    per-cell distinct) + one window for the cohort size — offset 0 always
    exists (a user is active in their own first week), so first_value is
    total. All counts integral; the rate is one double division."""
    ev = load_table(spark, sf, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_wk")
    )
    cells = (
        ev.join(firsts, "user_id")
        .select(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort"),
            (
                F.datediff(F.to_date(F.date_trunc("week", "ts")), F.to_date("cohort_wk"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    size_w = Window.partitionBy("cohort").orderBy("week_offset")
    return cells.select(
        "cohort",
        "week_offset",
        "n_users",
        F.round(
            F.col("n_users") / F.first("n_users").over(size_w), 4
        ).alias("retention"),
    )


COHORT_SQL = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
  FROM events GROUP BY 1
), cells AS (
  SELECT strftime(f.cohort_wk, '%Y-%m-%d') AS cohort,
         CAST(date_diff('day', CAST(f.cohort_wk AS DATE),
                        CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
           AS week_offset,
         count(DISTINCT e.user_id) AS n_users
  FROM events e JOIN firsts f USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort, week_offset, n_users,
       round(n_users * 1.0 /
             first_value(n_users) OVER (PARTITION BY cohort ORDER BY week_offset),
             4) AS retention
FROM cells
"""


# ---------------------------------------------------------------------------
# psi_drift — population stability index, first vs second half of month
# ---------------------------------------------------------------------------

PSI_BINS = 10
PSI_WIDTH = 50.0
PSI_SPLIT = "2024-01-16"


def psi_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index of the value distribution per series,
    first half-month vs second (the standard model/data drift monitor).
    Fixed-width bins (50-unit, clamped to 10) make the histogram a single
    hash aggregation; Laplace (+1) smoothing keeps every log term finite
    without data-dependent bin pruning. PSI = sum (p-q) ln(p/q); terms are
    O(0.1) and the cross-engine error is O(1e-15), five orders below the
    1e-6 output grid."""
    ev = load_table(spark, sf, "events")
    b = F.least(F.floor(F.col("value") / PSI_WIDTH).cast("int"), F.lit(PSI_BINS - 1))
    half = (F.col("ts") < F.lit(PSI_SPLIT).cast("timestamp")).cast("int")
    hist = (
        ev.select("event_type", b.alias("bin"), half.alias("is_first"))
        .groupBy("event_type", "bin")
        .agg(
            F.sum("is_first").alias("n1"),
            F.sum(1 - F.col("is_first")).alias("n2"),
        )
    )
    tw = Window.partitionBy("event_type")
    p1 = (F.col("n1") + 1) / (F.sum("n1").over(tw) + PSI_BINS)
    p2 = (F.col("n2") + 1) / (F.sum("n2").over(tw) + PSI_BINS)
    return (
        hist.select(
            "event_type",
            F.col("n1"),
            F.col("n2"),
            ((p1 - p2) * F.log(p1 / p2)).alias("term"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("n1").alias("n_first"),
            F.sum("n2").alias("n_second"),
            F.round(F.sum("term"), 6).alias("psi"),
        )
    )


PSI_SQL = f"""
WITH hist AS (
  SELECT event_type,
         least(CAST(floor(value / {PSI_WIDTH}) AS INT), {PSI_BINS - 1}) AS bin,
         count(*) FILTER (WHERE ts < TIMESTAMP '{PSI_SPLIT}') AS n1,
         count(*) FILTER (WHERE ts >= TIMESTAMP '{PSI_SPLIT}') AS n2
  FROM events GROUP BY 1, 2
), terms AS (
  SELECT event_type, n1, n2,
         ((n1 + 1) * 1.0 / (sum(n1) OVER w + {PSI_BINS})
          - (n2 + 1) * 1.0 / (sum(n2) OVER w + {PSI_BINS}))
         * ln(((n1 + 1) * 1.0 / (sum(n1) OVER w + {PSI_BINS}))
              / ((n2 + 1) * 1.0 / (sum(n2) OVER w + {PSI_BINS}))) AS term
  FROM hist
  WINDOW w AS (PARTITION BY event_type)
)
SELECT event_type, CAST(sum(n1) AS BIGINT) AS n_first,
       CAST(sum(n2) AS BIGINT) AS n_second,
       round(sum(term), 6) AS psi
FROM terms GROUP BY 1
"""


# ---------------------------------------------------------------------------
# cusum_shift_detect — one-sided CUSUM over daily counts
# ---------------------------------------------------------------------------

CUSUM_K = 0.5
CUSUM_H = 3.0


def cusum_shift_detect(spark: SparkSession, sf: str) -> DataFrame:
    """One-sided CUSUM change detection over standardized daily event
    counts. The textbook recursion S_t = max(0, S_{t-1} + x_t - k) is
    sequential; we use its closed form S_t = C_t - min(0, min_{j<=t} C_j)
    (C = running sum of x - k), which is two window passes and fully
    distributable — same decomposition that made EWMA scale in round 2.
    Mean/variance come from exact integer sums (counts and squares), so
    every double op downstream is bit-identical across engines."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n"))
    tw = Window.partitionBy("event_type")
    cnt = F.count("*").over(tw)
    mu = F.sum("n").over(tw) / cnt
    var = F.sum(F.col("n") * F.col("n")).over(tw) / cnt - mu * mu
    scored = daily.select(
        "event_type",
        "day",
        "n",
        ((F.col("n") - mu) / F.sqrt(var) - F.lit(CUSUM_K)).alias("y"),
    )
    ow = Window.partitionBy("event_type").orderBy("day")
    run = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = F.sum("y").over(run)
    s = c - F.least(F.lit(0.0), F.min(c).over(ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return scored.select(
        "event_type",
        "day",
        "n",
        F.round(s, 6).alias("cusum"),
        (s > CUSUM_H).alias("shift_flag"),
    )


CUSUM_SQL = f"""
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, day, n,
         (n - sum(n) OVER tw * 1.0 / count(*) OVER tw)
           / sqrt(sum(n * n) OVER tw * 1.0 / count(*) OVER tw
                  - (sum(n) OVER tw * 1.0 / count(*) OVER tw)
                    * (sum(n) OVER tw * 1.0 / count(*) OVER tw))
           - {CUSUM_K} AS y
  FROM daily
  WINDOW tw AS (PARTITION BY event_type)
), cum1 AS (
  -- DuckDB rejects nested window calls; materialize the running sum first
  SELECT event_type, day, n,
         sum(y) OVER ow AS c
  FROM scored
  WINDOW ow AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), cum AS (
  SELECT event_type, day, n, c,
         min(c) OVER ow2 AS mc
  FROM cum1
  WINDOW ow2 AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, n,
       round(c - least(0.0, mc), 6) AS cusum,
       (c - least(0.0, mc)) > {CUSUM_H} AS shift_flag
FROM cum
"""


# ---------------------------------------------------------------------------
# apdex_score — satisfied/tolerating SLA index per series per day
# ---------------------------------------------------------------------------

APDEX_T = 50.0


def apdex_score(spark: SparkSession, sf: str) -> DataFrame:
    """Apdex = (satisfied + tolerating/2) / n with T=50 (tolerating up to
    4T), per (series, day) — the standard UX SLA index. One conditional
    aggregation pass; integer counts, one terminal division."""
    ev = load_table(spark, sf, "events")
    return ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n"),
        F.count_if(F.col("value") <= APDEX_T).alias("satisfied"),
        F.count_if(
            (F.col("value") > APDEX_T) & (F.col("value") <= 4 * APDEX_T)
        ).alias("tolerating"),
        F.round(
            (
                F.count_if(F.col("value") <= APDEX_T)
                + F.count_if(
                    (F.col("value") > APDEX_T) & (F.col("value") <= 4 * APDEX_T)
                )
                * 0.5
            )
            / F.count("*"),
            4,
        ).alias("apdex"),
    )


APDEX_SQL = f"""
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
       count(*) FILTER (WHERE value <= {APDEX_T}) AS satisfied,
       count(*) FILTER (WHERE value > {APDEX_T} AND value <= {4 * APDEX_T}) AS tolerating,
       round((count(*) FILTER (WHERE value <= {APDEX_T})
              + count(*) FILTER (WHERE value > {APDEX_T} AND value <= {4 * APDEX_T}) * 0.5)
             / count(*), 4) AS apdex
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# seasonal_hour_profile — hour-of-day seasonality index
# ---------------------------------------------------------------------------


def seasonal_hour_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Hour-of-day seasonality per series: mean value by local hour vs the
    series-wide mean, as a ratio index (1.0 = flat). Integer-cents sums
    make both means exact-in-any-order; the index is computed from the two
    exact sums in one deterministic expression. One aggregation + one
    24-row-per-series window."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    hourly = ev.select(
        "event_type", F.hour("ts").alias("hod"), cents.alias("cents")
    ).groupBy("event_type", "hod").agg(
        F.count("*").alias("n"), F.sum("cents").alias("sc")
    )
    tw = Window.partitionBy("event_type")
    avg_h = F.col("sc") / (F.col("n") * 100.0)
    avg_t = F.sum("sc").over(tw) / (F.sum("n").over(tw) * 100.0)
    # UNROUNDED: both columns are deterministic expressions over exact
    # integer sums (single divisions / one ratio), bit-identical across
    # engines; round(x, 4) died at a reachable ...5 boundary in the
    # sf0.001 tri-scale sweep
    return hourly.select(
        "event_type",
        "hod",
        "n",
        avg_h.alias("avg_value"),
        (avg_h / avg_t).alias("seasonal_index"),
    )


SEASONAL_SQL = """
WITH hourly AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hod, count(*) AS n,
         sum(CAST(round(value * 100) AS BIGINT)) AS sc
  FROM events GROUP BY 1, 2
)
SELECT event_type, hod, n,
       sc / (n * 100.0) AS avg_value,
       (sc / (n * 100.0))
             / (sum(sc) OVER tw / (sum(n) OVER tw * 100.0)) AS seasonal_index
FROM hourly
WINDOW tw AS (PARTITION BY event_type)
"""


QUERIES: dict[str, QuerySpec] = {
    "ohlc_bars": QuerySpec(ohlc_bars, OHLC_SQL, "OHLC+VWAP hourly candlesticks"),
    "markov_transitions": QuerySpec(
        markov_transitions, MARKOV_SQL, "event-type Markov transition matrix"
    ),
    "cohort_matrix": QuerySpec(
        cohort_matrix, COHORT_SQL, "weekly cohort retention matrix"
    ),
    "psi_drift": QuerySpec(psi_drift, PSI_SQL, "population stability index drift"),
    "cusum_shift_detect": QuerySpec(
        cusum_shift_detect, CUSUM_SQL, "closed-form one-sided CUSUM"
    ),
    "apdex_score": QuerySpec(apdex_score, APDEX_SQL, "Apdex SLA index"),
    "seasonal_hour_profile": QuerySpec(
        seasonal_hour_profile, SEASONAL_SQL, "hour-of-day seasonality index"
    ),
}
