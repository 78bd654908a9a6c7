"""Round-2 batch 7 — latency-band dashboards and session path analysis:
the two remaining observability report shapes (per-bucket percentile
bands; top navigation paths) a HEPop operator would expect from a
monitoring engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# latency_bands_hourly — p50/p95/p99 per hour per event_type
# ---------------------------------------------------------------------------


def latency_bands_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """Percentile bands per (hour, event_type) — the latency-dashboard
    query (p50/p95/p99 lines per series). Exact interpolated percentiles
    within each bucket: group sizes are bounded by the bucket, so the
    sort-based percentile state stays small however long the stream runs;
    at 100 TB the documented swap is approx_percentile with the same
    grouping. Interpolation of 2-decimal inputs terminates at 4 decimals —
    grid-safe rounding (verify-skill rule)."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
    )


LATENCY_BANDS_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       event_type, count(*) AS n,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# session_paths_topk — top navigation paths per session
# ---------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000
PATH_STEPS = 5
PATH_TOPN = 20


def session_paths_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top navigation paths: sessionize (30-min gap), take each session's
    first 5 event types in order, count identical paths, return the top
    20 — the product-analytics 'common journeys' report. The path string
    is built with an ORDER-pinned collect inside the session group (ts,
    event_id total order), so the result is deterministic; sessions are
    the shuffle key and their length bounds all per-group state."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    sess = (
        ev.withColumn("ts_us", F.unix_micros("ts"))
        .withColumn(
            "new_sess",
            F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    paths = (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.array_join(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts_us", "event_id", "event_type")
                        )
                    ),
                    1,
                    PATH_STEPS,
                ).getField("event_type"),
                ">",
            ).alias("path")
        )
    )
    ranked = (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOPN)
    )
    return ranked


SESSION_PATHS_SQL = f"""
WITH marked AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM marked
), numbered AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, sess_id
                               ORDER BY ts_us, event_id) AS step
  FROM sess
), paths AS (
  SELECT user_id, sess_id,
         string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
  FROM numbered WHERE step <= {PATH_STEPS}
  GROUP BY user_id, sess_id
)
SELECT path, count(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {PATH_TOPN}
"""


# ---------------------------------------------------------------------------
# histogram_cumulative_le — Prometheus-style cumulative bucket export
# ---------------------------------------------------------------------------

LE_BOUNDS = (0.5, 1.0, 2.0, 4.0, 8.0, 16.0)


def histogram_cumulative_le(spark: SparkSession, sf: str) -> DataFrame:
    """Prometheus-layout histogram: per event_type, cumulative counts of
    value <= each exponential bound (le buckets, +Inf implied by n_total)
    — the export format scrape targets emit and TSDBs store. One scan
    aggregates every bucket simultaneously (conditional sums — no
    explode, no per-bucket pass); the cumulative property comes free from
    `<=` so no window is needed at all. Bounds on the 2^k grid keep every
    comparison exact."""
    ev = load_table(spark, sf, "events")
    aggs = [
        F.sum((F.col("value") <= b).cast("long")).alias(f"le_{str(b).replace('.', '_')}")
        for b in LE_BOUNDS
    ]
    wide = ev.groupBy("event_type").agg(*aggs, F.count("*").alias("n_total"))
    stack_args = ", ".join(
        f"'{b}', le_{str(b).replace('.', '_')}" for b in LE_BOUNDS
    )
    return wide.selectExpr(
        "event_type",
        "n_total",
        f"stack({len(LE_BOUNDS)}, {stack_args}) AS (le, cum_count)",
    )


HISTOGRAM_LE_SQL = f"""
WITH wide AS (
  SELECT event_type,
         {", ".join(f"sum(CASE WHEN value <= {b} THEN 1 ELSE 0 END) AS c{i}" for i, b in enumerate(LE_BOUNDS))},
         count(*) AS n_total
  FROM events GROUP BY event_type
)
{" UNION ALL ".join(f"SELECT event_type, n_total, '{b}' AS le, CAST(c{i} AS BIGINT) AS cum_count FROM wide" for i, b in enumerate(LE_BOUNDS))}
"""


# ---------------------------------------------------------------------------
# mode_per_group — deterministic-tie modal value
# ---------------------------------------------------------------------------


def mode_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Modal event_type per user with a DETERMINISTIC tie rule (highest
    count, then lexicographically smallest value). Both engines' built-in
    mode() leave ties implementation-defined, so the portable form is the
    count + min_by decomposition — two hash aggregations sharing one
    user_id shuffle, both map-side combinable."""
    ev = load_table(spark, sf, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    # (highest count, then smallest value) = min_by over struct(-c, type):
    # same deterministic tie rule as the former rank window, but a
    # partial-combinable hash agg sharing the user_id shuffle
    return (
        counts.groupBy("user_id")
        .agg(
            F.min_by(
                F.struct("event_type", "c"),
                F.struct((-F.col("c")).alias("nc"), F.col("event_type")),
            ).alias("b")
        )
        .select(
            "user_id",
            F.col("b.event_type").alias("modal_type"),
            F.col("b.c").alias("n_occurrences"),
        )
    )


MODE_SQL = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY user_id, event_type
)
SELECT user_id, event_type AS modal_type, c AS n_occurrences
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY c DESC, event_type) AS rk
      FROM counts)
WHERE rk = 1
"""


QUERIES: dict[str, QuerySpec] = {
    "mode_per_group": QuerySpec(
        mode_per_group, MODE_SQL, "deterministic-tie modal value per group"
    ),
    "latency_bands_hourly": QuerySpec(
        latency_bands_hourly, LATENCY_BANDS_SQL, "p50/p95/p99 bands per hour"
    ),
    "session_paths_topk": QuerySpec(
        session_paths_topk, SESSION_PATHS_SQL, "top-k session navigation paths"
    ),
    "histogram_cumulative_le": QuerySpec(
        histogram_cumulative_le,
        HISTOGRAM_LE_SQL,
        "Prometheus-layout cumulative le buckets",
    ),
}
