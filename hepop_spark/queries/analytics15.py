"""Round-3 analytics trio: nearest-direction as-of join, rolling
correlation on exact integer window sums, and the interpolated
percentile family on the cents grid.

Engine-parity rules: exact integer sums feeding ONE deterministic
double expression (sqrt/divide are IEEE-identical), unique total orders
for every selection, BIGINT casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# asof_join_nearest — direction='nearest' point-in-time join
# ---------------------------------------------------------------------------

ASOF_TOL_S = 600  # 10-minute tolerance window each direction


def asof_join_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof
    direction='nearest'): each purchase is matched to the closest click
    by the SAME user within ±10 minutes — earlier OR later, whichever is
    nearer, ties to the earlier click then lower event_id. Completes the
    as-of family (backward asof_join, cogroup variant) with the
    symmetric-tolerance semantics sensor fusion uses.

    Scale: the candidate join rides the (user, 10-min grid cell) equi-key
    — each purchase probes its own and both neighbor cells, so candidates
    are bounded by per-cell density, never a time-cross-join."""
    ev = load_table(spark, sf, "events")
    cell = (F.unix_timestamp("ts") / ASOF_TOL_S).cast("long")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("u"),
        F.unix_micros("ts").alias("p_us"),
        cell.alias("p_cell"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("u"),
        F.unix_micros("ts").alias("c_us"),
        cell.alias("c_cell"),
    )
    probes = purchases.withColumn(
        "cell", F.explode(F.array(F.col("p_cell") - 1, F.col("p_cell"), F.col("p_cell") + 1))
    )
    cand = (
        probes.join(clicks, (probes.u == clicks.u) & (probes.cell == clicks.c_cell))
        .filter(F.abs(F.col("p_us") - F.col("c_us")) <= ASOF_TOL_S * 1_000_000)
        .select(
            "p_id", probes.u.alias("user_id"), "p_us", "c_id", "c_us",
            F.abs(F.col("p_us") - F.col("c_us")).alias("gap_us"),
        )
        .distinct()
    )
    # nearest click per purchase: min_by over the (gap, c_us, c_id) order —
    # the same selection as the former row_number window but a
    # partial-combinable hash agg (no per-purchase candidate sort)
    return (
        cand.groupBy("p_id")
        .agg(
            F.min_by(
                F.struct("user_id", "c_id", "gap_us", "p_us", "c_us"),
                F.struct(F.col("gap_us"), F.col("c_us"), F.col("c_id")),
            ).alias("b")
        )
        .select(
            "p_id",
            F.col("b.user_id").alias("user_id"),
            F.col("b.c_id").alias("c_id"),
            F.col("b.gap_us").cast("long").alias("gap_us"),
            (F.col("b.c_us") < F.col("b.p_us")).alias("click_before"),
        )
    )


ASOF_NEAREST_SQL = f"""
WITH p AS (
  SELECT event_id AS p_id, user_id AS u, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS c_id, user_id AS u, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
), cand AS (
  SELECT p.p_id, p.u AS user_id, p.p_us, c.c_id, c.c_us,
         abs(p.p_us - c.c_us) AS gap_us
  FROM p JOIN c ON p.u = c.u
  WHERE abs(p.p_us - c.c_us) <= {ASOF_TOL_S} * 1000000
)
SELECT p_id, user_id, c_id, CAST(gap_us AS BIGINT) AS gap_us,
       c_us < p_us AS click_before
FROM (
  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY gap_us, c_us, c_id) AS rk
  FROM cand)
WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# rolling_corr — trailing-window correlation on exact integer sums
# ---------------------------------------------------------------------------

CORR_WIN = 24  # trailing rows (hours) per series


def rolling_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling correlation between purchase and click hourly volumes: the
    five window sums (n, Sx, Sy, Sxx, Syy, Sxy) are EXACT integers over a
    24-hour trailing ROWS frame, and the Pearson formula is one
    deterministic double expression — so the unrounded value is
    bit-identical across engines (no grid, no tolerance). The co-movement
    monitor between two metrics streams.

    Scale: one hourly pre-aggregation, one self-align by hour, one
    bounded ROWS window — corpus-linear with bounded state."""
    ev = load_table(spark, sf, "events")
    hourly = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
    )
    x = hourly.filter(F.col("event_type") == "purchase").select(
        "hour", F.col("n").alias("x")
    )
    y = hourly.filter(F.col("event_type") == "click").select(
        "hour", F.col("n").alias("y")
    )
    xy = x.join(y, "hour")
    w = Window.orderBy("hour").rowsBetween(-(CORR_WIN - 1), 0)
    n = F.count("*").over(w)
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    syy = F.sum(F.col("y") * F.col("y")).over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return (
        xy.select(
            "hour",
            F.col("x").cast("long").alias("x"),
            F.col("y").cast("long").alias("y"),
            n.cast("long").alias("win_n"),
            F.when(den > 0, num / den).alias("corr24"),
        )
        .orderBy("hour")
    )


ROLLING_CORR_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY 1, 2
), x AS (SELECT hour, n AS x FROM hourly WHERE event_type = 'purchase'),
   y AS (SELECT hour, n AS y FROM hourly WHERE event_type = 'click'),
   xy AS (SELECT x.hour, x.x, y.y FROM x JOIN y USING (hour)),
   win AS (
  SELECT hour, x, y,
         count(*) OVER w AS n, sum(x) OVER w AS sx, sum(y) OVER w AS sy,
         sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
         sum(x * y) OVER w AS sxy
  FROM xy
  WINDOW w AS (ORDER BY hour ROWS BETWEEN {CORR_WIN - 1} PRECEDING AND CURRENT ROW)
)
SELECT hour, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
       CAST(n AS BIGINT) AS win_n,
       CASE WHEN sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)) > 0
            THEN (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy))
            END AS corr24
FROM win
ORDER BY hour
"""


# ---------------------------------------------------------------------------
# percentile_cont_family — interpolated percentiles on the cents grid
# ---------------------------------------------------------------------------


def percentile_cont_family(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated (PERCENTILE_CONT) quartiles of value-cents per
    event_type — the continuous counterpart of the discrete selections
    used elsewhere. Engine parity holds because both engines use the same
    index = q*(n-1) linear interpolation and the interpolands are exact
    integers: a + frac*(b-a) is one deterministic double expression.

    Scale: Spark's percentile is a single-pass typed aggregate per group
    (no global sort); the group key is bounded."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.select("event_type", cents.alias("cents"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr("percentile(cents, 0.25)").alias("p25"),
            F.expr("percentile(cents, 0.5)").alias("p50"),
            F.expr("percentile(cents, 0.75)").alias("p75"),
        )
        .orderBy("event_type")
    )


PERCENTILE_CONT_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.25) AS p25,
       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) AS p50,
       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.75) AS p75
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "asof_join_nearest": QuerySpec(
        asof_join_nearest, ASOF_NEAREST_SQL,
        "direction='nearest' as-of join on a 10-min grid-cell key",
    ),
    "rolling_corr": QuerySpec(
        rolling_corr, ROLLING_CORR_SQL,
        "trailing-24h Pearson correlation, exact integer window sums",
    ),
    "percentile_cont_family": QuerySpec(
        percentile_cont_family, PERCENTILE_CONT_SQL,
        "interpolated quartiles on the cents grid",
    ),
}
