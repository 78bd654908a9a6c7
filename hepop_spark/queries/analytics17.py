"""Round-4 final trio: windowFunnel-style max-step-within-T, position-
based multi-touch attribution with exact largest-remainder credit, and
Herfindahl market concentration — three well-known report shapes
(ClickHouse windowFunnel, marketing multi-touch, antitrust HHI) not yet
in the inventory.

Engine-parity rules as established: exact integer microsecond/credit
arithmetic, largest-remainder apportionment with deterministic ties,
one terminal division (or none), no float rounding before comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# window_funnel_steps — max funnel step within a time window (windowFunnel)
# ---------------------------------------------------------------------------

FUNNEL_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7 days
FUNNEL_SEQ = ("view", "click", "purchase")


def window_funnel_steps(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse-windowFunnel semantics (greedy earliest-chain variant):
    per user, the deepest step of view -> click -> purchase reachable by
    STRICTLY later events, all within 7 days of the chain's first view —
    step k's timestamp is the EARLIEST event of type k after step k-1
    (the greedy chain; deterministic, and replayed identically by the
    oracle). Output: funnel depth -> users at exactly that depth, the
    conversion staircase product analytics reads daily.

    Scale: three conditional min-aggregations per user sharing ONE
    user_id shuffle (no self-joins, no window): min view, then min
    later click, then min later purchase via chained conditional aggs
    over the same grouped rows — map-side combinable throughout."""
    ev = load_table(spark, sf, "events").filter(
        F.col("event_type").isin(*FUNNEL_SEQ)
    )
    base = ev.select("user_id", "event_type", F.unix_micros("ts").alias("t"))
    # one grouped pass: collect each type's sorted timestamps (bounded by
    # per-user activity), then walk the greedy chain in array land
    g = base.groupBy("user_id").agg(
        *[
            F.array_sort(
                F.collect_list(F.when(F.col("event_type") == s, F.col("t")))
            ).alias(f"ts_{s}")
            for s in FUNNEL_SEQ
        ]
    )
    # F.get (0-based) returns NULL out-of-bounds even under ANSI mode,
    # unlike element_at which raises on an empty array
    t1 = F.get("ts_view", 0)
    t2 = F.array_min(F.filter("ts_click", lambda x: (x > t1)))
    t3 = F.array_min(F.filter("ts_purchase", lambda x: x > t2))
    deadline = t1 + F.lit(FUNNEL_WINDOW_US)
    depth = (
        F.when(t1.isNull(), 0)
        .when(t2.isNull() | (t2 > deadline), 1)
        .when(t3.isNull() | (t3 > deadline), 2)
        .otherwise(3)
    )
    return (
        g.select(depth.alias("depth"))
        .groupBy("depth")
        .agg(F.count("*").cast("long").alias("n_users"))
        .select(F.col("depth").cast("long").alias("depth"), "n_users")
        .orderBy("depth")
    )


WINDOW_FUNNEL_SQL = f"""
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) AS t
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
g AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN t END) AS t1
  FROM base GROUP BY user_id
),
g2 AS (
  SELECT g.user_id, g.t1,
         min(CASE WHEN b.event_type = 'click' AND b.t > g.t1 THEN b.t END) AS t2
  FROM g LEFT JOIN base b ON b.user_id = g.user_id
  GROUP BY g.user_id, g.t1
),
g3 AS (
  SELECT g2.user_id, g2.t1, g2.t2,
         min(CASE WHEN b.event_type = 'purchase' AND b.t > g2.t2 THEN b.t END) AS t3
  FROM g2 LEFT JOIN base b ON b.user_id = g2.user_id
  GROUP BY g2.user_id, g2.t1, g2.t2
),
depths AS (
  SELECT CASE WHEN t1 IS NULL THEN 0
              WHEN t2 IS NULL OR t2 > t1 + {FUNNEL_WINDOW_US} THEN 1
              WHEN t3 IS NULL OR t3 > t1 + {FUNNEL_WINDOW_US} THEN 2
              ELSE 3 END AS depth
  FROM g3
)
SELECT CAST(depth AS BIGINT) AS depth, CAST(count(*) AS BIGINT) AS n_users
FROM depths GROUP BY depth ORDER BY depth
"""


# ---------------------------------------------------------------------------
# attribution_position_based — 40/20/40 multi-touch credit
# ---------------------------------------------------------------------------

CREDIT_BP = 10_000  # total credit per conversion, in basis points


def attribution_position_based(spark: SparkSession, sf: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each purchase
    distributes 10,000 credit basis points over the user's PRECEDING
    touches (clicks/views before the first purchase): 40% to the first
    touch, 40% to the last, 20% split over the middle by LARGEST
    REMAINDER (ties to earlier touches), single-touch gets all 10,000,
    two touches split 50/50. Credits are exact integers that sum to
    10,000 per converting user BY CONSTRUCTION; the report rolls credit
    up per touch event_type.

    Scale: one window rank per user (the same shuffle any per-user
    journey pass needs), then pure integer arithmetic; the rollup is a
    bounded-key groupBy."""
    ev = load_table(spark, sf, "events")
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("p_t"))
    )
    touches = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .select("user_id", "event_type", F.unix_micros("ts").alias("t"), "event_id")
        .join(first_purchase, "user_id")
        .filter(F.col("t") < F.col("p_t"))
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    wn = Window.partitionBy("user_id")
    ranked = touches.withColumn("i", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    n, i = F.col("n"), F.col("i")
    mid = n - 2
    mid_each = F.expr(f"({CREDIT_BP} - 8000) div (n - 2)")
    mid_rem = F.expr(f"({CREDIT_BP} - 8000) % (n - 2)")
    credit = (
        F.when(n == 1, F.lit(CREDIT_BP))
        .when(n == 2, F.lit(CREDIT_BP // 2))
        .when(i == 1, F.lit(4000))
        .when(i == n, F.lit(4000))
        # middle touches: 2000 bp split evenly, remainder to the EARLIEST
        # middle touches (deterministic largest-remainder tie rule)
        .otherwise(mid_each + F.when(i - 1 <= mid_rem, 1).otherwise(0))
    )
    return (
        ranked.withColumn("credit", credit)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum("credit").cast("long").alias("credit_bp"),
        )
        .orderBy("event_type")
    )


ATTRIBUTION_SQL = f"""
WITH fp AS (
  SELECT user_id, min(epoch_us(ts)) AS p_t
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
touches AS (
  SELECT e.user_id, e.event_type, epoch_us(e.ts) AS t, e.event_id, fp.p_t
  FROM events e JOIN fp USING (user_id)
  WHERE e.event_type IN ('view', 'click') AND epoch_us(e.ts) < fp.p_t
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS i,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM touches
),
credited AS (
  SELECT event_type,
         CASE WHEN n = 1 THEN {CREDIT_BP}
              WHEN n = 2 THEN {CREDIT_BP // 2}
              WHEN i = 1 THEN 4000
              WHEN i = n THEN 4000
              ELSE ({CREDIT_BP} - 8000) // (n - 2)
                   + CASE WHEN i - 1 <= ({CREDIT_BP} - 8000) % (n - 2) THEN 1 ELSE 0 END
         END AS credit
  FROM ranked
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(credit) AS BIGINT) AS credit_bp
FROM credited
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# market_concentration_hhi — Herfindahl-Hirschman index per market
# ---------------------------------------------------------------------------


def market_concentration_hhi(spark: SparkSession, sf: str) -> DataFrame:
    """Market concentration: per nation (the supplier's market), the
    Herfindahl-Hirschman index over suppliers' revenue shares, computed
    on an exact integer grid — share_i in basis points is
    (cents_i * 10000) div total_cents (largest-remainder NOT needed:
    HHI convention squares the floored bp shares), HHI = sum(share_bp^2)
    div 10000 so the index lands on the familiar 0..10000 scale. Plus
    the top supplier's share. All integer; no rounding anywhere.

    Scale: lineitem aggregates per supplier (partial-combinable), one
    bounded 25-key nation rollup; supplier dim broadcasts."""
    li = load_table(spark, sf, "lineitem")
    sup = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per_sup = (
        li.select("l_suppkey", cents.alias("c"))
        .groupBy("l_suppkey")
        .agg(F.sum("c").alias("rev_c"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "rev_c")
    )
    wtot = Window.partitionBy("n_name")
    shared = per_sup.withColumn("tot_c", F.sum("rev_c").over(wtot)).withColumn(
        "share_bp", F.expr("rev_c * 10000 div tot_c")
    )
    return (
        shared.groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.expr("cast(sum(share_bp * share_bp) div 10000 as bigint)").alias(
                "hhi"
            ),
            F.max("share_bp").cast("long").alias("top_share_bp"),
        )
        .orderBy("n_name")
    )


HHI_SQL = """
WITH per_sup AS (
  SELECT n.n_name, sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS rev_c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name, l.l_suppkey
),
shared AS (
  SELECT n_name,
         rev_c * 10000 // sum(rev_c) OVER (PARTITION BY n_name) AS share_bp
  FROM per_sup
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(share_bp * share_bp) // 10000 AS BIGINT) AS hhi,
       CAST(max(share_bp) AS BIGINT) AS top_share_bp
FROM shared
GROUP BY n_name
ORDER BY n_name
"""


QUERIES: dict[str, QuerySpec] = {
    "window_funnel_steps": QuerySpec(
        window_funnel_steps, WINDOW_FUNNEL_SQL,
        "windowFunnel max-step-within-7d conversion staircase",
    ),
    "attribution_position_based": QuerySpec(
        attribution_position_based, ATTRIBUTION_SQL,
        "U-shaped multi-touch attribution, exact integer credit",
    ),
    "market_concentration_hhi": QuerySpec(
        market_concentration_hhi, HHI_SQL,
        "Herfindahl concentration per market on the integer bp grid",
    ),
}


# ---------------------------------------------------------------------------
# quantile_normalize_feature — empirical-CDF feature transform table
# ---------------------------------------------------------------------------


def quantile_normalize_feature(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile normalization (the rank/CDF feature transform): per
    event_type, each value maps to its empirical CDF in basis points —
    cdf_bp(v) = count(<= v) * 10000 div n — and the published transform
    table rolls the cents grid into CDF deciles (decile = cdf_bp div
    1000): rows, value range, exact boundaries. The preprocessing step
    that makes a heavy-tailed feature uniform before quantile-bucketed
    models; emitted as a TABLE (grid -> decile) so it can be broadcast-
    joined onto any scoring pass.

    Scale: groupBy on the (type, cents) grid with map-side combine, a
    cumulative window over the per-type DISTINCT-value grid (bounded, the
    r04 grid pattern), then a bounded rollup. All integer."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    per = (
        ev.select("event_type", cents.alias("cents"))
        .groupBy("event_type", "cents")
        .agg(F.count("*").alias("n_c"))
    )
    wcum = Window.partitionBy("event_type").orderBy("cents")
    wtot = Window.partitionBy("event_type")
    cum = per.withColumn("cum_n", F.sum("n_c").over(wcum)).withColumn(
        "n", F.sum("n_c").over(wtot)
    )
    decile = F.expr("least(cum_n * 10000 div n, 9999) div 1000")
    return (
        cum.withColumn("decile", decile)
        .groupBy("event_type", "decile")
        .agg(
            F.sum("n_c").alias("n_rows"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .select(
            "event_type",
            F.col("decile").cast("long").alias("decile"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("lo_cents").cast("long").alias("lo_cents"),
            F.col("hi_cents").cast("long").alias("hi_cents"),
        )
        .orderBy("event_type", "decile")
    )


QUANTILE_NORM_SQL = """
WITH per AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         count(*) AS n_c
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, cents, n_c,
         sum(n_c) OVER (PARTITION BY event_type ORDER BY cents) AS cum_n,
         sum(n_c) OVER (PARTITION BY event_type) AS n
  FROM per
)
SELECT event_type,
       CAST(least(cum_n * 10000 // n, 9999) // 1000 AS BIGINT) AS decile,
       CAST(sum(n_c) AS BIGINT) AS n_rows,
       CAST(min(cents) AS BIGINT) AS lo_cents,
       CAST(max(cents) AS BIGINT) AS hi_cents
FROM cum
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# golden_record_merge — survivorship merge (latest non-null per column)
# ---------------------------------------------------------------------------

GOLDEN_NULL_MOD = 7  # planted sparsity: every 7th event's value is missing


def golden_record_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Golden-record survivorship: per user, merge the LATEST NON-NULL
    observation of each attribute independently (the MDM merge rule,
    stricter than cdc_keep_latest's whole-row latest). Sparsity is
    planted deterministically — every 7th event's value is treated as
    missing — so the per-attribute and whole-row winners genuinely
    diverge. Implementation: max over struct(ts, event_id, attr)
    restricted to non-null rows — a PLAIN max, partial-combinable, no
    window, no sort; null structs fall out of max in both engines.

    Scale: one hash aggregation on user_id with map-side combine — the
    cheapest possible survivorship plan."""
    ev = load_table(spark, sf, "events")
    cents = F.when(
        F.col("event_id") % GOLDEN_NULL_MOD != 0,
        F.round(F.col("value") * 100).cast("long"),
    )
    base = ev.select(
        "user_id", "ts", "event_id", "event_type", cents.alias("cents")
    )
    latest_val = F.max(
        F.when(F.col("cents").isNotNull(), F.struct("ts", "event_id", "cents"))
    )["cents"]
    latest_type = F.max(F.struct("ts", "event_id", "event_type"))["event_type"]
    return (
        base.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.sum(F.col("cents").isNull().cast("long")).cast("long").alias("n_missing"),
            latest_val.cast("long").alias("golden_cents"),
            latest_type.alias("latest_type"),
        )
        .orderBy("user_id")
    )


GOLDEN_SQL = f"""
WITH base AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_id % {GOLDEN_NULL_MOD} != 0
              THEN CAST(round(value * 100) AS BIGINT) END AS cents
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(sum(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
       CAST((max(CASE WHEN cents IS NOT NULL
                      THEN {{'ts': ts, 'event_id': event_id, 'cents': cents}} END)).cents AS BIGINT) AS golden_cents,
       (max({{'ts': ts, 'event_id': event_id, 'event_type': event_type}})).event_type AS latest_type
FROM base
GROUP BY user_id
ORDER BY user_id
"""

QUERIES["quantile_normalize_feature"] = QuerySpec(
    quantile_normalize_feature, QUANTILE_NORM_SQL,
    "empirical-CDF quantile-normalization table on the integer grid",
)
QUERIES["golden_record_merge"] = QuerySpec(
    golden_record_merge, GOLDEN_SQL,
    "survivorship merge: latest non-null per attribute via plain struct max",
)
