"""Round-2 batch 5 — sequence pattern matching and geospatial join.

`pattern_3step_funnel` is the MATCH_RECOGNIZE niche (strict event order
with a time budget) expressed as chained earliest-transition joins — the
greedy semantics SQL pattern matching uses, built from three aggregations
that reuse ONE user_id partitioning. `geo_distance_join` is the classic
spatial-join decomposition: a coarse equi-joinable grid key bounds the
candidate pairs, an exact haversine refine keeps correctness — the shape
that replaces an impossible cross join at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# pattern_3step_funnel — strict-order signup -> click -> purchase in 24h
# ---------------------------------------------------------------------------

PATTERN_BUDGET_H = 24


def pattern_3step_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Strict-order pattern match per user: first signup, then the FIRST
    click after it, then the FIRST purchase after that click, with the
    whole chain inside a 24 h budget — earliest-transition (greedy)
    semantics, the same a MATCH_RECOGNIZE `A B C` pattern uses. Each step
    is a conditional-min aggregation joined back on user_id; all three
    shuffles share the same key so the sort/exchange is reused. Output is
    the per-stage survivor funnel."""
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    s1 = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("t").alias("t1")
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("t") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("t") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t3"), F.min("t1").alias("t1"))
    )
    budget_us = PATTERN_BUDGET_H * 3_600 * 1_000_000
    done = s3.filter(F.col("t3") - F.col("t1") <= budget_us)
    return (
        s1.agg(F.count("*").alias("stage1_signup"))
        .crossJoin(s2.agg(F.count("*").alias("stage2_click_after")))
        .crossJoin(s3.agg(F.count("*").alias("stage3_purchase_after")))
        .crossJoin(done.agg(F.count("*").alias("converted_within_budget")))
    )


PATTERN_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
), s1 AS (
  SELECT user_id, min(t) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT ev.user_id, min(ev.t) AS t2, min(s1.t1) AS t1
  FROM ev JOIN s1 USING (user_id)
  WHERE ev.event_type = 'click' AND ev.t > s1.t1
  GROUP BY ev.user_id
), s3 AS (
  SELECT ev.user_id, min(ev.t) AS t3, min(s2.t1) AS t1
  FROM ev JOIN s2 USING (user_id)
  WHERE ev.event_type = 'purchase' AND ev.t > s2.t2
  GROUP BY ev.user_id
)
SELECT (SELECT count(*) FROM s1) AS stage1_signup,
       (SELECT count(*) FROM s2) AS stage2_click_after,
       (SELECT count(*) FROM s3) AS stage3_purchase_after,
       (SELECT count(*) FROM s3
        WHERE t3 - t1 <= CAST({PATTERN_BUDGET_H} AS BIGINT) * 3600 * 1000000)
           AS converted_within_budget
"""


# ---------------------------------------------------------------------------
# geo_distance_join — grid-bucketed haversine neighborhood join
# ---------------------------------------------------------------------------

GEO_RADIUS_KM = 500.0
GEO_BAND_DEG = 5  # grid cell: 5 degrees latitude (~556 km) covers the radius


def _with_coords(df: DataFrame, key: str, a: int, b: int) -> DataFrame:
    """Deterministic synthetic coordinates from the integer key (the
    testdata has no geo columns): lat in [-60, 60), lon in [-180, 180) —
    polar latitudes excluded so a fixed longitude window stays a valid
    bounding prefilter."""
    return df.withColumn(
        "lat", ((F.col(key) * a) % 12000) / 100.0 - 60.0
    ).withColumn("lon", ((F.col(key) * b) % 36000) / 100.0 - 180.0)


_HAVERSINE = (
    "2 * 6371.0 * asin(sqrt("
    "pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
)


def geo_distance_join(spark: SparkSession, sf: str) -> DataFrame:
    """Spatial neighborhood join: customers within 500 km of each supplier
    (deterministic synthetic coordinates). The scalable plan: both sides
    get a coarse latitude-band grid key, suppliers explode to their band
    ±1, the join is a plain EQUI-join on the band, and an exact rounded
    haversine refines — candidate pairs shrink from |C|x|S| to
    ~(3/24)·|C|x|S| here and to O(local density) with a 2-D grid at real
    scale. The oracle is the naive cross join + haversine, proving the
    grid prefilter loses no pair (band width 5° > 500 km guarantees
    containment in latitude)."""
    cust = _with_coords(
        load_table(spark, sf, "customer").select("c_custkey"), "c_custkey", 7919, 104729
    )
    supp = _with_coords(
        load_table(spark, sf, "supplier").select("s_suppkey"), "s_suppkey", 6151, 9973
    )
    c = cust.withColumn("band", F.floor(F.col("lat") / GEO_BAND_DEG)).select(
        "c_custkey", F.col("lat").alias("clat"), F.col("lon").alias("clon"), "band"
    )
    s = (
        supp.withColumn("b0", F.floor(F.col("lat") / GEO_BAND_DEG))
        .withColumn("db", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "s_suppkey",
            F.col("lat").alias("slat"),
            F.col("lon").alias("slon"),
            (F.col("b0") + F.col("db")).alias("band"),
        )
    )
    dist = _HAVERSINE.format(lat1="clat", lon1="clon", lat2="slat", lon2="slon")
    pairs = (
        c.join(s, "band")
        .withColumn("dist_km", F.round(F.expr(dist), 1))
        .filter(F.col("dist_km") <= GEO_RADIUS_KM)
    )
    return (
        pairs.groupBy("s_suppkey")
        .agg(
            F.count("*").alias("n_within"),
            F.min("dist_km").alias("nearest_km"),
        )
    )


_DIST_DUCK = _HAVERSINE.format(
    lat1="c.lat", lon1="c.lon", lat2="s.lat", lon2="s.lon"
)

GEO_SQL = f"""
WITH c AS (
  SELECT c_custkey,
         (c_custkey * 7919) % 12000 / 100.0 - 60.0 AS lat,
         (c_custkey * 104729) % 36000 / 100.0 - 180.0 AS lon
  FROM customer
), s AS (
  SELECT s_suppkey,
         (s_suppkey * 6151) % 12000 / 100.0 - 60.0 AS lat,
         (s_suppkey * 9973) % 36000 / 100.0 - 180.0 AS lon
  FROM supplier
), pairs AS (
  SELECT s.s_suppkey, round({_DIST_DUCK}, 1) AS dist_km
  FROM c CROSS JOIN s
)
SELECT s_suppkey, count(*) AS n_within, min(dist_km) AS nearest_km
FROM pairs WHERE dist_km <= {GEO_RADIUS_KM}
GROUP BY s_suppkey
"""


QUERIES: dict[str, QuerySpec] = {
    "pattern_3step_funnel": QuerySpec(
        pattern_3step_funnel, PATTERN_SQL, "strict-order greedy sequence match"
    ),
    "geo_distance_join": QuerySpec(
        geo_distance_join, GEO_SQL, "grid-bucketed haversine neighborhood join"
    ),
}
