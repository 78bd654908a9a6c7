"""Second breadth batch of the delegated SQL surface (SURVEY §2 B10 +
§2 negative-space operators the north star promotes to first-class):
window frames, rank family, explode/unnest, ordered string aggregation,
arg-max aggregates, non-equi (range) joins, cross join, manual central
moments, and grouped medians.

All spellings are ANSI-common so the DuckDB oracle runs the same semantics.
Scale notes are per-function docstrings — every shape here is a single
shuffle (or shuffle-free broadcast) at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from . import QuerySpec

# --- window frames: first/last/nth over explicit ROWS frames ------------------


def win_frame_rows(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit ROWS frames (first_value/last_value/nth_value). One shuffle
    on the partition key; frame evaluation is streaming within each sorted
    partition — scales linearly, no buffering beyond the frame."""
    register_views(spark, sf, tables=("events",))
    return spark.sql("""
        SELECT user_id, event_id,
               round(first_value(value) OVER w, 2) AS first_v,
               round(last_value(value) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_v,
               round(nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_v,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS sum3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """)


WIN_FRAME_ROWS_SQL = """
SELECT user_id, event_id,
       round(first_value(value) OVER w, 2) AS first_v,
       round(last_value(value) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_v,
       round(nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_v,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS sum3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


# --- rank family --------------------------------------------------------------


def win_rank_family(spark: SparkSession, sf: str) -> DataFrame:
    """dense_rank/percent_rank/cume_dist over a deterministic ordering
    (totalprice has collisions → rank over (price, key) tiebreak so both
    engines agree row-for-row)."""
    register_views(spark, sf, tables=("orders",))
    return spark.sql("""
        SELECT o_orderkey, o_orderpriority,
               CAST(dense_rank() OVER w AS BIGINT) AS drank,
               round(percent_rank() OVER w, 6) AS prank,
               round(cume_dist() OVER w, 6) AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """)


WIN_RANK_FAMILY_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(dense_rank() OVER w AS BIGINT) AS drank,
       round(percent_rank() OVER w, 6) AS prank,
       round(cume_dist() OVER w, 6) AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
"""


# --- explode / unnest ---------------------------------------------------------


def explode_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Lateral explode of a token array → per-token global counts: the
    tokenize-then-count shape of every corpus-frequency pipeline. Explode is
    narrow (no shuffle); the single shuffle is the groupBy, with map-side
    partial aggregation shrinking it to O(vocabulary)."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        SELECT tok, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT explode(split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''
        GROUP BY tok
    """)


EXPLODE_TOKENS_SQL = """
SELECT tok, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
WHERE tok <> ''
GROUP BY tok
"""


# --- ordered string aggregation ----------------------------------------------


def string_agg_sorted(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic list aggregation: collect_list has no ordering contract
    under parallel merge, so sort the collected array before joining —
    the only way an aggregated-string column is stable on a cluster."""
    register_views(spark, sf, tables=("nation", "region"))
    return spark.sql("""
        SELECT r_name,
               array_join(array_sort(collect_list(n_name)), ',') AS nations,
               CAST(count(*) AS BIGINT) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """)


STRING_AGG_SORTED_SQL = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       CAST(count(*) AS BIGINT) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- arg-max family -----------------------------------------------------------


def agg_argmax(spark: SparkSession, sf: str) -> DataFrame:
    """max_by/min_by (DuckDB arg_max/arg_min), count_if, bool_and/bool_or.
    Tie risk: o_totalprice collisions would make max_by nondeterministic, so
    the extremum is taken over a collision-free composite — a zero-padded
    (price, key) string, since DuckDB's arg_max can't order by a struct."""
    register_views(spark, sf, tables=("orders",))
    return spark.sql("""
        SELECT o_orderpriority,
               max_by(o_orderkey, format_string('%020.2f-%010d', o_totalprice, o_orderkey)) AS top_order,
               min_by(o_orderkey, format_string('%020.2f-%010d', o_totalprice, o_orderkey)) AS bottom_order,
               CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
               bool_and(o_totalprice > 1000) AS all_over_1k,
               bool_or(o_totalprice > 400000) AS any_over_400k
        FROM orders
        GROUP BY o_orderpriority
    """)


AGG_ARGMAX_SQL = """
SELECT o_orderpriority,
       arg_max(o_orderkey, printf('%020.2f-%010d', o_totalprice, o_orderkey)) AS top_order,
       arg_min(o_orderkey, printf('%020.2f-%010d', o_totalprice, o_orderkey)) AS bottom_order,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 400000) AS any_over_400k
FROM orders
GROUP BY o_orderpriority
"""


# --- non-equi range join ------------------------------------------------------


def range_join_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Band (range) join: events against a tiny derived bin table on
    value BETWEEN lo AND hi. The bin side is bounded (10 rows) → Spark picks
    BroadcastNestedLoopJoin: each executor scans its events partition once
    against an in-memory bin list — no shuffle at any scale."""
    register_views(spark, sf, tables=("events",))
    return spark.sql("""
        WITH bins AS (
            SELECT id AS bin_id, CAST(id * 10 AS DOUBLE) AS lo,
                   CAST((id + 1) * 10 AS DOUBLE) AS hi
            FROM range(0, 10)
        )
        SELECT bin_id, CAST(count(*) AS BIGINT) AS n,
               round(avg(value), 3) AS avg_v
        FROM events JOIN bins ON value >= lo AND value < hi
        GROUP BY bin_id
    """)


RANGE_JOIN_BINS_SQL = """
WITH bins AS (
    SELECT range AS bin_id, CAST(range * 10 AS DOUBLE) AS lo,
           CAST((range + 1) * 10 AS DOUBLE) AS hi
    FROM range(0, 10)
)
SELECT bin_id, CAST(count(*) AS BIGINT) AS n,
       round(avg(value), 3) AS avg_v
FROM events JOIN bins ON value >= lo AND value < hi
GROUP BY bin_id
"""


# --- cross join ---------------------------------------------------------------


def cross_join_dims(spark: SparkSession, sf: str) -> DataFrame:
    """Cartesian product of two small dims + a fact probe: the densified
    dimension grid (every region × every priority, even empty cells). Both
    inputs are bounded → broadcast NLJ, shuffle-free."""
    register_views(spark, sf, tables=("region", "orders"))
    return spark.sql("""
        SELECT r_name, pri, CAST(coalesce(n, 0) AS BIGINT) AS n
        FROM (SELECT r_name, pri FROM region
              CROSS JOIN (SELECT DISTINCT o_orderpriority AS pri FROM orders))
        LEFT JOIN (SELECT o_orderpriority, count(*) AS n
                   FROM orders WHERE o_orderkey % 5 = 0 GROUP BY o_orderpriority) f
          ON pri = f.o_orderpriority
    """)


CROSS_JOIN_DIMS_SQL = """
SELECT r_name, pri, CAST(coalesce(n, 0) AS BIGINT) AS n
FROM (SELECT r_name, pri FROM region
      CROSS JOIN (SELECT DISTINCT o_orderpriority AS pri FROM orders))
LEFT JOIN (SELECT o_orderpriority, count(*) AS n
           FROM orders WHERE o_orderkey % 5 = 0 GROUP BY o_orderpriority) f
  ON pri = f.o_orderpriority
"""


# --- manual central moments ---------------------------------------------------


def central_moments(spark: SparkSession, sf: str) -> DataFrame:
    """Skewness/kurtosis via explicit central-moment formulas (identical on
    both sides — Spark's skewness() is population g1 while DuckDB's is sample
    G1, so the built-ins are NOT cross-engine comparable; the moments are).
    Single-pass: sum/sum2/sum3/sum4 accumulate map-side, moments derive at
    the end — one aggregation, no second scan."""
    register_views(spark, sf, tables=("events",))
    moments = """
        SELECT event_type,
               count(*) AS n, avg(value) AS mu,
               avg(value * value) AS m2r,
               avg(value * value * value) AS m3r,
               avg(value * value * value * value) AS m4r
        FROM events GROUP BY event_type
    """
    final = """
        SELECT event_type,
               round(mu, 4) AS mean_v,
               round((m3r - 3 * mu * m2r + 2 * mu * mu * mu)
                     / power(m2r - mu * mu, 1.5), 4) AS skew_g1,
               round((m4r - 4 * mu * m3r + 6 * mu * mu * m2r - 3 * mu * mu * mu * mu)
                     / power(m2r - mu * mu, 2) - 3, 4) AS kurt_excess
        FROM ({m}) t
    """
    return spark.sql(final.format(m=moments))


CENTRAL_MOMENTS_SQL = """
SELECT event_type,
       round(mu, 4) AS mean_v,
       round((m3r - 3 * mu * m2r + 2 * mu * mu * mu)
             / power(m2r - mu * mu, 1.5), 4) AS skew_g1,
       round((m4r - 4 * mu * m3r + 6 * mu * mu * m2r - 3 * mu * mu * mu * mu)
             / power(m2r - mu * mu, 2) - 3, 4) AS kurt_excess
FROM (
    SELECT event_type,
           count(*) AS n, avg(value) AS mu,
           avg(value * value) AS m2r,
           avg(value * value * value) AS m3r,
           avg(value * value * value * value) AS m4r
    FROM events GROUP BY event_type
) t
"""


# --- grouped median -----------------------------------------------------------


def median_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped median (interpolated, type-7 in both engines). At scale this
    is the ordered-statistic shape: Spark computes it via sort-based
    aggregation within groups — prefer approx_percentile at 100 TB unless
    exactness is contractual (the percentiles query covers the approx path)."""
    register_views(spark, sf, tables=("lineitem",))
    # medians computed on the exact cents/unit grids and emitted UNROUNDED:
    # the interpolated midpoint of two integers is an exact .0/.5 double on
    # both engines, while round(median(price), 2) dies at a reachable ...5
    # boundary (found by the sf0.001 tri-scale sweep)
    return spark.sql("""
        SELECT l_returnflag,
               median(CAST(round(l_quantity) AS BIGINT)) AS med_qty,
               median(CAST(round(l_extendedprice * 100) AS BIGINT)) AS med_price_cents
        FROM lineitem GROUP BY l_returnflag
    """)


MEDIAN_AGG_SQL = """
SELECT l_returnflag,
       median(CAST(round(l_quantity) AS BIGINT)) AS med_qty,
       median(CAST(round(l_extendedprice * 100) AS BIGINT)) AS med_price_cents
FROM lineitem GROUP BY l_returnflag
"""


QUERIES: dict[str, QuerySpec] = {
    "win_frame_rows": QuerySpec(win_frame_rows, WIN_FRAME_ROWS_SQL),
    "win_rank_family": QuerySpec(win_rank_family, WIN_RANK_FAMILY_SQL),
    "explode_tokens": QuerySpec(explode_tokens, EXPLODE_TOKENS_SQL),
    "string_agg_sorted": QuerySpec(string_agg_sorted, STRING_AGG_SORTED_SQL),
    "agg_argmax": QuerySpec(agg_argmax, AGG_ARGMAX_SQL),
    "range_join_bins": QuerySpec(range_join_bins, RANGE_JOIN_BINS_SQL),
    "cross_join_dims": QuerySpec(cross_join_dims, CROSS_JOIN_DIMS_SQL),
    "central_moments": QuerySpec(central_moments, CENTRAL_MOMENTS_SQL),
    "median_agg": QuerySpec(median_agg, MEDIAN_AGG_SQL),
}
