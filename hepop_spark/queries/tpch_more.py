"""Additional TPC-H-shaped pipelines + subquery forms + skew-mitigation —
deepening the analytics surface (SURVEY §2 negative space / §7 Phase 2).

Includes the correlated-subquery family (EXISTS / IN / scalar subquery)
exercised through spark.sql so Catalyst's decorrelation machinery is what's
under test, and a salted two-stage aggregation that produces results
identical to the plain group-by — the standard skew-mitigation rewrite for
hot keys at 100 TB, verified against the unsalted oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from . import QuerySpec

# --- TPC-H shapes -----------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-agg; every predicate pushes to parquet."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery -> priority histogram.
    Catalyst decorrelates to a left-semi join."""
    register_views(spark, sf, tables=("orders", "lineitem"))
    return spark.sql("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, top-20 customers.
    Ranked on the rounded revenue (cross-engine-stable top-k)."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q14_promo_effect(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share. Numerator and denominator
    are rounded separately BEFORE the division so both engines divide
    identical doubles."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load_table(spark, sf, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(0.0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.round(F.sum(promo), 2)
                / F.nullif(F.round(F.sum(disc_price), 2), F.lit(0.0))
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT 100.0 * round(sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END), 2)
       / nullif(round(sum(l_extendedprice * (1 - l_discount)), 2), 0.0) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over an aggregate, then enrich with dims."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"), "total_qty",
        )
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       round(o_totalprice, 2) AS totalprice, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --- subquery family --------------------------------------------------------


def in_subquery(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf, tables=("orders", "customer"))
    return spark.sql("""
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
          AND o_totalprice > 100000
    """)


IN_SUBQUERY_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
  AND o_totalprice > 100000
"""


def scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Uncorrelated scalar subquery: compare each order to the global mean
    (the subquery result is broadcast — one extra tiny job, no shuffle on
    the fact side)."""
    register_views(spark, sf, tables=("orders",))
    return spark.sql("""
        SELECT o_orderstatus, count(*) AS n_above
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
    """)


SCALAR_SUBQUERY_SQL = """
SELECT o_orderstatus, count(*) AS n_above
FROM orders
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
GROUP BY o_orderstatus
"""


def having_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Plain HAVING over the events table (B-surface companion)."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .filter((F.col("n") > 50) & (F.col("total") > 1000))
    )


HAVING_SQL = """
SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
FROM events
GROUP BY user_id
HAVING count(*) > 50 AND round(sum(value), 2) > 1000
"""


# --- skew mitigation --------------------------------------------------------

SALT_BUCKETS = 8


def salted_groupby(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage salted aggregation: stage 1 aggregates on (key, salt) so a
    hot key's rows spread over SALT_BUCKETS reducers; stage 2 folds the
    partials. Result is IDENTICAL to the plain group-by (the oracle runs the
    unsalted query) — this is the verified skew-mitigation rewrite for the
    100 TB hot-key case. Counts fold exactly; the double sum is rounded only
    after the final fold."""
    ev = load_table(spark, sf, "events")
    stage1 = (
        ev.withColumn("salt", (F.col("event_id") % SALT_BUCKETS))
        .groupBy("user_id", "salt")
        .agg(F.sum("value").alias("psum"), F.count("*").alias("pcnt"))
    )
    return (
        stage1.groupBy("user_id")
        .agg(
            F.round(F.sum("psum"), 2).alias("total"),
            F.sum("pcnt").alias("n"),
        )
    )


SALTED_SQL = """
SELECT user_id, round(sum(value), 2) AS total, count(*) AS n
FROM events
GROUP BY user_id
"""


QUERIES: dict[str, QuerySpec] = {
    "q6_forecast_revenue": QuerySpec(q6_forecast_revenue, Q6_SQL),
    "q4_order_priority": QuerySpec(q4_order_priority, Q4_SQL),
    "q10_returned_items": QuerySpec(q10_returned_items, Q10_SQL),
    "q14_promo_effect": QuerySpec(q14_promo_effect, Q14_SQL),
    "q18_large_orders": QuerySpec(q18_large_orders, Q18_SQL),
    "in_subquery": QuerySpec(in_subquery, IN_SUBQUERY_SQL),
    "scalar_subquery": QuerySpec(scalar_subquery, SCALAR_SUBQUERY_SQL),
    "having_filter": QuerySpec(having_filter, HAVING_SQL),
    "salted_groupby": QuerySpec(salted_groupby, SALTED_SQL),
}
