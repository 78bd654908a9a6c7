"""Analytics operators beyond the reference's own surface (SURVEY §2 negative
space: the reference implements NO joins / windows / set ops / grouping sets
anywhere in its own code — its regex parser even mis-plans multi-table SQL,
query.js:71-84). These are first-class tested operators here because the
north star targets full analytics-engine capability.

Scale notes are attached per query: broadcast vs shuffle join choice, partial
aggregation, and rank-based top-k are what survive a 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from . import QuerySpec

# --- TPC-H-flavored multi-operator pipelines --------------------------------


def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy agg over lineitem. One shuffle on the tiny
    (returnflag, linestatus) key; everything before it is map-side partial
    aggregation inside whole-stage codegen."""
    li = load_table(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            # grid-stabilized avgs (round(sum,2)/n): immune to cross-engine
            # summation-order noise at rounding midpoints
            (F.round(F.sum("l_quantity"), 2) / F.count("*")).alias("avg_qty"),
            (F.round(F.sum("l_extendedprice"), 2) / F.count("*")).alias("avg_price"),
            (F.round(F.sum("l_discount"), 2) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       (round(sum(l_quantity), 2) / count(*)) AS avg_qty,
       (round(sum(l_extendedprice), 2) / count(*)) AS avg_price,
       (round(sum(l_discount), 2) / count(*)) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-10.
    customer is small relative to lineitem: broadcast it; orders⋈lineitem is
    the one real shuffle. Ranking on the ROUNDED revenue keeps the top-10 set
    identical across engines despite float summation order."""
    cust = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = load_table(spark, sf, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(F.round(revenue, 2).alias("revenue"))
    )
    return (
        joined.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. region/nation/supplier/customer are all
    broadcast-able dims — only lineitem⋈orders shuffles. At 100 TB the same
    plan holds: dims stay < broadcast threshold, fact joins co-partition on
    orderkey."""
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf, "nation")
    supplier = load_table(spark, sf, "supplier")
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC
"""


def join_broadcast_dim(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit broadcast-hash join of the fact table against a small dim —
    zero shuffle on the 100 TB side (lineitem), only the post-join agg
    shuffles on the 25-ish brand key."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


JOIN_BROADCAST_SQL = """
SELECT p_brand, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one high-value order.
    Semi joins never duplicate the left side and broadcast the filter set."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


def join_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no high-value order."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


def join_outer(spark: SparkSession, sf: str) -> DataFrame:
    """Full outer join on per-nation aggregates of customers vs suppliers."""
    cust = (
        load_table(spark, sf, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        load_table(spark, sf, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


JOIN_OUTER_SQL = """
SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
       coalesce(c.n_cust, 0) AS n_cust,
       coalesce(s.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
ON c.c_nationkey = s.s_nationkey
"""


def join_null_safe(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): nationkeys
    divisible by 7 are nulled on BOTH sides, and the null groups must still
    pair up — the semantic a plain equi-join silently drops. Aggregated
    before the join so each side is one row per key.

    Scale: eqNullSafe is still a hash-join key (null hashes to a bucket
    like any value) — same shuffle/broadcast behavior as `=`."""
    cust = (
        load_table(spark, sf, "customer")
        .select(
            F.when(F.col("c_nationkey") % 7 == 0, None)
            .otherwise(F.col("c_nationkey"))
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").alias("n_cust"))
        .alias("c")
    )
    supp = (
        load_table(spark, sf, "supplier")
        .select(
            F.when(F.col("s_nationkey") % 7 == 0, None)
            .otherwise(F.col("s_nationkey"))
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").alias("n_supp"))
        .alias("s")
    )
    return cust.join(supp, F.col("c.k").eqNullSafe(F.col("s.k"))).select(
        F.col("c.k").alias("k"), "n_cust", "n_supp"
    )


JOIN_NULL_SAFE_SQL = """
WITH c AS (
    SELECT CASE WHEN c_nationkey % 7 = 0 THEN NULL ELSE c_nationkey END AS k,
           count(*) AS n_cust
    FROM customer GROUP BY 1
),
s AS (
    SELECT CASE WHEN s_nationkey % 7 = 0 THEN NULL ELSE s_nationkey END AS k,
           count(*) AS n_supp
    FROM supplier GROUP BY 1
)
SELECT c.k, c.n_cust, s.n_supp
FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
"""


LATERAL_TOPN_SQL = """
SELECT n.n_name, l.c_name, l.c_acctbal
FROM nation n, LATERAL (
    SELECT c_name, c_acctbal
    FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_name
    LIMIT 2
) l
"""


def lateral_join_topn(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 customers per nation) — the ANSI
    form of per-group top-k, run as the IDENTICAL SQL text on both engines.
    Catalyst decorrelates the lateral into a ranked window join (no
    per-nation re-execution); the tiebreak (c_acctbal DESC, c_name) makes
    the top-2 unique on both engines."""
    register_views(spark, sf, tables=("nation", "customer"))
    return spark.sql(LATERAL_TOPN_SQL)


# --- Window functions -------------------------------------------------------


def win_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 users by spend per event_type via row_number — the scale-safe
    top-k-per-group (no global sort; one shuffle on the partition key).
    Rank on the ROUNDED sum so both engines rank identical values."""
    ev = load_table(spark, sf, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 4).alias("total")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("total").desc(), F.col("user_id"))
    return (
        per_user.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "user_id", "total", F.col("rk").cast("long").alias("rk"))
    )


WIN_TOPK_SQL = """
WITH per_user AS (
  SELECT event_type, user_id, round(sum(value), 4) AS total
  FROM events GROUP BY event_type, user_id
)
SELECT event_type, user_id, total,
       CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY total DESC, user_id) AS rk
  FROM per_user
)
WHERE rk <= 3
"""


def win_lag_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user event-over-event delta via lag() — partitioned window, no
    global sort; partition key = user_id spreads across the cluster."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
    )


WIN_LAG_SQL = """
SELECT event_id, user_id,
       round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
FROM events
"""


def win_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    """3-row trailing moving average per user (ROWS frame)."""
    ev = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 4).alias("mov_avg")
    )


WIN_MOVING_SQL = """
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg
FROM events
"""


def win_cumulative(spark: SparkSession, sf: str) -> DataFrame:
    """Running total per customer over their order history."""
    orders = load_table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("run_total"),
    )


WIN_CUMULATIVE_SQL = """
SELECT o_orderkey, o_custkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
FROM orders
"""


def win_ntile_rank(spark: SparkSession, sf: str) -> DataFrame:
    """rank/dense_rank/ntile family over account balances (rounded key so
    tie groups agree across engines)."""
    cust = load_table(spark, sf, "customer")
    base = cust.select(
        "c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("bal")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("bal").desc(), F.col("c_custkey"))
    return base.select(
        "c_custkey",
        "c_mktsegment",
        "bal",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


WIN_NTILE_SQL = """
SELECT c_custkey, c_mktsegment, bal,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM (SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS bal FROM customer)
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY bal DESC, c_custkey)
"""


# --- Set operations ---------------------------------------------------------


def set_union(spark: SparkSession, sf: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    a = cust.filter(F.col("c_acctbal") > 9000).select(F.col("c_custkey").alias("k"))
    b = orders.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("k"))
    return a.union(b).distinct()


SET_UNION_SQL = """
SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
UNION
SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
"""


def set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    a = cust.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    b = orders.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("k"))
    return a.intersect(b)


SET_INTERSECT_SQL = """
SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
"""


def set_except(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    a = cust.select(F.col("c_custkey").alias("k"))
    b = orders.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b).distinct()


SET_EXCEPT_SQL = """
SELECT c_custkey AS k FROM customer
EXCEPT
SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
"""


def set_ops_all(spark: SparkSession, sf: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL — row
    multiplicities preserved, unlike the DISTINCT defaults): customers'
    nation keys vs suppliers' nation keys, with per-key multiplicity
    accounting proving the ALL semantics survived. Identical SQL text on
    both engines."""
    register_views(spark, sf, tables=("customer", "supplier"))
    return spark.sql(_SET_OPS_ALL_SQL)


_SET_OPS_ALL_SQL = """
WITH i AS (
    SELECT c_nationkey AS k FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS k FROM supplier
),
e AS (
    SELECT c_nationkey AS k FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS k FROM supplier
)
SELECT 'intersect_all' AS op, k, CAST(count(*) AS BIGINT) AS n FROM i GROUP BY k
UNION ALL
SELECT 'except_all' AS op, k, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY k
"""


def group_by_all(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP BY ALL (group on every non-aggregate select item — the
    modern-SQL sugar both engines implement): identical SQL text runs on
    both."""
    register_views(spark, sf, tables=("orders",))
    return spark.sql(_GROUP_BY_ALL_SQL)


_GROUP_BY_ALL_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY ALL
"""


# --- Grouping sets / rollup / cube -----------------------------------------


def rollup_agg(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def cube_agg(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )


CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def grouping_sets_agg(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf, tables=("orders",))
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- Distinct / conditional aggregation ------------------------------------


def distinct_exact(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("users"),
        F.countDistinct("event_type").alias("types"),
        F.countDistinct("user_id", "event_type").alias("user_type_pairs"),
    )


DISTINCT_SQL = """
SELECT count(DISTINCT user_id) AS users,
       count(DISTINCT event_type) AS types,
       count(DISTINCT (user_id, event_type)) AS user_type_pairs
FROM events
"""


def pivot_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot expressed as conditional aggregation (CASE WHEN) — the form that
    stays a single hash aggregate at any scale."""
    ev = load_table(spark, sf, "events")

    def cnt(t):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")

    return ev.groupBy("user_id").agg(
        cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error")
    )


PIVOT_SQL = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS n_click,
       count(*) FILTER (WHERE event_type = 'view') AS n_view,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       count(*) FILTER (WHERE event_type = 'error') AS n_error
FROM events GROUP BY user_id
"""


def subquery_agg_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated-style filter: orders above their customer's average order
    value (decorrelated to an explicit join — the plan Spark/DuckDB both pick)."""
    orders = load_table(spark, sf, "orders")
    avg_per_cust = orders.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("avg_total"))
    return (
        orders.join(avg_per_cust, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("avg_total") * 1.5)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


SUBQUERY_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
FROM orders o
JOIN (SELECT o_custkey AS k, avg(o_totalprice) AS avg_total FROM orders GROUP BY o_custkey) a
  ON o.o_custkey = a.k
WHERE o.o_totalprice > a.avg_total * 1.5
"""


QUERIES: dict[str, QuerySpec] = {
    "q1_pricing_summary": QuerySpec(q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": QuerySpec(q3_shipping_priority, Q3_SQL),
    "q5_local_supplier": QuerySpec(q5_local_supplier, Q5_SQL),
    "join_broadcast_dim": QuerySpec(join_broadcast_dim, JOIN_BROADCAST_SQL),
    "join_semi": QuerySpec(join_semi, JOIN_SEMI_SQL),
    "join_anti": QuerySpec(join_anti, JOIN_ANTI_SQL),
    "join_outer": QuerySpec(join_outer, JOIN_OUTER_SQL),
    "join_null_safe": QuerySpec(join_null_safe, JOIN_NULL_SAFE_SQL),
    "lateral_join_topn": QuerySpec(lateral_join_topn, LATERAL_TOPN_SQL),
    "set_ops_all": QuerySpec(set_ops_all, _SET_OPS_ALL_SQL),
    "group_by_all": QuerySpec(group_by_all, _GROUP_BY_ALL_SQL),
    "win_topk_per_group": QuerySpec(win_topk_per_group, WIN_TOPK_SQL),
    "win_lag_delta": QuerySpec(win_lag_delta, WIN_LAG_SQL),
    "win_moving_avg": QuerySpec(win_moving_avg, WIN_MOVING_SQL),
    "win_cumulative": QuerySpec(win_cumulative, WIN_CUMULATIVE_SQL),
    "win_ntile_rank": QuerySpec(win_ntile_rank, WIN_NTILE_SQL),
    "set_union": QuerySpec(set_union, SET_UNION_SQL),
    "set_intersect": QuerySpec(set_intersect, SET_INTERSECT_SQL),
    "set_except": QuerySpec(set_except, SET_EXCEPT_SQL),
    "rollup_agg": QuerySpec(rollup_agg, ROLLUP_SQL),
    "cube_agg": QuerySpec(cube_agg, CUBE_SQL),
    "grouping_sets_agg": QuerySpec(grouping_sets_agg, GROUPING_SETS_SQL),
    "distinct_exact": QuerySpec(distinct_exact, DISTINCT_SQL),
    "pivot_conditional": QuerySpec(pivot_conditional, PIVOT_SQL),
    "subquery_agg_filter": QuerySpec(subquery_agg_filter, SUBQUERY_SQL),
}
