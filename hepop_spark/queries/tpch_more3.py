"""Fourth SQL-surface batch: the ten TPC-H query shapes not yet in the
inventory (q2, q8, q9, q11, q12, q15, q17, q19, q20, q21), adapted to the
reduced synthetic schema (no partsupp table — part/supplier pairings come
from lineitem; no shipmode/commitdate columns — l_returnflag plays the
"mode" role where needed).

Reference context: HEPop itself has no joins or subqueries at all
(SURVEY §2 negative space, query.js:71-84 single-table grammar); this whole
family is north-star analytics surface expressed through Spark SQL/Catalyst.

Scale notes per query; the recurring pattern: nation/region/part filters
broadcast, lineitem-sized joins co-partition on their keys, scalar
subqueries evaluate once and broadcast as literals.

Float rule (see project memory): aggregate doubles are grid-stabilized with
round(sum(...), 2) BEFORE any division; never round(avg()) — midpoint ties
flip between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from . import QuerySpec

# --- TPC-H Q2 shape: minimum-cost supplier per part ---------------------------


def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q2 shape: correlated scalar MIN subquery selecting, per part, the
    supplier(s) whose average sale price for that part is the minimum
    (partsupp.ps_supplycost replaced by avg lineitem price per
    part-supplier pair). Catalyst decorrelates the scalar subquery into an
    aggregate + join on p_partkey — one co-partitioned shuffle pair, no
    per-row subquery execution. Ties on the min keep all qualifying
    suppliers (a filter, not a rank) so no tiebreak is needed.

    ps_cost_milli is EXACT integer arithmetic (tenth-of-cent unit prices,
    price*100 is integral so round() has no representation boundary): a
    round(sum(double),2) here flipped .xx5-boundary groups between engines
    at sf0.1 — Spark rounds the shortest-decimal repr, DuckDB the raw
    bits. MIN/equality over exact ints is stable at every SF."""
    register_views(spark, sf, tables=("lineitem", "part", "supplier", "nation"))
    return spark.sql("""
        WITH partsupp AS (
            SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                   sum((CAST(round(l_extendedprice * 100) AS BIGINT) * 10)
                       DIV CAST(l_quantity AS BIGINT)) AS ps_cost_milli
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, ps_cost_milli
        FROM partsupp
        JOIN part ON p_partkey = ps_partkey
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_size = 15
          AND ps_cost_milli = (SELECT min(ps2.ps_cost_milli)
                               FROM partsupp ps2
                               WHERE ps2.ps_partkey = p_partkey)
    """)


Q2_SQL = """
WITH partsupp AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           CAST(sum((CAST(round(l_extendedprice * 100) AS BIGINT) * 10)
                    // CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_cost_milli
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, ps_cost_milli
FROM partsupp
JOIN part ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size = 15
  AND ps_cost_milli = (SELECT min(ps2.ps_cost_milli)
                       FROM partsupp ps2
                       WHERE ps2.ps_partkey = p_partkey)
"""


# --- TPC-H Q8 shape: national market share ------------------------------------


def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """Q8 shape: market share of one supplier nation inside one customer
    region, by order year — conditional aggregation (sum(CASE)/sum) over a
    5-way join. nation/region broadcast; the share divides two
    grid-stabilized sums (identical doubles on both engines) so the
    quotient is bit-identical."""
    register_views(
        spark, sf,
        tables=("lineitem", "orders", "customer", "supplier", "nation", "region"),
    )
    return spark.sql("""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               round(sum(CASE WHEN n2.n_name = (SELECT n_name FROM nation WHERE n_nationkey = 1)
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
               / round(sum(l_extendedprice * (1 - l_discount)), 2) AS mkt_share
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        WHERE r_name = (SELECT r_name FROM region WHERE r_regionkey = 0)
        GROUP BY year(o_orderdate)
    """)


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN n2.n_name = (SELECT n_name FROM nation WHERE n_nationkey = 1)
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
       / round(sum(l_extendedprice * (1 - l_discount)), 2) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
WHERE r_name = (SELECT r_name FROM region WHERE r_regionkey = 0)
GROUP BY year(o_orderdate)
"""


# --- TPC-H Q9 shape: product-type profit by nation and year -------------------


def q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """Q9 shape: profit per supplier nation per year for parts matching a
    name pattern (ps_supplycost replaced by a retail-price cost proxy).
    part filter prunes before the join (predicate pushdown to the parquet
    scan); nation broadcasts; the heavy joins co-partition on
    l_partkey/l_suppkey/l_orderkey."""
    register_views(
        spark, sf, tables=("lineitem", "orders", "part", "supplier", "nation"),
    )
    return spark.sql("""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - 0.1 * p_retailprice * l_quantity), 2) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, year(o_orderdate)
    """)


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.1 * p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


# --- TPC-H Q11 shape: important inventory value (HAVING vs global scalar) -----


def q11_important_value(spark: SparkSession, sf: str) -> DataFrame:
    """Q11 shape: per-part sale value from one nation's suppliers, keeping
    parts whose value exceeds a fraction of the nation's total — a scalar
    subquery inside HAVING. The global total computes once (same
    aggregation, tiny result) and broadcasts as a literal into the HAVING
    filter; main aggregation shuffles once on l_partkey."""
    register_views(spark, sf, tables=("lineitem", "supplier", "nation"))
    return spark.sql("""
        SELECT l_partkey AS ps_partkey,
               round(sum(l_extendedprice * l_quantity), 2) AS part_value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_nationkey = 3
        GROUP BY l_partkey
        HAVING round(sum(l_extendedprice * l_quantity), 2) >
               (SELECT 0.001 * sum(l_extendedprice * l_quantity)
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
                WHERE n_nationkey = 3)
    """)


Q11_SQL = """
SELECT l_partkey AS ps_partkey,
       round(sum(l_extendedprice * l_quantity), 2) AS part_value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_nationkey = 3
GROUP BY l_partkey
HAVING round(sum(l_extendedprice * l_quantity), 2) >
       (SELECT 0.001 * sum(l_extendedprice * l_quantity)
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_nationkey = 3)
"""


# --- TPC-H Q12 shape: shipping-mode priority classification -------------------


def q12_priority_class(spark: SparkSession, sf: str) -> DataFrame:
    """Q12 shape: join + dual conditional aggregation classifying order
    priority per "mode" (l_returnflag plays l_shipmode's role — the schema
    has no shipmode column). One co-partitioned join on orderkey, then a
    3-group aggregation — the conditional sums fold into the partial
    (map-side) aggregate."""
    register_views(spark, sf, tables=("lineitem", "orders"))
    return spark.sql("""
        SELECT l_returnflag AS mode,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity > 10
        GROUP BY l_returnflag
    """)


Q12_SQL = """
SELECT l_returnflag AS mode,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_quantity > 10
GROUP BY l_returnflag
"""


# --- TPC-H Q15 shape: top supplier by revenue (view + MAX scalar) -------------


def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q15 shape: revenue-per-supplier CTE consumed twice — once for the
    global MAX (scalar subquery) and once for the equality filter. Spark
    evaluates the CTE per reference; the MAX side reduces to one scalar and
    broadcasts. Ties on max keep all suppliers (filter semantics) — no
    tiebreak needed."""
    register_views(spark, sf, tables=("lineitem", "supplier"))
    return spark.sql("""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """)


Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# --- TPC-H Q17 shape: small-quantity order revenue (correlated AVG) -----------


def q17_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q17 shape: lineitems below 0.5 × the part's average quantity —
    correlated scalar AVG subquery, decorrelated by Catalyst into an
    aggregate on l_partkey + join (one shuffle pair, no per-row execution).
    Single-row result; the sum is grid-stabilized before the /7 scaling."""
    register_views(spark, sf, tables=("lineitem", "part"))
    return spark.sql("""
        SELECT round(sum(l_extendedprice), 2) / 7.0 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)
    """)


Q17_SQL = """
SELECT round(sum(l_extendedprice), 2) / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


# --- TPC-H Q19 shape: disjunctive predicate revenue ---------------------------


def q19_disjunctive(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs mixing join-side predicates (brand/size ∧
    quantity band). Catalyst extracts the common l_partkey=p_partkey
    conjunct as the join key and keeps the disjunction as a post-join
    residual; part-side IN-list/range conjuncts are NOT pushed below the
    join (they live under the OR), which is the interesting planning
    property of this shape."""
    register_views(spark, sf, tables=("lineitem", "part"))
    return spark.sql("""
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 40)
    """)


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 40)
"""


# --- TPC-H Q20 shape: suppliers with excess volume (nested IN) ----------------


def q20_excess_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """Q20 shape: two nested IN subqueries — suppliers whose shipped
    quantity of forest-pattern parts exceeds a per-(part,supplier)
    threshold. Inner IN (part-name pattern) broadcasts its key set; the
    grouped-HAVING subquery compiles to aggregate → semi join on
    s_suppkey. Ordered by key for a deterministic listing."""
    register_views(spark, sf, tables=("lineitem", "part", "supplier", "nation"))
    return spark.sql("""
        SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%o%')
              AND l_shipdate >= TIMESTAMP '1995-01-01'
            GROUP BY l_suppkey
            HAVING sum(l_quantity) > 50
        )
          AND n_regionkey = 0
        ORDER BY s_name
    """)


Q20_SQL = """
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%o%')
      AND l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 50
)
  AND n_regionkey = 0
ORDER BY s_name
"""


# --- TPC-H Q21 shape: suppliers who kept the order waiting --------------------


def q21_waiting_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q21 shape: correlated EXISTS (another supplier contributed to the
    same order) + correlated NOT EXISTS (no OTHER supplier had a returned
    line) — self-joins on lineitem with an inequality on suppkey inside
    the correlation. Both decorrelate to semi/anti joins co-partitioned on
    l_orderkey. Group-count output keeps the result deterministic without
    a top-k tiebreak."""
    register_views(spark, sf, tables=("lineitem", "orders", "supplier"))
    return spark.sql("""
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
    """)


Q21_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
"""


QUERIES: dict[str, QuerySpec] = {
    "q2_min_cost_supplier": QuerySpec(q2_min_cost_supplier, Q2_SQL),
    "q8_market_share": QuerySpec(q8_market_share, Q8_SQL),
    "q9_product_profit": QuerySpec(q9_product_profit, Q9_SQL),
    "q11_important_value": QuerySpec(q11_important_value, Q11_SQL),
    "q12_priority_class": QuerySpec(q12_priority_class, Q12_SQL),
    "q15_top_supplier": QuerySpec(q15_top_supplier, Q15_SQL),
    "q17_small_qty_revenue": QuerySpec(q17_small_qty_revenue, Q17_SQL),
    "q19_disjunctive": QuerySpec(q19_disjunctive, Q19_SQL),
    "q20_excess_suppliers": QuerySpec(q20_excess_suppliers, Q20_SQL),
    "q21_waiting_supplier": QuerySpec(q21_waiting_supplier, Q21_SQL),
}
