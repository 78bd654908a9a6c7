"""Third SQL-surface batch: the remaining distinctive TPC-H query shapes
(adapted to the reduced synthetic schema — no partsupp/comment/phone
columns), correlated EXISTS/NOT EXISTS, time-interval RANGE window frames,
and the JSON build/extract family (the reference stores all nested data as
JSON strings — rcinfo/tags, SURVEY §1.2 — so query-time JSON extraction is
core surface, B9/B10).

Scale notes inline; every join here is either broadcast (dim side bounded)
or a single co-partitioned shuffle on the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from . import QuerySpec

# --- TPC-H Q7: volume shipping between two nations ---------------------------


def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """Q7 shape: revenue flow between two nations by year. nation is tiny →
    both nation joins broadcast; the only shuffles are lineitem⋈orders and
    ⋈customer on their keys. Citation: reference has no joins at all
    (SURVEY §2 negative space) — this is north-star surface."""
    register_views(spark, sf, tables=("lineitem", "orders", "customer", "supplier", "nation"))
    return spark.sql("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_nationkey = 1 AND n2.n_nationkey = 2)
           OR (n1.n_nationkey = 2 AND n2.n_nationkey = 1)
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """)


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_nationkey = 1 AND n2.n_nationkey = 2)
   OR (n1.n_nationkey = 2 AND n2.n_nationkey = 1)
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


# --- TPC-H Q13: customer order-count distribution ----------------------------


def q13_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Q13 shape: LEFT OUTER JOIN with a join-time residual predicate, then
    a two-level aggregation (per-customer count → distribution of counts).
    The second groupBy keys on the count itself — tiny cardinality, cheap
    shuffle; the heavy join co-partitions on custkey."""
    register_views(spark, sf, tables=("customer", "orders"))
    return spark.sql("""
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """)


Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


# --- TPC-H Q16 shape: distinct supplier count with NOT IN ---------------------


def q16_supplier_cnt(spark: SparkSession, sf: str) -> DataFrame:
    """Q16 shape (partsupp replaced by lineitem's part/supp pairing):
    count(DISTINCT supplier) per part attribute group, excluding a NOT IN
    subquery. NOT IN over a nullable-free key compiles to a broadcast
    null-aware anti join; the distinct aggregation shuffles once on the
    (brand,type,size) group key."""
    register_views(spark, sf, tables=("lineitem", "part", "supplier"))
    return spark.sql("""
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """)


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- TPC-H Q22 shape: rich customers with no orders ---------------------------


def q22_global_sales(spark: SparkSession, sf: str) -> DataFrame:
    """Q22 shape: scalar subquery (global average) + correlated NOT EXISTS
    anti join + final aggregation (no-urgent-orders predicate keeps the
    result nonempty on the synthetic data — every rich customer has SOME
    order, unlike TPC-H proper). The scalar subquery computes once and
    broadcasts; NOT EXISTS compiles to a left-anti hash join on custkey."""
    register_views(spark, sf, tables=("customer", "orders"))
    return spark.sql("""
        SELECT code, CAST(count(*) AS BIGINT) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM (
            SELECT c_nationkey % 5 AS code, c_acctbal, c_custkey
            FROM customer
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        ) rich
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = rich.c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY code
    """)


Q22_SQL = """
SELECT code, CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM (
    SELECT c_nationkey % 5 AS code, c_acctbal, c_custkey
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
) rich
WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = rich.c_custkey
                            AND o_orderpriority = '1-URGENT')
GROUP BY code
"""


# --- correlated EXISTS + NOT EXISTS (Q21 flavor) ------------------------------


def exists_correlated(spark: SparkSession, sf: str) -> DataFrame:
    """Q21 flavor: orders that have a heavy lineitem (EXISTS) and no
    returned lineitem (NOT EXISTS). Both correlated subqueries decorrelate
    to semi/anti hash joins on l_orderkey — two co-partitioned shuffles,
    no per-row subquery execution."""
    register_views(spark, sf, tables=("orders", "lineitem"))
    return spark.sql("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
          AND NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """)


EXISTS_CORRELATED_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
  AND NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# --- time-interval RANGE window frame ----------------------------------------


def win_range_time(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-1-hour per-user running aggregate via a RANGE frame over
    event time — the time-decayed-metric shape (rate limiting, rolling
    quotas). RANGE frames handle ties by peer-group, so both engines agree
    without a tiebreak. One shuffle on user_id; frame evaluation is a
    sliding pointer over each sorted partition."""
    register_views(spark, sf, tables=("events",))
    return spark.sql("""
        SELECT event_id, user_id,
               CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
               round(sum(value) OVER w, 2) AS sum_trailing_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """)


WIN_RANGE_TIME_SQL = """
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
       round(sum(value) OVER w, 2) AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


# --- JSON build/extract family ------------------------------------------------


def json_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """JSON round-trip: build a JSON document from columns, then extract
    scalars, array length, and key lists — the reference's entire nested
    data model is JSON strings (rcinfo at hepop.js:182, tags at
    hepop.js:1084), so this family is its query-time surface. Extracted
    values (not raw JSON text) are compared: engines may differ on number
    formatting inside the serialized string."""
    register_views(spark, sf, tables=("customer",))
    return spark.sql("""
        SELECT c_custkey,
               get_json_object(j, '$.name') AS name_j,
               CAST(get_json_object(j, '$.bal') AS DOUBLE) AS bal_j,
               CAST(json_array_length(arr) AS BIGINT) AS arr_len,
               array_join(json_object_keys(j), ',') AS keys_csv
        FROM (
            SELECT c_custkey,
                   to_json(named_struct('name', c_name, 'bal', c_acctbal)) AS j,
                   concat('[', c_custkey, ',', c_nationkey, ',',
                          c_nationkey * 2, ']') AS arr
            FROM customer
        ) built
    """)


JSON_FUNCS_SQL = """
SELECT c_custkey,
       json_extract_string(j, '$.name') AS name_j,
       CAST(json_extract(j, '$.bal') AS DOUBLE) AS bal_j,
       CAST(json_array_length(arr) AS BIGINT) AS arr_len,
       array_to_string(json_keys(j), ',') AS keys_csv
FROM (
    SELECT c_custkey,
           to_json(struct_pack(name := c_name, bal := c_acctbal)) AS j,
           concat('[', c_custkey, ',', c_nationkey, ',',
                  c_nationkey * 2, ']') AS arr
    FROM customer
) built
"""


QUERIES: dict[str, QuerySpec] = {
    "q7_volume_shipping": QuerySpec(q7_volume_shipping, Q7_SQL),
    "q13_count_distribution": QuerySpec(q13_count_distribution, Q13_SQL),
    "q16_supplier_cnt": QuerySpec(q16_supplier_cnt, Q16_SQL),
    "q22_global_sales": QuerySpec(q22_global_sales, Q22_SQL),
    "exists_correlated": QuerySpec(exists_correlated, EXISTS_CORRELATED_SQL),
    "win_range_time": QuerySpec(win_range_time, WIN_RANGE_TIME_SQL),
    "json_funcs": QuerySpec(json_funcs, JSON_FUNCS_SQL),
}
