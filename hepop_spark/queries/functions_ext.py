"""Extended scalar/aggregate function families — the rest of the delegated
SQL surface (SURVEY §2 B10: "full DuckDB scalar-function space reachable via
passthrough", query.js:162-170). ANSI-common spellings only, so the same
semantics hold in Spark SQL and the DuckDB oracle.

Also: ordered-statistics (percentiles), sample statistics, and approximate
aggregates (HLL count-distinct, with its exact twin as the oracle-checked
bound)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from . import QuerySpec

# --- string function family -------------------------------------------------


def str_funcs(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf, tables=("part",))
    return spark.sql("""
        SELECT p_partkey,
               trim(p_name) AS name_trim,
               lower(p_brand) AS brand_lc,
               replace(p_type, ' ', '_') AS type_us,
               split_part(p_type, ' ', 1) AS type_head,
               lpad(CAST(p_size AS STRING), 4, '0') AS size_pad,
               reverse(p_brand) AS brand_rev,
               left(p_name, 5) AS name5,
               right(p_brand, 2) AS brand2,
               repeat('x', p_size % 3) AS xs,
               CAST(length(p_name) AS BIGINT) AS name_len,
               CAST(instr(p_brand, '#') AS BIGINT) AS hash_pos,
               substring(p_name, 3, 4) AS name_mid
        FROM part
    """)


STR_FUNCS_SQL = """
SELECT p_partkey,
       trim(p_name) AS name_trim,
       lower(p_brand) AS brand_lc,
       replace(p_type, ' ', '_') AS type_us,
       split_part(p_type, ' ', 1) AS type_head,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       reverse(p_brand) AS brand_rev,
       left(p_name, 5) AS name5,
       right(p_brand, 2) AS brand2,
       repeat('x', p_size % 3) AS xs,
       CAST(length(p_name) AS BIGINT) AS name_len,
       CAST(strpos(p_brand, '#') AS BIGINT) AS hash_pos,
       substring(p_name, 3, 4) AS name_mid
FROM part
"""


# --- date/time function family ----------------------------------------------


def date_funcs(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf, tables=("orders",))
    # dayofweek normalized to ISO (Mon=1..Sun=7): Spark dayofweek is
    # 1=Sunday; DuckDB isodow is 1=Monday — expressed explicitly both sides.
    return spark.sql("""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               CAST(day(o_orderdate) AS BIGINT) AS dom,
               CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
               CAST(CASE WHEN dayofweek(o_orderdate) = 1 THEN 7
                         ELSE dayofweek(o_orderdate) - 1 END AS BIGINT) AS isodow,
               date_format(o_orderdate, 'yyyy-MM') AS ym,
               date_format(last_day(o_orderdate), 'yyyy-MM-dd') AS month_end,
               date_format(date_add(o_orderdate, 30), 'yyyy-MM-dd') AS plus30,
               CAST(datediff(DATE '2000-01-01', o_orderdate) AS BIGINT) AS days_to_y2k
        FROM orders
    """)


DATE_FUNCS_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(day(o_orderdate) AS BIGINT) AS dom,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
       CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
       strftime(o_orderdate, '%Y-%m') AS ym,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k
FROM orders
"""


# --- regexp family ----------------------------------------------------------


def regex_funcs(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf, tables=("documents",))
    return spark.sql(r"""
        SELECT doc_id,
               regexp_extract(text, '([a-z]+)', 1) AS first_word,
               CAST(length(regexp_replace(text, '[aeiou]', '')) AS BIGINT) AS no_vowel_len,
               CASE WHEN text RLIKE '(table|scan)' THEN 1 ELSE 0 END AS mentions_scan,
               CAST(size(regexp_extract_all(text, '(value)', 1)) AS BIGINT) AS n_value
        FROM documents
    """)


REGEX_FUNCS_SQL = r"""
SELECT doc_id,
       coalesce(regexp_extract(text, '([a-z]+)', 1), '') AS first_word,
       CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS no_vowel_len,
       CASE WHEN regexp_matches(text, '(table|scan)') THEN 1 ELSE 0 END AS mentions_scan,
       CAST(length(regexp_extract_all(text, '(value)', 1)) AS BIGINT) AS n_value
FROM documents
"""


# --- array/map family (built over split tokens) ------------------------------


def array_funcs(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        SELECT doc_id,
               CAST(size(t) AS BIGINT) AS n_toks,
               array_join(slice(t, 1, 3), '-') AS head3,
               element_at(t, 1) AS first_tok,
               element_at(t, -1) AS last_tok,
               CAST(size(array_distinct(t)) AS BIGINT) AS n_uniq,
               CAST(array_position(t, 'table') AS BIGINT) AS table_pos,
               CASE WHEN array_contains(t, 'spark') THEN 1 ELSE 0 END AS has_spark
        FROM (SELECT doc_id, split(text, ' ') AS t FROM documents)
    """)


ARRAY_FUNCS_SQL = """
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_toks,
       array_to_string(t[1:3], '-') AS head3,
       t[1] AS first_tok,
       t[-1] AS last_tok,
       CAST(len(list_distinct(t)) AS BIGINT) AS n_uniq,
       CAST(coalesce(list_position(t, 'table'), 0) AS BIGINT) AS table_pos,
       CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END AS has_spark
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
"""


# --- ordered statistics / percentiles ----------------------------------------


def percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated percentiles (type-7 quantile in both engines); rounded
    to 3 (interpolation of 2-decimal values terminates at 3 decimals —
    grid-safe)."""
    ev = load_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 3).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 3).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 3).alias("p99"),
    )


PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 3) AS p50,
       round(quantile_cont(value, 0.9), 3) AS p90,
       round(quantile_cont(value, 0.99), 3) AS p99
FROM events GROUP BY event_type
"""


def stats_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Sample statistics (stddev/variance/correlation). True values are
    irrational — never on a rounding midpoint — so round(.,4) is stable
    despite different accumulation algorithms."""
    orders = load_table(spark, sf, "orders")
    return orders.agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_total"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var_total"),
        F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("corr_tc"),
        F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias("covar_tc"),
    )


STATS_AGG_SQL = """
SELECT round(stddev_samp(o_totalprice), 4) AS sd_total,
       round(var_samp(o_totalprice), 2) AS var_total,
       round(corr(o_totalprice, o_custkey), 6) AS corr_tc,
       round(covar_samp(o_totalprice, o_custkey), 2) AS covar_tc
FROM orders
"""


# --- approximate aggregates ---------------------------------------------------


def approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL approximate count-distinct. Sketches differ across engines, so
    the ORACLE-CHECKED columns are the exact count and a boolean asserting
    the approximation landed within 5% — the accuracy contract itself is
    verified, not the sketch internals."""
    ev = load_table(spark, sf, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            (
                F.abs(F.approx_count_distinct("user_id", rsd=0.02) - F.countDistinct("user_id"))
                / F.countDistinct("user_id")
            )
            <= 0.05
        ).alias("approx_within_5pct"),
    )


APPROX_DISTINCT_SQL = """
SELECT count(DISTINCT user_id) AS exact_users,
       abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
         * 1.0 / count(DISTINCT user_id) <= 0.05 AS approx_within_5pct
FROM events
"""


# --- conditional / null-handling family --------------------------------------


def null_funcs(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf, tables=("customer", "orders"))
    # left join produces genuine NULLs to exercise the null family
    return spark.sql("""
        SELECT c_custkey,
               coalesce(n_orders, 0) AS n_orders,
               CASE WHEN n_orders IS NULL THEN 'none'
                    WHEN n_orders > 10 THEN 'many' ELSE 'some' END AS order_class,
               ifnull(max_price, -1.0) AS max_price_f,
               nullif(c_mktsegment, 'BUILDING') AS seg_nb,
               CAST(isnull(n_orders) AS INT) AS is_orderless
        FROM customer
        LEFT JOIN (
            SELECT o_custkey, count(*) AS n_orders, round(max(o_totalprice), 2) AS max_price
            FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey
        ) o ON c_custkey = o.o_custkey
    """)


NULL_FUNCS_SQL = """
SELECT c_custkey,
       coalesce(n_orders, 0) AS n_orders,
       CASE WHEN n_orders IS NULL THEN 'none'
            WHEN n_orders > 10 THEN 'many' ELSE 'some' END AS order_class,
       ifnull(max_price, -1.0) AS max_price_f,
       nullif(c_mktsegment, 'BUILDING') AS seg_nb,
       CAST(n_orders IS NULL AS INT) AS is_orderless
FROM customer
LEFT JOIN (
    SELECT o_custkey, count(*) AS n_orders, round(max(o_totalprice), 2) AS max_price
    FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey
) o ON c_custkey = o.o_custkey
"""


# --- math family --------------------------------------------------------------


def math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf, tables=("lineitem",))
    return spark.sql("""
        SELECT l_orderkey, l_linenumber,
               round(sqrt(l_quantity), 6) AS sqrt_q,
               round(ln(l_extendedprice), 6) AS ln_p,
               round(log10(l_extendedprice), 6) AS log10_p,
               round(power(l_discount, 2), 6) AS disc_sq,
               CAST(ceil(l_quantity / 7) AS BIGINT) AS q_ceil7,
               CAST(floor(l_quantity / 7) AS BIGINT) AS q_floor7,
               CAST(l_quantity AS BIGINT) % 5 AS q_mod5,
               CAST(sign(l_quantity - 25) AS BIGINT) AS q_sign,
               greatest(l_discount, l_tax) AS max_rate,
               least(l_discount, l_tax) AS min_rate
        FROM lineitem
        WHERE l_linenumber = 1
    """)


MATH_FUNCS_SQL = """
SELECT l_orderkey, l_linenumber,
       round(sqrt(l_quantity), 6) AS sqrt_q,
       round(ln(l_extendedprice), 6) AS ln_p,
       round(log10(l_extendedprice), 6) AS log10_p,
       round(power(l_discount, 2), 6) AS disc_sq,
       CAST(ceil(l_quantity / 7) AS BIGINT) AS q_ceil7,
       CAST(floor(l_quantity / 7) AS BIGINT) AS q_floor7,
       CAST(l_quantity AS BIGINT) % 5 AS q_mod5,
       CAST(sign(l_quantity - 25) AS BIGINT) AS q_sign,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate
FROM lineitem
WHERE l_linenumber = 1
"""


QUERIES: dict[str, QuerySpec] = {
    "str_funcs": QuerySpec(str_funcs, STR_FUNCS_SQL),
    "date_funcs": QuerySpec(date_funcs, DATE_FUNCS_SQL),
    "regex_funcs": QuerySpec(regex_funcs, REGEX_FUNCS_SQL),
    "array_funcs": QuerySpec(array_funcs, ARRAY_FUNCS_SQL),
    "percentiles": QuerySpec(percentiles, PERCENTILES_SQL),
    "stats_agg": QuerySpec(stats_agg, STATS_AGG_SQL),
    "approx_distinct": QuerySpec(approx_distinct, APPROX_DISTINCT_SQL),
    "null_funcs": QuerySpec(null_funcs, NULL_FUNCS_SQL),
    "math_funcs": QuerySpec(math_funcs, MATH_FUNCS_SQL),
}
