"""Layer-B surface of the reference (SURVEY §2 B1-B10): the SQL capabilities
HEPop exposes by delegating to DuckDB (reference: query.js:162-172 forwards
SELECT list / residual WHERE / ORDER BY / LIMIT verbatim).

Spark SQL/Catalyst plays DuckDB's role here; every query is expressed with the
DataFrame API (or spark.sql) so Catalyst handles pushdown/pruning. The HEP
tables themselves don't exist in testdata — `events` is the HEP-shaped
fixture (`props` plays `rcinfo`'s JSON role, FIXTURES.md F4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from . import QuerySpec

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def fmt_ts(col, alias: str):
    """Timestamp -> canonical string so both engines hash identically."""
    return F.date_format(col, TS_FMT_SPARK).alias(alias)


# --- B1: projection, column lists, aliases (reference README.md:152) -------

def b1_projection(spark: SparkSession, sf: str) -> DataFrame:
    """Projection + computed aliases; Catalyst prunes the scan to 3 columns
    (reference: query.js:67-68 SELECT-list passthrough)."""
    ev = load_table(spark, sf, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("etype"),
        F.round(F.col("value") * 2, 2).alias("value_x2"),
    )


B1_SQL = """
SELECT event_id, upper(event_type) AS etype, round(value * 2, 2) AS value_x2
FROM events
"""


# --- B2: filters, AND/OR, LIKE (reference README.md:158) -------------------

def b2_filter_like(spark: SparkSession, sf: str) -> DataFrame:
    """`payload LIKE '%INVITE%'`-style predicate (reference query.js:120-125
    residual-WHERE passthrough); LIKE stays JVM-side and pushes a
    StringContains filter to the parquet scan."""
    docs = load_table(spark, sf, "documents")
    return docs.filter(
        F.col("text").like("%spark%") & (F.col("lang") == "en")
        | (F.col("n_chars") < 60)
    ).select("doc_id", "lang", "source", "n_chars")


B2_SQL = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE (text LIKE '%spark%' AND lang = 'en') OR n_chars < 60
"""


# --- B3: time-range predicate (reference query.js:88-117, 165-166) ---------

def b3_time_range(spark: SparkSession, sf: str) -> DataFrame:
    """`time >= '<T>'` rewritten to timestamp bounds in the reference;
    here a plain range predicate that Catalyst pushes to parquet row-group
    min/max stats — the engine-native replacement for the reference's
    metadata.json zone-map pruning (query.js:22-63)."""
    ev = load_table(spark, sf, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00"))
            & (F.col("ts") < F.lit("2024-01-12 00:00:00"))
        )
        .select("event_id", fmt_ts(F.col("ts"), "ts_s"), "event_type")
    )


B3_SQL = f"""
SELECT event_id, strftime(ts, '{TS_FMT_DUCK}') AS ts_s, event_type
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
"""


# --- B4: ORDER BY ... DESC (reference README.md:158, query.js:128-131) -----

def b4_order_limit(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-N: Sort + Limit collapses to TakeOrderedAndProject — no
    full global sort materialized, the scale-safe plan for ORDER BY+LIMIT."""
    ev = load_table(spark, sf, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id"))
        .select("event_id", "user_id", "value")
        .limit(50)
    )


B4_SQL = """
SELECT event_id, user_id, value
FROM events
ORDER BY value DESC, event_id
LIMIT 50
"""


# --- B5: LIMIT + OFFSET (README.md:135 documents OFFSET; reference drops it
#        silently, query.js:129-132 — we implement it correctly) ------------

def b5_limit_offset(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.select("event_id", "event_type").orderBy("event_id").offset(10).limit(20)


B5_SQL = """
SELECT event_id, event_type
FROM events
ORDER BY event_id
LIMIT 20 OFFSET 10
"""


# --- B6: aggregates count/avg with aliases (reference README.md:216,
#        examples/loopback_test.sh:46 `count() as count, avg(temp)`) --------

def b6_agg_basic(spark: SparkSession, sf: str) -> DataFrame:
    """Zero-group aggregate; partial+final automatic (map-side combine)."""
    ev = load_table(spark, sf, "events")
    # avg is grid-stabilized (round(sum,2)/n) so summation-order float noise
    # can't flip the last rounded digit between engines.
    return ev.agg(
        F.count("*").alias("n"),
        (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


B6_SQL = """
SELECT count(*) AS n,
       (round(sum(value), 2) / count(*)) AS avg_value,
       round(sum(value), 2) AS sum_value,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value
FROM events
"""


# --- B7: GROUP BY + ordered aggregate output (reference README.md:216) -----

def b7_group_agg(spark: SparkSession, sf: str) -> DataFrame:
    """`SELECT host, avg(used_percent) .. GROUP BY host ORDER BY .. DESC`
    shape; hash aggregate with map-side partials, shuffle only on the
    (low-cardinality) group key."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
            F.countDistinct("user_id").alias("users"),
        )
        .orderBy(F.col("avg_value").desc())
    )


B7_SQL = """
SELECT event_type, count(*) AS n,
       (round(sum(value), 2) / count(*)) AS avg_value,
       count(DISTINCT user_id) AS users
FROM events
GROUP BY event_type
ORDER BY avg_value DESC
"""


# --- B8: cross-file scan union (reference query.js:164 multi-file
#        read_parquet; README.md:165 glob query) ----------------------------

def b8_scan_union(spark: SparkSession, sf: str) -> DataFrame:
    """The reference unions many parquet files into one scan; Spark's file
    source does the same natively. Semantically exercised here as a UNION ALL
    of two time slices, which Catalyst folds into one scan Union."""
    ev = load_table(spark, sf, "events")
    a = ev.filter(F.col("ts") < "2024-01-05 00:00:00")
    b = ev.filter(F.col("ts") >= "2024-01-25 00:00:00")
    return (
        a.unionAll(b)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


B8_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM (
  SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
  UNION ALL
  SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
)
GROUP BY event_type
"""


# --- B9: virtual-field explosion from JSON header (reference README.md:
#        138-147; never implemented in query.js — we implement the documented
#        semantics, SURVEY §1.2) --------------------------------------------

def b9_virtual_fields(spark: SparkSession, sf: str) -> DataFrame:
    """`src_ip`-style query-time JSON extraction: get_json_object stays in
    whole-stage codegen; `events.props` plays `rcinfo`'s role."""
    ev = load_table(spark, sf, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


B9_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
FROM events
GROUP BY k
"""


# --- B10: scalar-function space reachable via passthrough (reference
#         query.js:162-170; ANSI core as the compatibility contract) --------

def b10_scalar_funcs(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf, tables=("orders",))
    return spark.sql("""
        SELECT o_orderkey,
               upper(substring(o_orderpriority, 1, 3)) AS pri3,
               length(o_orderstatus) AS st_len,
               concat(o_orderstatus, '-', o_orderpriority) AS status_pri,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               round(o_totalprice * 0.1, 3) AS tithe,
               CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
               abs(o_custkey - 100) AS custdist,
               CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice > 50000 THEN 'mid'
                    ELSE 'small' END AS size_class,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_x
        FROM orders
    """)


B10_SQL = """
SELECT o_orderkey,
       upper(substring(o_orderpriority, 1, 3)) AS pri3,
       length(o_orderstatus) AS st_len,
       concat(o_orderstatus, '-', o_orderpriority) AS status_pri,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       round(o_totalprice * 0.1, 3) AS tithe,
       CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
       abs(o_custkey - 100) AS custdist,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'small' END AS size_class,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_x
FROM orders
"""


QUERIES: dict[str, QuerySpec] = {
    "b1_projection": QuerySpec(b1_projection, B1_SQL),
    "b2_filter_like": QuerySpec(b2_filter_like, B2_SQL),
    "b3_time_range": QuerySpec(b3_time_range, B3_SQL),
    "b4_order_limit": QuerySpec(b4_order_limit, B4_SQL),
    "b5_limit_offset": QuerySpec(b5_limit_offset, B5_SQL),
    "b6_agg_basic": QuerySpec(b6_agg_basic, B6_SQL),
    "b7_group_agg": QuerySpec(b7_group_agg, B7_SQL),
    "b8_scan_union": QuerySpec(b8_scan_union, B8_SQL),
    "b9_virtual_fields": QuerySpec(b9_virtual_fields, B9_SQL),
    "b10_scalar_funcs": QuerySpec(b10_scalar_funcs, B10_SQL),
}
