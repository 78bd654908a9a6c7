"""Fourth breadth batch: relational reshaping (unpivot/stack, posexplode
with ordinality, map round-trips), lead/lag pairing, and bitwise functions.
ANSI-common spellings; where the engines' surface syntax diverges
(UNPIVOT vs stack(), unnest WITH ORDINALITY vs posexplode) the SEMANTICS
are identical and that is what the oracle pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from . import QuerySpec

# --- unpivot / stack ----------------------------------------------------------


def unpivot_stack(spark: SparkSession, sf: str) -> DataFrame:
    """Wide→long reshape: one row per (orderkey, measure). Spark's stack()
    is a generator expression — narrow, no shuffle; DuckDB spells it
    UNPIVOT. The 3× row expansion happens scan-side, before any exchange."""
    register_views(spark, sf, tables=("orders",))
    return spark.sql("""
        SELECT o_orderkey, measure, round(val, 2) AS val
        FROM (
            SELECT o_orderkey,
                   stack(2, 'totalprice', o_totalprice,
                            'custkey_x100', CAST(o_custkey AS DOUBLE) * 100.0)
                       AS (measure, val)
            FROM orders
        ) u
        WHERE o_orderkey <= 2000
    """)


UNPIVOT_STACK_SQL = """
SELECT o_orderkey, measure, round(val, 2) AS val
FROM (
    SELECT o_orderkey, o_totalprice AS totalprice,
           CAST(o_custkey AS DOUBLE) * 100.0 AS custkey_x100
    FROM orders
) w
UNPIVOT (val FOR measure IN (totalprice, custkey_x100))
WHERE o_orderkey <= 2000
"""


# --- posexplode / unnest WITH ORDINALITY --------------------------------------


def posexplode_ordinal(spark: SparkSession, sf: str) -> DataFrame:
    """Position-preserving explode: (doc_id, position, token). Positions are
    1-based on both sides (Spark posexplode is 0-based — shifted
    explicitly). Narrow op; the downstream filter keeps output bounded."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        SELECT doc_id, CAST(pos + 1 AS BIGINT) AS ordinality, tok
        FROM documents
        LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok
        WHERE doc_id <= 50 AND pos < 5
    """)


POSEXPLODE_SQL = """
SELECT doc_id, CAST(ord AS BIGINT) AS ordinality, tok
FROM (
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS ord,
           unnest(string_split(text, ' ')) AS tok
    FROM documents
) t
WHERE doc_id <= 50 AND ord <= 5
"""


# --- map round-trip -----------------------------------------------------------


def map_entries_explode(spark: SparkSession, sf: str) -> DataFrame:
    """MapType surface: build a map from columns, explode back to rows, and
    aggregate per key — proving the native map column (not JSON-string)
    path the reference never had (its tags are JSON text, hepop.js:1084).
    The oracle reproduces the same (key, value) rows without a map type:
    the semantics pinned are entry iteration + per-key aggregation."""
    register_views(spark, sf, tables=("customer",))
    return spark.sql("""
        SELECT k, CAST(count(*) AS BIGINT) AS n, round(sum(v), 2) AS total
        FROM (
            SELECT explode(map('acctbal', c_acctbal,
                               'natkey', CAST(c_nationkey AS DOUBLE))) AS (k, v)
            FROM customer
        ) e
        GROUP BY k
    """)


MAP_ENTRIES_SQL = """
SELECT k, CAST(count(*) AS BIGINT) AS n, round(sum(v), 2) AS total
FROM (
    SELECT 'acctbal' AS k, c_acctbal AS v FROM customer
    UNION ALL
    SELECT 'natkey' AS k, CAST(c_nationkey AS DOUBLE) AS v FROM customer
) e
GROUP BY k
"""


# --- lead/lag pairing ---------------------------------------------------------


def win_lead_lag_pair(spark: SparkSession, sf: str) -> DataFrame:
    """lead+lag in one window (per-user previous and next event value, with
    defaults at the edges) — the symmetric twin of win_lag_delta. One
    shuffle on user_id, single sorted pass."""
    register_views(spark, sf, tables=("events",))
    return spark.sql("""
        SELECT user_id, event_id,
               round(lag(value, 1, 0.0) OVER w, 2) AS prev_v,
               round(lead(value, 1, -1.0) OVER w, 2) AS next_v,
               CASE WHEN lead(value, 1) OVER w IS NULL THEN 1 ELSE 0 END AS is_last
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """)


WIN_LEAD_LAG_SQL = """
SELECT user_id, event_id,
       round(lag(value, 1, 0.0) OVER w, 2) AS prev_v,
       round(lead(value, 1, -1.0) OVER w, 2) AS next_v,
       CASE WHEN lead(value, 1) OVER w IS NULL THEN 1 ELSE 0 END AS is_last
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


# --- bitwise family -----------------------------------------------------------


def bitwise_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise ops over integer keys (the SimHash/bucket-mask toolkit used
    by the LLM operators, exercised directly)."""
    register_views(spark, sf, tables=("part",))
    return spark.sql("""
        SELECT p_partkey,
               p_partkey & 255 AS low_byte,
               p_partkey | 4096 AS with_flag,
               CAST(p_partkey ^ 1365 AS BIGINT) AS xored,
               shiftleft(p_partkey, 2) AS shl2,
               shiftright(p_partkey, 3) AS shr3,
               CAST(bit_count(p_partkey) AS BIGINT) AS popcnt
        FROM part
    """)


BITWISE_SQL = """
SELECT p_partkey,
       p_partkey & 255 AS low_byte,
       p_partkey | 4096 AS with_flag,
       CAST(xor(p_partkey, 1365) AS BIGINT) AS xored,
       p_partkey << 2 AS shl2,
       p_partkey >> 3 AS shr3,
       CAST(bit_count(p_partkey) AS BIGINT) AS popcnt
FROM part
"""


QUERIES: dict[str, QuerySpec] = {
    "unpivot_stack": QuerySpec(unpivot_stack, UNPIVOT_STACK_SQL),
    "posexplode_ordinal": QuerySpec(posexplode_ordinal, POSEXPLODE_SQL),
    "map_entries_explode": QuerySpec(map_entries_explode, MAP_ENTRIES_SQL),
    "win_lead_lag_pair": QuerySpec(win_lead_lag_pair, WIN_LEAD_LAG_SQL),
    "bitwise_funcs": QuerySpec(bitwise_funcs, BITWISE_SQL),
}


# --- FILTER clause aggregates ---------------------------------------------


def agg_filter_clause(spark: SparkSession, sf: str) -> DataFrame:
    """Per-aggregate FILTER clauses: several conditional aggregates in one
    pass over the scan (the alternative — one scan per condition — is the
    classic accidental-N-scans mistake at scale)."""
    register_views(spark, sf, tables=("lineitem",))
    return spark.sql("""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_all,
               CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_heavy,
               round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS rich_disc_rev,
               round(max(l_extendedprice) FILTER (WHERE l_tax = 0.0), 2) AS max_notax
        FROM lineitem
        GROUP BY l_returnflag
    """)


AGG_FILTER_SQL = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_all,
       CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_heavy,
       round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS rich_disc_rev,
       round(max(l_extendedprice) FILTER (WHERE l_tax = 0.0), 2) AS max_notax
FROM lineitem
GROUP BY l_returnflag
"""


# --- error-safe try_* family ------------------------------------------------


def try_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Error-safe expression family: try_cast on mixed-validity strings and
    try_divide by a sometimes-zero denominator yield NULL instead of
    runtime failure — the difference between a 100 TB job that finishes
    with a null-audit and one that dies at hour 9 on a bad row."""
    register_views(spark, sf, tables=("part",))
    return spark.sql("""
        SELECT p_partkey,
               try_cast(split_part(p_type, ' ', 1) AS DOUBLE) AS type_num,
               try_cast(CAST(p_size AS STRING) AS DOUBLE) AS size_num,
               try_divide(p_retailprice, p_size % 3) AS per_mod,
               try_cast(p_brand AS DOUBLE) AS brand_num
        FROM part
    """)


TRY_FUNCS_SQL = """
SELECT p_partkey,
       TRY_CAST(split_part(p_type, ' ', 1) AS DOUBLE) AS type_num,
       TRY_CAST(CAST(p_size AS VARCHAR) AS DOUBLE) AS size_num,
       CASE WHEN p_size % 3 = 0 THEN NULL
            ELSE p_retailprice / (p_size % 3) END AS per_mod,
       TRY_CAST(p_brand AS DOUBLE) AS brand_num
FROM part
"""

QUERIES["agg_filter_clause"] = QuerySpec(agg_filter_clause, AGG_FILTER_SQL)
QUERIES["try_funcs"] = QuerySpec(try_funcs, TRY_FUNCS_SQL)


# --- IGNORE NULLS window navigation ------------------------------------------


def win_ignore_nulls(spark: SparkSession, sf: str) -> DataFrame:
    """last_value(... IGNORE NULLS) — the forward-fill / last-known-value
    shape (sensor gaps, sparse metrics). NULLs are synthesized
    deterministically (every 3rd event), then each row carries the latest
    non-null value at-or-before it. Single shuffle on user_id."""
    register_views(spark, sf, tables=("events",))
    return spark.sql("""
        SELECT user_id, event_id,
               round(v, 2) AS v,
               round(last_value(v) IGNORE NULLS OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS ffill_v
        FROM (SELECT user_id, event_id,
                     CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
              FROM events) t
    """)


WIN_IGNORE_NULLS_SQL = """
SELECT user_id, event_id,
       round(v, 2) AS v,
       round(last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS ffill_v
FROM (SELECT user_id, event_id,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
      FROM events) t
"""

QUERIES["win_ignore_nulls"] = QuerySpec(win_ignore_nulls, WIN_IGNORE_NULLS_SQL)


def variant_json_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4's VARIANT type over the reference's JSON-string data model
    (rcinfo/props are stored as opaque JSON text, hepop.js:182-184):
    parse_json(props) -> VARIANT, typed variant_get extraction, then an
    aggregate over the extracted values. VARIANT keeps a binary-encoded
    shredded form — repeated path access skips re-parsing the text, the
    right answer for semi-structured columns at scale. The oracle extracts
    the same path with DuckDB's JSON operators."""
    register_views(spark, sf, tables=("events",))
    return spark.sql("""
        WITH v AS (
            SELECT event_type, parse_json(props) AS pv FROM events
        )
        SELECT event_type,
               CAST(count(variant_get(pv, '$.k', 'int')) AS BIGINT) AS n_k,
               CAST(sum(variant_get(pv, '$.k', 'int')) AS BIGINT) AS sum_k,
               CAST(min(variant_get(pv, '$.k', 'int')) AS INT) AS min_k,
               CAST(max(variant_get(pv, '$.k', 'int')) AS INT) AS max_k
        FROM v
        GROUP BY event_type
    """)


VARIANT_SQL = """
SELECT event_type,
       CAST(count(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS n_k,
       CAST(sum(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(min(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS min_k,
       CAST(max(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS max_k
FROM events
GROUP BY event_type
"""

QUERIES["variant_json_ops"] = QuerySpec(variant_json_ops, VARIANT_SQL)


def json_corrupt_handling(spark: SparkSession, sf: str) -> DataFrame:
    """Malformed-input discipline for JSON columns: every third event's
    props is corrupted (truncated brace) before parsing; from_json /
    try-style extraction must yield NULL for the bad rows — never an
    error, never a phantom value — and the accounting splits good/bad
    exactly. The reference would store the broken text silently and fail
    at read (its payloads are never validated, hepop.js:183); here the
    failure surface is explicit and bounded. get_json_object on a corrupt
    document returns NULL on both engines (DuckDB: json_extract on
    invalid -> NULL via TRY)."""
    register_views(spark, sf, tables=("events",))
    return spark.sql("""
        WITH mangled AS (
            SELECT event_type,
                   CASE WHEN event_id % 3 = 0
                        THEN substring(props, 1, length(props) - 1)
                        ELSE props END AS p
            FROM events
        )
        SELECT event_type,
               CAST(count(get_json_object(p, '$.k')) AS BIGINT) AS n_parsed,
               CAST(sum(CASE WHEN get_json_object(p, '$.k') IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
               CAST(sum(CAST(get_json_object(p, '$.k') AS INT)) AS BIGINT) AS sum_k
        FROM mangled
        GROUP BY event_type
    """)


JSON_CORRUPT_SQL = """
WITH mangled AS (
    SELECT event_type,
           CASE WHEN event_id % 3 = 0
                THEN substring(props, 1, length(props) - 1)
                ELSE props END AS p
    FROM events
),
ex AS (
    SELECT event_type,
           CASE WHEN json_valid(p)
                THEN CAST(json_extract_string(p, '$.k') AS INTEGER) END AS k
    FROM mangled
)
SELECT event_type,
       CAST(count(k) AS BIGINT) AS n_parsed,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
       CAST(sum(k) AS BIGINT) AS sum_k
FROM ex
GROUP BY event_type
"""

QUERIES["json_corrupt_handling"] = QuerySpec(json_corrupt_handling, JSON_CORRUPT_SQL)


def array_set_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Array set algebra (union / intersect / except) over per-user
    event-type sets from the two halves of the month. collect_set order is
    nondeterministic, so every array is array_sort'ed before comparison
    and serialized with concat_ws — set semantics, stable hash. The
    oracle rebuilds the same algebra from DuckDB list primitives
    (list_except doesn't exist there: list_filter + NOT list_contains)."""
    register_views(spark, sf, tables=("events",))
    return spark.sql("""
        WITH halves AS (
            SELECT user_id,
                   collect_set(event_type)
                       FILTER (WHERE day(ts) <= 15) AS a,
                   collect_set(event_type)
                       FILTER (WHERE day(ts) > 15) AS b
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               concat_ws(',', array_sort(array_union(a, b))) AS u_types,
               concat_ws(',', array_sort(array_intersect(a, b))) AS i_types,
               concat_ws(',', array_sort(array_except(a, b))) AS e_types
        FROM halves
    """)


ARRAY_SET_SQL = """
WITH halves AS (
    SELECT user_id,
           coalesce(array_agg(DISTINCT event_type)
               FILTER (WHERE date_part('day', ts) <= 15), []) AS a,
           coalesce(array_agg(DISTINCT event_type)
               FILTER (WHERE date_part('day', ts) > 15), []) AS b
    FROM events GROUP BY user_id
)
SELECT user_id,
       coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','),
                '') AS u_types,
       coalesce(array_to_string(list_sort(list_intersect(a, b)), ','), '')
           AS i_types,
       coalesce(array_to_string(
           list_sort(list_filter(a, x -> NOT list_contains(b, x))), ','), '')
           AS e_types
FROM halves
"""

QUERIES["array_set_funcs"] = QuerySpec(array_set_funcs, ARRAY_SET_SQL)


def date_month_arith(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-month arithmetic with end-of-month clamping (the semantics
    both engines share: Jan 31 + 1 month = Feb 29 in a leap year):
    add_months over a spread of offsets, aggregated per resulting month."""
    register_views(spark, sf, tables=("events",))
    return spark.sql("""
        SELECT date_format(add_months(CAST(ts AS DATE),
                                      CAST(event_id % 13 AS INT) - 6),
                           'yyyy-MM') AS month,
               CAST(count(*) AS BIGINT) AS n
        FROM events
        GROUP BY 1
    """)


DATE_MONTH_SQL = """
SELECT strftime(CAST(ts AS DATE) + to_months(CAST(event_id % 13 AS INTEGER) - 6),
                '%Y-%m') AS month,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1
"""

QUERIES["date_month_arith"] = QuerySpec(date_month_arith, DATE_MONTH_SQL)
