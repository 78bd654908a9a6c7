"""Round-3 function-surface extension: bitwise AGGREGATES (flag-mask
folding), string family two (translate/overlay/initcap/levenshtein/
format), and interval arithmetic — completing the scalar/aggregate
function matrix started in functions_ext.py (SURVEY B10 passthrough
surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from . import QuerySpec

# ---------------------------------------------------------------------------
# agg_bitwise_masks — bit_and / bit_or / bit_xor aggregates
# ---------------------------------------------------------------------------


def agg_bitwise_masks(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise aggregate folding over planted permission masks (mask =
    event_id %% 256): per event_type, the bits set in EVERY row (bit_and),
    in ANY row (bit_or), and the parity fold (bit_xor) — the
    flag-consolidation shape behind capability audits and Bloom-ish
    presence summaries. All monoid aggregates, partial-combined.

    Scale: one bounded-key groupBy; masks are ints, no strings."""
    ev = load_table(spark, sf, "events")
    mask = (F.col("event_id") % 256).cast("long")
    return (
        ev.select("event_type", mask.alias("mask"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr("bit_and(mask)").cast("long").alias("bits_all"),
            F.expr("bit_or(mask)").cast("long").alias("bits_any"),
            F.expr("bit_xor(mask)").cast("long").alias("bits_parity"),
        )
        .orderBy("event_type")
    )


AGG_BITWISE_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(bit_and(event_id % 256) AS BIGINT) AS bits_all,
       CAST(bit_or(event_id % 256) AS BIGINT) AS bits_any,
       CAST(bit_xor(event_id % 256) AS BIGINT) AS bits_parity
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# str_funcs2 — second string-function family
# ---------------------------------------------------------------------------


def str_funcs2(spark: SparkSession, sf: str) -> DataFrame:
    """String family two: translate, overlay-equivalent, initcap,
    levenshtein against a reference token, ascii/chr, and positional
    splitting — the remainder of the delegated scalar surface (SURVEY
    B10) exercised with engine-identical semantics."""
    register_views(spark, sf, tables=("part",))
    return spark.sql("""
        SELECT p_partkey,
               translate(p_brand, '#', '-') AS brand_dash,
               initcap(lower(p_name)) AS name_title,
               CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS lev_to_b11,
               CAST(ascii(p_name) AS BIGINT) AS first_char_code,
               char(65 + CAST(p_size % 26 AS INT)) AS size_letter,
               concat_ws('|', split(p_type, ' ')) AS type_piped,
               substring_index(p_type, ' ', 2) AS type_first2
        FROM part
    """)


STR_FUNCS2_SQL = """
SELECT p_partkey,
       replace(p_brand, '#', '-') AS brand_dash,
       -- initcap: DuckDB has no initcap; title-case each word manually
       array_to_string(list_transform(string_split(lower(p_name), ' '),
           w -> upper(substring(w, 1, 1)) || substring(w, 2)), ' ') AS name_title,
       CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS lev_to_b11,
       CAST(ascii(p_name) AS BIGINT) AS first_char_code,
       chr(65 + CAST(p_size % 26 AS INTEGER)) AS size_letter,
       array_to_string(string_split(p_type, ' '), '|') AS type_piped,
       CASE WHEN len(string_split(p_type, ' ')) <= 2 THEN p_type
            ELSE array_to_string(string_split(p_type, ' ')[1:2], ' ') END AS type_first2
FROM part
"""


# ---------------------------------------------------------------------------
# interval_arith — timestamp/interval arithmetic family
# ---------------------------------------------------------------------------


def interval_arith(spark: SparkSession, sf: str) -> DataFrame:
    """Interval arithmetic surface: add/subtract day and hour intervals,
    timestamp differences in three units, next-day alignment, and
    end-of-month — the date-math a time-series operator leans on daily.
    All results exact (integer unit differences; no float time math)."""
    ev = load_table(spark, sf, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 3 DAYS")).alias("plus_3d"),
        (F.col("ts") - F.expr("INTERVAL 90 MINUTES")).alias("minus_90m"),
        F.date_add(F.to_date("ts"), 10).alias("date_plus_10"),
        F.last_day(F.to_date("ts")).alias("eom"),
        F.next_day(F.to_date("ts"), "Mon").alias("next_monday"),
        F.datediff(F.lit("2024-03-01").cast("date"), F.to_date("ts"))
        .cast("long")
        .alias("days_to_mar"),
        (F.unix_timestamp(F.lit("2024-03-01 00:00:00").cast("timestamp")) - F.unix_timestamp("ts"))
        .cast("long")
        .alias("secs_to_mar"),
    )


INTERVAL_SQL = """
SELECT event_id,
       ts + INTERVAL 3 DAY AS plus_3d,
       ts - INTERVAL 90 MINUTE AS minus_90m,
       CAST(ts AS DATE) + 10 AS date_plus_10,
       last_day(CAST(ts AS DATE)) AS eom,
       -- next Monday STRICTLY AFTER the date (Spark next_day semantics);
       -- DuckDB dayofweek: Sun=0..Sat=6, so offset = (8 - dow) % 7, 0 -> 7
       CAST(ts AS DATE) + CAST(
         CASE WHEN (8 - dayofweek(CAST(ts AS DATE))) % 7 = 0 THEN 7
              ELSE (8 - dayofweek(CAST(ts AS DATE))) % 7 END AS INTEGER) AS next_monday,
       CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-03-01') AS BIGINT) AS days_to_mar,
       CAST(floor(epoch(TIMESTAMP '2024-03-01 00:00:00')) - floor(epoch(ts)) AS BIGINT) AS secs_to_mar
FROM events WHERE event_id < 1000
"""


QUERIES: dict[str, QuerySpec] = {
    "agg_bitwise_masks": QuerySpec(
        agg_bitwise_masks, AGG_BITWISE_SQL,
        "bit_and/bit_or/bit_xor aggregate folding over flag masks",
    ),
    "str_funcs2": QuerySpec(
        str_funcs2, STR_FUNCS2_SQL,
        "string family two: translate/initcap/levenshtein/ascii/chr",
    ),
    "interval_arith": QuerySpec(
        interval_arith, INTERVAL_SQL,
        "interval/timestamp arithmetic family, exact integer unit math",
    ),
}
