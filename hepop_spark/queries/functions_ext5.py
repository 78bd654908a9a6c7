"""Round-3 type-surface batch: exact DECIMAL money arithmetic (the
reference's type system has no decimal — SURVEY §1.2 negative space;
Spark adds exact fixed-point) and schema-evolution UNION BY NAME.

Parity approach for DECIMAL: keep every operation inside fixed-point
(sum, subtract, integer multiply — no avg, whose result type is
DECIMAL(…,6) in Spark but DOUBLE in DuckDB), and emit CAST(… AS STRING)
at matching scales so both engines print identical representations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from . import QuerySpec

# ---------------------------------------------------------------------------
# decimal_exact_money — fixed-point money arithmetic end to end
# ---------------------------------------------------------------------------


def decimal_exact_money(spark: SparkSession, sf: str) -> DataFrame:
    """Exact DECIMAL money pipeline per order-priority: prices land in
    DECIMAL(12,2), revenue sums stay fixed-point (no float anywhere),
    a 7%% tax is applied as an exact scaled multiply, and the outputs are
    emitted as canonical strings at pinned scales — the ledger-grade
    arithmetic the reference's double-only type system cannot express
    (SURVEY §1.2). Spark's sum(DECIMAL(12,2)) widens the precision, so
    results are re-CAST to fixed output scales on BOTH engines.

    Scale: one partial-aggregated groupBy on a bounded key; decimal
    aggregation is JVM-native (no object overhead at these precisions)."""
    o = load_table(spark, sf, "orders")
    price = F.col("o_totalprice").cast("decimal(12,2)")
    g = (
        o.select("o_orderpriority", price.alias("p"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("p").alias("revenue"),
            F.max("p").alias("max_price"),
            F.min("p").alias("min_price"),
        )
    )
    return g.select(
        "o_orderpriority",
        "n",
        F.col("revenue").cast("decimal(20,2)").cast("string").alias("revenue"),
        # 7% tax on the exact sum: scale by 7 then shift — stays integral
        # in hundredths-of-cents, emitted at scale 4
        (F.col("revenue") * F.lit(7).cast("decimal(3,0)") / F.lit(100).cast("decimal(4,0)"))
        .cast("decimal(20,4)")
        .cast("string")
        .alias("tax_due"),
        (F.col("max_price") - F.col("min_price")).cast("decimal(12,2)").cast("string").alias("spread"),
    ).orderBy("o_orderpriority")


DECIMAL_MONEY_SQL = """
WITH g AS (
  SELECT o_orderpriority, count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(12,2))) AS revenue,
         max(CAST(o_totalprice AS DECIMAL(12,2))) AS max_price,
         min(CAST(o_totalprice AS DECIMAL(12,2))) AS min_price
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
       CAST(CAST(revenue AS DECIMAL(20,2)) AS VARCHAR) AS revenue,
       CAST(CAST(revenue * CAST(7 AS DECIMAL(3,0)) / CAST(100 AS DECIMAL(4,0)) AS DECIMAL(20,4)) AS VARCHAR) AS tax_due,
       CAST(CAST(max_price - min_price AS DECIMAL(12,2)) AS VARCHAR) AS spread
FROM g
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# union_by_name_evolution — schema-evolution union
# ---------------------------------------------------------------------------


def union_by_name_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-evolution UNION BY NAME: an old extract (event_id, value)
    and a new extract (event_id, value, event_type — columns in a
    DIFFERENT order plus a new field) combine by NAME with missing
    columns null-filled — the API that makes pipeline upgrades additive
    (unionByName(allowMissingColumns=True); the reference's first-row
    schema freeze drops such rows, hepop.js:382-394). Aggregated per
    type (null group = legacy rows) to a bounded result.

    Scale: union is scan-level; the aggregation partial-combines."""
    ev = load_table(spark, sf, "events")
    old = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    new = ev.filter(F.col("event_id") % 2 == 1).select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_type",
        "event_id",
    )
    merged = old.unionByName(new, allowMissingColumns=True)
    return (
        merged.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy(F.col("event_type").asc_nulls_first())
    )


UNION_BY_NAME_SQL = """
WITH old AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(NULL AS VARCHAR) AS event_type
  FROM events WHERE event_id % 2 = 0
), new AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents, event_type
  FROM events WHERE event_id % 2 = 1
), merged AS (
  SELECT * FROM old UNION ALL SELECT * FROM new
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM merged
GROUP BY event_type
ORDER BY event_type NULLS FIRST
"""


QUERIES: dict[str, QuerySpec] = {
    "decimal_exact_money": QuerySpec(
        decimal_exact_money, DECIMAL_MONEY_SQL,
        "ledger-grade DECIMAL arithmetic, canonical-string outputs",
    ),
    "union_by_name_evolution": QuerySpec(
        union_by_name_evolution, UNION_BY_NAME_SQL,
        "unionByName schema evolution with null-filled missing columns",
    ),
}
