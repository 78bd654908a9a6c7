"""Round-3 SQL-surface completions and migration-validation operators:
modern aggregate functions as a judged entry, hierarchical rollup
(iterative DataFrame loop vs a true WITH RECURSIVE oracle), an
order-insensitive table checksum (the "switch engines and prove results
identical" tool — exactly this repo's oracle gate, packaged as a user
operator), and weighted discrete percentiles.

Reference scope: reachable-but-unexercised DuckDB surface (query.js
passthrough, SURVEY B10) plus north-star additions.

Engine-parity rules as established: md5 keys, exact integers, discrete
order statistics, BIGINT casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# agg_modern_funcs — bool_and/bool_or/count_if/any_value/max_by surface
# ---------------------------------------------------------------------------


def agg_modern_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """The modern aggregate-function family in one judged entry —
    count_if, bool_and, bool_or, and argmax via max_by under a unique
    BIGINT key (any_value is made deterministic the only portable way:
    min) — per order-priority over orders.

    Scale: single partial-aggregated groupBy on a bounded key."""
    o = load_table(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_orderstatus",
            cents.alias("cents"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_orderstatus") == "F").cast("long").alias("n_finished"),
            F.bool_and(F.col("cents") > 0).alias("all_positive"),
            F.bool_or(F.col("cents") > 40_000_000).alias("any_over_400k"),
            F.min("o_orderstatus").alias("first_status"),
            # argmax under the unique (cents, orderkey) total order, packed
            # into one BIGINT so both engines break ties identically
            F.max_by("o_orderkey", F.col("cents") * 10_000_000 + F.col("o_orderkey"))
            .cast("long")
            .alias("max_price_orderkey"),
        )
        .orderBy("o_orderpriority")
    )


AGG_MODERN_SQL = """
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       bool_and(CAST(round(o_totalprice * 100) AS BIGINT) > 0) AS all_positive,
       bool_or(CAST(round(o_totalprice * 100) AS BIGINT) > 40000000) AS any_over_400k,
       min(o_orderstatus) AS first_status,
       CAST(max_by(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS BIGINT) AS max_price_orderkey
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# hierarchy_rollup_tree — transitive rollup, iterative loop vs recursive CTE
# ---------------------------------------------------------------------------

TREE_DEPTH = 3


def hierarchy_rollup_tree(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical (BOM/org-chart) rollup over a planted tree: node =
    part key, parent(p) = p / 10 (depth ≤ 3 over the key range), value =
    retail-price cents. Each node reports the SUM over its entire subtree
    — computed with a bounded iterative DataFrame loop (one join per
    level, the Spark-native recursion pattern), while the oracle uses a
    true WITH RECURSIVE — proving the loop IS the recursive query.

    Scale: each iteration is one equi-join on the parent key; depth bounds
    the loop (real hierarchies are shallow); the final rollup is one
    partial-aggregated groupBy on ancestor."""
    p = load_table(spark, sf, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    nodes = p.select(F.col("p_partkey").alias("node"), cents.alias("val"))
    # ancestor closure via iterative self-join: start with (node, node),
    # add one parent level per round
    closure = nodes.select("node", F.col("node").alias("anc"))
    cur = closure
    for _ in range(TREE_DEPTH):
        nxt = cur.filter(F.col("anc") > 0).select(
            "node", (F.col("anc") / 10).cast("long").alias("anc")
        )
        closure = closure.unionAll(nxt)
        cur = nxt
    closure = closure.filter(F.col("anc") > 0).distinct()
    return (
        closure.join(nodes, "node")
        .groupBy(F.col("anc").alias("node"))
        .agg(
            F.count("*").cast("long").alias("subtree_n"),
            F.sum("val").cast("long").alias("subtree_cents"),
        )
        .orderBy("node")
    )


HIERARCHY_SQL = f"""
WITH RECURSIVE nodes AS (
  SELECT p_partkey AS node, CAST(round(p_retailprice * 100) AS BIGINT) AS val
  FROM part
),
closure AS (
  SELECT node, node AS anc, 0 AS depth FROM nodes
  UNION ALL
  SELECT node, anc // 10 AS anc, depth + 1
  FROM closure WHERE anc > 0 AND depth < {TREE_DEPTH}
),
cl AS (SELECT DISTINCT node, anc FROM closure WHERE anc > 0)
SELECT cl.anc AS node,
       CAST(count(*) AS BIGINT) AS subtree_n,
       CAST(sum(n.val) AS BIGINT) AS subtree_cents
FROM cl JOIN nodes n USING (node)
GROUP BY cl.anc
ORDER BY node
"""


# ---------------------------------------------------------------------------
# table_checksum — order-insensitive migration-validation fingerprint
# ---------------------------------------------------------------------------


def table_checksum(spark: SparkSession, sf: str) -> DataFrame:
    """Order-insensitive table fingerprint — THE migration-validation tool
    for "switch from the reference to this engine and prove every row
    survived": per column, row count, null count, and the sum of each
    value's md5-derived 48-bit integer (mod 2^48 keeps the sum inside
    exact BIGINT range at any corpus size). Two engines/tables agree on
    this output iff the multisets of values agree.

    Scale: one narrow hash map + one global aggregate — no sort, no
    shuffle beyond the single-row reduce; partitioning-invariant by
    construction (sums commute)."""
    li = load_table(spark, sf, "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate"]

    def h48(c: str) -> F.Column:
        # cast to a canonical string first so the checksum is
        # representation-stable across engines
        canon = F.when(
            F.col(c).cast("string").isNull(), F.lit("\0null")
        ).otherwise(F.col(c).cast("string"))
        return F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("long")

    aggs = []
    for c in cols:
        aggs.append(F.count(c).cast("long").alias(f"{c}_n"))
        # DECIMAL(38,0) accumulator: a BIGINT sum of 48-bit hashes
        # overflows past ~32k rows; decimal sums stay exact to 10^38
        # (DuckDB's HUGEINT accumulator is the same fix on the oracle side)
        aggs.append(F.sum(h48(c).cast("decimal(38,0)")).alias(f"{c}_sum"))
    wide = li.agg(*aggs)
    # long-form output (column, n_nonnull, checksum) — canonicalizer-friendly
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}_n").alias("n_nonnull"),
                (F.col(f"{c}_sum") % F.lit(2**48).cast("decimal(38,0)"))
                .cast("long")
                .alias("checksum"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.explode(pairs).alias("e"))
        .select("e.col_name", "e.n_nonnull", "e.checksum")
        .orderBy("col_name")
    )


def _checksum_oracle_sql() -> str:
    cols = ["l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate"]
    parts = []
    for c in cols:
        # duckdb CAST(timestamp AS VARCHAR) matches Spark's string form for
        # these columns (dates at midnight print identically); doubles in
        # l_quantity are integral in TPC-H data. 'DuckDB strtol' = the
        # '0x' || hex trick used across the oracle suite.
        parts.append(f"""
  SELECT '{c}' AS col_name, CAST(count({c}) AS BIGINT) AS n_nonnull,
         CAST(sum(CAST('0x' || substring(md5(coalesce(CAST({c} AS VARCHAR), chr(0) || 'null')), 1, 12) AS BIGINT)) % 281474976710656 AS BIGINT) AS checksum
  FROM lineitem""")
    return "\nUNION ALL".join(parts) + "\nORDER BY col_name"


# ---------------------------------------------------------------------------
# weighted_percentile_disc — weighted discrete percentiles
# ---------------------------------------------------------------------------


def weighted_percentile_disc(spark: SparkSession, sf: str) -> DataFrame:
    """Quantity-weighted DISCRETE percentiles of price per return flag:
    the value whose running weight first reaches q * total_weight under
    the unique (cents, orderkey, linenumber) order — the weighted-SLO /
    weighted-median primitive, with no interpolation anywhere.

    Scale: the raw rows are FIRST collapsed with a map-side-combinable
    groupBy(l_returnflag, cents) -> sum(w), so the per-flag cumulative
    window runs over the bounded distinct-cents domain (thousands of rows
    per flag), not the corpus.  Identical discrete semantics: if the
    threshold is crossed mid-group at row granularity, the group-total
    cumulative weight also crosses it, and no earlier cents value can
    qualify — so min(cents | cw >= ceil(q*tw)) is unchanged.  (Round-3
    verdict item #1: previously the window sorted every lineitem row
    partitioned by a 3-value key — a single-task corpus sort at 100x.)

    At sf0.1 the distinct-cents grid is ~594k of 600k rows (TPC-H prices
    rarely repeat), so the bench wall there barely moves; the gain is the
    ASYMPTOTE: the grid saturates while rows grow — the 20x probe (12M
    rows, same 594k-row window) measures 0.8s vs 3.4s at 1/20 the data
    (tools/scale_probe.py, SCALE.md r04).

    Round-6 note (measured, then rejected): a two-level prefix sum
    (range-bucket the cents, offset window over the ~600-row bucket
    grid, fine windows per (flag, bucket)) parallelizes the sort but
    needs the aggregated grid as input to THREE differently-keyed
    consumers (fine window, bucket subtotals, totals) — and Spark has no
    cross-branch common-subexpression reuse, so each branch re-scanned
    and re-aggregated the base table: 7.5 s at the 20x probe vs 0.9 s
    for this single-chain plan (one scan, windows reuse one exchange).
    The two-level shape only wins when the aggregated grid is a
    MATERIALIZED table (a real pipeline would persist the per-cents
    rollup at ingest and two-level THAT); over a single declarative
    query, the one-task-per-flag window on the collapsed grid is the
    plan that minimizes total work."""
    li = load_table(spark, sf, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    agg = (
        li.select("l_returnflag", cents.alias("cents"), qty.alias("w"))
        .groupBy("l_returnflag", "cents")
        .agg(F.sum("w").alias("w"))
    )
    wcum = Window.partitionBy("l_returnflag").orderBy("cents")
    wtot = Window.partitionBy("l_returnflag")
    ranked = agg.withColumn("cw", F.sum("w").over(wcum)).withColumn(
        "tw", F.sum("w").over(wtot)
    )
    out = []
    for q_name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        out.append(
            F.min(
                F.when(F.col("cw") * 100 >= F.ceil(F.col("tw") * q * 100), F.col("cents"))
            ).cast("long").alias(f"{q_name}_cents")
        )
    return (
        ranked.groupBy("l_returnflag")
        .agg(F.sum("w").cast("long").alias("total_weight"), *out)
        .orderBy("l_returnflag")
    )


WEIGHTED_PCT_SQL = """
WITH base AS (
  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(round(l_quantity) AS BIGINT) AS w, l_orderkey, l_linenumber
  FROM lineitem
), ranked AS (
  SELECT *, sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents, l_orderkey, l_linenumber) AS cw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM base
)
SELECT l_returnflag, CAST(sum(w) AS BIGINT) AS total_weight,
       CAST(min(CASE WHEN cw * 100 >= CAST(ceil(tw * 0.5 * 100) AS BIGINT) THEN cents END) AS BIGINT) AS p50_cents,
       CAST(min(CASE WHEN cw * 100 >= CAST(ceil(tw * 0.9 * 100) AS BIGINT) THEN cents END) AS BIGINT) AS p90_cents,
       CAST(min(CASE WHEN cw * 100 >= CAST(ceil(tw * 0.99 * 100) AS BIGINT) THEN cents END) AS BIGINT) AS p99_cents
FROM ranked
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES: dict[str, QuerySpec] = {
    "agg_modern_funcs": QuerySpec(
        agg_modern_funcs, AGG_MODERN_SQL,
        "count_if / bool_and / bool_or / deterministic argmax surface",
    ),
    "hierarchy_rollup_tree": QuerySpec(
        hierarchy_rollup_tree, HIERARCHY_SQL,
        "subtree rollup: iterative join loop == WITH RECURSIVE oracle",
    ),
    "table_checksum": QuerySpec(
        table_checksum, _checksum_oracle_sql(),
        "order-insensitive per-column table fingerprint (migration check)",
    ),
    "weighted_percentile_disc": QuerySpec(
        weighted_percentile_disc, WEIGHTED_PCT_SQL,
        "weight-cumulative discrete percentiles, no interpolation",
    ),
}
