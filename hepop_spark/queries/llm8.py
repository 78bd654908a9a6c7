"""Round-3 data-mixing batch: DoReMi-style domain reweighting,
exact-substring benchmark decontamination, and largest-remainder token
budget allocation — the three calculations an LLM data-mixing pipeline
runs between training epochs.

Engine-parity rules: exp/ln under the psi_drift bound with round-6
output, exact integer token counts, largest-remainder apportionment in
pure integer arithmetic with deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# domain_reweight_step — one DoReMi-style mixture-reweighting iteration
# ---------------------------------------------------------------------------

REWEIGHT_LR = 0.5


def domain_reweight_step(spark: SparkSession, sf: str) -> DataFrame:
    """One iteration of exponentiated-gradient domain reweighting (the
    DoReMi / group-DRO update): per source domain, a deterministic
    planted excess-loss signal (md5-derived, standing in for the proxy
    model's per-domain loss gap), new_weight ∝ old_weight ·
    exp(lr · excess), renormalized. Old weights = current token share.
    The table that decides the next epoch's sampling mixture.

    Scale: everything after the per-domain token aggregate is
    domain-cardinality-sized; one corpus pass."""
    docs = load_table(spark, sf, "documents")
    toks = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("n_toks")
    )
    tot = toks.agg(F.sum("n_toks").alias("total"))
    excess = (
        (F.conv(F.substring(F.md5(F.col("source")), 1, 8), 16, 10).cast("long") % 1000)
        / 1000
        - 0.5
    )
    base = toks.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_toks").cast("long").alias("n_toks"),
        (F.col("n_toks") / F.col("total")).alias("w_old"),
        excess.alias("excess_loss"),
    )
    unnorm = base.withColumn(
        "w_unnorm", F.col("w_old") * F.exp(F.lit(REWEIGHT_LR) * F.col("excess_loss"))
    )
    z = unnorm.agg(F.sum("w_unnorm").alias("z"))
    return (
        unnorm.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_toks",
            F.round("w_old", 6).alias("w_old"),
            F.round("excess_loss", 6).alias("excess_loss"),
            F.round(F.col("w_unnorm") / F.col("z"), 6).alias("w_new"),
        )
        .orderBy("source")
    )


DOMAIN_REWEIGHT_SQL = f"""
WITH toks AS (
  SELECT source, sum(len(string_split(text, ' '))) AS n_toks
  FROM documents GROUP BY source
), tot AS (SELECT sum(n_toks) AS total FROM toks),
base AS (
  SELECT source, n_toks,
         n_toks * 1.0 / total AS w_old,
         (CAST('0x' || substring(md5(source), 1, 8) AS BIGINT) % 1000) / 1000.0 - 0.5 AS excess_loss
  FROM toks, tot
), unnorm AS (
  SELECT *, w_old * exp({REWEIGHT_LR} * excess_loss) AS w_unnorm FROM base
), z AS (SELECT sum(w_unnorm) AS z FROM unnorm)
SELECT source, CAST(n_toks AS BIGINT) AS n_toks,
       round(w_old, 6) AS w_old,
       round(excess_loss, 6) AS excess_loss,
       round(w_unnorm / z, 6) AS w_new
FROM unnorm, z
ORDER BY source
"""


# ---------------------------------------------------------------------------
# decontaminate_exact_substring — exact-match benchmark leakage scan
# ---------------------------------------------------------------------------

BENCH_N = 20


def decontaminate_exact_substring(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring contamination scan (the strict sibling of
    decontaminate_ngram_overlap): a planted benchmark set of 20 probe
    strings (mid-document slices of every 250th doc, so true hits exist)
    is broadcast and every document checked for VERBATIM containment.
    Output: per probe, how many documents leak it and the lowest doc id
    — the evidence row a benchmark-leakage report needs.

    Scale: |bench| is bounded -> broadcast; the scan is one narrow
    contains() pass per probe over the corpus (|bench| x corpus string
    scans, embarrassingly parallel, zero shuffle before the tiny
    aggregate)."""
    docs = load_table(spark, sf, "documents")
    probes = (
        docs.filter((F.col("doc_id") % 250 == 0) & (F.col("n_chars") >= 60))
        .select(
            F.col("doc_id").alias("probe_src"),
            F.substring("text", 20, 35).alias("probe"),
        )
        # deterministic TakeOrdered probe selection — a bare .limit() is
        # partition-order dependent once the %250 slice exceeds BENCH_N
        .orderBy("probe_src")
        .limit(BENCH_N)
    )
    hits = (
        docs.crossJoin(F.broadcast(probes))
        .filter(F.expr("instr(text, probe) > 0"))
        .groupBy("probe_src", "probe")
        .agg(
            F.count("*").cast("long").alias("n_leaked"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
    )
    return hits.orderBy("probe_src")


DECON_EXACT_SQL = f"""
WITH probes AS (
  SELECT doc_id AS probe_src, substring(text, 20, 35) AS probe
  FROM documents
  WHERE doc_id % 250 = 0 AND n_chars >= 60
  ORDER BY doc_id LIMIT {BENCH_N}
)
SELECT p.probe_src, p.probe,
       CAST(count(*) AS BIGINT) AS n_leaked,
       CAST(min(d.doc_id) AS BIGINT) AS first_doc
FROM documents d CROSS JOIN probes p
WHERE strpos(d.text, p.probe) > 0
GROUP BY p.probe_src, p.probe
ORDER BY p.probe_src
"""


# ---------------------------------------------------------------------------
# token_budget_allocation — largest-remainder epoch apportionment
# ---------------------------------------------------------------------------

BUDGET_TOKENS = 1_000_000


def token_budget_allocation(spark: SparkSession, sf: str) -> DataFrame:
    """Epoch planning: apportion a 1M-token training budget across source
    domains proportionally to their corpus share using the
    LARGEST-REMAINDER (Hamilton) method in pure integer arithmetic —
    floor shares first, then the leftover tokens go to the largest
    remainders (ties by source). Allocations sum EXACTLY to the budget,
    which naive per-domain rounding does not guarantee.

    Scale: domain-cardinality-sized after one corpus aggregate."""
    docs = load_table(spark, sf, "documents")
    toks = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("n_toks")
    )
    tot = toks.agg(F.sum("n_toks").alias("total"), F.count("*").alias("k"))
    base = toks.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_toks").cast("long").alias("n_toks"),
        # exact integer floor share and remainder (scaled by total) —
        # `div` is Spark's integer division, so floor and remainder come
        # from the same exact arithmetic (double division truncates once
        # n_toks * budget exceeds 2^53)
        F.expr(f"n_toks * {BUDGET_TOKENS} div total").cast("long").alias("floor_alloc"),
        ((F.col("n_toks") * BUDGET_TOKENS) % F.col("total")).alias("rem"),
    )
    leftover = base.agg(
        (F.lit(BUDGET_TOKENS) - F.sum("floor_alloc")).alias("leftover")
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("source"))
    return (
        base.crossJoin(F.broadcast(leftover))
        .withColumn("rk", F.row_number().over(w))
        .select(
            "source",
            "n_toks",
            "floor_alloc",
            (F.col("floor_alloc") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0))
            .cast("long")
            .alias("alloc_tokens"),
        )
        .orderBy("source")
    )


TOKEN_BUDGET_SQL = f"""
WITH toks AS (
  SELECT source, sum(len(string_split(text, ' '))) AS n_toks
  FROM documents GROUP BY source
), tot AS (SELECT sum(n_toks) AS total, count(*) AS k FROM toks),
base AS (
  SELECT source, n_toks,
         (n_toks * {BUDGET_TOKENS}) // total AS floor_alloc,
         (n_toks * {BUDGET_TOKENS}) % total AS rem
  FROM toks, tot
), leftover AS (
  SELECT {BUDGET_TOKENS} - sum(floor_alloc) AS leftover FROM base
)
SELECT source, CAST(n_toks AS BIGINT) AS n_toks,
       CAST(floor_alloc AS BIGINT) AS floor_alloc,
       CAST(floor_alloc + CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <= leftover
                               THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
FROM base, leftover
ORDER BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "domain_reweight_step": QuerySpec(
        domain_reweight_step, DOMAIN_REWEIGHT_SQL,
        "exponentiated-gradient domain mixture reweighting step",
    ),
    "decontaminate_exact_substring": QuerySpec(
        decontaminate_exact_substring, DECON_EXACT_SQL,
        "verbatim benchmark-substring leakage scan with evidence rows",
    ),
    "token_budget_allocation": QuerySpec(
        token_budget_allocation, TOKEN_BUDGET_SQL,
        "largest-remainder token apportionment, sums exactly to budget",
    ),
}
