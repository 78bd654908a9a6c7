"""Round-2 batch 4 — SRE alerting, recsys training data, and ANN quality
evaluation: the operational closes of three families already in the
inventory (rolling windows, similarity search, dataset shaping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# slo_burn_rate — multi-window error-budget burn
# ---------------------------------------------------------------------------

SLO_BUDGET = 0.25  # error budget: 25% of requests may error
BURN_WINDOW_H = 6


def slo_burn_rate(spark: SparkSession, sf: str) -> DataFrame:
    """SRE error-budget burn rate: hourly error ratio over a rolling
    6-hour window, normalized by the SLO budget (burn > 1 means the budget
    is being consumed faster than allowed — the Google SRE multi-window
    alert shape). The raw scan reduces to one hourly aggregate; the
    rolling window then runs on the hours domain (720 rows/month — tiny at
    any data scale). Integer counts; one deterministic division."""
    ev = load_table(spark, sf, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum((F.col("event_type") == "error").cast("int")).alias("errors"),
        F.count("*").alias("total"),
    )
    w6 = Window.orderBy("h").rowsBetween(-(BURN_WINDOW_H - 1), 0)
    return (
        hourly.withColumn("err6", F.sum("errors").over(w6))
        .withColumn("tot6", F.sum("total").over(w6))
        .select(
            F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
            "errors",
            "total",
            F.round(F.col("err6") / F.col("tot6") / SLO_BUDGET, 4).alias("burn_rate"),
            (F.col("err6") / F.col("tot6") > SLO_BUDGET).alias("breach"),
        )
    )


SLO_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS errors,
         count(*) AS total
  FROM events GROUP BY 1
), rolled AS (
  SELECT h, errors, total,
         sum(errors) OVER w AS err6,
         sum(total) OVER w AS tot6
  FROM hourly
  WINDOW w AS (ORDER BY h ROWS BETWEEN {BURN_WINDOW_H - 1} PRECEDING AND CURRENT ROW)
)
SELECT strftime(h, '%Y-%m-%d %H:00') AS hour, errors, total,
       round(err6 / tot6 / {SLO_BUDGET}, 4) AS burn_rate,
       err6 / tot6 > {SLO_BUDGET} AS breach
FROM rolled
"""


# ---------------------------------------------------------------------------
# negative_sample_pairs — recsys negative sampling
# ---------------------------------------------------------------------------

NEG_K = 3
NEG_A = 9973
NEG_B = 6151


def negative_sample_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Recsys training-data negative sampling: for every customer with
    purchases, K candidate parts drawn by a deterministic hash
    (custkey*A + i*B mod |part|), with accidental positives rejected by an
    anti join against the observed (customer, part) pairs. This is the
    skip-gram/two-tower negative generation shape: candidate generation is
    pure arithmetic (no shuffle), the only wide stage is the anti join on
    the positives table — which at 100 TB is a bloom/shuffle-hash anti
    join keyed by the pair. Rejected candidates are dropped (sampling
    without replacement is a re-draw loop; the dropped count is part of
    the output contract via i)."""
    ord_ = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    positives = (
        ord_.join(li, ord_.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    maxp = part.agg(F.max("p_partkey").alias("maxp"))
    custs = positives.select("o_custkey").distinct()
    cands = (
        custs.crossJoin(F.broadcast(maxp))
        .withColumn("i", F.explode(F.sequence(F.lit(1), F.lit(NEG_K))))
        .withColumn(
            "neg_partkey",
            (F.col("o_custkey") * NEG_A + F.col("i") * NEG_B) % F.col("maxp") + 1,
        )
        .select("o_custkey", "i", "neg_partkey")
    )
    return cands.join(
        positives,
        (cands.o_custkey == positives.o_custkey)
        & (cands.neg_partkey == positives.l_partkey),
        "left_anti",
    ).select("o_custkey", "i", "neg_partkey")


NEGSAMPLE_SQL = f"""
WITH positives AS (
  SELECT DISTINCT o_custkey, l_partkey
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), maxp AS (SELECT max(p_partkey) AS maxp FROM part),
cands AS (
  SELECT c.o_custkey, i.i,
         (c.o_custkey * {NEG_A} + i.i * {NEG_B}) % maxp.maxp + 1 AS neg_partkey
  FROM (SELECT DISTINCT o_custkey FROM positives) c
  CROSS JOIN maxp
  CROSS JOIN (SELECT unnest(range(1, {NEG_K} + 1)) AS i) i
)
SELECT o_custkey, i, neg_partkey
FROM cands c
WHERE NOT EXISTS (
  SELECT 1 FROM positives p
  WHERE p.o_custkey = c.o_custkey AND p.l_partkey = c.neg_partkey
)
"""


# ---------------------------------------------------------------------------
# ann_recall_eval — recall@k of the LSH sketch path vs the exact baseline
# ---------------------------------------------------------------------------

RECALL_K = 5


def ann_recall_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Quality evaluation of ALL SIX ANN paths (LSH, IVF, SQ8, PQ,
    IVF-PQ, graph beam search): per-query recall@5 against exact
    brute-force
    cosine — the harness that drives index choice at 100 TB, and the one
    that already drove a fix: single-table 8-bit multiprobe sign-LSH
    measured ~0.12 recall@5 here (top-5 neighbors are only moderately
    similar, so one table's sign buckets split them), which motivated the
    banding amplification now in operators/similarity.lsh_topk —
    4 tables × multiprobe lands ~0.4, near IVF nprobe=4/16 at similar
    candidate cost. Deterministic end-to-end — and since round 3 FULLY
    oracle-checked: every sketch path's plan is a deterministic function
    of the data with its own SQL replay (scale_paths.py), so the recall
    table is the composition of those five oracles (exact + LSH + IVF +
    SQ8 + PQ as CTEs, hit-counted per query). Floors additionally pinned
    by tests/test_round2d.py."""
    from ..operators.similarity import ivf_topk, lsh_topk, pq_topk, sq8_topk

    emb = load_table(spark, sf, "embeddings").withColumn(
        "vec", F.expr("transform(embedding, x -> cast(x AS double))")
    ).withColumn("norm", F.expr("sqrt(aggregate(vec, 0D, (acc, x) -> acc + x * x))"))
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)

    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    c = corpus.select(
        F.col("vec_id").alias("c_id"), F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    cos = (
        "aggregate(zip_with(qvec, cvec, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        " / (qnorm * cnorm)"
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    exact = (
        c.join(F.broadcast(q))
        .withColumn("sim", F.round(F.expr(cos), 4))
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= RECALL_K)
        .select("q_id", "c_id")
    )
    raw_corpus = load_table(spark, sf, "embeddings").filter(F.col("vec_id") >= 10)
    raw_queries = load_table(spark, sf, "embeddings").filter(F.col("vec_id") < 10)
    from .scale_paths import (
        IVF_CELLS, IVF_NPROBE, LSH_TABLES, PQ_K, PQ_M, PQ_SHORT,
    )

    lsh = lsh_topk(
        raw_corpus, raw_queries, top_k=RECALL_K, multiprobe=True,
        n_tables=LSH_TABLES,
    ).select("q_id", "c_id")
    ivf = ivf_topk(
        raw_corpus, raw_queries, n_cells=IVF_CELLS, nprobe=IVF_NPROBE,
        top_k=RECALL_K,
    ).select("q_id", "c_id")
    sq8 = sq8_topk(raw_corpus, raw_queries, top_k=RECALL_K).select("q_id", "c_id")
    pq = pq_topk(
        raw_corpus, raw_queries, m_sub=PQ_M, k_codes=PQ_K, shortlist=PQ_SHORT,
        top_k=RECALL_K,
    ).select("q_id", "c_id")
    from .scale_paths import ann_ivfpq_topk

    ivfpq = ann_ivfpq_topk(spark, sf).select("q_id", "c_id")
    from .llm7 import ann_graph_topk

    # sixth path (r12): beam search over the kNN graph — same
    # query/corpus split by construction (GRAPH_MIN_CORPUS_ID = 10)
    graph = ann_graph_topk(spark, sf).select("q_id", "c_id")

    def hits(approx: DataFrame, name: str) -> DataFrame:
        return (
            exact.join(approx, ["q_id", "c_id"])
            .groupBy("q_id")
            .agg(F.count("*").alias(name))
        )

    return (
        exact.groupBy("q_id")
        .agg(F.count("*").alias("n_exact"))
        .join(hits(lsh, "lsh_hits"), "q_id", "left")
        .join(hits(ivf, "ivf_hits"), "q_id", "left")
        .join(hits(sq8, "sq8_hits"), "q_id", "left")
        .join(hits(pq, "pq_hits"), "q_id", "left")
        .join(hits(ivfpq, "ivfpq_hits"), "q_id", "left")
        .join(hits(graph, "graph_hits"), "q_id", "left")
        .select(
            "q_id",
            F.round(
                F.coalesce("lsh_hits", F.lit(0)) / F.col("n_exact"), 3
            ).alias("recall_lsh"),
            F.round(
                F.coalesce("ivf_hits", F.lit(0)) / F.col("n_exact"), 3
            ).alias("recall_ivf"),
            F.round(
                F.coalesce("sq8_hits", F.lit(0)) / F.col("n_exact"), 3
            ).alias("recall_sq8"),
            F.round(
                F.coalesce("pq_hits", F.lit(0)) / F.col("n_exact"), 3
            ).alias("recall_pq"),
            F.round(
                F.coalesce("ivfpq_hits", F.lit(0)) / F.col("n_exact"), 3
            ).alias("recall_ivfpq"),
            F.round(
                F.coalesce("graph_hits", F.lit(0)) / F.col("n_exact"), 3
            ).alias("recall_graph"),
        )
    )


def _recall_oracle_sql() -> str:
    """Recall@5 oracle = the five already-verified ANN oracles composed as
    CTEs (DuckDB allows a nested WITH inside a parenthesized subquery).
    This removed the registry's last rows-only entry (r02 verdict item 5):
    the sketch paths are deterministic functions of the data, so so is the
    recall table."""
    from .llm import ANN_TOPK_SQL
    from .llm7 import _graph_search_sql
    from .scale_paths import (
        IVF_ORACLE_SQL,
        IVFPQ_ORACLE_SQL,
        PQ_ORACLE_SQL,
        SQ8_ORACLE_SQL,
        _lsh_oracle_sql,
    )

    def body(sql: str) -> str:
        return sql.strip().rstrip(";")

    def hits(cte: str) -> str:
        return (
            f"SELECT e.q_id, count(*) AS h FROM exact5 e "
            f"JOIN {cte} a ON e.q_id = a.q_id AND e.c_id = a.c_id GROUP BY e.q_id"
        )

    return f"""
WITH exact5 AS ({body(ANN_TOPK_SQL)}),
lsh5 AS ({body(_lsh_oracle_sql())}),
ivf5 AS ({body(IVF_ORACLE_SQL)}),
sq85 AS ({body(SQ8_ORACLE_SQL)}),
pq5 AS ({body(PQ_ORACLE_SQL)}),
ivfpq5 AS ({body(IVFPQ_ORACLE_SQL)}),
graph5 AS ({body(_graph_search_sql())}),
base AS (SELECT q_id, count(*) AS n_exact FROM exact5 GROUP BY q_id)
SELECT b.q_id,
       round(coalesce(l.h, 0) * 1.0 / b.n_exact, 3) AS recall_lsh,
       round(coalesce(i.h, 0) * 1.0 / b.n_exact, 3) AS recall_ivf,
       round(coalesce(s.h, 0) * 1.0 / b.n_exact, 3) AS recall_sq8,
       round(coalesce(p.h, 0) * 1.0 / b.n_exact, 3) AS recall_pq,
       round(coalesce(cp.h, 0) * 1.0 / b.n_exact, 3) AS recall_ivfpq,
       round(coalesce(gr.h, 0) * 1.0 / b.n_exact, 3) AS recall_graph
FROM base b
LEFT JOIN ({hits('lsh5')}) l ON b.q_id = l.q_id
LEFT JOIN ({hits('ivf5')}) i ON b.q_id = i.q_id
LEFT JOIN ({hits('sq85')}) s ON b.q_id = s.q_id
LEFT JOIN ({hits('pq5')}) p ON b.q_id = p.q_id
LEFT JOIN ({hits('ivfpq5')}) cp ON b.q_id = cp.q_id
LEFT JOIN ({hits('graph5')}) gr ON b.q_id = gr.q_id
"""


QUERIES: dict[str, QuerySpec] = {
    "slo_burn_rate": QuerySpec(
        slo_burn_rate, SLO_SQL, "rolling error-budget burn-rate alerting"
    ),
    "negative_sample_pairs": QuerySpec(
        negative_sample_pairs, NEGSAMPLE_SQL, "deterministic recsys negative sampling"
    ),
    "ann_recall_eval": QuerySpec(
        ann_recall_eval,
        _recall_oracle_sql(),
        "recall@k evaluation of all six ANN paths (incl. graph beam "
        "search, r12)",
    ),
}
