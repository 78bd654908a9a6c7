"""Round-3 model-evaluation / robust-statistics batch: exact AUC, KS
two-sample test, deterministic hash bootstrap, Hill tail-index, a
differential-privacy noised release, community label propagation,
Johnson-Lindenstrauss random projection, and bigram add-k LM scoring.

Reference scope: north-star extensions (the reference delegates all SQL,
query.js:162-172, and has no statistics surface).

Engine-parity rules as established: exact integer rank/count arithmetic
with a single terminal division (AUC, KS, bootstrap), md5-derived
determinism for anything "random" (bootstrap weights, DP noise), ln sums
only under the psi_drift error-bound argument with round(..., 4), BIGINT
casts over DuckDB count/sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.similarity import _hyperplanes
from . import QuerySpec
from .llm import _tokens
from .mining_q import _EDGES_SQL, _cosupply_edges

# ---------------------------------------------------------------------------
# auc_roc_exact — exact AUC via the tie-corrected rank-sum statistic
# ---------------------------------------------------------------------------


def auc_roc_exact(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT ROC-AUC of a deterministic pseudo-score against the purchase
    label, via the Mann-Whitney U statistic with tie correction — computed
    entirely in integers: per-score positives get average rank
    (2*cum_before + n_s + 1)/2, so 2U is an exact integer and AUC is one
    terminal division. The evaluation primitive behind every quality-
    classifier threshold sweep, with no sampling and no sort of the raw
    corpus (only the score-distinct aggregate is ordered).

    Scale: one groupBy on the bounded score domain + one windowed
    cumulative over that bounded aggregate + one scalar reduce."""
    ev = load_table(spark, sf, "events")
    mil = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10).cast("long") % 1000
    scored = ev.select(
        mil.alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    per_s = scored.groupBy("s").agg(
        F.count("*").alias("n_s"), F.sum("y").alias("pos_s")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_s.withColumn("cum_before", F.coalesce(F.sum("n_s").over(w), F.lit(0)))
    agg = ranked.agg(
        F.sum("pos_s").alias("n_pos"),
        F.sum(F.col("n_s") - F.col("pos_s")).alias("n_neg"),
        F.sum(F.col("pos_s") * (2 * F.col("cum_before") + F.col("n_s") + 1)).alias("two_r_pos"),
    )
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(
            (F.col("two_r_pos") - F.col("n_pos") * (F.col("n_pos") + 1))
            / (2 * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


AUC_SQL = """
WITH scored AS (
  SELECT CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000 AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), per_s AS (
  SELECT s, count(*) AS n_s, sum(y) AS pos_s FROM scored GROUP BY s
), ranked AS (
  SELECT *, coalesce(sum(n_s) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM per_s
)
SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
       CAST(sum(n_s - pos_s) AS BIGINT) AS n_neg,
       round((sum(pos_s * (2 * cum_before + n_s + 1)) - sum(pos_s) * (sum(pos_s) + 1)) * 1.0
             / (2 * sum(pos_s) * sum(n_s - pos_s)), 6) AS auc
FROM ranked
"""


# ---------------------------------------------------------------------------
# ks_test_twosample — Kolmogorov-Smirnov distance between two segments
# ---------------------------------------------------------------------------


def ks_test_twosample(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample KS statistic between purchase and click value
    distributions on the exact cents grid: per distinct cent, cumulative
    counts for each group (step ECDFs), D = max |F_a - F_b|. Each ECDF
    value is an exact integer ratio, so the max is engine-identical.
    The drift test a data-mixing pipeline runs between corpus snapshots
    (heavier-tailed sibling of psi_drift's binned version).

    Scale: groupBy on the bounded cents domain, one windowed cumulative
    over that bounded aggregate, one scalar max."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    e = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        cents.alias("c"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
    )
    per_c = e.groupBy("c").agg(
        F.sum("is_a").alias("na_c"), F.sum(1 - F.col("is_a")).alias("nb_c")
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_c.select(
        "c",
        F.sum("na_c").over(w).alias("cum_a"),
        F.sum("nb_c").over(w).alias("cum_b"),
    )
    tot = e.agg(F.sum("is_a").alias("na"), F.sum(1 - F.col("is_a")).alias("nb"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
            F.round(
                F.max(F.abs(F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb"))), 6
            ).alias("d_stat"),
        )
    )


KS_SQL = """
WITH e AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
  FROM events WHERE event_type IN ('purchase', 'click')
), per_c AS (
  SELECT c, sum(is_a) AS na_c, sum(1 - is_a) AS nb_c FROM e GROUP BY c
), cum AS (
  SELECT c, sum(na_c) OVER (ORDER BY c) AS cum_a, sum(nb_c) OVER (ORDER BY c) AS cum_b
  FROM per_c
), tot AS (SELECT sum(is_a) AS na, sum(1 - is_a) AS nb FROM e)
SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
       round(max(abs(cum_a * 1.0 / na - cum_b * 1.0 / nb)), 6) AS d_stat
FROM cum, tot
"""


# ---------------------------------------------------------------------------
# bootstrap_ci_hash — deterministic Poisson bootstrap replicates
# ---------------------------------------------------------------------------

BOOT_B = 100
# 16 hash slots approximating Poisson(1): P(0)=6/16, P(1)=6/16, P(2)=3/16,
# P(3)=1/16 (vs .368/.368/.184/.061) — the standard streaming-bootstrap
# weight trick with a content-addressed "RNG" so both engines agree
_POISSON_W = "CASE WHEN slot < 6 THEN 0 WHEN slot < 12 THEN 1 WHEN slot < 15 THEN 2 ELSE 3 END"


def bootstrap_ci_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Poisson bootstrap of the mean purchase value with CONTENT-ADDRESSED
    replicate weights: w(event, b) = a Poisson(1)-approximating function of
    md5(event_id:b) — no RNG state, reproducible on any engine and any
    partitioning, the way a distributed pipeline bootstraps without
    coordinating seeds. Emits one row per replicate (the CI is the
    quantile spread of this table).

    Scale: the B-fold explode is a narrow map (B rows per event, B
    bounded); one groupBy on B keys, all integer sums."""
    ev = load_table(spark, sf, "events").filter(F.col("event_type") == "purchase")
    cents = F.round(F.col("value") * 100).cast("long")
    b = F.explode(F.array(*[F.lit(i) for i in range(BOOT_B)])).alias("b")
    e = ev.select(cents.alias("cents"), F.col("event_id"), b)
    slot = F.conv(F.substring(F.md5(F.concat_ws(":", "event_id", "b")), 1, 8), 16, 10).cast("long") % 16
    weighted = e.withColumn("slot", slot).withColumn("w", F.expr(_POISSON_W))
    return (
        weighted.groupBy("b")
        .agg(F.sum("w").alias("n_eff"), F.sum(F.col("w") * F.col("cents")).alias("wsum"))
        .select(
            F.col("b").cast("long").alias("b"),
            F.col("n_eff").cast("long").alias("n_eff"),
            F.round(F.col("wsum") / F.col("n_eff"), 4).alias("mean_cents"),
        )
        .orderBy("b")
    )


BOOTSTRAP_SQL = f"""
WITH e AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_id, b.b
  FROM events, unnest(range({BOOT_B})) b(b)
  WHERE event_type = 'purchase'
), weighted AS (
  SELECT cents, b,
         {_POISSON_W.replace("slot", "(CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 8) AS BIGINT) % 16)")} AS w
  FROM e
)
SELECT CAST(b AS BIGINT) AS b, CAST(sum(w) AS BIGINT) AS n_eff,
       round(sum(w * cents) * 1.0 / sum(w), 4) AS mean_cents
FROM weighted GROUP BY b ORDER BY b
"""


# ---------------------------------------------------------------------------
# tail_index_hill — Hill estimator over the top order statistics
# ---------------------------------------------------------------------------

HILL_K = 100


def tail_index_hill(spark: SparkSession, sf: str) -> DataFrame:
    """Hill tail-index estimator on o_totalprice: the k=100 largest values
    under a unique (cents desc, orderkey) total order; alpha^-1 =
    mean ln(x_i / x_k). Heavy-tail exponents drive storage skew and
    shuffle-partition sizing decisions, and the top-k selection is a
    bounded TakeOrdered — no global sort of the corpus.

    Per-row ln terms are emitted alongside the single-row summary column
    (ln-sum under the psi_drift bound, round 4)."""
    orders = load_table(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    # TakeOrdered selects the k largest (distributed partial top-k);
    # the rank window then covers only HILL_K rows
    w = Window.orderBy(F.col("cents").desc(), F.col("o_orderkey"))
    top = (
        orders.select(cents.alias("cents"), "o_orderkey")
        .orderBy(F.col("cents").desc(), F.col("o_orderkey"))
        .limit(HILL_K)
        .withColumn("i", F.row_number().over(w).cast("long"))
    )
    xk = top.filter(F.col("i") == HILL_K).select(F.col("cents").alias("xk"))
    return (
        top.filter(F.col("i") < HILL_K)
        .crossJoin(F.broadcast(xk))
        .select(
            "i",
            F.col("cents").alias("x_cents"),
            F.round(F.log(F.col("cents") / F.col("xk")), 6).alias("ln_ratio"),
        )
        .orderBy("i")
    )


HILL_SQL = f"""
WITH top AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(row_number() OVER (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey) AS BIGINT) AS i
  FROM orders QUALIFY i <= {HILL_K}
), xk AS (SELECT cents AS xk FROM top WHERE i = {HILL_K})
SELECT i, cents AS x_cents, round(ln(cents * 1.0 / xk), 6) AS ln_ratio
FROM top, xk
WHERE i < {HILL_K}
ORDER BY i
"""


# ---------------------------------------------------------------------------
# dp_noise_count — differential-privacy noised count release
# ---------------------------------------------------------------------------

DP_EPS = 1.0


def dp_noise_count(spark: SparkSession, sf: str) -> DataFrame:
    """Laplace-mechanism noised per-group counts (sensitivity 1, eps=1):
    the inverse-CDF transform -sign(u) * ln(1 - 2|u|) / eps applied to a
    CONTENT-ADDRESSED uniform u in (-0.5, 0.5) derived from
    md5(event_type) — deterministic "noise" so the release is reproducible
    and testable on both engines (a production release swaps in real
    randomness; the plan is identical). Pairs with kanonymity_audit as the
    privacy surface.

    Scale: one bounded-key groupBy; the noise is a scalar expression."""
    ev = load_table(spark, sf, "events")
    g = ev.groupBy("event_type").agg(F.count("*").alias("true_n"))
    u = (
        F.conv(F.substring(F.md5(F.col("event_type")), 1, 8), 16, 10).cast("long") % 1_000_000
    ) / 1_000_000 - 0.5
    noise = -F.signum(u) * F.log(1 - 2 * F.abs(u)) / DP_EPS
    return g.select(
        "event_type",
        F.col("true_n").cast("long").alias("true_n"),
        F.round(F.col("true_n") + noise, 4).alias("released_n"),
        F.lit(float(DP_EPS)).alias("epsilon"),
    ).orderBy("event_type")


DP_SQL = f"""
WITH g AS (
  SELECT event_type, count(*) AS true_n FROM events GROUP BY event_type
), u AS (
  SELECT *, (CAST('0x' || substring(md5(event_type), 1, 8) AS BIGINT) % 1000000) / 1000000.0 - 0.5 AS uu
  FROM g
)
SELECT event_type, CAST(true_n AS BIGINT) AS true_n,
       round(true_n + (-sign(uu) * ln(1 - 2 * abs(uu)) / {DP_EPS}), 4) AS released_n,
       CAST({DP_EPS} AS DOUBLE) AS epsilon
FROM u
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# label_propagation_3iter — community detection on the co-supply graph
# ---------------------------------------------------------------------------

LP_ITERS = 3


def label_propagation_3iter(spark: SparkSession, sf: str) -> DataFrame:
    """Three synchronous label-propagation rounds on the degree-capped
    co-supply graph, seeded with each supplier's nation: every round each
    node takes the modal label among its neighbors (count desc, label asc
    tie-break; isolated nodes keep their label). The cheap community
    detector that complements pagerank_3iter/triangle_count; the oracle
    unrolls the identical three rounds as CTEs.

    Scale: the edge list is cached once; each round shuffles only the
    (node, label) vector — the Pregel shape in DataFrame ops, one driver
    action total."""
    und = _cosupply_edges(spark, sf)
    edges = und.select("u", "v").unionAll(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    edges.cache()
    edges.count()
    sup = load_table(spark, sf, "supplier")
    labels = sup.select(
        F.col("s_suppkey").alias("node"), F.col("s_nationkey").cast("long").alias("lbl")
    )
    seed = labels
    for _ in range(LP_ITERS):
        votes = (
            edges.join(labels, edges.u == labels.node)
            .groupBy(F.col("v").alias("nd"), "lbl")
            .agg(F.count("*").alias("n"))
        )
        wv = Window.partitionBy("nd").orderBy(F.col("n").desc(), F.col("lbl"))
        winner = votes.withColumn("rk", F.row_number().over(wv)).filter(
            F.col("rk") == 1
        ).select(F.col("nd").alias("node"), F.col("lbl").alias("new_lbl"))
        labels = (
            seed.join(winner, "node", "left")
            .select("node", F.coalesce("new_lbl", "lbl").alias("lbl"))
        )
        # next round votes read this round's labels; seed keeps the
        # isolated-node fallback stable
        seed = seed.select("node", "lbl").join(
            labels.select(F.col("node"), F.col("lbl").alias("cur")), "node"
        ).select("node", F.col("cur").alias("lbl"))
        labels = seed
    edges.unpersist()
    return labels.select(
        F.col("node").cast("long").alias("node"), F.col("lbl").alias("lbl")
    ).orderBy("node")


def _lp_round_sql(prev: str, out: str) -> str:
    return f"""
{out}_votes AS (
  SELECT e.v AS nd, p.lbl, count(*) AS n
  FROM edges_sym e JOIN {prev} p ON e.u = p.node
  GROUP BY 1, 2
), {out}_win AS (
  SELECT nd AS node, lbl FROM (
    SELECT nd, lbl, row_number() OVER (PARTITION BY nd ORDER BY n DESC, lbl) AS rk
    FROM {out}_votes) WHERE rk = 1
), {out} AS (
  SELECT s.node, coalesce(w.lbl, s.lbl) AS lbl
  FROM {prev} s LEFT JOIN {out}_win w USING (node)
)"""


LABEL_PROP_SQL = f"""
WITH edges AS ({_EDGES_SQL}),
edges_sym AS (
  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
),
l0 AS (
  SELECT s_suppkey AS node, CAST(s_nationkey AS BIGINT) AS lbl FROM supplier
),
{_lp_round_sql('l0', 'l1')[1:]},
{_lp_round_sql('l1', 'l2')[1:]},
{_lp_round_sql('l2', 'l3')[1:]}
SELECT CAST(node AS BIGINT) AS node, lbl FROM l3 ORDER BY node
"""


# ---------------------------------------------------------------------------
# random_projection_reduce — Johnson-Lindenstrauss dimensionality reduction
# ---------------------------------------------------------------------------

RP_DIM = 16


def random_projection_reduce(spark: SparkSession, sf: str) -> DataFrame:
    """Johnson-Lindenstrauss reduction 64 -> 16 dims with the engine's
    deterministic md5-derived hyperplanes (the same construction the LSH
    family uses): projected component = <v, plane_d>, emitted long-form
    (vec_id, dim, val) on the round-4 grid the ANN oracles pin. The
    embedding-compression step before clustering / coarse search at scale.

    Scale: pure narrow map — 16 array dot products per vector, no
    shuffle at all (the output groupBy key is the row identity)."""
    emb = load_table(spark, sf, "embeddings")
    planes = _hyperplanes(64, RP_DIM, seed=7)
    # + 0.0 normalizes IEEE signed zero: round(-4e-5, 4) is -0.0, which
    # engines stringify differently (sf0.1 parity edge)
    # r12: ONE parsed SQL string instead of RP_DIM x (64 literals + 2
    # lambdas) of py4j round-trips — identical expression (the bucket_sql
    # literal argument: repr() round-trips every double and CAST(string AS
    # DOUBLE) is a correctly-rounded parse)
    terms = []
    for d in range(RP_DIM):
        lits = ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in planes[d])
        dot = (
            f"aggregate(zip_with(embedding, array({lits}), "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, x) -> acc + x)"
        )
        terms.append(f"(round({dot}, 4) + 0D)")
    comps = F.expr("array(" + ", ".join(terms) + ")")
    return emb.select("vec_id", F.posexplode(comps).alias("dim", "val")).select(
        "vec_id", F.col("dim").cast("long").alias("dim"), "val"
    )


def _rp_oracle_sql() -> str:
    planes = _hyperplanes(64, RP_DIM, seed=7)
    rows = []
    for d in range(RP_DIM):
        arr = "[" + ", ".join(repr(x) for x in planes[d]) + "]"
        rows.append(f"({d}, CAST({arr} AS DOUBLE[]))")
    values = ",\n".join(rows)
    return f"""
WITH planes(dim, plane) AS (VALUES {values}),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT e.vec_id, CAST(p.dim AS BIGINT) AS dim,
       round(list_dot_product(e.v, p.plane), 4) + 0.0 AS val
FROM emb e CROSS JOIN planes p
"""


# ---------------------------------------------------------------------------
# ngram_lm_bigram — add-one-smoothed bigram LM scoring
# ---------------------------------------------------------------------------


def ngram_lm_bigram(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document cross-entropy under an add-one-smoothed BIGRAM model
    trained on the corpus itself — one rung up from
    text_perplexity_unigram on the LM-quality axis (context-sensitive:
    penalizes improbable transitions, not just rare words). avg_nll =
    mean over a doc's bigrams of -ln[(c(w1 w2)+1) / (c(w1)+V)].

    Scale: bigram/unigram tables are vocabulary-bounded aggregates,
    broadcast onto the bigram stream; one per-doc aggregation. Float
    story = text_perplexity_unigram's (ln terms match to the ulp,
    ~100-term sums, round 4)."""
    docs = load_table(spark, sf, "documents").withColumn("t", F.split("text", " "))
    big = docs.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))")
        ).alias("bg"),
    )
    bc = big.groupBy("bg").agg(F.count("*").alias("c_bg"))
    uni = _tokens(spark, sf).groupBy("tok").agg(F.count("*").alias("c_w1"))
    vsize = uni.agg(F.count("*").alias("v"))
    w1 = F.split(F.col("bg"), " ")[0]
    uni_w1 = uni.withColumnRenamed("tok", "w1")
    return (
        big.join(F.broadcast(bc), "bg")
        .withColumn("w1", w1)
        .join(F.broadcast(uni_w1), "w1")
        .crossJoin(F.broadcast(vsize))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                -F.sum(F.log((F.col("c_bg") + 1) / (F.col("c_w1") + F.col("v"))))
                / F.count("*"),
                4,
            ).alias("avg_nll"),
        )
    )


BIGRAM_LM_SQL = """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), big AS (
  SELECT doc_id, t[CAST(i.i + 1 AS INTEGER)] || ' ' || t[CAST(i.i + 2 AS INTEGER)] AS bg
  FROM docs, unnest(range(len(t) - 1)) i(i) WHERE len(t) >= 2
), bc AS (
  SELECT bg, count(*) AS c_bg FROM big GROUP BY bg
), uni AS (
  SELECT tok, count(*) AS c_w1 FROM (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents) GROUP BY tok
), vs AS (SELECT count(*) AS v FROM uni)
SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(-sum(ln((bc.c_bg + 1) * 1.0 / (u.c_w1 + v))) / count(*), 4) AS avg_nll
FROM big b
JOIN bc USING (bg)
JOIN uni u ON u.tok = string_split(b.bg, ' ')[1]
CROSS JOIN vs
GROUP BY b.doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "auc_roc_exact": QuerySpec(
        auc_roc_exact, AUC_SQL,
        "exact tie-corrected ROC-AUC via integer rank sums",
    ),
    "ks_test_twosample": QuerySpec(
        ks_test_twosample, KS_SQL,
        "two-sample KS distance on exact step ECDFs",
    ),
    "bootstrap_ci_hash": QuerySpec(
        bootstrap_ci_hash, BOOTSTRAP_SQL,
        "content-addressed Poisson bootstrap replicate means",
    ),
    "tail_index_hill": QuerySpec(
        tail_index_hill, HILL_SQL,
        "Hill tail-index terms over the top-k order statistics",
    ),
    "dp_noise_count": QuerySpec(
        dp_noise_count, DP_SQL,
        "Laplace-mechanism noised counts, content-addressed noise",
    ),
    "label_propagation_3iter": QuerySpec(
        label_propagation_3iter, LABEL_PROP_SQL,
        "3-round synchronous label propagation, modal-neighbor update",
    ),
    "random_projection_reduce": QuerySpec(
        random_projection_reduce, _rp_oracle_sql(),
        "JL random projection 64->16 dims, deterministic hyperplanes",
    ),
    "ngram_lm_bigram": QuerySpec(
        ngram_lm_bigram, BIGRAM_LM_SQL,
        "add-one bigram LM per-doc cross-entropy",
    ),
}
