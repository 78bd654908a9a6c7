"""Round-2 graph + mining operators. The graph is derived from the data
itself — suppliers that co-supply the same order form an undirected
"co-supply" edge (the SIP analog: capture agents that saw the same call).
Triangle counting uses degree orientation (each triangle counted exactly
once from its lowest-degree corner — the join fan-out bound that makes
triangle counting feasible on power-law graphs); PageRank runs a fixed
3-iteration loop with the edge list persisted across iterations.

The ML-adjacent operators: fixed-centroid k-means assignment (broadcast
centroids, codegen'd array math), kNN majority-vote classification over the
embedding table, and exact heavy hitters via the Misra-Gries two-phase
pattern (per-partition bounded-memory candidate summaries, then an exact
recount of candidates only — the shuffle carries 400 keys per partition
instead of the full token stream).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# co-supply graph helpers
# ---------------------------------------------------------------------------


GRAPH_TOPK = 8  # degree cap: keep each node's top-8 co-supply neighbors


def _cosupply_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Undirected edges (u < v) of the degree-capped co-supply similarity
    graph: weight = number of shared orders, each node keeps its top-8
    neighbors by (weight desc, id), then directed picks are symmetrized.
    The raw co-occurrence graph is near-complete at scale (453k edges on
    1000 suppliers at sf0.1), which makes any triangle/PageRank work
    quadratic; the top-k cap bounds edges at k*n and is how similarity
    graphs are kept sparse at 100 TB. Fully deterministic (integer weights,
    id tie-break)."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .agg(F.count("*").alias("w"))
    )
    wk = Window.partitionBy("u").orderBy(F.col("w").desc(), F.col("v"))
    top = pairs.withColumn("rk", F.row_number().over(wk)).filter(
        F.col("rk") <= GRAPH_TOPK
    )
    return top.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()


_EDGES_SQL = f"""
  SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
  FROM (
    SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY w DESC, v) AS rk
    FROM (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS w
      FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey != b.l_suppkey
      GROUP BY 1, 2
    )
  ) WHERE rk <= {GRAPH_TOPK}
"""


def triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Exact triangle count on the co-supply graph via degree orientation:
    orient every edge from its (degree, id)-smaller endpoint, then join
    oriented wedges back against oriented edges. Orientation bounds each
    node's join fan-out by its oriented out-degree (O(sqrt(m)) on any
    graph), which is what keeps the wedge join from exploding on hub nodes
    at scale. The count is identical to naive a<b<c enumeration (the
    oracle's formulation)."""
    edges = _cosupply_edges(spark, sf)
    edges.cache()
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        edges.join(deg.withColumnRenamed("n", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("deg", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("d")))
            .alias("e")
        )
        .select("e.s", "e.d")
    )
    e.cache()
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.d") == F.col("e2.s"))
        .select(
            F.col("e1.s").alias("x"), F.col("e1.d").alias("y"), F.col("e2.d").alias("z")
        )
    )
    closing = edges.select(
        F.col("u").alias("cu"), F.col("v").alias("cv")
    )
    tri = wedges.join(
        closing,
        (
            (F.least("x", "z") == F.col("cu"))
            & (F.greatest("x", "z") == F.col("cv"))
        ),
    )
    nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    n_tri = tri.agg(F.count("*").alias("n_triangles"))
    return nodes.crossJoin(n_edges).crossJoin(n_tri)


TRIANGLE_SQL = f"""
WITH e AS MATERIALIZED ({_EDGES_SQL})
SELECT (SELECT count(*) FROM (SELECT u AS n FROM e UNION SELECT v FROM e)) AS n_nodes,
       (SELECT count(*) FROM e) AS n_edges,
       (SELECT count(*)
        FROM e e1 JOIN e e2 ON e2.u = e1.v
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
"""


# ---------------------------------------------------------------------------
# pagerank_3iter — fixed-iteration PageRank, loop-unrolled oracle
# ---------------------------------------------------------------------------

PR_DAMP = 0.85
PR_ITERS = 3


def pagerank_3iter(spark: SparkSession, sf: str) -> DataFrame:
    """3 fixed PageRank iterations (d=0.85) on the co-supply graph, both
    directions of each undirected edge. The iterative DataFrame loop keeps
    the directed edge list (with out-degrees) cached and shuffles only the
    rank vector each round — the GraphX/Pregel shape expressed in pure
    DataFrame ops. Ranks are reported scaled by n (so ~1.0) and rounded;
    the oracle unrolls the same three iterations as nested CTEs. Every
    node has in- and out-edges here, so no dangling-mass term is needed."""
    und = _cosupply_edges(spark, sf)
    und.cache()
    edges = und.select("u", "v").unionAll(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = edges.groupBy("u").agg(F.count("*").alias("outdeg"))
    ed = edges.join(deg, "u").select("u", "v", "outdeg")
    ed.cache()
    nodes = deg.select(F.col("u").alias("node")).cache()
    n = nodes.count()  # also materializes the cached edge list once
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(PR_ITERS):
        contrib = (
            ed.join(ranks, ed.u == ranks.node)
            .select(F.col("v").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - PR_DAMP) / n)
                    + F.lit(PR_DAMP) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select(
        "node", F.round(F.col("rank") * n, 4).alias("rank_scaled")
    )


PAGERANK_SQL = f"""
WITH und AS MATERIALIZED ({_EDGES_SQL}),
e AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
deg AS (SELECT u, count(*) AS outdeg FROM e GROUP BY u),
ed AS (SELECT e.u, e.v, deg.outdeg FROM e JOIN deg ON deg.u = e.u),
nodes AS (SELECT u AS node FROM deg),
nn AS (SELECT count(*) AS c FROM nodes),
r0 AS (SELECT node, 1.0 / c AS rank FROM nodes, nn),
r1 AS (
  SELECT n.node, (1 - {PR_DAMP}) / nn.c + {PR_DAMP} * coalesce(s.inflow, 0) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (SELECT ed.v AS node, sum(r.rank / ed.outdeg) AS inflow
             FROM ed JOIN r0 r ON r.node = ed.u GROUP BY ed.v) s ON s.node = n.node
),
r2 AS (
  SELECT n.node, (1 - {PR_DAMP}) / nn.c + {PR_DAMP} * coalesce(s.inflow, 0) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (SELECT ed.v AS node, sum(r.rank / ed.outdeg) AS inflow
             FROM ed JOIN r1 r ON r.node = ed.u GROUP BY ed.v) s ON s.node = n.node
),
r3 AS (
  SELECT n.node, (1 - {PR_DAMP}) / nn.c + {PR_DAMP} * coalesce(s.inflow, 0) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (SELECT ed.v AS node, sum(r.rank / ed.outdeg) AS inflow
             FROM ed JOIN r2 r ON r.node = ed.u GROUP BY ed.v) s ON s.node = n.node
)
SELECT node, round(rank * nn.c, 4) AS rank_scaled FROM r3, nn
"""


# ---------------------------------------------------------------------------
# kmeans_assign — fixed-centroid nearest-centroid assignment
# ---------------------------------------------------------------------------

KMEANS_K = 8


def kmeans_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-centroid assignment (the E-step of k-means / the routing
    step of IVF): centroids = the first K vectors by id (deterministic),
    broadcast to every task; squared-L2 via zip_with/aggregate runs inside
    whole-stage codegen — no Python in the scan. Per-cluster sizes and the
    grid-stabilized mean distance (round the sum, then divide) keep the
    result bit-stable across engines."""
    emb = load_table(spark, sf, "embeddings").withColumn(
        "vec", F.expr("transform(embedding, x -> cast(x AS double))")
    )
    cent = emb.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cluster_id"), F.col("vec").alias("cvec")
    )
    d2 = (
        "aggregate(zip_with(vec, cvec, (x, y) -> (x - y) * (x - y)),"
        " 0D, (acc, x) -> acc + x)"
    )
    scored = emb.crossJoin(F.broadcast(cent)).withColumn(
        "dist", F.round(F.sqrt(F.expr(d2)), 4)
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cluster_id")
    best = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        best.groupBy("cluster_id")
        .agg(F.count("*").alias("n_assigned"), F.sum("dist").alias("sum_dist"))
        .select(
            "cluster_id",
            "n_assigned",
            (F.round(F.col("sum_dist"), 2) / F.col("n_assigned")).alias("avg_dist"),
        )
    )


KMEANS_SQL = f"""
WITH cent AS (
  SELECT vec_id AS cluster_id, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings WHERE vec_id < {KMEANS_K}
), scored AS (
  SELECT e.vec_id, c.cluster_id,
         round(list_distance(CAST(e.embedding AS DOUBLE[]), c.cvec), 4) AS dist
  FROM embeddings e CROSS JOIN cent c
), best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rk
    FROM scored) WHERE rk = 1
)
SELECT cluster_id, count(*) AS n_assigned,
       round(sum(dist), 2) / count(*) AS avg_dist
FROM best GROUP BY cluster_id
"""


# ---------------------------------------------------------------------------
# knn_vote — kNN majority-vote classification
# ---------------------------------------------------------------------------

KNN_K = 5
KNN_QMOD = 37


def knn_vote(spark: SparkSession, sf: str) -> DataFrame:
    """kNN classification: each query vector (vec_id % 37 == 0) takes the
    majority label of its 5 cosine-nearest neighbors (ties -> smaller
    label). Same broadcast-queries/scan-corpus shape as ann_cosine_topk,
    plus the vote — at scale this is one corpus scan regardless of k or
    query count, with per-partition partial top-k folded by the rank."""
    emb = load_table(spark, sf, "embeddings").withColumn(
        "vec", F.expr("transform(embedding, x -> cast(x AS double))")
    ).withColumn("norm", F.expr("sqrt(aggregate(vec, 0D, (acc, x) -> acc + x * x))"))
    q = emb.filter(F.col("vec_id") % KNN_QMOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    c = emb.filter(F.col("vec_id") % KNN_QMOD != 0).select(
        F.col("vec_id").alias("c_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
        F.col("label").alias("c_label"),
    )
    cos = (
        "aggregate(zip_with(qvec, cvec, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        " / (qnorm * cnorm)"
    )
    scored = c.join(F.broadcast(q)).withColumn("sim", F.round(F.expr(cos), 4))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    top = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= KNN_K)
    votes = top.groupBy("q_id", "c_label").agg(F.count("*").alias("votes"))
    wv = Window.partitionBy("q_id").orderBy(F.col("votes").desc(), F.col("c_label"))
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "q_id",
            F.col("c_label").cast("long").alias("pred_label"),
            F.col("votes").cast("long").alias("votes"),
        )
    )


KNN_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label AS c_label,
         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])), 4) AS sim
  FROM embeddings q JOIN embeddings c
    ON q.vec_id % {KNN_QMOD} = 0 AND c.vec_id % {KNN_QMOD} != 0
), top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rk
    FROM scored) WHERE rk <= {KNN_K}
), votes AS (
  SELECT q_id, c_label, count(*) AS votes FROM top GROUP BY q_id, c_label
)
SELECT q_id, CAST(c_label AS BIGINT) AS pred_label, CAST(votes AS BIGINT) AS votes
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, c_label) AS vr
      FROM votes)
WHERE vr = 1
"""


# ---------------------------------------------------------------------------
# heavy_hitters_mg — exact heavy hitters via Misra-Gries two-phase
# ---------------------------------------------------------------------------

HH_DIV = 200  # report tokens with freq >= N / HH_DIV
MG_CAP = 400  # per-partition summary capacity; CAP > DIV guarantees recall


def _mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Misra-Gries summary of one partition's token stream: bounded at
    MG_CAP counters. Guarantee: any token with partition frequency
    > n_p/(MG_CAP+1) survives; combined with pigeonhole over partitions,
    every global >= N/HH_DIV hitter appears in some partition's summary."""
    counters: dict[str, int] = {}
    for pdf in batches:
        for tok in pdf["token"]:
            if tok in counters:
                counters[tok] += 1
            elif len(counters) < MG_CAP:
                counters[tok] = 1
            else:
                dead = [k for k in counters if counters[k] == 1]
                for k in counters:
                    counters[k] -= 1
                for k in dead:
                    del counters[k]
    yield pd.DataFrame({"token": list(counters.keys())})


def heavy_hitters_mg(spark: SparkSession, sf: str) -> DataFrame:
    """Exact heavy hitters (tokens with frequency >= N/200) without ever
    shuffling the full token stream: phase 1 computes a bounded Misra-Gries
    candidate summary per partition (mapInPandas, 400 counters), phase 2
    recounts ONLY the candidate tokens exactly and applies the threshold.
    The Misra-Gries recall guarantee (capacity 400 > divisor 200) makes the
    final answer exact — the oracle is a plain GROUP BY ... HAVING. At
    100 TB the shuffle carries candidates-per-partition, not tokens."""
    docs = load_table(spark, sf, "documents")
    tokens = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    candidates = (
        tokens.mapInPandas(_mg_partition, "token string").distinct()
    )
    total = tokens.agg(F.count("*").alias("total"))
    counts = (
        tokens.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.crossJoin(total)
        .filter(F.col("cnt") >= F.col("total") / HH_DIV)
        .select(
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 6).alias("frac"),
        )
    )


HH_SQL = f"""
WITH toks AS (
  SELECT t.token FROM documents, unnest(string_split(text, ' ')) AS t(token)
  WHERE t.token != ''
), tot AS (SELECT count(*) AS total FROM toks)
SELECT token, count(*) AS cnt,
       round(count(*) / any_value(tot.total), 6) AS frac
FROM toks, tot
GROUP BY token
HAVING count(*) >= any_value(tot.total) / {HH_DIV}
"""


QUERIES: dict[str, QuerySpec] = {
    "triangle_count": QuerySpec(
        triangle_count, TRIANGLE_SQL, "degree-oriented exact triangle count"
    ),
    "pagerank_3iter": QuerySpec(
        pagerank_3iter, PAGERANK_SQL, "fixed-iteration DataFrame PageRank"
    ),
    "kmeans_assign": QuerySpec(
        kmeans_assign, KMEANS_SQL, "broadcast fixed-centroid k-means E-step"
    ),
    "knn_vote": QuerySpec(knn_vote, KNN_SQL, "kNN majority-vote classification"),
    "heavy_hitters_mg": QuerySpec(
        heavy_hitters_mg, HH_SQL, "exact heavy hitters via Misra-Gries two-phase"
    ),
}
