"""Round-5 analytics batch 2: exact-arithmetic power-iteration PCA and
market-basket association rules.

Both follow the integer-grid determinism discipline: every cross-engine
double is either produced by an identical fixed-order expression or
quantized to an exact integer grid before any shuffled aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# pca_power_iteration — top principal direction via 2 exact power steps
# ---------------------------------------------------------------------------

PCA_Q = 10_000  # 1e4 quantization grid for components and vector entries


def pca_power_iteration(spark: SparkSession, sf: str) -> DataFrame:
    """Top principal direction of the embedding corpus by POWER ITERATION
    (v <- X^T X v, normalized), run on an EXACT INTEGER GRID: vector
    entries and the iterate are 1e4-quantized, so the two matvec passes
    are pure BIGINT sums — shuffle order cannot move a bit — and the only
    doubles are the per-iteration norm (a fixed-order fold over the 64
    dims) and the final requantization. Two iterations from the all-ones
    start; X^T X is PSD so the orientation is deterministic.

    This is how a distributed PCA actually runs at 100 TB: each matvec is
    one narrow map (s_i = x_i . v with v broadcast) + one hash agg per
    dim (w_d = sum_i s_i x_id); nothing materializes the covariance
    matrix, and state is one 64-row broadcast per iteration.

    Cited shape: power iteration as in the classic streaming-PCA
    literature; the integer-grid trick is this repo's cross-engine
    determinism discipline (see SQ8/MOS in SKILL gotchas)."""
    emb = load_table(spark, sf, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "xv")
    ).select(
        "vec_id",
        "d",
        F.floor(F.col("xv").cast("double") * PCA_Q + 0.5).cast("long").alias("xq"),
    )
    x = x.persist()

    def step(v_df: DataFrame) -> DataFrame:
        """One power step: returns the next 1e4-quantized iterate (d, vq)."""
        s = (
            x.join(F.broadcast(v_df), "d")
            .groupBy("vec_id")
            .agg(F.sum(F.col("xq") * F.col("vq")).alias("s"))
        )
        w = (
            x.join(s, "vec_id")
            .groupBy("d")
            .agg(F.sum(F.col("s") * F.col("xq")).alias("w"))
        )
        # norm over the 64 dims: fixed-order fold of exact i64 values cast
        # to double (i64 -> f64 is IEEE round-to-nearest in both engines)
        nrm = w.agg(
            F.sqrt(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("d", "w"))),
                    F.lit(0.0),
                    lambda a, s_: a
                    + s_["w"].cast("double") * s_["w"].cast("double"),
                )
            ).alias("nrm")
        )
        return (
            w.crossJoin(F.broadcast(nrm))
            .select(
                "d",
                F.floor(
                    F.col("w").cast("double")
                    / F.when(F.col("nrm") > 0, F.col("nrm")).otherwise(F.lit(1.0))
                    * PCA_Q
                    + 0.5
                )
                .cast("long")
                .alias("vq"),
            )
        )

    try:
        dims = x.select("d").distinct()
        v0 = dims.select("d", F.lit(PCA_Q).cast("long").alias("vq"))
        v1 = step(v0)
        v2 = step(v1)
        out = v2.select(
            F.col("d").cast("int").alias("d"), F.col("vq").alias("v_e4")
        ).orderBy("d")
        rows = out.collect()
    finally:
        x.unpersist()
    return spark.createDataFrame(rows, "d int, v_e4 bigint")


PCA_SQL = f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (
  SELECT vec_id, CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS d,
         CAST(floor(unnest(v) * {PCA_Q} + 0.5) AS BIGINT) AS xq
  FROM emb
),
v0 AS (SELECT DISTINCT d, CAST({PCA_Q} AS BIGINT) AS vq FROM x),
s1 AS (
  SELECT x.vec_id, CAST(sum(x.xq * v0.vq) AS BIGINT) AS s
  FROM x JOIN v0 USING (d) GROUP BY x.vec_id
),
w1 AS (
  SELECT x.d, CAST(sum(s1.s * x.xq) AS BIGINT) AS w
  FROM x JOIN s1 USING (vec_id) GROUP BY x.d
),
n1 AS (
  SELECT sqrt(list_aggregate(
    list(CAST(w AS DOUBLE) * CAST(w AS DOUBLE) ORDER BY d), 'sum')) AS nrm
  FROM w1
),
v1 AS (
  SELECT d, CAST(floor(CAST(w AS DOUBLE)
                       / (CASE WHEN nrm > 0 THEN nrm ELSE 1.0 END)
                       * {PCA_Q} + 0.5) AS BIGINT) AS vq
  FROM w1, n1
),
s2 AS (
  SELECT x.vec_id, CAST(sum(x.xq * v1.vq) AS BIGINT) AS s
  FROM x JOIN v1 USING (d) GROUP BY x.vec_id
),
w2 AS (
  SELECT x.d, CAST(sum(s2.s * x.xq) AS BIGINT) AS w
  FROM x JOIN s2 USING (vec_id) GROUP BY x.d
),
n2 AS (
  SELECT sqrt(list_aggregate(
    list(CAST(w AS DOUBLE) * CAST(w AS DOUBLE) ORDER BY d), 'sum')) AS nrm
  FROM w2
)
SELECT CAST(d AS INTEGER) AS d,
       CAST(floor(CAST(w AS DOUBLE)
                  / (CASE WHEN nrm > 0 THEN nrm ELSE 1.0 END)
                  * {PCA_Q} + 0.5) AS BIGINT) AS v_e4
FROM w2, n2
ORDER BY d
"""


# ---------------------------------------------------------------------------
# association_rules_brand — market-basket support/confidence/lift
# ---------------------------------------------------------------------------

RULE_MIN_SUPPORT = 10  # absolute basket count floor for a pair
RULE_TOP = 50


def association_rules_brand(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket association rules over order baskets of part BRANDS
    (bounded 25-value item domain, so pairs cap at 600 — the aggregation
    keys never grow with the fact table): for each ordered brand pair
    A -> B with pair support >= 10 baskets, exact support / confidence /
    lift in 1e6-quantized integer ratios (numerators and denominators are
    exact BIGINT counts, quantized before any cross-engine comparison).
    Top 50 by lift (desc, pair tie-break).

    Scale: baskets = one distinct (order, brand) projection; pair counts
    = one self-join on the order key restricted to A < B (each basket
    contributes its bounded brand-pair set, not row pairs); everything
    downstream runs on the <= 600-row pair table."""
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
    )
    part = load_table(spark, sf, "part").select(
        F.col("p_partkey").alias("pkey"), F.col("p_brand").alias("brand")
    )
    baskets = li.join(part, "pkey").select("okey", "brand").distinct()
    n_orders = baskets.select("okey").distinct().count()
    a = baskets.select("okey", F.col("brand").alias("brand_a"))
    b = baskets.select("okey", F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= RULE_MIN_SUPPORT)
    )
    per_brand = baskets.groupBy("brand").agg(F.count("*").cast("long").alias("n"))
    na = per_brand.select(F.col("brand").alias("brand_a"), F.col("n").alias("n_a"))
    nb = per_brand.select(F.col("brand").alias("brand_b"), F.col("n").alias("n_b"))
    scored = (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.floor(F.col("n_ab") * 1_000_000.0 / n_orders + 0.5)
            .cast("long")
            .alias("support_e6"),
            F.floor(F.col("n_ab") * 1_000_000.0 / F.col("n_a") + 0.5)
            .cast("long")
            .alias("conf_e6"),
            F.floor(
                F.col("n_ab") * n_orders * 1_000_000.0
                / (F.col("n_a") * F.col("n_b"))
                + 0.5
            )
            .cast("long")
            .alias("lift_e6"),
        )
    )
    return (
        scored.orderBy(
            F.col("lift_e6").desc(), F.col("brand_a"), F.col("brand_b")
        )
        .limit(RULE_TOP)
    )


RULES_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n_orders AS (SELECT count(DISTINCT okey) AS n FROM baskets),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM baskets a JOIN baskets b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2
  HAVING count(*) >= {RULE_MIN_SUPPORT}
),
per_brand AS (SELECT brand, CAST(count(*) AS BIGINT) AS n FROM baskets GROUP BY brand)
SELECT brand_a, brand_b, n_ab,
       CAST(floor(n_ab * 1000000.0 / o.n + 0.5) AS BIGINT) AS support_e6,
       CAST(floor(n_ab * 1000000.0 / na.n + 0.5) AS BIGINT) AS conf_e6,
       CAST(floor(n_ab * o.n * 1000000.0 / (na.n * nb.n) + 0.5) AS BIGINT) AS lift_e6
FROM pairs
JOIN per_brand na ON na.brand = pairs.brand_a
JOIN per_brand nb ON nb.brand = pairs.brand_b
CROSS JOIN n_orders o
ORDER BY lift_e6 DESC, brand_a, brand_b
LIMIT {RULE_TOP}
"""


QUERIES: dict[str, QuerySpec] = {
    "pca_power_iteration": QuerySpec(
        pca_power_iteration, PCA_SQL,
        "top principal direction via 2 integer-grid power-iteration steps",
    ),
    "association_rules_brand": QuerySpec(
        association_rules_brand, RULES_SQL,
        "market-basket support/confidence/lift over brand baskets, top-50 by lift",
    ),
}
