"""Scale-path similarity search: random-hyperplane LSH bucketing for
embedding ANN — the candidate-generation layer that replaces the O(n·q)
brute force of queries/llm.ann_cosine_topk when the corpus is 100 TB.

Sign-LSH: project each vector onto k fixed pseudo-random hyperplanes; the
k-bit sign pattern is the bucket key. Cosine-similar vectors agree on most
signs, so probing the query's bucket (plus optional multi-probe neighbors at
Hamming distance 1) retrieves candidates with an equi-join on the bucket key
— a hash shuffle, never a cross join. Recall/cost is tuned by k and the
number of hash tables.

Hyperplanes are derived deterministically from a seed via md5 (no RNG at
plan time — reproducible across runs and engines).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hyperplanes(dim: int, k: int, seed: int = 42) -> list[list[float]]:
    """k deterministic unit-free hyperplanes: component (i, j) is a
    zero-centered value derived from md5(seed:i:j)."""
    planes = []
    for i in range(k):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()
            (u,) = struct.unpack(">I", h[:4])
            row.append(u / 2**31 - 1.0)  # [-1, 1)
        planes.append(row)
    return planes


def with_lsh_bucket(df: DataFrame, vec_col: str = "embedding", dim: int = 64,
                    k: int = 8, seed: int = 42,
                    out_col: str = "lsh_bucket") -> DataFrame:
    """Add the k-bit sign-LSH bucket id, computed with array-native
    expressions (aggregate over zip products) — no Python in the scan."""
    planes = _hyperplanes(dim, k, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn(out_col, bucket)


def lsh_topk(corpus: DataFrame, queries: DataFrame, vec_col: str = "embedding",
             id_col: str = "vec_id", dim: int = 64, k_bits: int = 8,
             top_k: int = 5, multiprobe: bool = True) -> DataFrame:
    """ANN top-k restricted to LSH bucket matches.

    corpus/queries: DataFrames with (id_col, vec_col). Returns
    (q_id, c_id, sim, rk) like the brute-force baseline but only scoring
    candidate pairs that share a bucket (or a Hamming-1 neighbor bucket when
    multiprobe=True, trading more candidates for recall)."""
    c = with_lsh_bucket(corpus, vec_col, dim, k_bits).select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("cvec"),
        F.col("lsh_bucket").alias("c_bucket"),
    )
    q = with_lsh_bucket(queries, vec_col, dim, k_bits).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qvec"),
        F.col("lsh_bucket").alias("q_bucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("q_bucket"), *[F.expr(f"q_bucket ^ {1 << i}") for i in range(k_bits)]
        )
        q = q.withColumn("probe", F.explode(probes))
    else:
        q = q.withColumn("probe", F.col("q_bucket"))

    dot = F.aggregate(
        F.zip_with(
            F.col("qvec"), F.col("cvec"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        q.join(c, q.probe == c.c_bucket)
        .withColumn("sim", F.round(dot / (norm("qvec") * norm("cvec")), 4))
        .select("q_id", "c_id", "sim")
        .distinct()  # multiprobe can hit the same pair via two probes
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path
# ---------------------------------------------------------------------------


def ivf_topk(corpus: DataFrame, queries: DataFrame, vec_col: str = "embedding",
             id_col: str = "vec_id", n_cells: int = 16, nprobe: int = 4,
             top_k: int = 5) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into ``n_cells`` inverted lists,
    probe each query against its ``nprobe`` nearest cells, exact-rerank only
    the probed candidates.

    Cell assignment is a vectorized Pandas UDF (one numpy matmul per Arrow
    batch against the broadcast centroid matrix — the legitimate Python-UDF
    case: a dense GEMM the SQL expression language can't vectorize). The
    centroid "training" here is deterministic (n_cells vectors stride-
    sampled evenly across the id-ordered corpus, L2-normalized) so results
    are reproducible across engines and runs; a production deployment would
    refresh centroids with ml.clustering.KMeans on a sample — the
    query-side plan is identical.

    Scale shape: centroids are O(n_cells x dim) — driver-collected and
    closure-broadcast (bounded, independent of corpus size). Centroid
    selection is a deterministic hash-sample: order by md5(id) and take
    n_cells — Spark compiles orderBy+limit to TakeOrderedAndProject
    (per-partition partial top-k, driver merges n_cells rows), so there is
    no global sort, no extra count() job, and the choice is a uniform
    pseudo-random sample that is stable across runs, partitionings, and
    cluster sizes. Corpus assignment is a narrow map; the probe join is an
    equi-join on cell id (hash shuffle keyed on at most n_cells values —
    salt or raise n_cells if cells skew); rerank cost is
    |q| x (nprobe/n_cells) x |corpus| instead of |q| x |corpus|.
    """
    from pyspark.sql.functions import pandas_udf

    cents = (
        corpus.select(
            F.col(vec_col).alias("v"),
            F.md5(F.col(id_col).cast("string")).alias("hk"),
        )
        .orderBy("hk")
        .limit(n_cells)
        .select("v")
        .collect()
    )
    C = np.array([r[0] for r in cents], dtype=np.float64)
    C = C / np.linalg.norm(C, axis=1, keepdims=True)

    @pandas_udf("int")
    def assign_cell(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy())
        sims = M @ C.T
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy())
        sims = M @ C.T
        order = np.argsort(-sims, axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(order))

    c = corpus.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("cvec")
    ).withColumn("cell", assign_cell("cvec"))
    q = (
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qvec"))
        .withColumn("cell", F.explode(probe_cells("qvec")))
    )

    dot = F.aggregate(
        F.zip_with(
            F.col("qvec"), F.col("cvec"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        q.join(c, "cell")
        .withColumn("sim", F.round(dot / (norm("qvec") * norm("cvec")), 4))
        .select("q_id", "c_id", "sim")
        .distinct()
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
    )
