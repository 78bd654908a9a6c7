"""Round-8: skewed-key stress for the banded dedup join (r07 verdict
item 6).

The 100 TB risk in MinHash-LSH is a HOT BAND BUCKET: boilerplate-heavy
corpora (license headers, templated pages) put a constant fraction of all
documents into one (band, bkey) value. The flagship chain's all-pairs
self-join inside a bucket is then quadratic in the hot bucket AND lands
the whole bucket on one reducer. This module pins the production answer
on an ADVERSARIAL corpus (one boilerplate family carrying ~10% of docs):

 1. star candidates, not all-pairs: per bucket, link every doc to the
    bucket's MIN doc_id (one partial-combinable min agg — map-side
    combine absorbs the hot key before any shuffle), so candidate count
    is LINEAR in bucket size;
 2. salted representative join: the bands->reps equi-join still hashes
    ~10% of rows to one (band, bkey) reducer, so the band side carries a
    deterministic salt (doc_id % SALT) and the one-row-per-bucket reps
    side is replicated across all SALT values — the hot bucket spreads
    over SALT partitions with exactly one match per row. Salting is a
    physical rewrite only: results are provably identical to the unsalted
    join (each left row matches exactly the replica carrying its salt),
    which is why the DuckDB oracle replays the UNSALTED form.

tools/plan_audit.py asserts the physical shape (salt in the join keys,
partial aggregation before the reps exchange); tools/scale_probe.py
records the 20x number in SCALE.md.

Reference scope: north-star extension (the dedup family); the skew
pattern itself is the classic salted-join from the Spark performance
literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec
from .llm import (
    JACCARD_THRESHOLD,
    MINHASH_BAND_ROWS,
    MINHASH_SEEDS,
    _DUCK_SHINGLES_CTE,
    _doc_shingles,
    _minhash_bands,
    _verify_candidate_pairs,
)

SKEW_SALT = 8           # hot-bucket fanout of the salted reps join
SKEW_EVERY = 10         # every 10th doc becomes boilerplate (~10% hot)
BOILERPLATE = (
    "this document is provided as is without warranty of any kind either "
    "express or implied including but not limited to the implied "
    "warranties of merchantability and fitness for a particular purpose"
)


def _skewed_docs(spark: SparkSession, sf: str) -> DataFrame:
    """The adversarial corpus: every SKEW_EVERY-th document's text is the
    fixed boilerplate plus a tiny per-doc tail — NEAR-duplicates (so
    exact-collapse cannot remove them) that share almost all shingles and
    therefore pile into the same band buckets."""
    # spread=True: same serial-scan fix as llm._shingles_raw (the signing
    # work below is the heavy consumer); 3.79 -> 2.40 s same-window A/B
    return load_table(spark, sf, "documents", spread=True).select(
        "doc_id",
        F.when(
            F.col("doc_id") % SKEW_EVERY == 0,
            F.concat(F.lit(BOILERPLATE + " clause nr "),
                     F.col("doc_id").cast("string")),
        ).otherwise(F.col("text")).alias("text"),
    )


def dedup_skewed_band(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup detection on the adversarial boilerplate corpus with the
    skew-safe plan (module doc): star candidates per bucket + salted
    representative join + exact-Jaccard verification (the flagship's
    shared verification body, so the policies cannot drift). Returns
    (da=cluster representative, db, jaccard) pairs — the boilerplate
    family must link to its min-doc representative.

    Scale: the min-per-bucket agg is map-side combined (hot key absorbed
    before the exchange); the salted join bounds any single partition to
    ~hot_bucket/SALT rows; candidates are linear in bucket sizes, so
    verification work tracks the true near-dup rate, never its square."""
    sdocs = _skewed_docs(spark, sf)
    bands = _minhash_bands(_doc_shingles(sdocs))
    reps = bands.groupBy("band", "bkey").agg(F.min("doc_id").alias("rep"))
    reps_salted = reps.select(
        "band", "bkey", "rep",
        F.explode(F.array(*[F.lit(s) for s in range(SKEW_SALT)])).alias("salt"),
    )
    banded = bands.withColumn("salt", (F.col("doc_id") % SKEW_SALT).cast("int"))
    candidates = (
        banded.join(reps_salted, ["band", "bkey", "salt"])
        .filter(F.col("doc_id") > F.col("rep"))
        .select(F.col("rep").alias("da"), F.col("doc_id").alias("db"))
        .distinct()
    )
    return _verify_candidate_pairs(sdocs, candidates)


def _skew_oracle_sql() -> str:
    """Derived from the flagship shingle/signature generators over the
    adversarial corpus, with the UNSALTED star-candidate rule (salting is
    physically-only, see module doc)."""
    shingles_cte = _DUCK_SHINGLES_CTE.replace("FROM documents", "FROM docs2")
    assert "FROM docs2" in shingles_cte, "shingle CTE changed; re-derive"
    sig_cols = ", ".join(
        f"min(md5('{i}:' || sh)) AS mh{i}" for i in range(MINHASH_SEEDS)
    )
    bands_sql = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({expr}) AS bkey FROM sig".format(
            b=b,
            expr=" || ',' || ".join(
                f"mh{b * MINHASH_BAND_ROWS + r}"
                for r in range(MINHASH_BAND_ROWS)
            ),
        )
        for b in range(MINHASH_SEEDS // MINHASH_BAND_ROWS)
    )
    return f"""
WITH docs2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % {SKEW_EVERY} = 0
              THEN '{BOILERPLATE} clause nr ' || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM documents
),
{shingles_cte},
sig AS (SELECT doc_id, {sig_cols} FROM shingles GROUP BY doc_id),
bands AS ({bands_sql}),
reps AS (SELECT band, bkey, min(doc_id) AS rep FROM bands GROUP BY 1, 2),
candidates AS (
  SELECT DISTINCT r.rep AS da, b.doc_id AS db
  FROM bands b JOIN reps r ON b.band = r.band AND b.bkey = r.bkey
  WHERE b.doc_id > r.rep
),
counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.da, c.db, count(*) AS inter
  FROM candidates c
  JOIN shingles a ON a.doc_id = c.da
  JOIN shingles b ON b.doc_id = c.db AND a.sh = b.sh
  GROUP BY 1, 2
)
SELECT i.da, i.db,
       round(inter * 1.0 / (ca.n + cb.n - inter), 4) AS jaccard
FROM inter i
JOIN counts ca ON i.da = ca.doc_id
JOIN counts cb ON i.db = cb.doc_id
WHERE round(inter * 1.0 / (ca.n + cb.n - inter), 4) >= {JACCARD_THRESHOLD}
"""


QUERIES: dict[str, QuerySpec] = {
    "dedup_skewed_band": QuerySpec(
        dedup_skewed_band, _skew_oracle_sql(),
        doc="adversarial hot-band corpus (~10% boilerplate near-dups): "
            "star candidates per bucket + salted reps join keep the plan "
            "linear and skew-spread; oracle replays the unsalted form",
    ),
}
