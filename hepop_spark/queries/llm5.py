"""Round-3 LLM-pipeline batch: tokenizer-training, dedup-estimator
calibration, and LM-quality scoring primitives over `documents` (north-star
scope; the reference stores opaque payload text, hepop.js:183).

Engine-parity rules as established: md5-keyed determinism, integer counts,
one terminal double division, round() only on values whose cross-engine
error bound is orders below the output grid (the ln-sum arguments mirror
psi_drift's, queries/analytics9.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec
from .llm import (
    MINHASH_BAND_ROWS,
    MINHASH_SEEDS,
    _DUCK_SHINGLES_CTE,
    _shingles_raw,
    _tokens,
)

# ---------------------------------------------------------------------------
# bpe_merge_candidates — the first BPE merge-table iteration
# ---------------------------------------------------------------------------

BPE_TOP = 20


def bpe_merge_candidates(spark: SparkSession, sf: str) -> DataFrame:
    """The inner loop of BPE tokenizer training, as one corpus pass: count
    every adjacent character pair inside every token occurrence and rank
    the merge candidates — rank 1 is the pair the first BPE merge would
    fuse. Deterministic tie-break (count desc, pair asc) keeps the table
    engine-portable.

    Scale shape: explode to pairs is a narrow map (no shuffle), the count
    is one partial-aggregated groupBy on a vocabulary-bounded key space
    (|distinct pairs| <= |alphabet|^2), and the top-20 rank runs over that
    bounded aggregate — corpus volume only changes the count magnitudes.
    Real BPE iterates merge->recount; each iteration is this same plan
    over the re-segmented corpus."""
    toks = _tokens(spark, sf).filter(F.length("tok") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("pair"))
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= BPE_TOP)
        .select("pair", "n", "rk")
    )


BPE_MERGE_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), pairs AS (
  SELECT substr(tok, CAST(i.i + 1 AS INTEGER), 2) AS pair
  FROM toks, unnest(range(length(tok) - 1)) i(i)
  WHERE length(tok) >= 2
), counts AS (
  SELECT pair, count(*) AS n FROM pairs GROUP BY pair
)
SELECT pair, n, CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rk
FROM counts
QUALIFY rk <= {BPE_TOP}
"""


# ---------------------------------------------------------------------------
# dedup_jaccard_est — minhash-estimator calibration table
# ---------------------------------------------------------------------------


def dedup_jaccard_est(spark: SparkSession, sf: str) -> DataFrame:
    """Estimator-calibration table for the minhash pipeline: for every LSH
    candidate pair, BOTH the k=8 minhash Jaccard ESTIMATE (fraction of
    agreeing signature slots — what a 100 TB run would use INSTEAD of
    exact verification) and the exact Jaccard (what dedup_minhash_lsh
    verifies with). The output quantifies the estimator's bias/variance on
    this corpus — the number that decides whether exact verification can
    be dropped at scale (k=8: stderr ~ sqrt(j(1-j)/8) ~ 0.17 at j=0.5, so
    production would raise k before trusting the estimate alone).

    Plan shape = dedup_minhash_lsh's (single-aggregation signatures,
    banded equi-join candidates, candidate-restricted exact verify) plus
    one extra signature self-join on the bounded candidate set."""
    sh_raw = _shingles_raw(spark, sf)
    minhash_cols = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"mh{i}")
        for i in range(MINHASH_SEEDS)
    ]
    sig = sh_raw.groupBy("doc_id").agg(*minhash_cols)
    n_bands = MINHASH_SEEDS // MINHASH_BAND_ROWS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh{b * MINHASH_BAND_ROWS + r}")
                            for r in range(MINHASH_BAND_ROWS)
                        ],
                    )
                ).alias("bkey"),
            )
            for b in range(n_bands)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    # estimate: signature agreement over the bounded candidate set
    sa = sig.select(F.col("doc_id").alias("da"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(MINHASH_SEEDS)])
    sb = sig.select(F.col("doc_id").alias("db"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(MINHASH_SEEDS)])
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(MINHASH_SEEDS)
    )
    est = (
        candidates.join(F.broadcast(sa), "da")
        .join(F.broadcast(sb), "db")
        .select("da", "db", (agree / float(MINHASH_SEEDS)).alias("est_j"))
    )
    # exact jaccard, candidate-restricted (same recompute plan as
    # dedup_minhash_lsh — measured faster than any materialization)
    cand_docs = (
        candidates.select(F.col("da").alias("doc_id"))
        .union(candidates.select(F.col("db").alias("doc_id")))
        .distinct()
    )
    sh = sh_raw.join(F.broadcast(cand_docs), "doc_id", "left_semi").distinct()
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sha = sh.select(F.col("doc_id").alias("da"), F.col("sh").alias("sha"))
    shb = sh.select(F.col("doc_id").alias("db"), F.col("sh").alias("shb"))
    inter = (
        sha.join(F.broadcast(candidates), "da")
        .join(shb, "db")
        .filter(F.col("sha") == F.col("shb"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("inter"))
    )
    ca = counts.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    return (
        est.join(inter, ["da", "db"], "left")
        .join(ca, "da")
        .join(cb, "db")
        .select(
            "da",
            "db",
            "est_j",
            F.round(
                F.coalesce(F.col("inter"), F.lit(0))
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("inter"), F.lit(0))),
                4,
            ).alias("jaccard"),
        )
    )


_SIG_COLS = ", ".join(
    f"min(md5('{i}:' || sh)) AS mh{i}" for i in range(MINHASH_SEEDS)
)
_BANDS_UNION = " UNION ALL ".join(
    "SELECT doc_id, {b} AS band, md5({expr}) AS bkey FROM sig".format(
        b=b,
        expr=" || ',' || ".join(
            f"mh{b * MINHASH_BAND_ROWS + r}" for r in range(MINHASH_BAND_ROWS)
        ),
    )
    for b in range(MINHASH_SEEDS // MINHASH_BAND_ROWS)
)
_AGREE = " + ".join(
    f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(MINHASH_SEEDS)
)

DEDUP_JACCARD_EST_SQL = f"""
WITH {_DUCK_SHINGLES_CTE},
sig AS (SELECT doc_id, {_SIG_COLS} FROM shingles GROUP BY doc_id),
bands AS ({_BANDS_UNION}),
candidates AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
est AS (
  SELECT c.da, c.db, ({_AGREE}) / {float(MINHASH_SEEDS)} AS est_j
  FROM candidates c
  JOIN sig sa ON sa.doc_id = c.da
  JOIN sig sb ON sb.doc_id = c.db
),
counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.da, c.db, count(*) AS inter
  FROM candidates c
  JOIN shingles a ON a.doc_id = c.da
  JOIN shingles b ON b.doc_id = c.db AND a.sh = b.sh
  GROUP BY 1, 2
)
SELECT e.da, e.db, e.est_j,
       round(coalesce(i.inter, 0) * 1.0
             / (ca.n + cb.n - coalesce(i.inter, 0)), 4) AS jaccard
FROM est e
LEFT JOIN inter i ON e.da = i.da AND e.db = i.db
JOIN counts ca ON e.da = ca.doc_id
JOIN counts cb ON e.db = cb.doc_id
"""


# ---------------------------------------------------------------------------
# text_perplexity_unigram — LM-quality scoring
# ---------------------------------------------------------------------------


def text_perplexity_unigram(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document unigram cross-entropy under the corpus's own unigram
    LM — the cheap end of the CCNet/RedPajama "score text with a language
    model, filter the tail" quality axis (a real deployment swaps in a
    wiki-trained KenLM; the plan is identical). avg_nll = mean over tokens
    of -ln p(tok), p from global token frequencies.

    Scale shape: one vocabulary-bounded frequency aggregation, broadcast
    back onto the token stream (vocab ≪ corpus), one per-doc aggregation.
    Cross-engine float story: each ln term matches to the last ulp, the
    per-doc sum is ~100 terms so summation-order error is O(1e-13) —
    nine orders below the 1e-4 output grid (the psi_drift argument)."""
    toks = _tokens(spark, sf)
    freq = toks.groupBy("tok").agg(F.count("*").alias("m"))
    tot = freq.agg(F.sum("m").alias("nn"))
    freq_n = freq.crossJoin(F.broadcast(tot))
    return (
        toks.join(F.broadcast(freq_n), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.round(
                F.sum(F.log(F.col("nn").cast("double") / F.col("m")))
                / F.count("*"),
                4,
            ).alias("avg_nll"),
        )
    )


TEXT_PERPLEXITY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), freq AS (
  SELECT tok, count(*) AS m FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(sum(m) AS BIGINT) AS nn FROM freq
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
       round(sum(ln(CAST(nn AS DOUBLE) / m)) / count(*), 4) AS avg_nll
FROM toks JOIN freq USING (tok) CROSS JOIN tot
GROUP BY doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "bpe_merge_candidates": QuerySpec(
        bpe_merge_candidates, BPE_MERGE_SQL,
        "BPE merge-table iteration: top adjacent-char-pair counts",
    ),
    "dedup_jaccard_est": QuerySpec(
        dedup_jaccard_est, DEDUP_JACCARD_EST_SQL,
        "minhash Jaccard estimate vs exact — estimator calibration",
    ),
    "text_perplexity_unigram": QuerySpec(
        text_perplexity_unigram, TEXT_PERPLEXITY_SQL,
        "per-doc unigram cross-entropy quality score",
    ),
}
