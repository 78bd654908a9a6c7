"""Round-6 closing batch: corpus-span dedup, CCNet-style perplexity
bucketing, and DSIR importance weighting.

Three published training-data-curation steps the inventory did not yet
cover as first-class judged entries:

- ``repeated_span_dedup`` — the Lee et al. 2022 ("Deduplicating Training
  Data Makes Language Models Better") substring-dedup shape: find MAXIMAL
  token spans that recur across documents (suffix-array semantics,
  realised as a positioned-gram equi-join + gaps-and-islands merge).
- ``ccnet_perplexity_buckets`` — the CCNet head/middle/tail split:
  rank documents by LM perplexity WITHIN each source and cut into
  tertiles (rank-based selection, not a global threshold).
- ``dsir_importance_weights`` — Data Selection via Importance Resampling
  (Xie et al. 2023): hashed-bigram bag-of-features log importance weight
  of each document under a target-domain unigram-feature model vs the
  raw-corpus model; top-k selection.

Reference scope: north-star extensions — the reference stores opaque
payloads (hepop.js:183) and has no text pipeline; these extend the
curation suite (SURVEY §2 LLM-pipeline block).

Engine-parity rules as established: all-BIGINT span arithmetic; ln-sum
scores rounded on the 1e-4 grid (per-doc sums are O(100) terms, the
psi_drift ulp argument); rank windows ordered by (rounded score, doc_id)
so order is total and identical in both engines; short-doc CASE guard on
every 1-based sequence/slice shingle build (round-4 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# repeated_span_dedup — maximal cross-document duplicated token spans
# ---------------------------------------------------------------------------

SPAN_GRAM = 5  # seed gram width; spans are maximal unions of overlapping
               # duplicated grams, so reported spans are >= SPAN_GRAM tokens


def repeated_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Maximal duplicated token spans per document — the substring-dedup
    semantics of Lee et al. 2022, where any long-enough token run that
    recurs in the corpus is a removal candidate (their suffix-array pass;
    here the distributed realisation: positioned 5-gram hash join to find
    duplicated seed positions, then a gaps-and-islands merge into maximal
    spans).

    A 5-gram is "duplicated" when it occurs in >= 2 DISTINCT documents
    (within-doc repetition is the separate text_loop_detector entry).
    Duplicated seed positions p, p' in one doc chain into one span when
    p' - p <= 5 (their [p, p+4] windows overlap or touch), so a reported
    span is a maximal run of tokens fully covered by cross-doc-duplicated
    grams: span_tokens = last_pos - first_pos + 5.

    Output: per doc with >= 1 span — span count, longest span, duplicated
    token total, and the ppm duplicated-token fraction a trim pass would
    remove.

    Scale shape: positions explode the corpus by ~token count (linear);
    the duplicate-gram detection is one hash agg on gram; the join back
    is a gram equi-join; the islands pass is a per-doc window (partitioned
    by doc_id, doc-length bounded). All arithmetic BIGINT except the final
    ppm division (exact-double floor, both engines IEEE)."""
    docs = load_table(spark, sf, "documents")
    # Short-doc guard (see llm9._shingles): sequence(1, 0) is DESCENDING.
    grams = F.expr(
        f"case when size(split(text, ' ')) >= {SPAN_GRAM} then "
        f"transform(sequence(1, size(split(text, ' ')) - {SPAN_GRAM - 1}), "
        f"i -> struct(i as pos, concat_ws(' ', slice(split(text, ' '), i, {SPAN_GRAM})) as gram)) "
        f"else array() end"
    )
    pg = (
        docs.select("doc_id", F.explode(grams).alias("pg"))
        .select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    )
    dup = (
        pg.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    # duplicated seed positions; gram cardinality is corpus-dependent so this
    # stays a shuffle equi-join (no broadcast claim)
    dp = pg.join(dup, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = dp.withColumn(
        "flag",
        F.when(F.col("pos") - F.lag("pos").over(w) > SPAN_GRAM, F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "island",
        F.sum("flag").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = flagged.groupBy("doc_id", "island").agg(
        (F.max("pos") - F.min("pos") + SPAN_GRAM).alias("span_len")
    )
    ntoks = docs.select("doc_id", F.size(F.split("text", " ")).alias("n_toks"))
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.max("span_len").cast("long").alias("longest_span"),
            F.sum("span_len").cast("long").alias("dup_tokens"),
        )
        .join(ntoks, "doc_id")
        .select(
            "doc_id",
            "n_spans",
            "longest_span",
            "dup_tokens",
            F.col("n_toks").cast("long").alias("n_toks"),
            F.floor(F.lit(1_000_000.0) * F.col("dup_tokens") / F.col("n_toks"))
            .cast("long")
            .alias("dup_token_ppm"),
        )
        .orderBy("doc_id")
    )


REPEATED_SPAN_SQL = f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
pos AS (
  SELECT doc_id, toks,
         unnest(range(1, greatest(len(toks) - {SPAN_GRAM - 2}, 1))) AS pos
  FROM docs
),
pg AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(toks, pos, pos + {SPAN_GRAM - 1}), ' ') AS gram
  FROM pos
),
dup AS (
  SELECT gram FROM pg GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
dp AS (SELECT doc_id, pos FROM pg JOIN dup USING (gram)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   > {SPAN_GRAM} THEN 1 ELSE 0 END AS flag
  FROM dp
),
isl AS (
  SELECT doc_id, pos,
         sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
spans AS (
  SELECT doc_id, island, max(pos) - min(pos) + {SPAN_GRAM} AS span_len
  FROM isl GROUP BY doc_id, island
),
nt AS (SELECT doc_id, len(string_split(text, ' ')) AS n_toks FROM documents)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(max(span_len) AS BIGINT) AS longest_span,
       CAST(sum(span_len) AS BIGINT) AS dup_tokens,
       CAST(any_value(n_toks) AS BIGINT) AS n_toks,
       CAST(floor(1000000.0 * sum(span_len) / any_value(n_toks)) AS BIGINT)
         AS dup_token_ppm
FROM spans s JOIN nt ON s.doc_id = nt.doc_id
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


# ---------------------------------------------------------------------------
# ccnet_perplexity_buckets — head/middle/tail split per source
# ---------------------------------------------------------------------------


def ccnet_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet's quality split: score every document with an LM (here the
    corpus's own unigram model, identical to text_perplexity_unigram —
    a real deployment swaps in wiki-trained KenLM, the plan is the same),
    then rank WITHIN each source and cut into perplexity tertiles
    (head = bucket 1 lowest-nll ... tail = bucket 3). CCNet keeps
    head+middle per source rather than applying one global threshold, so
    the judged semantics here are the rank-based per-source NTILE, not
    the score itself.

    Determinism: avg_nll is rounded to the 1e-4 grid FIRST (both engines
    agree exactly — the text_perplexity_unigram ulp argument), and the
    NTILE order is (avg_nll, doc_id), a total order; NTILE(3) floor
    distribution is ANSI-identical in Spark and DuckDB.

    Scale shape: vocab-bounded freq agg broadcast onto the token stream,
    per-doc agg, then a per-source window (partitioned; source cardinality
    bounds the skew) and a 3*sources-row output."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select("doc_id", "source", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("m"))
    tot = freq.agg(F.sum("m").alias("nn"))
    # vocab << corpus: broadcast the frequency table onto the token stream
    freq_n = freq.crossJoin(F.broadcast(tot))
    per_doc = (
        toks.join(F.broadcast(freq_n), "tok")
        .groupBy("doc_id", "source")
        .agg(
            F.round(
                F.sum(F.log(F.col("nn").cast("double") / F.col("m"))) / F.count("*"),
                4,
            ).alias("avg_nll")
        )
    )
    w = Window.partitionBy("source").orderBy("avg_nll", "doc_id")
    bucketed = per_doc.withColumn("bucket", F.ntile(3).over(w))
    return (
        bucketed.groupBy("source", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.min("avg_nll"), 4).alias("min_nll"),
            F.round(F.max("avg_nll"), 4).alias("max_nll"),
            # mean over EXACT integer ten-thousandths: avg_nll sits on the
            # 1e-4 grid, but a float SUM of grid values is order-sensitive in
            # the last ulp and round(,4) flips at a representable boundary
            # (observed at sf0.001). Integer sum + ONE UNROUNDED division
            # (the ohlc_bars rule): sum_q/(n*1e4) can land exactly on a
            # reachable ...5 boundary where Spark (HALF_UP on shortest
            # repr) and DuckDB (raw-bits) disagree, so no outer round.
            (
                F.sum(F.round(F.col("avg_nll") * 10000).cast("long"))
                / (F.count("*") * 10000.0)
            ).alias("mean_nll"),
        )
        .select(
            "source",
            F.col("bucket").cast("int").alias("bucket"),
            "n_docs",
            "min_nll",
            "max_nll",
            "mean_nll",
        )
        .orderBy("source", "bucket")
    )


CCNET_BUCKETS_SQL = """
WITH toks AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents
), freq AS (
  SELECT tok, count(*) AS m FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(sum(m) AS BIGINT) AS nn FROM freq
), per_doc AS (
  SELECT doc_id, source,
         round(sum(ln(CAST(nn AS DOUBLE) / m)) / count(*), 4) AS avg_nll
  FROM toks JOIN freq USING (tok) CROSS JOIN tot
  GROUP BY doc_id, source
), bucketed AS (
  SELECT source, avg_nll,
         ntile(3) OVER (PARTITION BY source ORDER BY avg_nll, doc_id) AS bucket
  FROM per_doc
)
SELECT source, CAST(bucket AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(min(avg_nll), 4) AS min_nll,
       round(max(avg_nll), 4) AS max_nll,
       sum(CAST(round(avg_nll * 10000) AS BIGINT)) / (count(*) * 10000.0)
         AS mean_nll
FROM bucketed
GROUP BY source, bucket
ORDER BY source, bucket
"""


# ---------------------------------------------------------------------------
# dsir_importance_weights — hashed-ngram importance resampling scores
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256      # hashed feature space (Xie et al. use 10k; the corpus
                        # vocabulary here is ~30 words so 256 keeps buckets
                        # meaningfully populated)
DSIR_TARGET = "src0"    # stand-in target domain
DSIR_TOPK = 20


def dsir_importance_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): estimate how target-like each raw document is
    with bag-of-hashed-bigram features. Feature model: bigrams hashed to
    256 buckets (md5 low-48-bit), add-1-smoothed multinomials for the
    TARGET slice (source = src0) and the RAW corpus; per-doc log
    importance weight = sum over bigram occurrences of
    ln p_target(f) - ln p_raw(f). Output: top-20 docs by weight — the
    resampling step's selection head.

    Determinism: weight rounded to the 1e-4 grid (per-doc sums are O(100)
    ln terms, ulp argument); top-k order is (weight DESC, doc_id), total.

    Scale shape: features are a 256-row model — built with one hash agg,
    broadcast onto the corpus bigram stream; per-doc agg; TakeOrdered
    top-k (no global sort materialisation)."""
    docs = load_table(spark, sf, "documents")
    # Short-doc guard (see llm9._shingles)
    grams = F.expr(
        "case when size(split(text, ' ')) >= 2 then "
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> concat_ws(' ', slice(split(text, ' '), i, 2))) "
        "else array() end"
    )
    bg = docs.select(
        "doc_id", "source", F.explode(grams).alias("gram")
    ).select(
        "doc_id",
        "source",
        F.pmod(
            F.conv(F.substring(F.md5("gram"), 1, 12), 16, 10).cast("long"),
            F.lit(DSIR_BUCKETS),
        ).alias("f"),
    )
    # one hash agg builds both feature models; normalizers derived in-plan
    # from the <=256-row model table (no driver round-trip)
    raw_f = bg.groupBy("f").agg(
        F.count("*").alias("raw_n"),
        F.sum(F.when(F.col("source") == DSIR_TARGET, 1).otherwise(0)).alias("tgt_n"),
    )
    tots = raw_f.agg(
        F.sum("raw_n").alias("rn"), F.sum("tgt_n").alias("tn")
    )
    # model = <=256 rows: broadcast onto the corpus stream
    model = raw_f.crossJoin(F.broadcast(tots)).select(
        "f",
        (
            F.log((F.col("tgt_n") + 1).cast("double")
                  / (F.col("tn") + DSIR_BUCKETS).cast("double"))
            - F.log((F.col("raw_n") + 1).cast("double")
                    / (F.col("rn") + DSIR_BUCKETS).cast("double"))
        ).alias("llr"),
    )
    return (
        bg.join(F.broadcast(model), "f")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.round(F.sum("llr"), 4).alias("weight"),
        )
        .orderBy(F.desc("weight"), "doc_id")
        .limit(DSIR_TOPK)
    )


def _dsir_sql() -> str:
    return f"""
WITH docs AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
pos AS (
  SELECT doc_id, source, toks,
         unnest(range(1, greatest(len(toks), 1))) AS i
  FROM docs
),
bg AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 1), ' ')), 1, 12))
              AS BIGINT) % {DSIR_BUCKETS} AS f
  FROM pos
),
raw_tot AS (SELECT CAST(count(*) AS BIGINT) AS rn FROM bg),
tgt_tot AS (SELECT CAST(count(*) AS BIGINT) AS tn FROM bg WHERE source = '{DSIR_TARGET}'),
raw_f AS (SELECT f, count(*) AS raw_n FROM bg GROUP BY f),
tgt_f AS (SELECT f, count(*) AS tgt_n FROM bg WHERE source = '{DSIR_TARGET}' GROUP BY f),
model AS (
  SELECT r.f,
         ln((coalesce(t.tgt_n, 0) + 1) * 1.0 / (tn + {DSIR_BUCKETS}))
         - ln((r.raw_n + 1) * 1.0 / (rn + {DSIR_BUCKETS})) AS llr
  FROM raw_f r LEFT JOIN tgt_f t ON r.f = t.f
  CROSS JOIN raw_tot CROSS JOIN tgt_tot
)
SELECT doc_id, source,
       CAST(count(*) AS BIGINT) AS n_feats,
       round(sum(llr), 4) AS weight
FROM bg JOIN model USING (f)
GROUP BY doc_id, source
ORDER BY weight DESC, doc_id
LIMIT {DSIR_TOPK}
"""


QUERIES: dict[str, QuerySpec] = {
    "repeated_span_dedup": QuerySpec(
        repeated_span_dedup, REPEATED_SPAN_SQL,
        doc="Lee-et-al-style maximal cross-doc duplicated token spans "
            "(positioned-gram join + gaps-and-islands merge)",
    ),
    "ccnet_perplexity_buckets": QuerySpec(
        ccnet_perplexity_buckets, CCNET_BUCKETS_SQL,
        doc="CCNet head/middle/tail perplexity tertiles per source "
            "(rank-based selection, ntile over a total order)",
    ),
    "dsir_importance_weights": QuerySpec(
        dsir_importance_weights, _dsir_sql(),
        doc="DSIR hashed-bigram log importance weights, top-20 "
            "target-like documents",
    ),
}
