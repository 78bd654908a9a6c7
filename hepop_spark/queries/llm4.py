"""Round-2 LLM-pipeline batch: containment dedup (near-superset detection),
boilerplate n-gram mining, prefix-duplicate groups, and semantic (embedding)
dedup clusters.

These fill the curation gaps between exact/Jaccard/MinHash dedup (llm.py)
and the ANN scale paths (scale_paths.py): web-scale corpora need to catch
documents EMBEDDED in other documents (containment — Jaccard misses a small
doc swallowed by a big one), template/boilerplate text repeated across a
source, shared-prefix (header) duplication, and embedding-space duplicate
CLUSTERS with one canonical survivor per cluster.

Engine-parity rules as llm.py: md5-keyed hashes, equi-join candidate
generation, similarity ratios rounded on both sides before thresholding.
No counterpart in the reference (opaque payload storage, hepop.js:183).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec
from .llm import (
    COSINE_THRESHOLD,
    DEDUP_MINHASH_SQL,
    EMBEDDING_NEARDUP_SQL,
    _DUCK_SHINGLES_CTE,
    _minhash_pairs,
    _shingles,
    embedding_neardup,
)

CONTAINMENT_THRESHOLD = 0.5   # |A∩B| / min(|A|,|B|)  (probed: 25 pairs @ sf0.01)
BOILERPLATE_MIN_DOCS = 2      # 5-gram in >= 2 distinct docs of one source
PREFIX_TOKENS = 8             # shared-prefix length for header-dup groups


# ---------------------------------------------------------------------------
# dedup_containment — near-superset detection
# ---------------------------------------------------------------------------


def dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Containment near-dup pairs: |A∩B| / min(|A|,|B|) >= 0.5 over word
    3-gram shingle sets. Catches a short document embedded inside a longer
    one — a pair Jaccard (|A∩B|/|A∪B|) scores arbitrarily low as the long
    side grows, which is why curation pipelines measure containment
    separately. Same scale shape as dedup_ngram_jaccard: candidates from a
    shingle equi-join (only docs sharing >= 1 shingle meet), one shuffle
    keyed on shingle, no cross join."""
    sh = _shingles(spark, sf)
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("inter"))
    )
    ca = counts.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "da")
        .join(cb, "db")
        .withColumn(
            "containment",
            F.round(F.col("inter") / F.least(F.col("na"), F.col("nb")), 4),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
        .select("da", "db", "containment")
    )


DEDUP_CONTAINMENT_SQL = f"""
WITH {_DUCK_SHINGLES_CTE},
counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da, db,
       round(inter * 1.0 / least(ca.n, cb.n), 4) AS containment
FROM inter
JOIN counts ca ON da = ca.doc_id
JOIN counts cb ON db = cb.doc_id
WHERE round(inter * 1.0 / least(ca.n, cb.n), 4) >= {CONTAINMENT_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# boilerplate_ngrams — repeated template text within a source
# ---------------------------------------------------------------------------


def boilerplate_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Template/boilerplate mining (the CCNet/RefinedWeb shape): word
    5-grams appearing in >= 2 DISTINCT documents of the same source are
    boilerplate candidates (headers, footers, licenses). One explode ->
    distinct -> count aggregation, shuffled on (source, ngram): at 100 TB
    the ngram key space is huge but each key's group is tiny, so this is a
    plain well-distributed hash aggregate — no skew hotspot, no window."""
    docs = load_table(spark, sf, "documents").withColumn("t", F.split("text", " "))
    grams = docs.filter(F.size("t") >= 5).select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 5), i -> "
                "concat(t[i], ' ', t[i+1], ' ', t[i+2], ' ', t[i+3], ' ', t[i+4]))"
            )
        ).alias("ng"),
    ).distinct()
    return (
        grams.groupBy("source", "ng")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
    )


BOILERPLATE_SQL = f"""
WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
ti AS (SELECT doc_id, source, generate_subscripts(t, 1) AS i, unnest(t) AS w FROM d),
g AS (
  SELECT DISTINCT a.doc_id, a.source,
         a.w || ' ' || b.w || ' ' || c.w || ' ' || d2.w || ' ' || e.w AS ng
  FROM ti a
  JOIN ti b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN ti c ON a.doc_id = c.doc_id AND c.i = a.i + 2
  JOIN ti d2 ON a.doc_id = d2.doc_id AND d2.i = a.i + 3
  JOIN ti e ON a.doc_id = e.doc_id AND e.i = a.i + 4
)
SELECT source, ng, count(*) AS n_docs, min(doc_id) AS first_doc
FROM g GROUP BY 1, 2 HAVING count(*) >= {BOILERPLATE_MIN_DOCS}
"""


# ---------------------------------------------------------------------------
# prefix_dup_groups — shared-header duplicate groups
# ---------------------------------------------------------------------------


def prefix_dup_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Documents sharing an identical first-8-token prefix (generated
    headers, scraper artifacts). md5 the prefix so the shuffle key is
    fixed-width; group -> keep the min doc id as canonical. One hash
    aggregation; partial map-side combine makes it a single light shuffle
    at any corpus size."""
    docs = load_table(spark, sf, "documents").withColumn("t", F.split("text", " "))
    pre = F.md5(F.concat_ws(" ", F.slice("t", 1, PREFIX_TOKENS)))
    return (
        docs.select("doc_id", pre.alias("prefix_md5"))
        .groupBy("prefix_md5")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc"))
        .filter(F.col("n_docs") > 1)
    )


PREFIX_DUP_SQL = f"""
SELECT md5(array_to_string(string_split(text, ' ')[1:{PREFIX_TOKENS}], ' ')) AS prefix_md5,
       count(*) AS n_docs, min(doc_id) AS keep_doc
FROM documents
GROUP BY 1 HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# semantic_dedup_cc — embedding-space duplicate clusters
# ---------------------------------------------------------------------------


def semantic_dedup_cc(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic dedup: connected components over the embedding-cosine
    near-dup pairs, one canonical vector per cluster — the SemDeDup shape
    (cluster embeddings, keep one representative). Reuses the alternating
    star-contraction CC operator (operators/graph.py, O(log^2 n) rounds);
    at 100 TB the pair generation is the LSH-bucketed path and this final
    clustering step is unchanged."""
    pairs = embedding_neardup(spark, sf)
    from ..operators.graph import connected_components

    comps = connected_components(pairs, src="va", dst="vb")
    sizes = comps.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return comps.join(sizes, "comp").select(
        F.col("node").alias("vec_id"),
        F.col("comp").alias("canonical_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


SEMANTIC_DEDUP_SQL = f"""
WITH RECURSIVE
pairs AS (SELECT va, vb FROM ({EMBEDDING_NEARDUP_SQL}) q),
edges AS (SELECT va AS a, vb AS b FROM pairs UNION SELECT vb, va FROM pairs),
reach(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
labels AS (
    SELECT a AS vec_id, least(min(b), a) AS canonical_id FROM reach GROUP BY a
)
SELECT l.vec_id, l.canonical_id, CAST(s.n AS BIGINT) AS cluster_size
FROM labels l
JOIN (SELECT canonical_id, count(*) AS n FROM labels GROUP BY canonical_id) s
  USING (canonical_id)
"""


# ---------------------------------------------------------------------------
# curation_funnel — the whole pretraining-curation pipeline as ONE DAG
# ---------------------------------------------------------------------------


def curation_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """The full corpus-curation pipeline chained end-to-end with per-stage
    survivor accounting — the funnel report a dataset build ships:
    raw → drop held-out benchmark docs → quality cascade (llm3 rules) →
    exact dedup (md5) → token-set-fingerprint dedup → 5-gram benchmark
    decontamination. Each stage consumes the previous stage's survivors,
    so the counts are the real marginal cost of each gate, not
    independent measurements.

    Scale: one DAG — Catalyst pipelines the narrow stages into the same
    scan; the only shuffles are the two dedup windows (hash-partitioned on
    md5 keys) and the contamination join (md5-hashed 5-grams, benchmark
    side distinct-reduced and broadcastable). This is the shape you run
    nightly at 100 TB, writing stage-6 out in the same pass.

    r12 optimization: the funnel stages are STRICTLY NESTED (clean ⊆ fp ⊆
    exact ⊆ quality ⊆ corpus ⊆ raw), so the per-stage UNION ALL branches —
    which re-ran the scan 6x and the window chain per branch (Spark has no
    cross-branch CSE) — collapse into ONE pass that tags each doc with the
    maximal stage it reaches, then counts docs with smax >= k per stage.
    The subset-restricted dedup windows become conditional mins over the
    full partition (min over the q=1 rows of an md5 group IS the min of
    that group's quality rows); NOT EXISTS becomes a left join against the
    distinct contaminated ids. Stage k count = #docs with smax >= k and
    the char sums are exact integer sums, so the rows are identical — the
    unchanged DuckDB oracle gates the rewrite."""
    from ..catalog import register_views
    from .llm3 import _CASCADE_CASE, NGRAM

    register_views(spark, sf, tables=("documents",))
    return spark.sql(f"""
WITH raw AS (SELECT doc_id, text, n_chars FROM documents),
scored AS (
  SELECT doc_id, text, n_chars,
         CASE WHEN doc_id % 97 <> 0 THEN 1 ELSE 0 END AS in_corp,
         size(split(text, ' ')) AS n_tok,
         length(regexp_replace(text, '[^A-Za-z]', '')) AS n_alpha,
         length(text) AS n_len
  FROM raw
),
flags AS (
  SELECT doc_id, text, n_chars, in_corp,
         CASE WHEN in_corp = 1 AND ({_CASCADE_CASE}) = 'keep'
              THEN 1 ELSE 0 END AS q
  FROM scored
),
w1 AS (
  SELECT doc_id, text, n_chars, in_corp, q,
         CASE WHEN q = 1 AND doc_id = min(CASE WHEN q = 1 THEN doc_id END)
                   OVER (PARTITION BY md5(text))
              THEN 1 ELSE 0 END AS ex
  FROM flags
),
w2 AS (
  SELECT doc_id, text, n_chars, in_corp, q, ex,
         CASE WHEN ex = 1 AND doc_id = min(CASE WHEN ex = 1 THEN doc_id END)
                   OVER (PARTITION BY md5(concat_ws(' ',
                     array_sort(array_distinct(split(text, ' '))))))
              THEN 1 ELSE 0 END AS fpv
  FROM w1
),
bgrams AS (
  SELECT DISTINCT md5(concat_ws(' ', slice(toks, i, {NGRAM}))) AS g
  FROM (SELECT split(text, ' ') AS toks, size(split(text, ' ')) AS n
        FROM raw WHERE doc_id % 97 = 0) s
  LATERAL VIEW explode(sequence(1, n - {NGRAM} + 1)) t AS i
  WHERE n >= {NGRAM}
),
fgrams AS (
  SELECT doc_id, md5(concat_ws(' ', slice(toks, i, {NGRAM}))) AS g
  FROM (SELECT doc_id, split(text, ' ') AS toks, size(split(text, ' ')) AS n
        FROM w2 WHERE fpv = 1) s
  LATERAL VIEW explode(sequence(1, n - {NGRAM} + 1)) t AS i
  WHERE n >= {NGRAM}
),
contaminated AS (SELECT DISTINCT f.doc_id FROM fgrams f JOIN bgrams b ON f.g = b.g),
staged AS (
  SELECT CASE WHEN w2.fpv = 1 AND c.doc_id IS NULL THEN 6
              WHEN w2.fpv = 1 THEN 5
              WHEN w2.ex = 1 THEN 4
              WHEN w2.q = 1 THEN 3
              WHEN w2.in_corp = 1 THEN 2
              ELSE 1 END AS smax,
         w2.n_chars
  FROM w2 LEFT JOIN contaminated c ON c.doc_id = w2.doc_id
),
per_stage AS (
  SELECT k, count(*) AS n_docs, sum(n_chars) AS sum_chars
  FROM staged LATERAL VIEW explode(sequence(1, smax)) t AS k
  GROUP BY k
)
SELECT s.stage,
       CAST(coalesce(a.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(a.sum_chars AS BIGINT) AS sum_chars
FROM VALUES ('1_raw', 1), ('2_corpus', 2), ('3_quality', 3),
            ('4_exact_dedup', 4), ('5_fp_dedup', 5),
            ('6_decontaminated', 6) AS s(stage, k)
LEFT JOIN per_stage a ON a.k = s.k
ORDER BY s.stage
""")


def _funnel_oracle_sql() -> str:
    from .llm3 import _CASCADE_CASE, NGRAM

    return f"""
WITH raw AS (SELECT doc_id, text, n_chars FROM documents),
corp AS (SELECT * FROM raw WHERE doc_id % 97 <> 0),
scored AS (
  SELECT doc_id, text, n_chars,
         len(string_split(text, ' ')) AS n_tok,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(text) AS n_len
  FROM corp
),
quality AS (
  SELECT doc_id, text, n_chars FROM scored WHERE ({_CASCADE_CASE}) = 'keep'
),
exact AS (
  SELECT doc_id, text, n_chars FROM (
    SELECT doc_id, text, n_chars,
           min(doc_id) OVER (PARTITION BY md5(text)) AS kd
    FROM quality) x
  WHERE doc_id = kd
),
fp AS (
  SELECT doc_id, text, n_chars FROM (
    SELECT doc_id, text, n_chars,
           min(doc_id) OVER (PARTITION BY md5(array_to_string(
             list_sort(list_distinct(string_split(text, ' '))), ' '))) AS kd
    FROM exact) x
  WHERE doc_id = kd
),
bgrams AS (
  SELECT DISTINCT md5(array_to_string(list_slice(toks, i, i + {NGRAM} - 1), ' ')) AS g
  FROM (
    SELECT toks, unnest(generate_series(1, n - {NGRAM} + 1)) AS i
    FROM (SELECT string_split(text, ' ') AS toks, len(string_split(text, ' ')) AS n
          FROM raw WHERE doc_id % 97 = 0) r
    WHERE n >= {NGRAM}
  ) s
),
fgrams AS (
  SELECT doc_id, md5(array_to_string(list_slice(toks, i, i + {NGRAM} - 1), ' ')) AS g
  FROM (
    SELECT doc_id, toks, unnest(generate_series(1, n - {NGRAM} + 1)) AS i
    FROM (SELECT doc_id, string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS n
          FROM fp) r
    WHERE n >= {NGRAM}
  ) s
),
contaminated AS (SELECT DISTINCT f.doc_id FROM fgrams f JOIN bgrams b ON f.g = b.g),
clean AS (
  SELECT * FROM fp
  WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = fp.doc_id)
)
SELECT stage, CAST(n_docs AS BIGINT) AS n_docs, CAST(sum_chars AS BIGINT) AS sum_chars
FROM (
  SELECT '1_raw' AS stage, count(*) AS n_docs, sum(n_chars) AS sum_chars FROM raw
  UNION ALL SELECT '2_corpus', count(*), sum(n_chars) FROM corp
  UNION ALL SELECT '3_quality', count(*), sum(n_chars) FROM quality
  UNION ALL SELECT '4_exact_dedup', count(*), sum(n_chars) FROM exact
  UNION ALL SELECT '5_fp_dedup', count(*), sum(n_chars) FROM fp
  UNION ALL SELECT '6_decontaminated', count(*), sum(n_chars) FROM clean
) f
"""


QUERIES: dict[str, QuerySpec] = {
    "dedup_containment": QuerySpec(
        dedup_containment, DEDUP_CONTAINMENT_SQL,
        "near-superset pairs by shingle containment",
    ),
    "boilerplate_ngrams": QuerySpec(
        boilerplate_ngrams, BOILERPLATE_SQL,
        "repeated 5-gram boilerplate per source",
    ),
    "prefix_dup_groups": QuerySpec(
        prefix_dup_groups, PREFIX_DUP_SQL,
        "shared first-8-token prefix duplicate groups",
    ),
    "semantic_dedup_cc": QuerySpec(
        semantic_dedup_cc, SEMANTIC_DEDUP_SQL,
        "embedding near-dup clusters with canonical survivor",
    ),
    "curation_funnel": QuerySpec(
        curation_funnel, _funnel_oracle_sql(),
        "full curation pipeline with per-stage survivor accounting",
    ),
}


def sample_importance_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Importance sampling: keep each document with probability equal to
    its quality weight (alpha-character ratio in [0, 1]) — the data-mixing
    primitive that upsamples clean text without a global sort or RNG.
    Content-addressed like sample_stratified_hash: the uniform draw is the
    first 8 md5 hex chars of doc_id compared against the hex-encoded
    weight threshold, so the SAME rows are kept on any engine, partition
    layout, or cluster size. One narrow filter over the scan + one small
    aggregation on (source, lang).

    The threshold is clamped to 2^32 - 1 BEFORE hex encoding: for wt = 1.0
    (fully alphabetic text) floor(wt * 2^32) is 9 hex chars and an lpad-8
    would TRUNCATE it to '10000000', silently keeping a weight-1 doc only
    ~6% of the time (r02 advisor finding — parity masked it because both
    engines truncated identically). least(..., 4294967295) keeps every
    weight-1 doc with probability 1 - 2^-32 ~ always; empty documents get
    wt = 0 explicitly instead of a NaN from 0/0."""
    from ..catalog import register_views

    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        WITH w AS (
          SELECT doc_id, source, lang, n_chars,
                 CASE WHEN length(text) = 0 THEN 0.0
                      ELSE length(regexp_replace(text, '[^A-Za-z]', '')) * 1.0
                           / length(text) END AS wt
          FROM documents
        ), thr AS (
          SELECT doc_id, source, lang, n_chars,
                 lpad(lower(hex(least(CAST(floor(wt * 4294967296) AS BIGINT),
                                      4294967295))), 8, '0') AS cut
          FROM w
        )
        SELECT source, lang,
               CAST(count(*) AS BIGINT) AS total_docs,
               CAST(count_if(substring(md5(CAST(doc_id AS STRING)), 1, 8) < cut)
                    AS BIGINT) AS kept_docs,
               CAST(sum(CASE WHEN substring(md5(CAST(doc_id AS STRING)), 1, 8) < cut
                    THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
        FROM thr
        GROUP BY source, lang
    """)


SAMPLE_IMPORTANCE_SQL = """
WITH w AS (
  SELECT doc_id, source, lang, n_chars,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                   / length(text) END AS wt
  FROM documents
), thr AS (
  SELECT doc_id, source, lang, n_chars,
         lpad(lower(to_hex(least(CAST(floor(wt * 4294967296) AS BIGINT),
                                 4294967295))), 8, '0') AS cut
  FROM w
)
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS total_docs,
       CAST(count(*) FILTER (WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < cut)
            AS BIGINT) AS kept_docs,
       CAST(sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < cut
            THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM thr
GROUP BY source, lang
"""

QUERIES["sample_importance_weighted"] = QuerySpec(
    sample_importance_weighted, SAMPLE_IMPORTANCE_SQL,
    "content-addressed importance sampling by quality weight",
)


# ---------------------------------------------------------------------------
# dedup_minhash_collapsed — the scale-probe ordering lesson, operationalized
# ---------------------------------------------------------------------------


def dedup_minhash_collapsed(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash near-dup over EXACT-DEDUP REPRESENTATIVES — the production
    ordering the 20x scale probe pinned (SCALE.md): on a corpus with
    heavy exact duplication, raw pair enumeration is quadratic per
    duplicate group because the true answer is (95 s on the probe corpus);
    collapsing md5-exact groups first (one cheap shuffle) and minhashing
    only the representatives keeps the LSH stage linear in DISTINCT
    content while group sizes carry the duplication mass along. Output:
    representative pairs with each side's exact-group size, which is the
    complete answer (every member pair is implied by rep pair x member
    sets)."""
    # no spread (r12): unlike dedup_minhash_lsh, the signing here runs on
    # the reps JOIN output — already 32-way from the groups shuffle — so
    # the load-side spread adds nothing (interleaved A/B: parity)
    docs = load_table(spark, sf, "documents")
    groups = (
        docs.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("rep"), F.count("*").alias("n_members"))
    )
    reps = docs.join(groups.select(F.col("rep").alias("doc_id")), "doc_id")
    pairs = _minhash_pairs(reps)
    ga = groups.select(F.col("rep").alias("da"), F.col("n_members").alias("na_members"))
    gb = groups.select(F.col("rep").alias("db"), F.col("n_members").alias("nb_members"))
    return (
        pairs.join(ga, "da")
        .join(gb, "db")
        .select("da", "db", "jaccard", "na_members", "nb_members")
    )


def _collapsed_oracle_sql() -> str:
    """The full-corpus minhash oracle re-rooted at the representative
    corpus: its shingle CTE's `FROM documents` becomes `FROM reps`, its
    final SELECT becomes a CTE, and group sizes join on at the end."""
    rerooted = DEDUP_MINHASH_SQL.replace("FROM documents", "FROM reps")
    ctes, final = rerooted.rsplit("\nSELECT", 1)
    ctes = ctes.strip()[len("WITH"):]
    return f"""
WITH groups AS (
  SELECT md5(text) AS h, min(doc_id) AS rep, count(*) AS n_members
  FROM documents GROUP BY md5(text)
),
reps AS (SELECT d.doc_id, d.text FROM documents d JOIN groups g ON d.doc_id = g.rep),
{ctes},
base AS (
  SELECT{final}
)
SELECT base.da, base.db, base.jaccard,
       ga.n_members AS na_members, gb.n_members AS nb_members
FROM base
JOIN groups ga ON base.da = ga.rep
JOIN groups gb ON base.db = gb.rep
"""


QUERIES["dedup_minhash_collapsed"] = QuerySpec(
    dedup_minhash_collapsed, _collapsed_oracle_sql(),
    "minhash over exact-dedup representatives with group sizes",
)


# ---------------------------------------------------------------------------
# text_zipf_fit — Zipf-law fit over the corpus vocabulary
# ---------------------------------------------------------------------------


def text_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf's-law fit over the token frequency table: OLS slope of
    ln(freq) against ln(rank) (rank by freq desc, token asc — a total
    order, so ranks are engine-identical). A natural-text corpus sits
    near slope -1; synthetic or templated text drifts — the one-number
    corpus-health check. The regression runs over the VOCABULARY table
    (bounded, thousands of rows at any corpus size), so the single-pass
    regr_* aggregates cost nothing; the corpus-sized work is one token
    count shuffle. Rounding to 4 absorbs the engines' summation-order
    wobble in the regr_* reductions (the accepted class used by
    regr_by_group)."""
    docs = load_table(spark, sf, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    ranked = freq.withColumn("rank", F.row_number().over(w))
    return ranked.agg(
        F.count("*").alias("vocab_size"),
        F.sum("n").alias("total_tokens"),
        F.round(F.regr_slope(F.ln("n"), F.ln("rank")), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(F.ln("n"), F.ln("rank")), 4).alias("zipf_intercept"),
    )


ZIPF_SQL = """
WITH freq AS (
  SELECT tok, count(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
  GROUP BY tok
),
ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank FROM freq
)
SELECT count(*) AS vocab_size,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       round(regr_slope(ln(n), ln(rank)), 4) AS zipf_slope,
       round(regr_intercept(ln(n), ln(rank)), 4) AS zipf_intercept
FROM ranked
"""

QUERIES["text_zipf_fit"] = QuerySpec(
    text_zipf_fit, ZIPF_SQL, "Zipf-law exponent fit over the vocabulary"
)


# ---------------------------------------------------------------------------
# heaps_law_curve — vocabulary growth vs corpus size
# ---------------------------------------------------------------------------


def heaps_law_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Heaps'-law curve: distinct-vocabulary size after each decile of the
    corpus (by doc_id order) — how fast new types appear as the corpus
    grows, the measurement behind 'will more data add new vocabulary?'.
    Uses the first-seen decomposition (a token joins the vocabulary at
    min(doc_id)), so the cumulative distinct needs NO windowed
    COUNT(DISTINCT): one groupBy per token (corpus-sized shuffle), then a
    10-row-per-token bucket join — all integers, engine-exact."""
    from ..catalog import register_views

    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        WITH n AS (SELECT count(*) AS n_docs FROM documents),
        firsts AS (
          SELECT tok, min(doc_id) AS first_doc
          FROM (SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents) t
          GROUP BY tok
        ),
        deciles AS (SELECT explode(sequence(1, 10)) AS decile)
        SELECT d.decile,
               CAST((SELECT n_docs FROM n) * d.decile DIV 10 AS BIGINT) AS docs_seen,
               CAST(count_if(f.first_doc <
                    (SELECT n_docs FROM n) * d.decile DIV 10) AS BIGINT) AS vocab_size
        FROM deciles d CROSS JOIN firsts f
        GROUP BY d.decile
    """)


HEAPS_SQL = """
WITH n AS (SELECT count(*) AS n_docs FROM documents),
firsts AS (
  SELECT tok, min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
  GROUP BY tok
),
deciles AS (SELECT unnest(generate_series(1, 10)) AS decile)
SELECT d.decile,
       CAST((SELECT n_docs FROM n) * d.decile // 10 AS BIGINT) AS docs_seen,
       CAST(count(*) FILTER (WHERE f.first_doc <
            (SELECT n_docs FROM n) * d.decile // 10) AS BIGINT) AS vocab_size
FROM deciles d CROSS JOIN firsts f
GROUP BY d.decile
"""

QUERIES["heaps_law_curve"] = QuerySpec(
    heaps_law_curve, HEAPS_SQL, "vocabulary growth per corpus decile"
)


# ---------------------------------------------------------------------------
# ttr_by_source — lexical diversity per source
# ---------------------------------------------------------------------------


def ttr_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """Type-token ratio per source: distinct types over total tokens —
    the lexical-diversity gate (templated/generated text scores low).
    One aggregation on (source, token) then one on source; the only
    double is the final single division of two exact integers."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    return (
        toks.groupBy("source")
        .agg(
            F.countDistinct("tok").alias("n_types"),
            F.count("*").alias("n_tokens"),
        )
        .withColumn("ttr", F.col("n_types") / F.col("n_tokens"))
    )


TTR_SQL = """
SELECT source,
       count(DISTINCT tok) AS n_types,
       count(*) AS n_tokens,
       count(DISTINCT tok) / count(*) AS ttr
FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents) t
GROUP BY source
"""

QUERIES["ttr_by_source"] = QuerySpec(
    ttr_by_source, TTR_SQL, "type-token lexical diversity per source"
)
