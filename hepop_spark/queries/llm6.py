"""Round-3 LLM-pipeline batch: collocation mining (PMI), OOV-rate
filtering, LSH range search (the production near-dup path as a judged
entry), hashing-trick features, leave-one-out target encoding, BPE merge
application, market-basket Jaccard, and exact-grid embedding centroids.

Reference scope: all north-star extensions (the reference stores opaque
payloads, hepop.js:183, and delegates SQL, query.js:162-172).

Engine-parity rules as established: md5-derived determinism, exact integer
counts / fixed-point grids, one terminal double division, round(..., 6)
only on ln outputs (PMI mirrors psi_drift's ln-sum bound), BIGINT casts on
every DuckDB count/sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.similarity import _hyperplanes
from ..operators.vecexpr import dot_cast2, norm2_cast
from . import QuerySpec
from .llm import _tokens

# ---------------------------------------------------------------------------
# pmi_collocations — pointwise-mutual-information bigram mining
# ---------------------------------------------------------------------------

PMI_TOP = 100
PMI_MIN_COUNT = 5


def pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Collocation mining over the corpus: adjacent word pairs scored by
    PMI = ln(n_pair * N / (n_w1 * n_w2)) — the classic phrase-detection
    pass (word2vec-style phrase merging) a tokenizer-training pipeline
    runs first. Top pairs by count with deterministic tie-break.

    Scale: pair explosion is a narrow map; three aggregations on
    vocabulary-bounded keys (pairs, unigrams, scalar total), marginals
    broadcast back onto the pair table — no unbounded shuffle."""
    docs = load_table(spark, sf, "documents").withColumn("t", F.split("text", " "))
    pairs = docs.filter(F.size("t") >= 2).select(
        F.explode(
            F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))")
        ).alias("pair")
    )
    pc = pairs.groupBy("pair").agg(F.count("*").alias("n_pair"))
    uni = _tokens(spark, sf).groupBy("tok").agg(F.count("*").alias("n_tok"))
    # total tokens, minus one per document tail so bigram positions == N
    n_pos = pairs.agg(F.count("*").alias("n_pos"))
    w1 = F.split(F.col("pair"), " ")[0]
    w2 = F.split(F.col("pair"), " ")[1]
    uni_w1 = uni.withColumnRenamed("tok", "w1").withColumnRenamed("n_tok", "n_w1")
    uni_w2 = uni.withColumnRenamed("tok", "w2").withColumnRenamed("n_tok", "n_w2")
    scored = (
        pc.filter(F.col("n_pair") >= PMI_MIN_COUNT)
        .withColumn("w1", w1)
        .withColumn("w2", w2)
        .join(F.broadcast(uni_w1), "w1")
        .join(F.broadcast(uni_w2), "w2")
        .crossJoin(F.broadcast(n_pos))
        .select(
            "pair",
            F.col("n_pair").cast("long").alias("n_pair"),
            (
                F.round(
                    F.log(F.col("n_pair") * F.col("n_pos") / (F.col("n_w1") * F.col("n_w2"))), 6
                )
                + F.lit(0.0)  # normalize IEEE -0.0
            ).alias("pmi"),
        )
    )
    # TakeOrdered top-k first; the rank window sees only PMI_TOP rows
    w = Window.orderBy(F.col("n_pair").desc(), F.col("pair"))
    return (
        scored.orderBy(F.col("n_pair").desc(), F.col("pair"))
        .limit(PMI_TOP)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .select("pair", "n_pair", "pmi", "rk")
    )


PMI_SQL = f"""
WITH docs AS (
  SELECT string_split(text, ' ') AS t FROM documents
), pairs AS (
  SELECT t[CAST(i.i + 1 AS INTEGER)] || ' ' || t[CAST(i.i + 2 AS INTEGER)] AS pair
  FROM docs, unnest(range(len(t) - 1)) i(i)
  WHERE len(t) >= 2
), pc AS (
  SELECT pair, count(*) AS n_pair FROM pairs GROUP BY pair
), uni AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), uc AS (
  SELECT tok, count(*) AS n_tok FROM uni GROUP BY tok
), npos AS (SELECT count(*) AS n_pos FROM pairs)
SELECT pair, CAST(n_pair AS BIGINT) AS n_pair, pmi, CAST(rk AS BIGINT) AS rk FROM (
  SELECT pc.pair, pc.n_pair,
         round(ln(pc.n_pair * 1.0 * n_pos / (u1.n_tok * 1.0 * u2.n_tok)), 6) + 0.0 AS pmi,
         row_number() OVER (ORDER BY pc.n_pair DESC, pc.pair) AS rk
  FROM pc
  JOIN uc u1 ON u1.tok = string_split(pc.pair, ' ')[1]
  JOIN uc u2 ON u2.tok = string_split(pc.pair, ' ')[2]
  CROSS JOIN npos
  WHERE pc.n_pair >= {PMI_MIN_COUNT})
WHERE rk <= {PMI_TOP}
"""


# ---------------------------------------------------------------------------
# rare_token_oov_rate — per-doc out-of-vocabulary filtering
# ---------------------------------------------------------------------------

VOCAB_TOP = 40
OOV_MAX = 0.5


def rare_token_oov_rate(spark: SparkSession, sf: str) -> DataFrame:
    """OOV-rate quality filter: build the top-|V| vocabulary by corpus
    frequency (deterministic tie-break), score every document by the
    fraction of its token OCCURRENCES outside the vocabulary, and keep the
    documents that pass the threshold — the filter that drops
    non-linguistic / wrong-language shards before tokenizer training.

    Scale: vocabulary is a bounded top-k over the unigram aggregate
    (broadcast); the per-doc score is one groupBy over doc_id with a
    broadcast semi-join lookup — corpus-linear, no unbounded shuffle."""
    toks = _tokens(spark, sf)
    uni = toks.groupBy("tok").agg(F.count("*").alias("n"))
    # membership only needs the top-V set — TakeOrdered, no rank window
    vocab = (
        uni.orderBy(F.col("n").desc(), F.col("tok"))
        .limit(VOCAB_TOP)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    scored = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return (
        scored.withColumn("oov_rate", F.round(F.col("n_oov") / F.col("n_toks"), 6))
        .filter(F.col("oov_rate") <= OOV_MAX)
        .select(
            "doc_id",
            F.col("n_toks").cast("long").alias("n_toks"),
            F.col("n_oov").cast("long").alias("n_oov"),
            "oov_rate",
        )
    )


OOV_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), uni AS (
  SELECT tok, count(*) AS n FROM toks GROUP BY tok
), vocab AS (
  SELECT tok FROM (
    SELECT tok, row_number() OVER (ORDER BY n DESC, tok) AS rk FROM uni)
  WHERE rk <= {VOCAB_TOP}
), scored AS (
  SELECT t.doc_id, count(*) AS n_toks,
         sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
  GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks, CAST(n_oov AS BIGINT) AS n_oov,
       round(n_oov * 1.0 / n_toks, 6) AS oov_rate
FROM scored
WHERE round(n_oov * 1.0 / n_toks, 6) <= {OOV_MAX}
"""


# ---------------------------------------------------------------------------
# lsh_range_search — production all-pairs near-dup range search
# ---------------------------------------------------------------------------

RANGE_TAU = 0.35
RANGE_TABLES = 4
RANGE_BITS = 8


def lsh_range_search(spark: SparkSession, sf: str) -> DataFrame:
    """The PRODUCTION counterpart of embedding_neardup's guarded cartesian
    baseline: cosine range search (all pairs with sim >= tau) where
    candidate generation is a pure (table, bucket) self equi-join over 4
    sign-LSH tables — never O(n^2). Exactly the plan a 100 TB semantic
    dedup runs; recall is governed by the table count like ann_lsh_topk.

    The 4 tables are a subset of the PERSISTED 10-table sign-LSH index
    (operators/lsh_index.py, same planes/seeds, r05 verdict item 1):
    bucketing is paid once at ingest, and the tbl < 4 filter prunes the
    unused tables' partition directories at the scan. Oracle unchanged.

    Scale: the candidate self-join shuffles on the bounded bucket key;
    verification touches candidate pairs only."""
    from ..operators.lsh_index import embeddings_lsh_buckets

    emb = load_table(spark, sf, "embeddings")
    buck = embeddings_lsh_buckets(spark, sf, emb).filter(
        F.col("tbl") < RANGE_TABLES
    )
    left = buck.select(F.col("vec_id").alias("a_id"), "tbl", "bucket")
    right = buck.select(F.col("vec_id").alias("b_id"), "tbl", "bucket")
    cand = (
        left.join(right, ["tbl", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    vecs = emb.select("vec_id", "embedding")
    # r12: one-round-trip spellings of the identical expressions (vecexpr)
    dot = dot_cast2("va", "vb")
    norm = lambda c: F.sqrt(norm2_cast(c))  # noqa: E731
    return (
        cand.join(vecs.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("va")), "a_id")
        .join(vecs.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb")), "b_id")
        .withColumn("sim", F.round(dot / (norm("va") * norm("vb")), 4))
        .filter(F.col("sim") >= RANGE_TAU)
        .select("a_id", "b_id", "sim")
    )


def _range_oracle_sql() -> str:
    rows = []
    for t in range(RANGE_TABLES):
        for b, plane in enumerate(_hyperplanes(64, RANGE_BITS, seed=42 + 977 * t)):
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
),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM buckets a JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
)
SELECT c.a_id, c.b_id, round(list_cosine_similarity(ea.v, eb.v), 4) AS sim
FROM cand c
JOIN emb ea ON ea.vec_id = c.a_id
JOIN emb eb ON eb.vec_id = c.b_id
WHERE round(list_cosine_similarity(ea.v, eb.v), 4) >= {RANGE_TAU}
"""


# ---------------------------------------------------------------------------
# feature_hashing_vec — hashing-trick sparse feature vectors
# ---------------------------------------------------------------------------

HASH_DIM = 32
FEAT_DOCS = 200


def feature_hashing_vec(spark: SparkSession, sf: str) -> DataFrame:
    """The hashing trick: token -> md5-derived bucket in [0, 32); per-doc
    sparse counts (doc_id, bucket, n) are the feature vector a linear
    probe / quality classifier trains on — no vocabulary to build or ship.
    Bounded to the first 200 docs for a bounded judged result; the plan is
    corpus-linear.

    Scale: hash + groupBy(doc_id, bucket) — one shuffle keyed by
    (doc, bucket), map-side combined; dimensionality fixed at 32 whatever
    the vocabulary grows to (collisions are the accepted trade)."""
    toks = _tokens(spark, sf).filter(F.col("doc_id") < FEAT_DOCS)
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % HASH_DIM
    )
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("doc_id", "bucket")
    )


FEATURE_HASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  WHERE doc_id < {FEAT_DOCS}
)
SELECT doc_id,
       CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) % {HASH_DIM} AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM toks
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# target_encoding_loo — leave-one-out categorical target encoding
# ---------------------------------------------------------------------------

TE_SMOOTH = 20


def target_encoding_loo(spark: SparkSession, sf: str) -> DataFrame:
    """Leave-one-out target encoding of documents.source against the
    n_chars target, with additive smoothing toward the global mean — the
    leakage-safe categorical encoder. All sums are exact integers; each
    encode value is one exact-integer-polynomial division, so the doubles
    match bit-for-bit across engines.

    Scale: two aggregations (per-category, global scalar) broadcast back
    over the fact scan — one narrow map over the corpus, no per-row
    state."""
    docs = load_table(spark, sf, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_src"), F.sum("n_chars").alias("sum_src")
    )
    glob = docs.agg(F.count("*").alias("n_all"), F.sum("n_chars").alias("sum_all"))
    return (
        docs.join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(glob))
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            # loo numerator/denominator kept integral; smoothing folds the
            # global mean in as (smooth * sum_all / n_all) -> single division
            F.round(
                (
                    (F.col("sum_src") - F.col("n_chars")) * F.col("n_all")
                    + F.lit(TE_SMOOTH) * F.col("sum_all")
                )
                / (
                    (F.col("n_src") - 1 + F.lit(TE_SMOOTH)) * F.col("n_all")
                ),
                6,
            ).alias("te_loo"),
        )
    )


TARGET_ENC_SQL = f"""
WITH per_src AS (
  SELECT source, count(*) AS n_src, sum(n_chars) AS sum_src
  FROM documents GROUP BY source
), tot AS (
  SELECT count(*) AS n_all, sum(n_chars) AS sum_all FROM documents
)
SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars,
       round(((s.sum_src - d.n_chars) * n_all + {TE_SMOOTH} * sum_all) * 1.0
             / ((s.n_src - 1 + {TE_SMOOTH}) * n_all), 6) AS te_loo
FROM documents d JOIN per_src s USING (source), tot
"""


# ---------------------------------------------------------------------------
# tokenizer_bpe_apply — apply a fixed BPE merge list
# ---------------------------------------------------------------------------

# a fixed merge table (pair -> fused); applied in order with literal
# non-overlapping left-to-right replace — identical semantics in both
# engines, documented as the contract (real BPE would derive this table
# from bpe_merge_candidates iterations)
BPE_MERGES = [("t h", "th"), ("i n", "in"), ("a n", "an"), ("th e", "the")]
BPE_TOK_TOP = 50


def tokenizer_bpe_apply(spark: SparkSession, sf: str) -> DataFrame:
    """BPE segmentation: space out each character of a token, then apply a
    fixed merge list in order (each merge = one literal replace pass over
    the boundary-sentineled piece string). Emits the segmented form and
    piece counts for the top-50 corpus tokens — the apply side of the
    bpe_merge_candidates training loop.

    Scale: pure narrow string expressions over a bounded (top-k) token set;
    at corpus scale the same expressions run per-token inline in the
    tokenization map with zero shuffles."""
    toks = _tokens(spark, sf)
    uni = toks.groupBy("tok").agg(F.count("*").alias("n"))
    # TakeOrdered top-k; rank window covers only the BPE_TOK_TOP survivors
    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    top = (
        uni.orderBy(F.col("n").desc(), F.col("tok"))
        .limit(BPE_TOK_TOP)
        .withColumn("rk", F.row_number().over(w).cast("long"))
    )
    # ' c h a r s ' with boundary sentinels
    spaced = F.concat(
        F.lit(" "), F.trim(F.regexp_replace(F.col("tok"), "(.)", "$1 ")), F.lit(" ")
    )
    seg = spaced
    for pair, fused in BPE_MERGES:
        seg = F.replace(seg, F.lit(f" {pair} "), F.lit(f" {fused} "))
    pieces = F.size(F.split(F.trim(seg), " "))
    return top.select(
        "tok",
        F.col("n").cast("long").alias("n"),
        "rk",
        F.trim(seg).alias("segmented"),
        F.length("tok").cast("long").alias("pieces_before"),
        pieces.cast("long").alias("pieces_after"),
    )


def _bpe_apply_sql() -> str:
    seg = "' ' || trim(regexp_replace(tok, '(.)', '\\1 ', 'g')) || ' '"
    for pair, fused in BPE_MERGES:
        seg = f"replace({seg}, ' {pair} ', ' {fused} ')"
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), uni AS (
  SELECT tok, count(*) AS n FROM toks GROUP BY tok
), top AS (
  SELECT tok, n, CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rk
  FROM uni QUALIFY rk <= {BPE_TOK_TOP}
)
SELECT tok, CAST(n AS BIGINT) AS n, rk,
       trim({seg}) AS segmented,
       CAST(length(tok) AS BIGINT) AS pieces_before,
       CAST(len(string_split(trim({seg}), ' ')) AS BIGINT) AS pieces_after
FROM top
"""


# ---------------------------------------------------------------------------
# copurchase_jaccard — market-basket item-item similarity
# ---------------------------------------------------------------------------

COPURCHASE_MIN = 2


def copurchase_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Item-item co-occurrence similarity: parts appearing in the same
    order (lineitem self-join on l_orderkey, a strictly-ordered pair),
    Jaccard over each part's order set — the market-basket / co-citation
    shape behind related-items and graph-similarity features.

    Scale: the self-join shuffles on l_orderkey (bounded fan-out per
    order, ~4 lines, so pairs are ~6x orders, linear not quadratic);
    the degree table has one row per distinct l_partkey — corpus
    cardinality, so it is NOT broadcast-hinted (round-3 verdict item #2):
    the pairs side is already aggregated, the degree joins shuffle on the
    part key and AQE may still choose broadcast at small SF; Jaccard is
    exact-integer arithmetic with one terminal division."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= COPURCHASE_MIN)
    )
    deg = li.groupBy("l_partkey").agg(F.count("*").alias("deg"))
    return (
        pairs.join(deg.select(F.col("l_partkey").alias("pa"), F.col("deg").alias("n_a")), "pa")
        .join(deg.select(F.col("l_partkey").alias("pb"), F.col("deg").alias("n_b")), "pb")
        .select(
            F.col("pa").cast("long").alias("pa"),
            F.col("pb").cast("long").alias("pb"),
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(
                F.col("n_ab") / (F.col("n_a") + F.col("n_b") - F.col("n_ab")), 6
            ).alias("jaccard"),
        )
    )


COPURCHASE_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {COPURCHASE_MIN}
), deg AS (
  SELECT l_partkey, count(*) AS deg FROM li GROUP BY 1
)
SELECT CAST(pa AS BIGINT) AS pa, CAST(pb AS BIGINT) AS pb,
       CAST(n_ab AS BIGINT) AS n_ab,
       round(n_ab * 1.0 / (da.deg + db.deg - n_ab), 6) AS jaccard
FROM pairs JOIN deg da ON da.l_partkey = pa JOIN deg db ON db.l_partkey = pb
"""


# ---------------------------------------------------------------------------
# embedding_centroid_dist — exact-grid per-label centroids + distances
# ---------------------------------------------------------------------------

GRID = 10_000  # fixed-point grid: 4 decimal places per component


def embedding_centroid_dist(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label centroid assignment quality: each vector's squared L2
    distance to its own label centroid, computed entirely on a fixed-point
    integer grid so both engines agree bit-for-bit — per-dim term
    (e_i * n - sum_e)^2 is an exact integer, the per-vector sum of 64 such
    terms is exact, and the single terminal division by n^2 * GRID^2
    rescales to original units.

    Scale: one posexplode (narrow, 64 rows/vector), one groupBy on
    (label, dim) for centroid sums — a bounded key space — broadcast back,
    then one groupBy on vec_id. No float accumulation anywhere."""
    emb = load_table(spark, sf, "embeddings")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "x"),
    ).withColumn("e", F.round(F.col("x") * GRID).cast("long")).drop("x")
    cent = dims.groupBy("label", "dim").agg(
        F.sum("e").alias("sum_e"), F.count("*").alias("n")
    )
    term = (F.col("e") * F.col("n") - F.col("sum_e")) * (
        F.col("e") * F.col("n") - F.col("sum_e")
    )
    per_vec = (
        dims.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label", "n")
        .agg(F.sum(term).alias("ssq"))
    )
    return per_vec.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.round(
            F.col("ssq") / (F.col("n") * F.col("n") * F.lit(float(GRID) * GRID)), 6
        ).alias("dist2"),
    )


CENTROID_SQL = f"""
WITH dims AS (
  SELECT vec_id, label, CAST(u.i AS INTEGER) AS dim,
         CAST(round(CAST(embedding[CAST(u.i + 1 AS INTEGER)] AS DOUBLE) * {GRID}) AS BIGINT) AS e
  FROM embeddings, unnest(range(64)) u(i)
), cent AS (
  SELECT label, dim, sum(e) AS sum_e, count(*) AS n
  FROM dims GROUP BY 1, 2
), per_vec AS (
  SELECT d.vec_id, d.label, c.n,
         sum((d.e * c.n - c.sum_e) * (d.e * c.n - c.sum_e)) AS ssq
  FROM dims d JOIN cent c ON d.label = c.label AND d.dim = c.dim
  GROUP BY 1, 2, 3
)
SELECT vec_id, CAST(label AS BIGINT) AS label,
       round(ssq * 1.0 / (n * n * {GRID}.0 * {GRID}), 6) AS dist2
FROM per_vec
"""


QUERIES: dict[str, QuerySpec] = {
    "pmi_collocations": QuerySpec(
        pmi_collocations, PMI_SQL,
        "PMI collocation mining over adjacent word pairs",
    ),
    "rare_token_oov_rate": QuerySpec(
        rare_token_oov_rate, OOV_SQL,
        "per-doc OOV-rate quality filter against a top-k vocabulary",
    ),
    "lsh_range_search": QuerySpec(
        lsh_range_search, _range_oracle_sql(),
        "production cosine range search via 4-table sign-LSH equi-join",
    ),
    "feature_hashing_vec": QuerySpec(
        feature_hashing_vec, FEATURE_HASH_SQL,
        "hashing-trick sparse feature vectors (doc, bucket, count)",
    ),
    "target_encoding_loo": QuerySpec(
        target_encoding_loo, TARGET_ENC_SQL,
        "leave-one-out smoothed target encoding, exact-integer math",
    ),
    "tokenizer_bpe_apply": QuerySpec(
        tokenizer_bpe_apply, _bpe_apply_sql(),
        "apply a fixed BPE merge list; segmented pieces per token",
    ),
    "copurchase_jaccard": QuerySpec(
        copurchase_jaccard, COPURCHASE_SQL,
        "market-basket item-item Jaccard via per-order self-join",
    ),
    "embedding_centroid_dist": QuerySpec(
        embedding_centroid_dist, CENTROID_SQL,
        "per-label centroid distances on an exact fixed-point grid",
    ),
}
