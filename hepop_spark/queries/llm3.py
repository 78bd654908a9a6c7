"""Third LLM-pipeline batch: the dataset-shaping operators that sit between
a cleaned corpus and a training run — sliding-window chunking, sequential
sequence packing, weighted source mixing, and benchmark decontamination.

(North-star surface: the reference stores opaque payload strings,
hepop.js:183, and has no corpus tooling at all.)

Shared conventions: tokenization is a single-space split (≡ DuckDB
string_split); every sampling / replication decision is content-addressed
off md5(doc_id) hex prefixes (engine-, partition-, and cluster-size-
independent — the idiom proven by sample_stratified_hash); chunk and n-gram
identities are md5 over the joined token string so hashes compare across
engines without shipping the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from . import QuerySpec

# --- Sliding-window chunking --------------------------------------------------

CHUNK = 32   # tokens per chunk
STRIDE = 24  # tokens between chunk starts (overlap = CHUNK - STRIDE = 8)


def text_chunk_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Split each document into overlapping token windows (size {CHUNK},
    stride {STRIDE}) — the standard long-document → context-window prep.
    Chunk starts are 0, S, 2S, … ≤ n-1, so every token is covered and the
    tail chunk may be short; identity = md5 of the joined tokens.

    Scale: explode(sequence(...)) is a narrow generator — rows fan out
    ~n/S× with NO shuffle; the whole plan is scan → generate → project."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql(f"""
        WITH s AS (
            SELECT doc_id, split(text, ' ') AS toks,
                   size(split(text, ' ')) AS n
            FROM documents
        )
        SELECT doc_id, i AS chunk_idx,
               size(slice(toks, i * {STRIDE} + 1, {CHUNK})) AS chunk_tokens,
               md5(concat_ws(' ', slice(toks, i * {STRIDE} + 1, {CHUNK})))
                   AS chunk_hash
        FROM s LATERAL VIEW explode(sequence(0, int(floor((n - 1) / {STRIDE})))) t AS i
    """)


CHUNK_SQL = f"""
WITH s AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n
    FROM documents
),
idx AS (
    SELECT doc_id, toks,
           unnest(generate_series(0, CAST(floor((n - 1) / {STRIDE}) AS BIGINT))) AS i
    FROM s
)
SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       CAST(len(list_slice(toks, i * {STRIDE} + 1, i * {STRIDE} + {CHUNK}))
            AS INTEGER) AS chunk_tokens,
       md5(array_to_string(list_slice(toks, i * {STRIDE} + 1, i * {STRIDE} + {CHUNK}),
                           ' ')) AS chunk_hash
FROM idx
"""


# --- Sequential sequence packing ---------------------------------------------

CAP = 256  # tokens per packed sequence


def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-split sequence packing: docs are laid out in doc_id order
    inside a hash bucket (doc_id % 8 — the distribution unit, so packing
    parallelizes across buckets with no global sort) and a running token
    count assigns each doc to pack floor(cum_before / {CAP}). Docs are
    truncated to {CAP} tokens so no doc spans more than two packs. Returns
    per-pack fill statistics.

    Scale: ONE shuffle on the bucket key, one window sort inside it —
    the global-total-order trap (single reducer) is avoided by design; at
    1000 executors you'd raise the bucket count, nothing else changes."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql(f"""
        WITH t AS (
            SELECT doc_id, doc_id % 8 AS bucket,
                   least(size(split(text, ' ')), {CAP}) AS tok
            FROM documents
        ),
        placed AS (
            SELECT bucket, doc_id, tok,
                   coalesce(sum(tok) OVER (
                       PARTITION BY bucket ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM t
        )
        SELECT bucket, CAST(floor(cum_before / {CAP}) AS BIGINT) AS pack_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS pack_tokens
        FROM placed
        GROUP BY bucket, 2
    """)


PACK_SQL = f"""
WITH t AS (
    SELECT doc_id, doc_id % 8 AS bucket,
           least(len(string_split(text, ' ')), {CAP}) AS tok
    FROM documents
),
placed AS (
    SELECT bucket, doc_id, tok,
           coalesce(sum(tok) OVER (
               PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cum_before
    FROM t
)
SELECT bucket, CAST(floor(cum_before / {CAP}) AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS pack_tokens
FROM placed
GROUP BY bucket, 2
"""


# --- Weighted source mixing ---------------------------------------------------


def mix_sources_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset mixing with per-source sampling weights — up-weight (w > 1
    replicates ⌊w⌋× plus a hash-gated extra copy for the fraction) and
    down-weight (w < 1 keeps a hash-gated subset): src0-2 at w=2.5,
    src3-4 at w=1.0, everything else at w≈0.4. The fractional gate is the
    md5-hex-prefix threshold ('80'/256 ≈ .5, '66'/256 ≈ .4), so the mix is
    reproducible on any engine or cluster layout. Returns per-source
    replication accounting.

    Scale: narrow map + generator fan-out, then one aggregation on the
    20-key source space — no data-sized shuffle."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        WITH m AS (
            SELECT source, doc_id,
                   CASE
                     WHEN source IN ('src0', 'src1', 'src2') THEN
                       2 + IF(substring(md5(CAST(doc_id AS STRING)), 1, 2) < '80', 1, 0)
                     WHEN source IN ('src3', 'src4') THEN 1
                     ELSE
                       IF(substring(md5(CAST(doc_id AS STRING)), 1, 2) < '66', 1, 0)
                   END AS reps
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM m LATERAL VIEW explode(sequence(1, reps)) t AS copy
        WHERE reps > 0
        GROUP BY source
    """)


MIX_SQL = """
WITH m AS (
    SELECT source, doc_id,
           CASE
             WHEN source IN ('src0', 'src1', 'src2') THEN
               2 + CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
                        THEN 1 ELSE 0 END
             WHEN source IN ('src3', 'src4') THEN 1
             ELSE
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '66'
                    THEN 1 ELSE 0 END
           END AS reps
    FROM documents
)
, copies AS (
    SELECT source, doc_id, unnest(generate_series(1, reps)) AS copy
    FROM m WHERE reps > 0
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM copies
GROUP BY source
"""


# --- Benchmark decontamination ------------------------------------------------

NGRAM = 5


def decontaminate_ngram_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Training-set decontamination: flag corpus documents sharing any
    {NGRAM}-gram with a held-out benchmark set. Benchmark = doc_id % 97 = 0;
    corpus = the rest PLUS the benchmark texts re-keyed (+1,000,000) as
    planted leaks — detection must flag every plant (organic collisions, if
    any, are identical on both engines). Returns flagged doc_id with the
    count of distinct shared n-grams.

    Scale: n-grams are hashed to md5 BEFORE the join (fixed-width keys, no
    long-string shuffle); the benchmark side is distinct-reduced and tiny →
    Spark broadcasts it, so the corpus side never shuffles. This is the
    bucket-equi-join candidate-generation discipline (memory: never
    all-pairs) applied to contamination checking."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql(f"""
        WITH bench_docs AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
        ),
        corpus AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text FROM bench_docs
        ),
        grams AS (
            SELECT doc_id,
                   md5(concat_ws(' ', slice(toks, i, {NGRAM}))) AS g
            FROM (
                SELECT doc_id, split(text, ' ') AS toks,
                       size(split(text, ' ')) AS n
                FROM corpus
            ) s LATERAL VIEW explode(sequence(1, n - {NGRAM} + 1)) t AS i
            WHERE n >= {NGRAM}
        ),
        bgrams AS (
            SELECT DISTINCT md5(concat_ws(' ', slice(toks, i, {NGRAM}))) AS g
            FROM (
                SELECT doc_id, split(text, ' ') AS toks,
                       size(split(text, ' ')) AS n
                FROM bench_docs
            ) s LATERAL VIEW explode(sequence(1, n - {NGRAM} + 1)) t AS i
            WHERE n >= {NGRAM}
        )
        SELECT grams.doc_id,
               CAST(count(DISTINCT grams.g) AS BIGINT) AS n_shared,
               grams.doc_id >= 1000000 AS is_planted
        FROM grams JOIN bgrams ON grams.g = bgrams.g
        GROUP BY grams.doc_id
    """)


DECONTAM_SQL = f"""
WITH bench_docs AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
),
corpus AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM bench_docs
),
grams AS (
    SELECT doc_id, md5(array_to_string(list_slice(toks, i, i + {NGRAM} - 1), ' ')) AS g
    FROM (
        SELECT doc_id, toks, unnest(generate_series(1, n - {NGRAM} + 1)) AS i
        FROM (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM corpus
        ) raw WHERE n >= {NGRAM}
    ) s
),
bgrams AS (
    SELECT DISTINCT md5(array_to_string(list_slice(toks, i, i + {NGRAM} - 1), ' ')) AS g
    FROM (
        SELECT doc_id, toks, unnest(generate_series(1, n - {NGRAM} + 1)) AS i
        FROM (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM bench_docs
        ) raw WHERE n >= {NGRAM}
    ) s
)
SELECT grams.doc_id,
       CAST(count(DISTINCT grams.g) AS BIGINT) AS n_shared,
       grams.doc_id >= 1000000 AS is_planted
FROM grams JOIN bgrams ON grams.g = bgrams.g
GROUP BY grams.doc_id
"""


# --- URL / domain extraction --------------------------------------------------

_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def text_url_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-level corpus accounting — the shape behind domain allow/deny
    filtering and per-domain mixing in web-corpus pipelines: plant a
    deterministic URL per document (synthetic corpus has none), extract the
    registrable host with a shared Java∩RE2 regex, aggregate docs and
    chars per domain.

    Scale: regexp_extract is a narrow map; the aggregate shuffles on the
    (bounded) domain key space — the classic high-fanin low-cardinality
    reduce, fully map-side-combined."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql(f"""
        WITH planted AS (
            SELECT doc_id, n_chars,
                   concat(text, ' see https://host', CAST(doc_id % 50 AS STRING),
                          '.example.org/p/', CAST(doc_id AS STRING)) AS t2
            FROM documents
        )
        SELECT regexp_extract(t2, '{_DOMAIN_RE}', 1) AS domain,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM planted
        GROUP BY 1
    """)


URL_SQL = f"""
WITH planted AS (
    SELECT doc_id, n_chars,
           concat(text, ' see https://host', CAST(doc_id % 50 AS VARCHAR),
                  '.example.org/p/', CAST(doc_id AS VARCHAR)) AS t2
    FROM documents
)
SELECT regexp_extract(t2, '{_DOMAIN_RE}', 1) AS domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM planted
GROUP BY 1
"""


# --- Quality-filter cascade ---------------------------------------------------

_CASCADE_CASE = """
CASE WHEN n_tok < 25 THEN 'too_short'
     WHEN n_tok > 85 THEN 'too_long'
     WHEN 100 * n_alpha < 81 * n_len THEN 'low_alpha'
     ELSE 'keep' END
"""


def corpus_filter_cascade(spark: SparkSession, sf: str) -> DataFrame:
    """The pretraining quality gate as one pass: every document gets a
    verdict from a prioritized rule cascade (too_short → too_long →
    low_alpha → keep) and the output is per-verdict accounting — the
    report a corpus-cleaning run ships. All predicates are INTEGER
    comparisons (token counts, char counts, 100·alpha < 81·len instead of
    a float ratio) so the cascade is bit-identical on any engine.

    Scale: narrow per-row classify + one aggregation on a 4-value key —
    the classic full-corpus single-scan filter; at 100 TB you'd write the
    `keep` partition out in the same pass."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql(f"""
        WITH scored AS (
            SELECT doc_id, n_chars,
                   size(split(text, ' ')) AS n_tok,
                   length(regexp_replace(text, '[^A-Za-z]', '')) AS n_alpha,
                   length(text) AS n_len
            FROM documents
        )
        SELECT {_CASCADE_CASE} AS verdict,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               CAST(min(doc_id) AS BIGINT) AS sample_doc
        FROM scored
        GROUP BY 1
    """)


CASCADE_SQL = f"""
WITH scored AS (
    SELECT doc_id, n_chars,
           len(string_split(text, ' ')) AS n_tok,
           length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
           length(text) AS n_len
    FROM documents
)
SELECT {_CASCADE_CASE} AS verdict,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(min(doc_id) AS BIGINT) AS sample_doc
FROM scored
GROUP BY 1
"""


# --- Embedding scalar quantization (SQ8) -------------------------------------


def embedding_quantize_int8(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar int8 quantization of the embedding corpus — the 4×
    storage/bandwidth reduction that makes billion-vector ANN affordable:
    per-DIMENSION [min, max] learned from the corpus (one tiny aggregate),
    each coordinate mapped to ⌊(x-lo)/(hi-lo)·255⌉. Verification is pure
    INTEGER accounting per vector (Σq, Σq², dims, saturated endpoints), so
    the oracle pins the exact quantized codes, not a float proxy.

    Scale: posexplode → per-dim aggregate (k=dims groups — broadcastable)
    → join back → per-vector aggregate. Two shuffles total, one over
    (vec, dim) pairs; at 1B vectors you'd SAMPLE the min/max pass (the
    clamp makes out-of-range codes saturate, which n_saturated tracks)."""
    register_views(spark, sf, tables=("embeddings",))
    return spark.sql("""
        WITH e AS (
            SELECT vec_id, pos, CAST(x AS DOUBLE) AS x
            FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, x
        ),
        dims AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM e GROUP BY pos),
        q AS (
            SELECT e.vec_id,
                   CASE WHEN d.hi > d.lo THEN
                       CAST(round((e.x - d.lo) / (d.hi - d.lo) * 255) AS INT)
                   ELSE 0 END AS q
            FROM e JOIN dims d ON e.pos = d.pos
        )
        SELECT vec_id,
               CAST(sum(q) AS BIGINT) AS sum_q,
               CAST(sum(q * q) AS BIGINT) AS sum_q2,
               CAST(count(*) AS BIGINT) AS n_dims,
               CAST(sum(CASE WHEN q = 0 OR q = 255 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_saturated
        FROM q GROUP BY vec_id
    """)


QUANTIZE_SQL = """
WITH e AS (
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
),
dims AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM e GROUP BY pos),
q AS (
    SELECT e.vec_id,
           CASE WHEN d.hi > d.lo THEN
               CAST(round((e.x - d.lo) / (d.hi - d.lo) * 255) AS INTEGER)
           ELSE 0 END AS q
    FROM e JOIN dims d ON e.pos = d.pos
)
SELECT vec_id,
       CAST(sum(q) AS BIGINT) AS sum_q,
       CAST(sum(q * q) AS BIGINT) AS sum_q2,
       CAST(count(*) AS BIGINT) AS n_dims,
       CAST(sum(CASE WHEN q = 0 OR q = 255 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_saturated
FROM q GROUP BY vec_id
"""


# --- Intra-document repetition ------------------------------------------------


def text_repetition_score(spark: SparkSession, sf: str) -> DataFrame:
    """Repetition quality signal (the Gopher-rules shape): per document,
    total vs distinct word-3-gram counts — a high duplicate share marks
    boilerplate/looping text. Pure integer accounting (n_grams,
    n_distinct, repeated = n - distinct), so the score is engine-exact;
    docs shorter than 3 tokens emit nothing (no grams).

    Scale: one generator fan-out + two aggregations keyed on doc_id —
    map-side combined, no joins."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        WITH grams AS (
            SELECT doc_id,
                   concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS g
            FROM (SELECT doc_id, split(text, ' ') AS t FROM documents) d
            LATERAL VIEW explode(sequence(0, size(t) - 3)) x AS i
            WHERE size(t) >= 3
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
               CAST(count(*) - count(DISTINCT g) AS BIGINT) AS n_repeated
        FROM grams
        GROUP BY doc_id
    """)


REPETITION_SQL = """
WITH grams AS (
    SELECT doc_id, w1 || ' ' || w2 || ' ' || w3 AS g
    FROM (
        SELECT doc_id,
               unnest(t[1:len(t)-2]) AS w1,
               unnest(t[2:len(t)-1]) AS w2,
               unnest(t[3:len(t)]) AS w3
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d
        WHERE len(t) >= 3
    ) z
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
       CAST(count(*) - count(DISTINCT g) AS BIGINT) AS n_repeated
FROM grams
GROUP BY doc_id
"""


# --- Cross-source duplicate matrix -------------------------------------------


def cross_source_dup_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Which sources copy from which: exact-content fingerprints grouped,
    then every fingerprint shared by two sources contributes to the
    (source_a, source_b) cell — the provenance overlap report that decides
    which feeds to drop before training. Ordered pair (a < b) so each
    cross-source relation appears once. A planted 'src_mirror' feed
    re-publishing every 50th document proves the matrix actually fires
    (the synthetic sources share no organic exact content).

    Scale: hash → group (one shuffle); the pair explosion is bounded by
    duplicate-group sizes, not corpus size."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        WITH corpus AS (
            SELECT source, text FROM documents
            UNION ALL
            SELECT 'src_mirror' AS source, text
            FROM documents WHERE doc_id % 50 = 0
        ),
        fp AS (
            SELECT DISTINCT md5(text) AS h, source FROM corpus
        )
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared_contents
        FROM fp a JOIN fp b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2
    """)


CROSS_SOURCE_SQL = """
WITH corpus AS (
    SELECT source, text FROM documents
    UNION ALL
    SELECT 'src_mirror' AS source, text
    FROM documents WHERE doc_id % 50 = 0
),
fp AS (
    SELECT DISTINCT md5(text) AS h, source FROM corpus
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared_contents
FROM fp a JOIN fp b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2
"""


# --- Train/val/test split -----------------------------------------------------


def split_train_val_test(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic ~80/10/10 corpus split on md5(doc_id) hex thresholds
    ('cc' = 204/256 ≈ 79.7%, 'e6' = 230/256 ≈ 89.8%) — the same
    content-addressed discipline as sample_stratified_hash, so membership
    never depends on engine, partitioning, or cluster size, and re-running
    the pipeline never migrates a document across splits (the property
    RNG splits lack). Returns per-(split, source) accounting.

    Scale: a narrow hash classify + one aggregation on a tiny key space."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        WITH assigned AS (
            SELECT source, n_chars,
                   CASE WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < 'cc'
                            THEN 'train'
                        WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < 'e6'
                            THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT split, source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM assigned
        GROUP BY split, source
    """)


SPLIT_SQL = """
WITH assigned AS (
    SELECT source, n_chars,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                    THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'val'
                ELSE 'test' END AS split
    FROM documents
)
SELECT split, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM assigned
GROUP BY split, source
"""


# --- Deterministic corpus shuffle --------------------------------------------


def corpus_shuffle_head(spark: SparkSession, sf: str) -> DataFrame:
    """Reproducible global shuffle for training order: shuffle key =
    md5(doc_id), globally ordered; returns the first 20 positions. The
    Spark plan is TakeOrderedAndProject (per-partition partial top-k,
    driver merges 20 rows — NO global sort, no single-partition window);
    the rank window then runs over the 20 surviving rows only.

    Scale: the full shuffled ORDER of 100 TB is never materialized — a
    trainer consumes it as range-partitioned sorted output; heads/slices
    use partial top-k exactly like this."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        WITH head AS (
            SELECT doc_id, substring(md5(CAST(doc_id AS STRING)), 1, 8) AS shuffle_key
            FROM documents
            ORDER BY md5(CAST(doc_id AS STRING))
            LIMIT 20
        )
        SELECT CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS INTEGER)
                   AS position,
               doc_id, shuffle_key
        FROM head
    """)


SHUFFLE_HEAD_SQL = """
WITH head AS (
    SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS shuffle_key
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR))
    LIMIT 20
)
SELECT CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS INTEGER) AS position,
       doc_id, shuffle_key
FROM head
"""


# --- Time-series correlation (integer-exact Pearson) -------------------------

_TS_CORR_SQL = """
WITH cohort AS (SELECT user_id, ts, value FROM events WHERE user_id < 40),
h AS (
    SELECT user_id, date_trunc('hour', ts) AS hr,
           CAST(round(sum(value) * 100) AS BIGINT) AS vc
    FROM cohort GROUP BY 1, 2
),
p AS (
    SELECT a.user_id AS ua, b.user_id AS ub,
           count(*) AS n,
           sum(a.vc) AS sa, sum(b.vc) AS sb,
           sum(a.vc * b.vc) AS sab,
           sum(a.vc * a.vc) AS saa, sum(b.vc * b.vc) AS sbb
    FROM h a JOIN h b ON a.hr = b.hr AND a.user_id < b.user_id
    GROUP BY 1, 2
)
SELECT ua, ub, CAST(n AS BIGINT) AS n_hours,
       round((n * sab - sa * sb) /
             (sqrt(n * saa - sa * sa) * sqrt(n * sbb - sb * sb)), 4) AS corr_v
FROM p
WHERE n >= 6 AND (n * saa - sa * sa) > 0 AND (n * sbb - sb * sb) > 0
ORDER BY corr_v DESC, ua, ub
LIMIT 20
"""


def ts_correlation_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series similarity search (the classic co-movement query): top
    20 most-correlated user pairs over hourly value series. Every Pearson
    moment (n, Σx, Σy, Σxy, Σx², Σy²) is an EXACT integer (hourly sums in
    cents), so the correlation double and its top-k cut are bit-identical
    across engines — the float-parity discipline applied to a second-order
    statistic. The pair space is blocked to a cohort (user_id < 40 here);
    at scale the cohort/blocking key IS the lever — correlate within
    segments, never all-pairs. One aggregation + one hour-keyed self-join
    + one aggregation; top-k via total order (corr desc, ua, ub)."""
    register_views(spark, sf, tables=("events",))
    return spark.sql(_TS_CORR_SQL)


# --- Fuzzy string join (edit-distance with blocking) -------------------------

_FUZZY_JOIN_SQL = """
WITH c AS (
    SELECT c_custkey, c_name, substring(c_name, 1, 16) AS blk FROM customer
)
SELECT a.blk AS block_prefix,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(a.c_custkey) AS BIGINT) AS first_key
FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
GROUP BY 1
"""


def fuzzy_name_join(spark: SparkSession, sf: str) -> DataFrame:
    """String-similarity self-join (edit distance ≤ 1) with prefix
    blocking: candidate pairs come from a 16-char-prefix equi-join (~100
    names per block), and levenshtein runs on candidates only — the
    blocked form of a similarity join that would otherwise be |R|²
    distance computations. Identical SQL text runs on both engines
    (levenshtein is built into each).

    Scale: blocking-key choice bounds the quadratic term (block_size² per
    block); length-band + prefix blocks are the standard recipe."""
    register_views(spark, sf, tables=("customer",))
    return spark.sql(_FUZZY_JOIN_SQL)


# --- Unigram LM scoring -------------------------------------------------------


def text_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram language-model scoring — the cheap perplexity proxy real
    pipelines use as a quality filter: token probabilities learned from
    the corpus itself (one aggregation), each document scored by
    Σ log p(tok). The per-token log-prob is quantized to INTEGER
    milli-nats BEFORE summing, so the doc score is an exact integer —
    no float-accumulation-order hazard between engines (log p itself is a
    single deterministic double from exact integer counts).

    Scale: two token-keyed aggregations + one broadcast-sized vocab join —
    identical shape to tfidf_top_terms."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        WITH toks AS (
            SELECT doc_id, tok
            FROM documents LATERAL VIEW explode(split(text, ' ')) t AS tok
        ),
        vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        total AS (SELECT sum(c) AS n FROM vocab)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CAST(round(ln(CAST(vocab.c AS DOUBLE) / total.n) * 1000) AS BIGINT))
                    AS BIGINT) AS logprob_milli
        FROM toks JOIN vocab ON toks.tok = vocab.tok CROSS JOIN total
        GROUP BY doc_id
    """)


UNIGRAM_SQL = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
    FROM documents
),
vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
total AS (SELECT sum(c) AS n FROM vocab)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CAST(round(ln(CAST(vocab.c AS DOUBLE) / total.n) * 1000) AS BIGINT))
            AS BIGINT) AS logprob_milli
FROM toks JOIN vocab ON toks.tok = vocab.tok CROSS JOIN total
GROUP BY doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "text_chunk_windows": QuerySpec(text_chunk_windows, CHUNK_SQL),
    "pack_sequences": QuerySpec(pack_sequences, PACK_SQL),
    "mix_sources_weighted": QuerySpec(mix_sources_weighted, MIX_SQL),
    "decontaminate_ngram_overlap": QuerySpec(decontaminate_ngram_overlap, DECONTAM_SQL),
    "text_url_extract": QuerySpec(text_url_extract, URL_SQL),
    "corpus_filter_cascade": QuerySpec(corpus_filter_cascade, CASCADE_SQL),
    "embedding_quantize_int8": QuerySpec(embedding_quantize_int8, QUANTIZE_SQL),
    "text_repetition_score": QuerySpec(text_repetition_score, REPETITION_SQL),
    "cross_source_dup_matrix": QuerySpec(cross_source_dup_matrix, CROSS_SOURCE_SQL),
    "split_train_val_test": QuerySpec(split_train_val_test, SPLIT_SQL),
    "corpus_shuffle_head": QuerySpec(corpus_shuffle_head, SHUFFLE_HEAD_SQL),
    "ts_correlation_pairs": QuerySpec(ts_correlation_pairs, _TS_CORR_SQL),
    "fuzzy_name_join": QuerySpec(fuzzy_name_join, _FUZZY_JOIN_SQL),
    "text_unigram_logprob": QuerySpec(text_unigram_logprob, UNIGRAM_SQL),
}
