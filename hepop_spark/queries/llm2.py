"""Second LLM-pipeline batch: corpus statistics and sampling operators a
training-data pipeline needs beyond dedup/similarity — TF-IDF term
scoring, bigram language statistics, deterministic stratified sampling,
vocabulary-coverage sizing, and the two classic event-sequence analytics
shapes (funnel, weekly retention cohorts).

(The reference has no text analytics at all — its payloads are opaque
UTF8 columns, hepop.js:183; this whole family is north-star surface.)

Tokenization convention matches the rest of the inventory: whitespace
split on a single space (Spark split(text, ' ') ≡ DuckDB
string_split(text, ' ')).

Determinism: every ranked output carries a total tiebreak (score desc,
term asc); sampling is content-addressed (md5 of the id, not RNG) so both
engines and any partitioning agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from . import QuerySpec

# --- TF-IDF top terms per document -------------------------------------------


def tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. tf/df/N are exact integer
    aggregates; the only float is the final tf·ln(N/df), rounded to 4
    decimals before ranking with a (score desc, term asc) tiebreak so both
    engines rank identically. Scale shape: two token-keyed aggregations
    (map-side partial combine) + a broadcast-sized df table joined back on
    the term — no cross joins, no driver loops."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        WITH toks AS (
            SELECT doc_id, tok
            FROM documents LATERAL VIEW explode(split(text, ' ')) t AS tok
        ),
        tf AS (
            SELECT doc_id, tok, count(*) AS tf
            FROM toks GROUP BY doc_id, tok
        ),
        df AS (
            SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok
        ),
        n AS (SELECT count(DISTINCT doc_id) AS n FROM toks)
        SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf,
               score AS tfidf
        FROM (
            SELECT tf.doc_id, tf.tok, tf.tf,
                   round(tf.tf * ln(n.n * 1.0 / df.df), 4) AS score,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY round(tf.tf * ln(n.n * 1.0 / df.df), 4) DESC, tf.tok
                   ) AS rk
            FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
        ) s
        WHERE rk <= 3
    """)


TFIDF_SQL = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (
    SELECT doc_id, tok, count(*) AS tf
    FROM toks GROUP BY doc_id, tok
),
df AS (
    SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok
),
n AS (SELECT count(DISTINCT doc_id) AS n FROM toks)
SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf,
       score AS tfidf
FROM (
    SELECT tf.doc_id, tf.tok, tf.tf,
           round(tf.tf * ln(n.n * 1.0 / df.df), 4) AS score,
           row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY round(tf.tf * ln(n.n * 1.0 / df.df), 4) DESC, tf.tok
           ) AS rk
    FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
) s
WHERE rk <= 3
"""


# --- bigram counts ------------------------------------------------------------


def text_bigram_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 word bigrams by corpus frequency — position-preserving
    explode self-joined on (doc, pos+1). The join is co-partitioned on
    doc_id (each document's positions land together), so bigram formation
    never shuffles tokens across documents; the final top-k is an
    orderBy+limit (TakeOrderedAndProject) with a lexicographic tiebreak."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        WITH toks AS (
            SELECT doc_id, pos, tok
            FROM documents LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok
        )
        SELECT concat(a.tok, ' ', b.tok) AS bigram,
               CAST(count(*) AS BIGINT) AS cnt
        FROM toks a JOIN toks b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        GROUP BY concat(a.tok, ' ', b.tok)
        ORDER BY cnt DESC, bigram
        LIMIT 20
    """)


BIGRAM_SQL = """
WITH toks AS (
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS tok
    FROM documents
)
SELECT concat(a.tok, ' ', b.tok) AS bigram,
       CAST(count(*) AS BIGINT) AS cnt
FROM toks a JOIN toks b
  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY concat(a.tok, ' ', b.tok)
ORDER BY cnt DESC, bigram
LIMIT 20
"""


# --- deterministic stratified sampling ----------------------------------------


def sample_stratified_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified downsampling with per-language rates (50% for 'en',
    ~15.6% otherwise), keyed on md5(doc_id) — content-addressed, so the
    SAME rows are kept on any engine, partitioning, or cluster size (the
    property RNG-based sample() lacks). The filter is a narrow map over
    the scan; per-stratum counts shuffle once on the tiny (source, lang)
    key space."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        SELECT source, lang,
               CAST(count(*) AS BIGINT) AS sampled_docs,
               CAST(sum(n_chars) AS BIGINT) AS sampled_chars
        FROM documents
        WHERE substring(md5(CAST(doc_id AS STRING)), 1, 2) <
              CASE WHEN lang = 'en' THEN '80' ELSE '28' END
        GROUP BY source, lang
    """)


SAMPLE_STRATIFIED_SQL = """
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS sampled_docs,
       CAST(sum(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      CASE WHEN lang = 'en' THEN '80' ELSE '28' END
GROUP BY source, lang
"""


# --- vocabulary coverage ------------------------------------------------------


def vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Smallest vocabulary size whose tokens cover ≥ 50% of all token
    occurrences — the BPE-vocab-sizing question. Integer-only comparison
    (2·cum ≥ total) so no float crosses the engine boundary except the
    final reported ratio of two identical integers. The cumulative window
    runs over the token-frequency table (vocabulary-sized, bounded — NOT
    corpus-sized), so the single-partition window is safe at any corpus
    scale."""
    register_views(spark, sf, tables=("documents",))
    return spark.sql("""
        WITH counts AS (
            SELECT tok, count(*) AS cnt
            FROM documents LATERAL VIEW explode(split(text, ' ')) t AS tok
            GROUP BY tok
        ),
        ranked AS (
            SELECT cnt,
                   row_number() OVER (ORDER BY cnt DESC, tok) AS rk,
                   sum(cnt) OVER (ORDER BY cnt DESC, tok
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM counts
        ),
        tot AS (SELECT sum(cnt) AS total FROM counts)
        SELECT CAST(min(rk) AS BIGINT) AS vocab_k,
               CAST(min_by(cum, rk) AS BIGINT) AS covered,
               CAST(min(total) AS BIGINT) AS total_tokens,
               CAST(round(min_by(cum, rk) * 1.0 / min(total), 4) AS DOUBLE) AS coverage
        FROM ranked CROSS JOIN tot
        WHERE 2 * cum >= total
    """)


VOCAB_COVERAGE_SQL = """
WITH counts AS (
    SELECT tok, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
),
ranked AS (
    SELECT cnt,
           row_number() OVER (ORDER BY cnt DESC, tok) AS rk,
           sum(cnt) OVER (ORDER BY cnt DESC, tok
                          ROWS UNBOUNDED PRECEDING) AS cum
    FROM counts
),
tot AS (SELECT sum(cnt) AS total FROM counts)
SELECT CAST(min(rk) AS BIGINT) AS vocab_k,
       CAST(min_by(cum, rk) AS BIGINT) AS covered,
       CAST(min(total) AS BIGINT) AS total_tokens,
       CAST(round(min_by(cum, rk) * 1.0 / min(total), 4) AS DOUBLE) AS coverage
FROM ranked CROSS JOIN tot
WHERE 2 * cum >= total
"""


# --- funnel: signup → purchase ------------------------------------------------


def funnel_signup_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """Two-step funnel over the events stream: users whose first signup
    precedes their first purchase. One shuffle on user_id with the
    conditional-min aggregates folded map-side; the funnel predicate is a
    post-aggregation filter on a 1-row-per-user frame."""
    register_views(spark, sf, tables=("events",))
    return spark.sql("""
        SELECT CAST(count(*) AS BIGINT) AS signup_users,
               CAST(sum(CASE WHEN t_buy IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS purchased_users,
               CAST(sum(CASE WHEN t_buy > t_signup THEN 1 ELSE 0 END) AS BIGINT)
                   AS converted_users
        FROM (
            SELECT user_id,
                   min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
            FROM events GROUP BY user_id
        ) u
        WHERE t_signup IS NOT NULL
    """)


FUNNEL_SQL = """
SELECT CAST(count(*) AS BIGINT) AS signup_users,
       CAST(sum(CASE WHEN t_buy IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS purchased_users,
       CAST(sum(CASE WHEN t_buy > t_signup THEN 1 ELSE 0 END) AS BIGINT)
           AS converted_users
FROM (
    SELECT user_id,
           min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
           min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
    FROM events GROUP BY user_id
) u
WHERE t_signup IS NOT NULL
"""


# --- weekly retention cohorts -------------------------------------------------


def retention_weekly(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-active week, with
    the count still active the following week. DISTINCT (user, week)
    activity shuffles once on user_id; the retention check is a left
    self-join on (user, cohort+7d) — co-partitioned on user_id, no
    re-shuffle. Week labels are cast DATE→string for engine-portable
    output formatting."""
    register_views(spark, sf, tables=("events",))
    return spark.sql("""
        WITH wk AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
        ),
        cohort AS (
            SELECT user_id, min(w) AS c FROM wk GROUP BY user_id
        )
        SELECT CAST(CAST(cohort.c AS DATE) AS STRING) AS cohort_week,
               CAST(count(*) AS BIGINT) AS cohort_users,
               CAST(sum(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS retained_next_week
        FROM cohort
        LEFT JOIN wk r
          ON r.user_id = cohort.user_id AND r.w = cohort.c + INTERVAL 7 DAY
        GROUP BY CAST(CAST(cohort.c AS DATE) AS STRING)
    """)


RETENTION_SQL = """
WITH wk AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
),
cohort AS (
    SELECT user_id, min(w) AS c FROM wk GROUP BY user_id
)
SELECT CAST(CAST(cohort.c AS DATE) AS VARCHAR) AS cohort_week,
       CAST(count(*) AS BIGINT) AS cohort_users,
       CAST(sum(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS retained_next_week
FROM cohort
LEFT JOIN wk r
  ON r.user_id = cohort.user_id AND r.w = cohort.c + INTERVAL 7 DAY
GROUP BY CAST(CAST(cohort.c AS DATE) AS VARCHAR)
"""


QUERIES: dict[str, QuerySpec] = {
    "tfidf_top_terms": QuerySpec(tfidf_top_terms, TFIDF_SQL),
    "text_bigram_counts": QuerySpec(text_bigram_counts, BIGRAM_SQL),
    "sample_stratified_hash": QuerySpec(sample_stratified_hash, SAMPLE_STRATIFIED_SQL),
    "vocab_coverage": QuerySpec(vocab_coverage, VOCAB_COVERAGE_SQL),
    "funnel_signup_purchase": QuerySpec(funnel_signup_purchase, FUNNEL_SQL),
    "retention_weekly": QuerySpec(retention_weekly, RETENTION_SQL),
}
