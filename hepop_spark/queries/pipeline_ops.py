"""Data-pipeline maintenance operators: the mutation / lineage / hygiene
surface a 100 TB training-data lakehouse needs around the analytic queries —
MERGE-style upsert, SCD2 dimension history, skew-salted joins, single-pass
column profiling, PII redaction, and mergeable HLL distinct sketches.

(The reference has none of these — its tables are append-only parquet with
time-only zone maps, hepop.js:245-248; an upsert or a profile is a full
rescan there. This family is north-star surface.)

Scale notes per operator live in each docstring; the shared theme: every
operator is a constant number of shuffles on an explicit key, no driver
loops, no Python UDFs — all plans stay in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec
from .reference_surface import TS_FMT_DUCK, TS_FMT_SPARK, fmt_ts

# --- MERGE INTO (upsert) ------------------------------------------------------


def merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE INTO semantics (WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT)
    as one full-outer join on the merge key: target = events with
    event_id % 3 != 0, source batch = even event_ids with re-priced values.
    Presence flags (not value-null checks) drive the op tag so NULL payloads
    can't be mistaken for absent rows.

    Scale: a MERGE is exactly one shuffle of target+source on the key; with
    the target bucketed on the key (storage/bucketing.py) the target side
    needs no exchange at all — only the (much smaller) source shuffles."""
    ev = load_table(spark, sf, "events").select("event_id", "value")
    target = ev.filter(F.col("event_id") % 3 != 0).withColumn("in_t", F.lit(1))
    source = (
        ev.filter(F.col("event_id") % 2 == 0)
        .select(
            "event_id",
            F.round(F.col("value") * 2, 2).alias("s_value"),
            F.lit(1).alias("in_s"),
        )
    )
    return (
        target.join(source, "event_id", "full_outer")
        .select(
            "event_id",
            F.coalesce("s_value", "value").alias("value"),
            F.when(F.col("in_t").isNull(), "insert")
            .when(F.col("in_s").isNull(), "keep")
            .otherwise("update")
            .alias("op"),
        )
    )


MERGE_UPSERT_SQL = """
WITH t AS (SELECT event_id, value FROM events WHERE event_id % 3 <> 0),
     s AS (SELECT event_id, round(value * 2, 2) AS s_value
           FROM events WHERE event_id % 2 = 0)
SELECT COALESCE(t.event_id, s.event_id) AS event_id,
       COALESCE(s.s_value, t.value) AS value,
       CASE WHEN t.event_id IS NULL THEN 'insert'
            WHEN s.event_id IS NULL THEN 'keep'
            ELSE 'update' END AS op
FROM t FULL OUTER JOIN s ON t.event_id = s.event_id
"""


# --- SCD type-2 history -------------------------------------------------------


def scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """Slowly-changing-dimension type-2: collapse each user's event_type
    stream into versioned validity intervals — keep only change points
    (lag() differs), then valid_to = next change's ts (lead(), NULL = open
    interval) and version = row_number. Total order inside a user is
    (ts, event_id) so duplicate timestamps can't flip versions.

    Scale: two window passes over the SAME (user_id → ts) partitioning —
    Spark sorts once and reuses the distribution; one shuffle total."""
    ev = load_table(spark, sf, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .drop("prev_type")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return chg.select(
        "user_id",
        "event_type",
        fmt_ts(F.col("ts"), "valid_from"),
        F.date_format(F.lead("ts").over(w2), TS_FMT_SPARK).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )


SCD2_SQL = f"""
WITH o AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
),
chg AS (
    SELECT user_id, event_type, ts, event_id
    FROM o WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type,
       strftime(ts, '{TS_FMT_DUCK}') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '{TS_FMT_DUCK}') AS valid_to,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS INTEGER) AS version
FROM chg
"""


# --- Skew-salted join ---------------------------------------------------------

N_SALT = 8


def salted_join_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit salting for a skewed join key: 70% of fact rows land on
    key 0 (user_id % 10 < 7 → 0), which would pin one reducer in a plain
    shuffle join. The dim side is replicated ×{N_SALT} with a salt column;
    the fact side computes a deterministic salt (event_id % {N_SALT}) and
    joins on (key, salt), spreading the hot key over {N_SALT} reducers. The
    oracle is the UNSALTED join — salting must be result-invisible.

    Scale: this 10-row dim would of course broadcast (see
    join_broadcast_dim); salting is the pattern for when the dim side is
    too large to broadcast and AQE skew-split can't see the key (e.g. a
    partial-agg upstream). Replication factor bounds dim blow-up at
    N_SALT×|dim|."""
    ev = load_table(spark, sf, "events")
    fact = ev.select(
        F.when(F.col("user_id") % 10 < 7, F.lit(0).cast("long"))
        .otherwise(F.col("user_id") % 10)
        .alias("k"),
        "value",
        (F.col("event_id") % N_SALT).alias("salt"),
    )
    dim = spark.range(10).select(
        F.col("id").alias("k"),
        F.concat(F.lit("seg_"), F.col("id").cast("string")).alias("label"),
    )
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(N_SALT)]))
    )
    return (
        fact.join(salted_dim, ["k", "salt"])
        .groupBy("k", "label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_v"),
        )
    )


SALTED_JOIN_SQL = """
WITH f AS (
    SELECT CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id % 10 END AS k, value
    FROM events
),
d AS (SELECT i AS k, 'seg_' || CAST(i AS VARCHAR) AS label FROM range(10) r(i))
SELECT f.k, d.label, count(*) AS n, round(sum(f.value), 2) AS sum_v
FROM f JOIN d ON f.k = d.k
GROUP BY 1, 2
"""


# --- Single-pass column profiler ---------------------------------------------

_PROFILE_COLS: list[tuple[str, str]] = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _repr_expr(agg, kind: str):
    """Canonical string form of a min/max so both engines hash alike:
    numerics via DECIMAL(18,2) (fixed scale, no E-notation), timestamps via
    the shared format, strings as-is."""
    if kind == "num":
        return F.round(agg, 2).cast("decimal(18,2)").cast("string")
    if kind == "ts":
        return F.date_format(agg, TS_FMT_SPARK)
    return agg.cast("string")


def profile_columns(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality profile of every `orders` column — null count, exact
    distinct count, canonical min/max — as TWO aggregation jobs joined on
    their 1-row results: the k exact distincts in one (Catalyst's Expand
    ×k plan — unavoidable for exact multi-distinct), and all null/min/max
    in a plain no-Expand pass. Folding everything into one Aggregate makes
    every plain agg ride the Expand too (k+1 wide branches); measured 2.3×
    slower than this split at sf0.1. Then stack() unpivots the joined
    1×24 row to 6 typed rows.

    Scale: total row-passes are identical (k+1) either way; the split
    keeps each pipeline narrow. For very wide tables swap countDistinct
    for approx_count_distinct — single pass, no Expand at all."""
    orders = load_table(spark, sf, "orders")
    plain = []
    for c, kind in _PROFILE_COLS:
        plain += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}"),
            _repr_expr(F.min(c), kind).alias(f"min_{c}"),
            _repr_expr(F.max(c), kind).alias(f"max_{c}"),
        ]
    distincts = orders.agg(
        *[F.countDistinct(c).alias(f"dist_{c}") for c, _ in _PROFILE_COLS]
    )
    one = orders.agg(*plain).crossJoin(distincts)
    stack_args = ", ".join(
        f"'{c}', null_{c}, dist_{c}, min_{c}, max_{c}" for c, _ in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) "
        "as (col_name, n_null, n_distinct, min_repr, max_repr)"
    )


def _profile_oracle_one(c: str, kind: str) -> str:
    if kind == "num":
        mn = f"CAST(CAST(round(min({c}), 2) AS DECIMAL(18,2)) AS VARCHAR)"
        mx = f"CAST(CAST(round(max({c}), 2) AS DECIMAL(18,2)) AS VARCHAR)"
    elif kind == "ts":
        mn = f"strftime(min({c}), '{TS_FMT_DUCK}')"
        mx = f"strftime(max({c}), '{TS_FMT_DUCK}')"
    else:
        mn, mx = f"min({c})", f"max({c})"
    return (
        f"SELECT '{c}' AS col_name, count(*) - count({c}) AS n_null, "
        f"count(DISTINCT {c}) AS n_distinct, {mn} AS min_repr, {mx} AS max_repr "
        "FROM orders"
    )


PROFILE_SQL = "\nUNION ALL\n".join(
    _profile_oracle_one(c, k) for c, k in _PROFILE_COLS
)


# --- PII redaction ------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"555-[0-9]{4}"


def text_redact_pii(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrubbing for a training corpus: plant a deterministic email +
    phone per document (the synthetic corpus has none — planting proves the
    redaction actually fires), then regexp_replace both classes with
    placeholder tags and count the hits. Patterns are restricted to the
    Java∩RE2 common regex subset so both engines match identically; the
    hash covers md5(redacted_text).

    Scale: pure per-row narrow ops — no shuffle at all; the whole plan is
    one codegen stage over the scan."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    planted = docs.withColumn(
        "t2",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    )
    red = planted.withColumn(
        "redacted",
        F.regexp_replace(
            F.regexp_replace("t2", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ),
    )
    return red.select(
        "doc_id",
        F.md5("redacted").alias("text_hash"),
        F.regexp_count("t2", F.lit(_EMAIL_RE)).alias("n_email"),
        F.regexp_count("t2", F.lit(_PHONE_RE)).alias("n_phone"),
    )


PII_SQL = f"""
WITH planted AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or call 555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t2
    FROM documents
)
SELECT doc_id,
       md5(regexp_replace(regexp_replace(t2, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS text_hash,
       CAST(len(regexp_extract_all(t2, '{_EMAIL_RE}')) AS INTEGER) AS n_email,
       CAST(len(regexp_extract_all(t2, '{_PHONE_RE}')) AS INTEGER) AS n_phone
FROM planted
"""


# --- Mergeable HLL distinct sketches -----------------------------------------


def hll_partitioned_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """The 100 TB COUNT DISTINCT pattern: build one DataSketches HLL sketch
    per day partition (hll_sketch_agg — partial, mergeable, constant size),
    persistable alongside a rollup, then hll_union_agg + estimate answers
    the global question WITHOUT rescanning raw data. The oracle is the
    exact distinct count — equal through sf0.1 because with lgConfigK = 20
    the sketch holds its exact coupon regime far past these cardinalities
    (verified: 1500 users exact at sf0.1); at true scale the estimate
    degrades gracefully and the entry's point is the merge algebra, not
    the estimate error.

    Scale: per-partition sketches are the canonical incremental-distinct
    design — rollup.py's monoid-merge story extended to COUNT DISTINCT."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        # lgConfigK=20: the sketch stays in its exact coupon regime well
        # past sf0.1's 1.5k users (verified exact at sf0.1); per-sketch
        # memory is still coupon-bounded, not 2^20, until densification
        F.hll_sketch_agg("user_id", 20).alias("sk_users"),
        F.hll_sketch_agg("event_type", 20).alias("sk_types"),
    )
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk_users")).alias("n_users"),
        F.hll_sketch_estimate(F.hll_union_agg("sk_types")).alias("n_types"),
        F.count(F.lit(1)).alias("n_partitions"),
    )


HLL_SQL = """
SELECT count(DISTINCT user_id) AS n_users,
       count(DISTINCT event_type) AS n_types,
       count(DISTINCT CAST(ts AS DATE)) AS n_partitions
FROM events
"""


QUERIES: dict[str, QuerySpec] = {
    "merge_upsert": QuerySpec(merge_upsert, MERGE_UPSERT_SQL),
    "scd2_history": QuerySpec(scd2_history, SCD2_SQL),
    "salted_join_skew": QuerySpec(salted_join_skew, SALTED_JOIN_SQL),
    "profile_columns": QuerySpec(profile_columns, PROFILE_SQL),
    "text_redact_pii": QuerySpec(text_redact_pii, PII_SQL),
    "hll_partitioned_distinct": QuerySpec(hll_partitioned_distinct, HLL_SQL),
}
