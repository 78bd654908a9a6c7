"""Round-3 closing batch: tokenizer vocab-size sweep, deterministic
k-fold assignment, label-aware hard-negative mining, SIP dialog state
folding, and CDC keep-latest dedup.

Engine-parity rules as established: md5-derived determinism, exact
integer counts, unique total orders for every selection, BIGINT casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.vecexpr import dot_cast2, norm2_cast
from . import QuerySpec
from .llm import _tokens

# ---------------------------------------------------------------------------
# vocab_size_sweep — token coverage vs vocabulary size in ONE pass
# ---------------------------------------------------------------------------

VOCAB_SIZES = (5, 10, 15, 20, 25)  # synthetic corpus vocab = 31 types


def vocab_size_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """The tokenizer-design table: for each candidate vocabulary size |V|,
    what fraction of token OCCURRENCES does the top-|V| vocabulary cover?
    Computed in ONE pass — rank the unigram table once (count desc, token
    asc), take the cumulative occurrence sum, and read the coverage at
    each candidate size. The curve that picks the vocab budget before BPE
    training.

    Scale: everything after the unigram aggregate is vocabulary-sized;
    the corpus is scanned once."""
    uni = _tokens(spark, sf).groupBy("tok").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    ranked = uni.withColumn("rk", F.row_number().over(w)).withColumn(
        "cum", F.sum("n").over(wcum)
    )
    tot = uni.agg(F.sum("n").alias("total"), F.count("*").alias("n_types"))
    sizes = F.explode(F.array(*[F.lit(v) for v in VOCAB_SIZES])).alias("vocab_size")
    return (
        ranked.filter(F.col("rk").isin(*VOCAB_SIZES))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("rk").cast("long").alias("vocab_size"),
            F.col("cum").cast("long").alias("occ_covered"),
            F.col("total").cast("long").alias("occ_total"),
            F.round(F.col("cum") / F.col("total"), 6).alias("coverage"),
            F.col("n_types").cast("long").alias("n_types"),
        )
        .orderBy("vocab_size")
    )


VOCAB_SWEEP_SQL = f"""
WITH uni AS (
  SELECT tok, count(*) AS n FROM (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents) GROUP BY tok
), ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rk,
         sum(n) OVER (ORDER BY n DESC, tok) AS cum
  FROM uni
), tot AS (SELECT sum(n) AS total, count(*) AS n_types FROM uni)
SELECT CAST(rk AS BIGINT) AS vocab_size,
       CAST(cum AS BIGINT) AS occ_covered,
       CAST(total AS BIGINT) AS occ_total,
       round(cum * 1.0 / total, 6) AS coverage,
       CAST(n_types AS BIGINT) AS n_types
FROM ranked, tot
WHERE rk IN ({", ".join(str(v) for v in VOCAB_SIZES)})
ORDER BY vocab_size
"""


# ---------------------------------------------------------------------------
# stratified_kfold_assign — deterministic k-fold with balance audit
# ---------------------------------------------------------------------------

KFOLDS = 5


def stratified_kfold_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified k-fold assignment with a content-addressed hash (fold =
    md5(doc_id) mod k within each source stratum) plus the balance audit a
    training pipeline checks before trusting the split: per (source,
    fold) counts and each fold's share of its stratum. No RNG, stable
    under any partitioning/insertion order — re-running on a grown corpus
    moves no existing document.

    Scale: one narrow hash map + one bounded-key groupBy."""
    docs = load_table(spark, sf, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % KFOLDS
    )
    g = docs.select("source", fold.alias("fold")).groupBy("source", "fold").agg(
        F.count("*").alias("n")
    )
    tot = g.groupBy("source").agg(F.sum("n").alias("n_src"))
    return (
        g.join(F.broadcast(tot), "source")
        .select(
            "source",
            F.col("fold").cast("long").alias("fold"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("n_src"), 6).alias("share"),
        )
        .orderBy("source", "fold")
    )


KFOLD_SQL = f"""
WITH g AS (
  SELECT source,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % {KFOLDS} AS fold,
         count(*) AS n
  FROM documents GROUP BY 1, 2
), tot AS (SELECT source, sum(n) AS n_src FROM g GROUP BY source)
SELECT source, CAST(fold AS BIGINT) AS fold, CAST(n AS BIGINT) AS n,
       round(n * 1.0 / n_src, 6) AS share
FROM g JOIN tot USING (source)
ORDER BY source, fold
"""


# ---------------------------------------------------------------------------
# negative_mining_hard — label-aware hard negatives for contrastive training
# ---------------------------------------------------------------------------

HARD_NEG_K = 5


def negative_mining_hard(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector (first 10), the top-k most-similar vectors with a DIFFERENT
    label — the negatives that actually teach the margin, not random ones.
    Exact cosine against the labeled corpus, label-mismatch filter BEFORE
    ranking.

    Scale: anchors broadcast (bounded query set); at full scale the
    candidate stage swaps to the LSH/IVF candidate join exactly like
    ann_*_topk — the ranking and label filter are unchanged."""
    emb = load_table(spark, sf, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("av"),
        F.col("label").alias("a_label"),
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv"),
        F.col("label").alias("n_label"),
    )
    # r12: one-round-trip spellings of the identical expressions (vecexpr)
    dot = dot_cast2("av", "nv")
    norm = lambda c: F.sqrt(norm2_cast(c))  # noqa: E731
    scored = (
        corpus.join(F.broadcast(anchors))
        .filter(F.col("n_label") != F.col("a_label"))
        .withColumn("sim", F.round(dot / (norm("av") * norm("nv")), 4))
    )
    w = Window.partitionBy("a_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= HARD_NEG_K)
        .select(
            "a_id",
            F.col("a_label").cast("long").alias("a_label"),
            "n_id",
            F.col("n_label").cast("long").alias("n_label"),
            "sim",
            "rk",
        )
    )


HARD_NEG_SQL = f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
anchors AS (SELECT vec_id AS a_id, v AS av, label AS a_label FROM emb WHERE vec_id < 10),
corpus AS (SELECT vec_id AS n_id, v AS nv, label AS n_label FROM emb WHERE vec_id >= 10),
scored AS (
  SELECT a.a_id, a.a_label, c.n_id, c.n_label,
         round(list_cosine_similarity(a.av, c.nv), 4) AS sim
  FROM corpus c CROSS JOIN anchors a
  WHERE c.n_label != a.a_label
)
SELECT a_id, CAST(a_label AS BIGINT) AS a_label, n_id,
       CAST(n_label AS BIGINT) AS n_label, sim, rk
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, n_id) AS BIGINT) AS rk
  FROM scored)
WHERE rk <= {HARD_NEG_K}
"""


# ---------------------------------------------------------------------------
# sip_dialog_progress — ordered SIP message folding per dialog
# ---------------------------------------------------------------------------

# deterministic per-dialog message script: which messages exist is a
# function of call_id, so both engines replant identical sequences
_SIP_STATES = ("INVITE", "RINGING", "ANSWERED", "COMPLETED")


def sip_dialog_progress(spark: SparkSession, sf: str) -> DataFrame:
    """SIP dialog state-machine folding: each dialog emits an ordered
    message sequence (INVITE always; 180 RINGING unless call_id%5==0;
    200 OK unless call_id%4==0; BYE only if answered and call_id%3!=0),
    and the fold reduces each dialog to its FURTHEST state reached plus
    timing. Grouped into the dialog-outcome distribution — the state
    funnel of a SIP capture store (vs hep_sip_call_stats' answered-only
    rollup).

    Scale: message explosion is a narrow map (≤4 rows per dialog); the
    fold is one max() per dialog — no window; outcome rollup is a
    bounded-key groupBy."""
    ev = load_table(spark, sf, "events").filter(F.col("event_id") < 3000)
    base = ev.select(F.col("event_id").alias("call_id"))
    # state indices present per dialog
    has_ringing = F.col("call_id") % 5 != 0
    has_answer = F.col("call_id") % 4 != 0
    has_bye = has_answer & (F.col("call_id") % 3 != 0)
    state_idx = F.greatest(
        F.lit(0),
        F.when(has_ringing, 1).otherwise(0),
        F.when(has_answer, 2).otherwise(0),
        F.when(has_bye, 3).otherwise(0),
    )
    states = F.array(*[F.lit(s) for s in _SIP_STATES])
    dialogs = base.select(
        "call_id", F.element_at(states, state_idx + 1).alias("final_state")
    )
    tot = dialogs.agg(F.count("*").alias("total"))
    return (
        dialogs.groupBy("final_state")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "final_state",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
        )
        .orderBy("final_state")
    )


SIP_PROGRESS_SQL = f"""
WITH base AS (
  SELECT event_id AS call_id FROM events WHERE event_id < 3000
), dialogs AS (
  SELECT call_id,
         (['{_SIP_STATES[0]}', '{_SIP_STATES[1]}', '{_SIP_STATES[2]}', '{_SIP_STATES[3]}'])[
           greatest(0,
             CASE WHEN call_id % 5 != 0 THEN 1 ELSE 0 END,
             CASE WHEN call_id % 4 != 0 THEN 2 ELSE 0 END,
             CASE WHEN call_id % 4 != 0 AND call_id % 3 != 0 THEN 3 ELSE 0 END) + 1
         ] AS final_state
  FROM base
), tot AS (SELECT count(*) AS total FROM dialogs)
SELECT final_state, CAST(count(*) AS BIGINT) AS n,
       round(count(*) * 1.0 / total, 6) AS share
FROM dialogs, tot
GROUP BY final_state, total
ORDER BY final_state
"""


# ---------------------------------------------------------------------------
# cdc_keep_latest — change-data-capture keep-latest dedup
# ---------------------------------------------------------------------------


def cdc_keep_latest(spark: SparkSession, sf: str) -> DataFrame:
    """CDC ingest dedup: events carry multiple versions per logical key
    (user_id, event_type); keep each key's LATEST version under the
    unique (ts, event_id) order — the first transformation every CDC
    consumer applies before a merge. Emits the surviving row plus how
    many versions it superseded.

    Scale: ONE max_by hash aggregation per key (the same shuffle a MERGE
    would need anyway, now with map-side combine and no per-key sort); no
    driver state. With a bucketed target table the shuffle disappears
    (storage/bucketing.py)."""
    ev = load_table(spark, sf, "events")
    # latest version per key: max_by over (ts, event_id) + count in ONE
    # partial-combinable aggregation — replaces a rank window + count
    # window (two per-key sorts of every version) with a hash agg, the
    # shape that survives a 100x version-history blowup
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.max_by(
                F.struct("event_id", "value"),
                F.struct(F.col("ts"), F.col("event_id")),
            ).alias("b"),
            F.count("*").alias("n_versions"),
        )
        .select(
            "user_id",
            "event_type",
            F.col("b.event_id").alias("latest_event_id"),
            F.round(F.col("b.value") * 100).cast("long").alias("latest_cents"),
            F.col("n_versions").cast("long").alias("n_versions"),
        )
    )


CDC_LATEST_SQL = """
SELECT user_id, event_type, event_id AS latest_event_id,
       CAST(round(value * 100) AS BIGINT) AS latest_cents,
       CAST(n_versions AS BIGINT) AS n_versions
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rk,
         count(*) OVER (PARTITION BY user_id, event_type) AS n_versions
  FROM events)
WHERE rk = 1
"""


QUERIES: dict[str, QuerySpec] = {
    "vocab_size_sweep": QuerySpec(
        vocab_size_sweep, VOCAB_SWEEP_SQL,
        "token coverage vs vocabulary size, one corpus pass",
    ),
    "stratified_kfold_assign": QuerySpec(
        stratified_kfold_assign, KFOLD_SQL,
        "content-addressed stratified k-fold with balance audit",
    ),
    "negative_mining_hard": QuerySpec(
        negative_mining_hard, HARD_NEG_SQL,
        "label-aware hard negatives: top-k similar with different label",
    ),
    "sip_dialog_progress": QuerySpec(
        sip_dialog_progress, SIP_PROGRESS_SQL,
        "SIP dialog state-machine fold to outcome distribution",
    ),
    "cdc_keep_latest": QuerySpec(
        cdc_keep_latest, CDC_LATEST_SQL,
        "CDC keep-latest per key under a unique version order",
    ),
}
