"""Round-6 extension batch: blocked edit-distance dedup, a full Lloyd
k-means step on an exact integer grid, and incremental maintenance of the
persisted IVF-PQ index.

Three capabilities the inventory did not yet cover as first-class judged
entries:

- ``dedup_edit_distance`` — character-level near-duplicate detection
  (the classic record-linkage tolerance the MinHash/SimHash family does
  NOT give: token-set similarity is blind to small in-place edits that
  keep token multisets different). Blocked self-join + Levenshtein.
- ``kmeans_lloyd_iter`` — one FULL Lloyd iteration (E-step assignment
  plus M-step centroid recomputation and per-cluster movement), the step
  `kmeans_assign` stops short of; all M-step arithmetic on an exact
  integer ten-thousandths grid so the shuffled sums are order-free.
- ``ann_ivfpq_append_topk`` — incremental maintenance of the persisted
  IVF-PQ index (operators/pq_index.py): a late-arriving ingest batch is
  encoded with the FROZEN codebook built from the base corpus and its
  codes published as an append-only sibling of the base code table; the
  query path scans base+appended codes as one store. This is the ANN
  analogue of `dedup_streaming_accumulate`'s appendable band store —
  the index keeps serving while the corpus grows, with no re-encode of
  the base.

Reference scope: north-star extensions — the reference stores opaque
payloads (hepop.js:183) and has no vector or text pipeline; these extend
the curation/ANN suite (SURVEY §2 LLM-pipeline block).

Engine-parity rules as established: Levenshtein is the classic DP on both
engines (verified identical); all k-means M-step sums are BIGINT on the
floor(x*1e4+0.5) grid (the SQ8 quantize rule) with HUGEINT/DECIMAL(38,0)
accumulation for the squared movement (table_checksum rule); the append
oracle is DERIVED from IVFPQ_ORACLE_SQL by one string substitution so the
two can never desynchronize on a constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec
from .mining_q import KMEANS_K
from .scale_paths import (
    IVF_CELLS,
    IVF_NPROBE,
    IVFPQ_ORACLE_SQL,
    IVFPQ_SHORT,
    PQ_K,
    PQ_M,
    PQ_SUB,
)

# ---------------------------------------------------------------------------
# dedup_edit_distance — blocked Levenshtein near-duplicate pairs
# ---------------------------------------------------------------------------

EDIT_CAP = 120   # compare prefix length: bounds the O(cap^2) DP per pair
EDIT_TAU = 40    # keep pairs within this distance on the capped prefix
EDIT_PFX = 16    # blocking: identical 16-char prefix ...
EDIT_LEN_BUCKET = 8  # ... and same n_chars DIV 8 length bucket


def dedup_edit_distance(spark: SparkSession, sf: str) -> DataFrame:
    """Character-level near-duplicate pairs via blocked Levenshtein — the
    tolerance class the shingle family can't express (a 1-char in-place
    edit changes every k-gram that crosses it, but moves edit distance by
    1). Candidate generation is a BLOCKED self equi-join — (16-char
    prefix, n_chars DIV 8) — so no cross join ever forms; the quadratic
    DP runs only inside blocks, on a capped 120-char prefix.

    Recall contract (documented, standard for blocking): pairs whose
    edits touch the first 16 chars or move length across a bucket
    boundary are not candidates — blocking trades exhaustiveness for a
    shuffle-join shape that survives any corpus size. Block size is
    bounded by the duplication multiplicity of a (prefix, length) key,
    not the corpus.

    Output: candidate pairs (a < b) with capped-prefix distance <= 40,
    plus both lengths — the reviewable near-dup worklist."""
    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        "n_chars",
        F.substring("text", 1, EDIT_PFX).alias("pfx"),
        (F.col("n_chars") / EDIT_LEN_BUCKET).cast("long").alias("lb"),
        F.substring("text", 1, EDIT_CAP).alias("head"),
    )
    a = docs.select(
        F.col("doc_id").alias("doc_a"), "pfx", "lb",
        F.col("head").alias("head_a"), F.col("n_chars").alias("len_a"),
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"), "pfx", "lb",
        F.col("head").alias("head_b"), F.col("n_chars").alias("len_b"),
    )
    return (
        a.join(b, ["pfx", "lb"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("edit_dist", F.levenshtein("head_a", "head_b").cast("long"))
        .filter(F.col("edit_dist") <= EDIT_TAU)
        .select("doc_a", "doc_b", "edit_dist", "len_a", "len_b")
    )


EDIT_DIST_SQL = f"""
WITH d AS (
  SELECT doc_id, n_chars,
         substr(text, 1, {EDIT_PFX}) AS pfx,
         n_chars // {EDIT_LEN_BUCKET} AS lb,
         substr(text, 1, {EDIT_CAP}) AS head
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist,
       a.n_chars AS len_a, b.n_chars AS len_b
FROM d a JOIN d b ON a.pfx = b.pfx AND a.lb = b.lb AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= {EDIT_TAU}
"""


# ---------------------------------------------------------------------------
# kmeans_lloyd_iter — one full Lloyd iteration on an exact integer grid
# ---------------------------------------------------------------------------

EMB_DIM = PQ_M * PQ_SUB  # 64, same constant chain as the PQ entries


def kmeans_lloyd_iter(spark: SparkSession, sf: str) -> DataFrame:
    """One FULL Lloyd iteration: E-step nearest-centroid assignment (same
    deterministic first-K centroids and rounded-distance key as
    `kmeans_assign`) then the M-step — per-cluster member counts and the
    squared movement of each centroid after recomputation — the
    convergence signal a k-means driver loops on.

    All M-step arithmetic is EXACT: member coordinates quantized to the
    integer ten-thousandths grid with floor(x*1e4+0.5) (the SQ8 rule —
    F.round/round() HALF_UP vs raw-bits differ on this grid), per-(cluster,
    dim) BIGINT sums (order-free under any shuffle), and movement as
    sum_d (sum_q_d - n*oldq_d)^2 — the grid-scaled squared L2 between the
    new mean and the old centroid, times n^2, kept integral so no float
    mean is ever materialized. The squared terms accumulate in
    DECIMAL(38,0)/HUGEINT (table_checksum rule: BIGINT^2 sums overflow at
    corpus scale) and the final value is cast back to BIGINT.

    E-step is the broadcast-centroids corpus scan of kmeans_assign
    (min_by over (dist, cluster) — partial-combinable, no window); M-step
    is one posexplode (64 rows/vector) + two hash aggregations."""
    emb = load_table(spark, sf, "embeddings").withColumn(
        "vec", F.expr("transform(embedding, x -> cast(x AS double))")
    )
    cent = emb.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cluster_id"), F.col("vec").alias("cvec")
    )
    d2 = (
        "aggregate(zip_with(vec, cvec, (x, y) -> (x - y) * (x - y)),"
        " 0D, (acc, x) -> acc + x)"
    )
    # E-step: argmin over (rounded dist, cluster_id) — min_by over a
    # struct is partial-combinable (no per-key sort, map-side combine)
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("dist", F.round(F.sqrt(F.expr(d2)), 4))
        .groupBy("vec_id")
        .agg(
            F.min_by("cluster_id", F.struct("dist", "cluster_id")).alias("cluster_id")
        )
        .join(emb.select("vec_id", "vec"), "vec_id")
    )
    # M-step on the integer grid: per-(cluster, dim) exact sums
    per_cd = (
        assign.select(
            "cluster_id",
            F.posexplode(
                F.expr("transform(vec, x -> cast(floor(x * 10000 + 0.5) as bigint))")
            ).alias("d", "q"),
        )
        .groupBy("cluster_id", "d")
        .agg(F.sum("q").alias("sum_q"), F.count("*").alias("n"))
    )
    old_cd = cent.select(
        "cluster_id",
        F.posexplode(
            F.expr("transform(cvec, x -> cast(floor(x * 10000 + 0.5) as bigint))")
        ).alias("d", "oq"),
    )
    diff = (F.col("sum_q") - F.col("n") * F.col("oq")).cast("decimal(38,0)")
    return (
        per_cd.join(old_cd, ["cluster_id", "d"])
        .groupBy("cluster_id")
        .agg(
            F.max("n").cast("long").alias("n_members"),
            F.sum(diff * diff).cast("long").alias("movement_sq"),
        )
        .select("cluster_id", "n_members", "movement_sq")
    )


KMEANS_LLOYD_SQL = f"""
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
),
cent AS (
  SELECT vec_id AS cluster_id, vec AS cvec FROM emb WHERE vec_id < {KMEANS_K}
),
assign AS (
  SELECT vec_id, cluster_id FROM (
    SELECT e.vec_id, c.cluster_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_distance(e.vec, c.cvec), 4), c.cluster_id) AS rk
    FROM emb e CROSS JOIN cent c) WHERE rk = 1
),
dims AS (SELECT CAST(unnest(range(1, {EMB_DIM} + 1)) AS INTEGER) AS di),
per_cd AS (
  SELECT a.cluster_id, di - 1 AS d,
         sum(CAST(floor(e.vec[di] * 10000 + 0.5) AS BIGINT)) AS sum_q,
         count(*) AS n
  FROM assign a JOIN emb e USING (vec_id) CROSS JOIN dims
  GROUP BY 1, 2
),
old_cd AS (
  SELECT cluster_id, di - 1 AS d,
         CAST(floor(cvec[di] * 10000 + 0.5) AS BIGINT) AS oq
  FROM cent CROSS JOIN dims
)
SELECT p.cluster_id,
       CAST(max(p.n) AS BIGINT) AS n_members,
       CAST(sum(CAST(p.sum_q - p.n * o.oq AS HUGEINT)
                * (p.sum_q - p.n * o.oq)) AS BIGINT) AS movement_sq
FROM per_cd p JOIN old_cd o ON p.cluster_id = o.cluster_id AND p.d = o.d
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# ann_ivfpq_append_topk — incremental maintenance of the persisted index
# ---------------------------------------------------------------------------

APP_MOD = 7  # corpus vectors with c_id % 7 == 3 "arrive later" as a batch


def ann_ivfpq_append_topk(spark: SparkSession, sf: str) -> DataFrame:
    """ANN top-k over an INCREMENTALLY MAINTAINED persisted IVF-PQ index:
    the base corpus (c_id % 7 != 3) is indexed once; the late batch
    (c_id % 7 == 3) is encoded with the FROZEN base codebook/centroids and
    its codes published as an append-only sibling partition of the code
    table (operators/pq_index.py:ivfpq_append_batch — atomic rename, no-op
    on redelivery). The query path scans base + appended codes as ONE
    store and reranks against the full corpus.

    This is the index-maintenance shape a 100 TB ingest actually runs:
    growing the corpus costs ONE encode pass over the new batch (frozen
    codebook — the FAISS `add` contract), never a re-encode of what is
    already indexed, and queries see the union immediately. The ANN
    analogue of the appendable MinHash band store
    (`dedup_streaming_accumulate`).

    The oracle is IVFPQ_ORACLE_SQL with its codebook sample drawn from
    the base slice only (one derived substitution below) — encode math,
    ADC fold, shortlist and rerank are expression-for-expression the
    flagship's, so a drift between the frozen-codebook append path and
    the from-scratch replay cannot pass."""
    from ..operators.pq_index import (
        build_ivfpq_index,
        ivfpq_append_batch,
        ivfpq_index_path,
        ivfpq_topk_from_index,
    )

    emb = load_table(spark, sf, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv")
    )
    base = corpus.filter(F.col("c_id") % APP_MOD != 3)
    batch = corpus.filter(F.col("c_id") % APP_MOD == 3)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    path = ivfpq_index_path(sf, f"app{APP_MOD}m{PQ_M}k{PQ_K}c{IVF_CELLS}")
    build_ivfpq_index(
        spark, base, path,
        n_cells=IVF_CELLS, m_sub=PQ_M, sub=PQ_SUB, k_codes=PQ_K,
    )
    ivfpq_append_batch(
        spark, batch, path, m_sub=PQ_M, sub=PQ_SUB, batch_id="b1",
    )
    return ivfpq_topk_from_index(
        spark, queries, corpus, path,
        m_sub=PQ_M, sub=PQ_SUB, nprobe=IVF_NPROBE,
        shortlist=IVFPQ_SHORT, top_k=5,
    )


# Derived, not copied: the append oracle IS the flagship oracle with the
# codebook sample restricted to the base slice. A constant change in
# scale_paths propagates here automatically; the assert makes a silent
# non-substitution (e.g. after an oracle rewrite) a loud import error.
_SAMP_FROM = f"FROM corpus ORDER BY md5(CAST(c_id AS VARCHAR)) LIMIT {PQ_K}"
_SAMP_TO = (
    f"FROM corpus WHERE c_id % {APP_MOD} != 3 "
    f"ORDER BY md5(CAST(c_id AS VARCHAR)) LIMIT {PQ_K}"
)
assert _SAMP_FROM in IVFPQ_ORACLE_SQL, "flagship oracle changed; re-derive"
IVFPQ_APPEND_SQL = IVFPQ_ORACLE_SQL.replace(_SAMP_FROM, _SAMP_TO, 1)


DEL_MOD = 11  # corpus vectors with c_id % 11 == 5 are deleted post-build


def ann_ivfpq_delete_topk(spark: SparkSession, sf: str) -> DataFrame:
    """ANN top-k over a persisted IVF-PQ index WITH DEFERRED DELETES: the
    full corpus is indexed, then a slice (c_id % 11 == 5) is deleted by
    publishing a tombstone set (operators/pq_index.py:ivfpq_delete_ids —
    metadata only, the code table is not rewritten). Queries exclude
    tombstoned candidates at the code scan, so the delete is visible on
    the very next query; `ivfpq_compact_store` later folds tombstones
    into a rewritten code table (atomic swap) with query results
    invariant across the swap — the defer-then-merge ladder the parquet
    store runs (storage/compaction.py), applied to the ANN index. With
    `ann_ivfpq_append_topk` this closes the index lifecycle: add, delete,
    compact, all without re-encoding what is already indexed.

    Oracle: the flagship replay with deleted ids excluded from the ADC
    candidate set (one derived substitution below) — codebook and coarse
    assignment still see the full corpus, exactly as an index built
    before the delete does."""
    from ..operators.pq_index import (
        build_ivfpq_index,
        ivfpq_delete_ids,
        ivfpq_index_path,
        ivfpq_topk_from_index,
    )

    emb = load_table(spark, sf, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv")
    )
    deleted = corpus.filter(F.col("c_id") % DEL_MOD == 5).select("c_id")
    live = corpus.filter(F.col("c_id") % DEL_MOD != 5)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    path = ivfpq_index_path(sf, f"del{DEL_MOD}m{PQ_M}k{PQ_K}c{IVF_CELLS}")
    build_ivfpq_index(
        spark, corpus, path,
        n_cells=IVF_CELLS, m_sub=PQ_M, sub=PQ_SUB, k_codes=PQ_K,
    )
    ivfpq_delete_ids(spark, deleted, path, batch_id="d1")
    return ivfpq_topk_from_index(
        spark, queries, live, path,
        m_sub=PQ_M, sub=PQ_SUB, nprobe=IVF_NPROBE,
        shortlist=IVFPQ_SHORT, top_k=5,
    )


# Derived like the append oracle: deleted ids drop out of the candidate
# set (the code-scan exclusion); codebook/assignment replay the
# full-corpus build exactly as an index built before the delete does.
_CAND_FROM = "FROM qprobe p JOIN cassign a USING (cell)"
_CAND_TO = (
    f"FROM qprobe p JOIN cassign a USING (cell)\n"
    f"  WHERE a.c_id % {DEL_MOD} != 5"
)
assert _CAND_FROM in IVFPQ_ORACLE_SQL, "flagship oracle changed; re-derive"
IVFPQ_DELETE_SQL = IVFPQ_ORACLE_SQL.replace(_CAND_FROM, _CAND_TO, 1)


QUERIES: dict[str, QuerySpec] = {
    "dedup_edit_distance": QuerySpec(
        dedup_edit_distance, EDIT_DIST_SQL,
        doc="blocked Levenshtein near-duplicate pairs (prefix+length "
            "blocking, capped-DP compare)",
    ),
    "kmeans_lloyd_iter": QuerySpec(
        kmeans_lloyd_iter, KMEANS_LLOYD_SQL,
        doc="one full Lloyd k-means iteration: assignment + exact "
            "integer-grid centroid movement",
    ),
    "ann_ivfpq_append_topk": QuerySpec(
        ann_ivfpq_append_topk, IVFPQ_APPEND_SQL,
        doc="ANN over an incrementally-appended persisted IVF-PQ index "
            "(frozen-codebook batch encode)",
    ),
    "ann_ivfpq_delete_topk": QuerySpec(
        ann_ivfpq_delete_topk, IVFPQ_DELETE_SQL,
        doc="ANN over a persisted IVF-PQ index with deferred deletes "
            "(tombstone scan-exclusion; compaction folds them in)",
    ),
}
