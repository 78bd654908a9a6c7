"""Round-7 LLM-pipeline batch: index maintenance driven FROM the
streaming ingest path.

Round 6 left a gap the verdict named (next-round item 3): the appendable
MinHash band store and the IVF-PQ lifecycle existed, but nothing fed them
from the streaming sinks — a serve-mode corpus grew while its indexes went
stale. streaming/index_maint.py closes that with per-batch index hooks;
this module pins the end-to-end behavior under the oracle gate:
`streaming_index_maintain_replay` lands the documents corpus through a
REAL Structured Streaming query (file source, maxFilesPerTrigger=1 →
one micro-batch per arriving file, foreachBatch sink appending parquet +
running the MinHash maintenance hook), then answers a dedup query WARM
from the maintained store — and the from-scratch DuckDB oracle must agree.

Reference scope: north-star extension (the reference has no secondary
indexes); the micro-batch flush discipline is the reference's own buffer
model (hepop.js:12 flushInterval) carried through to derived artifacts.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import local_result, load_table
from ..operators.vecexpr import dot_cast2, norm2_cast
from . import QuerySpec
from .llm import MINHASH_BAND_ROWS, MINHASH_SEEDS
from .llm11 import _exact_best_match, _stream_accum_sql

# distinct from llm11.STREAM_BATCHES=5 so the two entries' oracles differ
# (different batch partition → different candidate restriction)
MAINT_BATCHES = 4


def streaming_index_maintain_replay(spark: SparkSession, sf: str) -> DataFrame:
    """Documents arrive as MAINT_BATCHES parquet files in a landing dir; a
    Structured Streaming query (readStream + maxFilesPerTrigger=1 +
    availableNow) drains them one micro-batch per file through
    streaming/index_maint.table_sink, which appends each batch to the
    corpus table AND runs the minhash_maintenance hook — so the band store
    advances in lock-step with the corpus, exactly what a live serve
    process does. The dedup answer is then computed WARM from (a) the
    corpus AS WRITTEN BY THE SINK and (b) the maintained band store: best
    earlier-batch match per doc (batch = doc_id % MAINT_BATCHES, candidates
    restricted to batch(new) > batch(old), exact-Jaccard verified,
    threshold 0.5). The oracle re-derives everything from the raw
    documents table — a sink that dropped rows, an unfired hook, or a
    stale/corrupt band batch all fail the gate.

    Scale: the stream signs each batch ONCE (hook work ~ |batch|); the
    warm query joins the 3-column band scan against itself on (band, bkey)
    with the batch inequality inside the join — no text rescan outside the
    candidate-bounded verification. The landing/replay loop is over a
    FIXED small file count, not data."""
    from ..operators.minhash_index import minhash_store_bands
    from ..streaming.index_maint import (
        minhash_maintenance,
        stage_batch_files,
        table_sink,
    )

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="maint_replay_")
    landing = os.path.join(root, "landing")
    base = os.path.join(root, "tables")
    store = os.path.join(root, "bands_store")
    try:
        # one parquet file per micro-batch (batch tag = doc_id % N; the
        # final answer keys on the DATA-borne tag, so file arrival order
        # cannot change the result — append order is a monoid)
        stage_batch_files(
            docs, landing, F.col("doc_id") % MAINT_BATCHES, MAINT_BATCHES
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        hook = minhash_maintenance(
            store, table="documents",
            n_seeds=MINHASH_SEEDS, band_rows=MINHASH_BAND_ROWS,
        )
        q = table_sink(
            stream, base, os.path.join(root, "ckpt"), "documents",
            index_hooks=[hook],
        ).start()
        q.awaitTermination()

        # warm answer: corpus as the SINK committed it (exactly-once batch
        # dirs), bands as the HOOK maintained them — the entry fails if
        # either path lost or duplicated rows
        from ..streaming.exactly_once import read_committed

        corpus = read_committed(spark, os.path.join(base, "documents"))
        bands = minhash_store_bands(spark, store)
        bt = (F.col("doc_id") % MAINT_BATCHES).alias("bt")
        nb = bands.select(F.col("doc_id").alias("new_doc"), bt.alias("nbt"),
                          "band", "bkey")
        ib = bands.select(F.col("doc_id").alias("old_doc"), bt.alias("obt"),
                          "band", "bkey")
        pairs = (
            nb.join(ib, ["band", "bkey"])
            .filter(F.col("nbt") > F.col("obt"))
            .select("new_doc", "old_doc")
            .distinct()
        )
        rows = (
            _exact_best_match(corpus, pairs, "new_doc", "old_doc")
            .select(
                "new_doc",
                "old_doc",
                (F.col("old_doc") % MAINT_BATCHES).cast("long")
                .alias("match_batch"),
                "jaccard",
            )
            .collect()
        )
        return local_result(spark, 
            rows,
            "new_doc bigint, old_doc bigint, match_batch bigint, jaccard double",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# streaming_ann_maintain_replay — the ANN twin: IVF-PQ maintained by the
# streaming sink's hook (train on the first batch, frozen-codebook appends)
# ---------------------------------------------------------------------------

ANN_MAINT_BATCHES = 4


def streaming_ann_maintain_replay(spark: SparkSession, sf: str) -> DataFrame:
    """ANN top-k over an IVF-PQ index MAINTAINED BY THE STREAMING PATH:
    the corpus arrives as ANN_MAINT_BATCHES micro-batches (one file per
    trigger); streaming/index_maint.ivfpq_maintenance trains and
    publishes the index from the FIRST batch, then encodes every later
    batch with the frozen codebook as append-only code segments (the
    FAISS train-once/add-forever shape, now driven by foreachBatch
    instead of a manual lifecycle call — the gap r06 verdict item 3
    named). The query scans the maintained store and reranks against the
    full corpus.

    Oracle: the flagship IVF-PQ replay with its codebook sample drawn
    from the first batch's slice only (one derived substitution, the
    llm13 discipline) — encode math, ADC fold, shortlist and rerank are
    expression-for-expression the flagship's, so drift between the
    hook-maintained index and the from-scratch replay cannot pass.

    Scale: per batch, the hook's work is one encode pass over the batch
    against broadcast artifacts; the store grows by 8-byte codes. Query
    cost is the flagship's: partition-pruned code scan + broadcast ADC
    LUT + bounded exact rerank."""
    from ..operators.pq_index import ivfpq_topk_from_index
    from ..streaming.index_maint import ivfpq_maintenance, table_sink
    from .scale_paths import IVF_CELLS, IVF_NPROBE, IVFPQ_SHORT, PQ_K, PQ_M, PQ_SUB

    emb = load_table(spark, sf, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv")
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    from ..streaming.index_maint import stage_batch_files

    vec_type = emb.schema["embedding"].dataType.simpleString()
    root = tempfile.mkdtemp(prefix="ann_maint_")
    landing = os.path.join(root, "landing")
    idx = os.path.join(root, "ivfpq_idx")
    try:
        # batch 0 lands first (stage_batch_files orders file mtimes) —
        # it trains the index; later batches append with the frozen book
        stage_batch_files(
            corpus, landing, F.col("c_id") % ANN_MAINT_BATCHES,
            ANN_MAINT_BATCHES,
        )
        stream = (
            spark.readStream.schema(f"c_id long, cv {vec_type}")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        hook = ivfpq_maintenance(
            idx, table="vectors", id_col="c_id", vec_col="cv",
            n_cells=IVF_CELLS, m_sub=PQ_M, sub=PQ_SUB, k_codes=PQ_K,
        )
        q = table_sink(
            stream, os.path.join(root, "tables"), os.path.join(root, "ckpt"),
            "vectors", index_hooks=[hook],
        ).start()
        q.awaitTermination()
        rows = ivfpq_topk_from_index(
            spark, queries, corpus, idx,
            m_sub=PQ_M, sub=PQ_SUB, nprobe=IVF_NPROBE,
            shortlist=IVFPQ_SHORT, top_k=5,
        ).collect()
        return local_result(spark, 
            rows, "q_id bigint, c_id bigint, sim double, rk bigint"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _stream_ann_sql() -> str:
    """Derived, not copied (llm13 discipline): the flagship oracle with
    the codebook sample restricted to the first batch's slice. The assert
    makes a silent non-substitution a loud import error."""
    from .scale_paths import IVFPQ_ORACLE_SQL, PQ_K

    samp_from = f"FROM corpus ORDER BY md5(CAST(c_id AS VARCHAR)) LIMIT {PQ_K}"
    samp_to = (
        f"FROM corpus WHERE c_id % {ANN_MAINT_BATCHES} = 0 "
        f"ORDER BY md5(CAST(c_id AS VARCHAR)) LIMIT {PQ_K}"
    )
    assert samp_from in IVFPQ_ORACLE_SQL, "flagship oracle changed; re-derive"
    return IVFPQ_ORACLE_SQL.replace(samp_from, samp_to, 1)


# ---------------------------------------------------------------------------
# streaming_lsh_maintain_replay — the sign-LSH twin (r07 verdict item 2):
# the appendable bucket store maintained by the streaming sink's hook
# ---------------------------------------------------------------------------

LSH_MAINT_BATCHES = 3


def streaming_lsh_maintain_replay(spark: SparkSession, sf: str) -> DataFrame:
    """Cosine range search answered WARM from a sign-LSH bucket store
    MAINTAINED BY THE STREAMING PATH: vectors arrive as LSH_MAINT_BATCHES
    micro-batches (one file per trigger) through
    streaming/index_maint.table_sink; the lsh_maintenance hook encodes
    each batch against the deterministic plane family and publishes it as
    an immutable `batch=<id>/` segment (operators/lsh_index.
    lsh_store_append) — no training batch, no frozen artifacts: the store
    after any prefix of batches equals the from-scratch build over those
    batches' vectors. The query is lsh_range_search's candidate equi-join
    over the maintained buckets, restricted to CROSS-BATCH pairs (the
    decontamination shape: new arrivals vs the older corpus), verified by
    exact cosine against the corpus AS THE SINK COMMITTED IT — a dropped
    row, an unfired hook or a duplicated segment all fail the gate.

    Oracle: the flagship range-search oracle with the cross-batch
    predicate added by one asserted substitution (the llm13 discipline) —
    bucket math, candidate rule and verification are expression-for-
    expression the flagship's.

    Scale: hook work per trigger is one narrow encode of the arriving
    batch (4 tables x 8 planes of zip_with dot products, JVM-side); the
    warm query never rescans vectors outside the candidate-bounded
    verification."""
    from ..operators.lsh_index import lsh_store_scan
    from ..streaming.exactly_once import read_committed
    from ..streaming.index_maint import (
        lsh_maintenance,
        stage_batch_files,
        table_sink,
    )
    from .llm6 import RANGE_BITS, RANGE_TABLES, RANGE_TAU

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    vec_type = emb.schema["embedding"].dataType.simpleString()
    root = tempfile.mkdtemp(prefix="lsh_maint_")
    landing = os.path.join(root, "landing")
    store = os.path.join(root, "lsh_store")
    try:
        stage_batch_files(
            emb, landing, F.col("vec_id") % LSH_MAINT_BATCHES,
            LSH_MAINT_BATCHES,
        )
        stream = (
            spark.readStream.schema(f"vec_id long, embedding {vec_type}")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        hook = lsh_maintenance(
            store, table="vectors",
            k_bits=RANGE_BITS, n_tables=RANGE_TABLES,
        )
        q = table_sink(
            stream, os.path.join(root, "tables"), os.path.join(root, "ckpt"),
            "vectors", index_hooks=[hook],
        ).start()
        q.awaitTermination()

        corpus = read_committed(spark, os.path.join(root, "tables", "vectors"))
        buck = lsh_store_scan(spark, store)
        left = buck.select(F.col("vec_id").alias("a_id"), "tbl", "bucket")
        right = buck.select(F.col("vec_id").alias("b_id"), "tbl", "bucket")
        cand = (
            left.join(right, ["tbl", "bucket"])
            .filter(
                (F.col("a_id") < F.col("b_id"))
                & ((F.col("a_id") % LSH_MAINT_BATCHES)
                   != (F.col("b_id") % LSH_MAINT_BATCHES))
            )
            .select("a_id", "b_id")
            .distinct()
        )
        vecs = corpus.select("vec_id", "embedding")
        # r12: one-round-trip spellings of the identical expressions
        dot = dot_cast2("va", "vb")
        norm = lambda c: F.sqrt(norm2_cast(c))  # noqa: E731
        rows = (
            cand.join(vecs.select(F.col("vec_id").alias("a_id"),
                                  F.col("embedding").alias("va")), "a_id")
            .join(vecs.select(F.col("vec_id").alias("b_id"),
                              F.col("embedding").alias("vb")), "b_id")
            .withColumn("sim", F.round(dot / (norm("va") * norm("vb")), 4))
            .filter(F.col("sim") >= RANGE_TAU)
            .select("a_id", "b_id", "sim")
            .collect()
        )
        return local_result(spark, 
            rows, "a_id bigint, b_id bigint, sim double"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _stream_lsh_sql() -> str:
    """Derived from the flagship range-search oracle by ONE asserted
    substitution: the cross-batch candidate predicate."""
    from .llm6 import _range_oracle_sql

    base = _range_oracle_sql()
    old = "WHERE a.vec_id < b.vec_id"
    new = (
        f"{old} AND (a.vec_id % {LSH_MAINT_BATCHES}) "
        f"<> (b.vec_id % {LSH_MAINT_BATCHES})"
    )
    assert base.count(old) == 1, "flagship oracle changed; re-derive"
    return base.replace(old, new, 1)


# ---------------------------------------------------------------------------
# theta_sketch_setops — KMV (k-minimum-values) sketch set operations
# ---------------------------------------------------------------------------

THETA_K = 256
_H48 = float(1 << 48)  # 48-bit hash fraction denominator (exact power of 2)


def theta_sketch_setops(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct-count SET OPERATIONS on KMV/theta sketches — the
    cross-dataset overlap estimator a 100 TB curation pipeline runs
    instead of a distinct-join: two document subsets (A = doc_id % 2 = 0,
    B = doc_id % 3 = 0, overlapping by construction) are sketched as
    their k smallest DISTINCT 48-bit content-hash values (TakeOrdered —
    k rows of state per set regardless of set size; the bottom-k merge
    monoid proven by bottomk_sample_merge makes the sketch shard-local).
    Union estimate = (k-1)/theta with theta = the union sketch's k-th
    smallest hash as a fraction of hash space; intersection estimate =
    |sk_A ∩ sk_B below theta| * union_est / k — below the union
    threshold, sketch membership IS set membership (every A-hash ≤
    theta_A is in sk_A and theta_A >= theta_union), so after the two
    bottom-k scans every set operation is k-row arithmetic; the raw
    sets are never co-shuffled or re-scanned. Exact counts ride along
    so the judged row pins
    BOTH the estimator arithmetic and its inputs; every step is
    deterministic (md5, exact 48-bit integers, one IEEE division), so
    the DuckDB oracle replays it bit-for-bit.

    Scale: sketch state is k rows per set; set ops cost O(k) after two
    narrow scans. The exact columns are the expensive part — a real
    deployment drops them and keeps only the sketches."""
    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        F.conv(F.substring(F.md5("text"), 1, 12), 16, 10)
        .cast("long").alias("h"),
    )
    a = docs.filter(F.col("doc_id") % 2 == 0).select("h").distinct()
    b = docs.filter(F.col("doc_id") % 3 == 0).select("h").distinct()
    sk_a = a.orderBy("h").limit(THETA_K)
    sk_b = b.orderBy("h").limit(THETA_K)
    union_sk = sk_a.union(sk_b).distinct().orderBy("h").limit(THETA_K)
    # theta = k-th smallest union hash / 2^48 (exact integer, exact /2^48)
    kth = union_sk.agg(F.max("h").alias("kth"))
    matches = (
        sk_a.join(sk_b, "h")
        .crossJoin(kth)
        .filter(F.col("h") <= F.col("kth"))
        .agg(F.count("*").alias("c"))
    )
    exact = (
        a.withColumn("s", F.lit("a"))
        .unionByName(b.withColumn("s", F.lit("b")))
        .agg(
            F.countDistinct("h").alias("union_exact"),
            (F.countDistinct(F.when(F.col("s") == "a", F.col("h")))
             + F.countDistinct(F.when(F.col("s") == "b", F.col("h")))
             - F.countDistinct("h")).alias("inter_exact"),
        )
    )
    est = (
        kth.crossJoin(matches)
        .select(
            F.lit(THETA_K).cast("int").alias("k"),
            (F.lit(float(THETA_K - 1)) / (F.col("kth") / F.lit(_H48)))
            .alias("union_est"),
            (
                F.col("c")
                * (F.lit(float(THETA_K - 1)) / (F.col("kth") / F.lit(_H48)))
                / F.lit(float(THETA_K))
            ).alias("inter_est"),
        )
    )
    return est.crossJoin(exact).select(
        "k", "union_exact", "union_est", "inter_exact", "inter_est"
    )


THETA_SETOPS_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(text), 1, 12)) AS BIGINT) AS h
  FROM documents
),
a AS (SELECT DISTINCT h FROM d WHERE doc_id % 2 = 0),
b AS (SELECT DISTINCT h FROM d WHERE doc_id % 3 = 0),
sk_a AS (SELECT h FROM a ORDER BY h LIMIT {THETA_K}),
sk_b AS (SELECT h FROM b ORDER BY h LIMIT {THETA_K}),
union_sk AS (
  SELECT DISTINCT h FROM (SELECT h FROM sk_a UNION ALL SELECT h FROM sk_b)
  ORDER BY h LIMIT {THETA_K}
),
kth AS (SELECT max(h) AS kth FROM union_sk),
m AS (
  SELECT count(*) AS c
  FROM sk_a JOIN sk_b USING (h), kth
  WHERE h <= kth.kth
),
ex AS (
  SELECT (SELECT count(*) FROM (SELECT h FROM a UNION SELECT h FROM b))
           AS union_exact,
         (SELECT count(*) FROM (SELECT h FROM a INTERSECT SELECT h FROM b))
           AS inter_exact
)
SELECT CAST({THETA_K} AS INTEGER) AS k,
       CAST(ex.union_exact AS BIGINT) AS union_exact,
       CAST({THETA_K - 1} AS DOUBLE) / (kth.kth / CAST({1 << 48} AS DOUBLE))
         AS union_est,
       CAST(ex.inter_exact AS BIGINT) AS inter_exact,
       m.c * (CAST({THETA_K - 1} AS DOUBLE)
              / (kth.kth / CAST({1 << 48} AS DOUBLE)))
           / CAST({THETA_K} AS DOUBLE) AS inter_est
FROM kth, m, ex
"""


# ---------------------------------------------------------------------------
# ddsketch_quantiles — bounded-state mergeable quantile sketch (integer-exact)
# ---------------------------------------------------------------------------

DD_SUB = 16  # linear sub-buckets per power-of-two => relative error <= 1/16


def ddsketch_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable quantile SKETCH over lineitem price cents — the
    DDSketch/HDR-histogram shape with INTEGER-EXACT bucketing, so unlike
    the float log-gamma original it is deterministic across engines and
    fully oracle-checkable: bucket = floor(log2(cents)) via the binary
    string length (no transcendental), refined into DD_SUB linear
    sub-buckets, giving relative error <= 1/DD_SUB. Sketch state is
    O(log(max) * DD_SUB) counters per group — constant, mergeable by
    addition — which is what a 1000-executor percentile actually ships
    (weighted_percentile_* answer exactly at grid cost; this is the
    bounded-state path when even the value grid is too large). Estimated
    p50/p95/p99 (bucket lower bounds, exact integers) ride next to the
    exact percentiles so the judged row pins both the sketch math and
    its accuracy; tests assert the 1/DD_SUB relative-error contract.

    Scale: one map-side-combinable aggregation to the bucket grid; the
    per-flag cumulative window covers <= ~64*DD_SUB rows per flag."""
    li = load_table(spark, sf, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    ).filter(F.col("cents") >= 1)
    b = (F.length(F.conv(F.col("cents"), 10, 2)) - 1).cast("int")
    low = F.expr("shiftleft(cast(1 as bigint), b)")
    enc = li.withColumn("b", b).withColumn("low", low).select(
        "l_returnflag", "cents", "b", "low",
        ((F.col("cents") - F.col("low")) * DD_SUB / F.col("low"))
        .cast("long").alias("sub"),
    )
    sketch = (
        enc.groupBy(
            "l_returnflag",
            (F.col("b") * DD_SUB + F.col("sub")).alias("bucket"),
            # bucket lower bound, exact integer: (DD_SUB+sub)*2^b / DD_SUB
            F.expr(
                f"((({DD_SUB} + sub) * low) div {DD_SUB})"
            ).alias("bucket_low"),
        )
        .agg(F.count("*").alias("n"))
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sketch.withColumn("cw", F.sum("n").over(wcum))
    tot = sketch.groupBy("l_returnflag").agg(F.sum("n").alias("tw"))
    ranked = cum.join(F.broadcast(tot), "l_returnflag")
    ests = []
    for q_name, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
        ests.append(
            F.min(
                F.when(
                    F.col("cw") * 100 >= F.ceil(F.col("tw") * q * 100),
                    F.col("bucket_low"),
                )
            ).cast("long").alias(f"{q_name}_est")
        )
    est = ranked.groupBy("l_returnflag").agg(*ests)
    # exact ground truth: the same selection rule on the raw cents grid
    grid = li.groupBy("l_returnflag", "cents").agg(F.count("*").alias("n"))
    wg = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gcum = grid.withColumn("cw", F.sum("n").over(wg)).join(
        F.broadcast(tot), "l_returnflag"
    )
    exacts = []
    for q_name, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
        exacts.append(
            F.min(
                F.when(
                    F.col("cw") * 100 >= F.ceil(F.col("tw") * q * 100),
                    F.col("cents"),
                )
            ).cast("long").alias(f"{q_name}_exact")
        )
    exact = gcum.groupBy("l_returnflag").agg(*exacts)
    return (
        est.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "p50_est", "p50_exact", "p95_est", "p95_exact",
            "p99_est", "p99_exact",
        )
        .orderBy("l_returnflag")
    )


DDSKETCH_SQL = f"""
WITH li AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
  WHERE CAST(round(l_extendedprice * 100) AS BIGINT) >= 1
), enc AS (
  SELECT l_returnflag, cents,
         length(bin(cents)) - 1 AS b,
         (1::BIGINT << (length(bin(cents)) - 1)) AS low
  FROM li
), enc2 AS (
  SELECT l_returnflag, cents, b, low,
         ((cents - low) * {DD_SUB}) // low AS sub
  FROM enc
), sketch AS (
  SELECT l_returnflag,
         b * {DD_SUB} + sub AS bucket,
         (({DD_SUB} + sub) * low) // {DD_SUB} AS bucket_low,
         count(*) AS n
  FROM enc2 GROUP BY 1, 2, 3
), tot AS (
  SELECT l_returnflag, sum(n) AS tw FROM sketch GROUP BY 1
), cum AS (
  SELECT s.l_returnflag, s.bucket_low, t.tw,
         sum(s.n) OVER (PARTITION BY s.l_returnflag ORDER BY s.bucket) AS cw
  FROM sketch s JOIN tot t USING (l_returnflag)
), est AS (
  SELECT l_returnflag,
         CAST(min(CASE WHEN cw * 100 >= ceil(tw * 0.5 * 100)
                       THEN bucket_low END) AS BIGINT) AS p50_est,
         CAST(min(CASE WHEN cw * 100 >= ceil(tw * 0.95 * 100)
                       THEN bucket_low END) AS BIGINT) AS p95_est,
         CAST(min(CASE WHEN cw * 100 >= ceil(tw * 0.99 * 100)
                       THEN bucket_low END) AS BIGINT) AS p99_est
  FROM cum GROUP BY 1
), grid AS (
  SELECT l_returnflag, cents, count(*) AS n FROM li GROUP BY 1, 2
), gcum AS (
  SELECT g.l_returnflag, g.cents, t.tw,
         sum(g.n) OVER (PARTITION BY g.l_returnflag ORDER BY g.cents) AS cw
  FROM grid g JOIN tot t USING (l_returnflag)
), exact AS (
  SELECT l_returnflag,
         CAST(min(CASE WHEN cw * 100 >= ceil(tw * 0.5 * 100)
                       THEN cents END) AS BIGINT) AS p50_exact,
         CAST(min(CASE WHEN cw * 100 >= ceil(tw * 0.95 * 100)
                       THEN cents END) AS BIGINT) AS p95_exact,
         CAST(min(CASE WHEN cw * 100 >= ceil(tw * 0.99 * 100)
                       THEN cents END) AS BIGINT) AS p99_exact
  FROM gcum GROUP BY 1
)
SELECT e.l_returnflag,
       p50_est, p50_exact, p95_est, p95_exact, p99_est, p99_exact
FROM est e JOIN exact x ON e.l_returnflag = x.l_returnflag
ORDER BY e.l_returnflag
"""



# ---------------------------------------------------------------------------
# kmv_distinct_maintained — continuous approx-distinct aggregation: a KMV
# sketch COLUMN CLASS in the maintained projection store (r09)
# ---------------------------------------------------------------------------

KMV_K = 128
KMV_BATCHES = 4


def _kmv_partial(docs: DataFrame, by: tuple = ("lang",)) -> DataFrame:
    """One batch's partial: per `by` key, the row count (sum class) and
    the bottom-KMV_K distinct 48-bit content hashes (kmv class). The
    bottom-k is a PARTITIONED window over the batch's distinct (by, h)
    pairs — at most KMV_K rows survive per key before the k-element array
    is gathered, so no array ever exceeds k*8 bytes. `by` may carry a
    leading batch column (r12): partitioning the window by (bat, lang)
    and slicing per bat yields bit-identical per-batch partials from ONE
    corpus scan — no ties in the ranking either way, since (lang, h)
    pairs are distinct within a batch."""
    base = docs.select(
        *by,
        F.conv(F.substring(F.md5("text"), 1, 12), 16, 10)
        .cast("long").alias("h"),
    )
    nrows = base.groupBy(*by).agg(F.count("*").alias("n_rows"))
    w = Window.partitionBy(*by).orderBy("h")
    sk = (
        base.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy(*by)
        .agg(F.array_sort(F.collect_list("h")).alias("kmv"))
    )
    return nrows.join(sk, list(by))


def _kmv_est(size_col, kth_col):
    """(k-1)/theta estimator with the exact-below-k fast path: while the
    sketch holds fewer than k hashes it IS the distinct set, so the
    estimate is the exact count — both branches replay in ANSI SQL
    (integer sizes, one IEEE division)."""
    return F.when(
        size_col < KMV_K, size_col.cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) / (kth_col / F.lit(_H48))
    )


def kmv_distinct_maintained(spark: SparkSession, sf: str) -> DataFrame:
    """Continuous APPROX-DISTINCT aggregation (r09): the maintained
    projection store (storage/rollup.py) gains a KMV-sketch column class
    — per (lang), the k smallest distinct content hashes ride the same
    immutable segments as sums, merged by the bottom-k monoid
    (merge_aggs), folded by projection_compact, and re-aggregated across
    key subsets like any other monoid column. The entry ingests the
    documents corpus as KMV_BATCHES per-batch partials (idempotence
    pinned in-entry: a redelivered batch id must no-op; a mid-lifecycle
    fold must not change the scan), then answers per-lang distinct-doc
    estimates PLUS the global row obtained by merging the per-lang
    sketches — the continuous-aggregation face of count(distinct).

    Everything is deterministic (48-bit md5 integers, total order, one
    IEEE division), so the DuckDB oracle replays both estimator branches
    bit-for-bit; below k the sketch IS the distinct set, so small scales
    exercise the exact branch and large scales the (k-1)/theta branch.

    Scale: sketch state is k*8 bytes per (key, column) forever; each
    batch contributes one bounded partial; the query reads O(|grid|)
    rows. count(distinct x) at 100 TB without ever re-shuffling raw
    rows."""
    from ..storage.rollup import (
        merge_aggs,
        projection_append,
        projection_compact,
        projection_scan,
    )

    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "text")
    root = tempfile.mkdtemp(prefix="kmv_store_")
    store = os.path.join(root, "lang_distinct")
    try:
        # r12: ONE corpus scan (md5 + distinct + bottom-k window) feeds
        # every batch partial and the redelivered one — the five serial
        # re-scans of the unsplittable testdata file were the entry's
        # dominant cost. Bit-identical slices (see _kmv_partial docstring);
        # the checkpoint holds ~batches x |langs| rows of k-capped arrays.
        pre = _kmv_partial(
            docs.withColumn("bat", F.col("doc_id") % KMV_BATCHES),
            by=("bat", "lang"),
        ).localCheckpoint(eager=True)
        for b in range(KMV_BATCHES):
            part = pre.filter(F.col("bat") == b).drop("bat")
            assert projection_append(
                spark, store, part, f"b{b}",
                keys=["lang"], sums=["n_rows"], kmvs=["kmv"], kmv_k=KMV_K,
            ) is True
            if b == 1:  # mid-lifecycle fold: scan must be invariant
                projection_compact(spark, store, ["lang"], ["n_rows"],
                                   kmvs=["kmv"], kmv_k=KMV_K)
        # exactly-once: a redelivered batch id must no-op (b0 was folded,
        # so this also exercises the _folded.json path)
        redelivered = pre.filter(F.col("bat") == 0).drop("bat")
        assert projection_append(spark, store, redelivered, "b0") is False
        scan = projection_scan(spark, store, ["lang"], ["n_rows"],
                               kmvs=["kmv"], kmv_k=KMV_K)
        per_lang = scan.select(
            "lang", "n_rows",
            F.size("kmv").alias("sketch_size"),
            F.element_at("kmv", F.size("kmv")).alias("kth"),
        )
        glob = (
            scan.groupBy()
            .agg(*merge_aggs(["n_rows"], kmvs=["kmv"], kmv_k=KMV_K))
            .select(
                F.lit("*").alias("lang"), "n_rows",
                F.size("kmv").alias("sketch_size"),
                F.element_at("kmv", F.size("kmv")).alias("kth"),
            )
        )
        out = per_lang.unionByName(glob).select(
            "lang", "n_rows", "sketch_size",
            _kmv_est(F.col("sketch_size"), F.col("kth")).alias("distinct_est"),
        )
        rows = out.collect()
        return local_result(spark, 
            rows,
            "lang string, n_rows bigint, sketch_size int, distinct_est double",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


KMV_MAINT_SQL = f"""
WITH d AS (
  SELECT lang,
         CAST(('0x' || substr(md5(text), 1, 12)) AS BIGINT) AS h
  FROM documents
),
n AS (SELECT lang, count(*) AS n_rows FROM d GROUP BY lang),
dd AS (SELECT DISTINCT lang, h FROM d),
rk AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM dd
),
sk AS (
  SELECT lang, count(*) AS sketch_size, max(h) AS kth
  FROM rk WHERE rn <= {KMV_K} GROUP BY lang
),
gd AS (SELECT DISTINCT h FROM d),
grk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM gd),
gsk AS (
  SELECT count(*) AS sketch_size, max(h) AS kth FROM grk WHERE rn <= {KMV_K}
),
gn AS (SELECT count(*) AS n_rows FROM d),
unioned AS (
  SELECT n.lang, n.n_rows, sk.sketch_size, sk.kth
  FROM n JOIN sk USING (lang)
  UNION ALL
  SELECT '*' AS lang, gn.n_rows, gsk.sketch_size, gsk.kth FROM gn, gsk
)
SELECT lang,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(sketch_size AS INTEGER) AS sketch_size,
       CASE WHEN sketch_size < {KMV_K} THEN CAST(sketch_size AS DOUBLE)
            ELSE CAST({KMV_K - 1} AS DOUBLE)
                 / (kth / CAST({1 << 48} AS DOUBLE))
       END AS distinct_est
FROM unioned
"""


GRAPH_MAINT_BATCHES = 3


def streaming_graph_maintain_replay(spark: SparkSession, sf: str) -> DataFrame:
    """The kNN GRAPH maintained from the streaming ingest path (r12 —
    the HNSW-insert shape): vectors arrive as GRAPH_MAINT_BATCHES
    micro-batches through table_sink; lsh_maintenance keeps the bucket
    store fresh and graph_maintenance (ordered after it) appends each
    batch's candidate-edge partial — the batch's bucket-mates against
    everything committed so far, scored round(cos, 4) in both
    directions. The warm query is ONE pass over the distinct stored
    partials: top-KNN_K per node. k-selection is a monoid over candidate
    sets, so the maintained graph must equal the from-scratch flagship
    — the oracle IS knn_graph_build's SQL text verbatim (the llm13
    one-oracle discipline): a dropped batch, an unfired or mis-ordered
    hook, or a duplicated partial all hash-mismatch.

    Scale: per-trigger hook work is batch-candidate-bounded (bucket
    equi-join + narrow vector join); the store grows by the batch's
    candidate count; the warm query never recomputes an edge score."""
    from ..operators.graph_index import graph_store_scan
    from ..operators.lsh_index import lsh_store_scan
    from ..queries.llm6 import RANGE_BITS, RANGE_TABLES
    from ..queries.llm7 import KNN_K
    from ..streaming.index_maint import (
        graph_maintenance,
        lsh_maintenance,
        stage_batch_files,
        table_sink,
    )

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    vec_type = emb.schema["embedding"].dataType.simpleString()
    root = tempfile.mkdtemp(prefix="graph_maint_")
    landing = os.path.join(root, "landing")
    bucket_store = os.path.join(root, "lsh_store")
    edge_store = os.path.join(root, "graph_store")
    tables_dir = os.path.join(root, "tables", "vectors")
    try:
        stage_batch_files(
            emb, landing, F.col("vec_id") % GRAPH_MAINT_BATCHES,
            GRAPH_MAINT_BATCHES,
        )
        stream = (
            spark.readStream.schema(f"vec_id long, embedding {vec_type}")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        hooks = [
            lsh_maintenance(bucket_store, table="vectors",
                            k_bits=RANGE_BITS, n_tables=RANGE_TABLES),
            graph_maintenance(edge_store, table="vectors",
                              bucket_store=bucket_store,
                              tables_dir=tables_dir,
                              n_tables=RANGE_TABLES),
        ]
        q = table_sink(
            stream, os.path.join(root, "tables"), os.path.join(root, "ckpt"),
            "vectors", index_hooks=hooks,
        ).start()
        q.awaitTermination()

        n_batches = len(lsh_store_scan(spark, bucket_store)
                        .select("batch").distinct().collect())
        if n_batches != GRAPH_MAINT_BATCHES:
            raise AssertionError(
                f"bucket store has {n_batches} batches, expected "
                f"{GRAPH_MAINT_BATCHES}")
        edges = graph_store_scan(spark, edge_store).distinct()
        w = Window.partitionBy("node").orderBy(F.col("sim").desc(),
                                               F.col("nbr"))
        rows = (
            edges.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= KNN_K)
            .select("node", "nbr", "sim", "rk")
            .collect()
        )
        return local_result(spark, 
            rows, "node bigint, nbr bigint, sim double, rk bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _graph_maint_oracle() -> str:
    """The from-scratch flagship graph SQL VERBATIM — the maintained
    store's one correctness contract (asserted non-empty)."""
    from .llm7 import _knn_graph_sql

    sql = _knn_graph_sql()
    assert "row_number() OVER (PARTITION BY node" in sql
    return sql


QUERIES: dict[str, QuerySpec] = {
    "streaming_graph_maintain_replay": QuerySpec(
        streaming_graph_maintain_replay, _graph_maint_oracle(),
        "kNN graph maintained by streaming ingest hooks (candidate-edge "
        "partials per batch); warm top-K equals the from-scratch "
        "flagship oracle verbatim (r12)",
    ),
    "ddsketch_quantiles": QuerySpec(
        ddsketch_quantiles, DDSKETCH_SQL,
        doc="integer-exact DDSketch-style quantile sketch (log2 buckets x "
            "linear sub-buckets, bounded mergeable state) with exact "
            "percentiles riding as ground truth",
    ),
    "kmv_distinct_maintained": QuerySpec(
        kmv_distinct_maintained, KMV_MAINT_SQL,
        doc="continuous approx-distinct: a KMV sketch column class in the "
            "maintained projection store (bottom-k monoid rides the same "
            "segments as sums; fold-invariant, redelivery-idempotent); "
            "per-key + merged-global estimates, exact below k",
    ),
    "theta_sketch_setops": QuerySpec(
        theta_sketch_setops, THETA_SETOPS_SQL,
        doc="KMV/theta-sketch distinct union/intersection estimates with "
            "exact ground truth riding along; k rows of state per set",
    ),
    "streaming_index_maintain_replay": QuerySpec(
        streaming_index_maintain_replay,
        # derived from the SAME generator as dedup_streaming_accumulate's
        # oracle, at this entry's batch count — the two replay paths
        # cannot desynchronize
        _stream_accum_sql(MAINT_BATCHES),
        doc="micro-batched ingest through the real streaming sink with the "
            "MinHash maintenance hook; dedup answered warm from the "
            "maintained store",
    ),
    "streaming_ann_maintain_replay": QuerySpec(
        streaming_ann_maintain_replay,
        _stream_ann_sql(),
        doc="IVF-PQ index trained on the first micro-batch and grown by "
            "frozen-codebook appends from the streaming sink's hook; "
            "flagship oracle with the codebook sample re-rooted",
    ),
    "streaming_lsh_maintain_replay": QuerySpec(
        streaming_lsh_maintain_replay,
        _stream_lsh_sql(),
        doc="sign-LSH bucket store grown per micro-batch by the streaming "
            "sink's hook (deterministic planes: no train/append asymmetry); "
            "cross-batch cosine range search answered warm from the "
            "maintained segments",
    ),
}
