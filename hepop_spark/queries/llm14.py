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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
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

        # warm answer: corpus as the SINK wrote it, bands as the HOOK
        # maintained them — the entry fails if either path lost rows
        corpus = spark.read.parquet(os.path.join(base, "documents"))
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
        return spark.createDataFrame(
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
        return spark.createDataFrame(
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


QUERIES: dict[str, QuerySpec] = {
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
}
