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
    from ..streaming.index_maint import minhash_maintenance, table_sink

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="maint_replay_")
    landing = os.path.join(root, "landing")
    base = os.path.join(root, "tables")
    store = os.path.join(root, "bands_store")
    os.makedirs(landing)
    try:
        # one parquet file per micro-batch (batch tag = doc_id % N; the
        # final answer keys on the DATA-borne tag, so file arrival order
        # cannot change the result — append order is a monoid)
        for b in range(MAINT_BATCHES):
            staged = os.path.join(root, f"stage{b}")
            docs.filter(F.col("doc_id") % MAINT_BATCHES == b).coalesce(1) \
                .write.mode("overwrite").parquet(staged)
            part = next(
                p for p in os.listdir(staged)
                if p.endswith(".parquet") and not p.startswith(("_", "."))
            )
            os.rename(os.path.join(staged, part),
                      os.path.join(landing, f"batch{b}.parquet"))
            shutil.rmtree(staged, ignore_errors=True)

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
}
