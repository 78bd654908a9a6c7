"""Streaming index maintenance: keep the persisted dedup/ANN stores fresh
from the ingest path itself (r06 verdict next-round item 3).

Round 6 built the persisted artifacts — the appendable MinHash band store
(operators/minhash_index.minhash_store_append) and the IVF-PQ code-table
lifecycle (operators/pq_index.ivfpq_append_batch / ivfpq_delete_ids /
ivfpq_compact_store) — but nothing drove them from the streaming sinks, so
a serve-mode corpus grew while its indexes went stale until a manual
rebuild. This module closes that gap with *index hooks*: callables
`(table_name, typed_rows, batch_id) -> None` that the foreachBatch sinks
(streaming/ingest.lp_sink / hep_sink and table_sink below) invoke for each
micro-batch AFTER the parquet append.

Exactly-once composition: foreachBatch redelivers a batch id after a
restart; both store append primitives are idempotent per batch id (a
published `batch=<id>` / `codes_<id>` directory no-ops), so hook + sink
give at-least-once delivery with exactly-once store effects — the same
contract the parquet append relies on via the output committer.

Reference scope: north-star extension (the reference has no secondary
indexes; hepop.js stores opaque payloads). The freshness model — the
store's batch dirs ARE the ground truth of what has been indexed — is the
reference's own listing-is-truth metadata policy (query.js:36-38) applied
to derived artifacts.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IndexHook = Callable[[str, DataFrame, int], None]


def minhash_maintenance(
    store_path: str,
    *,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_seeds: int = 8,
    band_rows: int = 2,
) -> IndexHook:
    """Hook that signs each micro-batch of `table` and appends its band
    rows to the appendable MinHash store. Query work against the store
    stays |batch| x collision rate no matter how long the stream runs
    (queries/llm11.dedup_incremental_indexed); redelivered batch ids
    no-op inside minhash_store_append."""
    from ..operators.minhash_index import minhash_store_append

    def hook(table_name: str, rows: DataFrame, batch_id: int) -> None:
        if table_name != table:
            return
        docs = rows.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).cast("string").alias("text"),
        )
        minhash_store_append(
            rows.sparkSession, docs, store_path, f"b{batch_id}",
            n_seeds=n_seeds, band_rows=band_rows,
        )

    return hook


def ivfpq_maintenance(
    index_path: str,
    *,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int,
    m_sub: int,
    sub: int,
    k_codes: int,
) -> IndexHook:
    """Hook that keeps an IVF-PQ index fresh under a vector ingest stream:
    the FIRST batch trains and publishes the index (bounded codebook
    sample, operators/pq_index.build_ivfpq_index); every later batch is
    encoded with the FROZEN codebook and published as an append-only code
    segment (ivfpq_append_batch) — the FAISS train-once/add-forever shape.
    Redelivered batch ids no-op on the published segment; the TRAINING
    batch id is persisted inside the index (atomic with its publish), so
    a crash between the index publish and the streaming checkpoint commit
    redelivers batch 0 into a no-op instead of a duplicate code segment
    carrying every trained vector (r07 ADVICE item 2)."""
    import os

    from ..operators.pq_index import (
        build_ivfpq_index,
        ivfpq_append_batch,
        read_trained_marker,
    )

    def hook(table_name: str, rows: DataFrame, batch_id: int) -> None:
        if table_name != table:
            return
        vecs = rows.select(
            F.col(id_col).cast("long").alias("c_id"),
            F.col(vec_col).alias("cv"),
        )
        if not os.path.isdir(index_path):
            build_ivfpq_index(
                rows.sparkSession, vecs, index_path,
                n_cells=n_cells, m_sub=m_sub, sub=sub, k_codes=k_codes,
                trained_marker=f"b{batch_id}",
            )
            return
        if read_trained_marker(index_path) == f"b{batch_id}":
            return  # redelivered training batch: its vectors ARE the base
        ivfpq_append_batch(
            rows.sparkSession, vecs, index_path,
            m_sub=m_sub, sub=sub, batch_id=f"b{batch_id}",
        )

    return hook


def lsh_maintenance(
    store_path: str,
    *,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_bits: int = 8,
    n_tables: int = 10,
) -> IndexHook:
    """Hook that keeps an appendable sign-LSH bucket store fresh under a
    vector ingest stream (r07 verdict item 2 — the last persisted store
    without a maintenance path). The plane family is deterministic, so
    every micro-batch encodes independently (no training batch, no frozen
    artifacts to broadcast beyond the plane literals); hook work is one
    narrow encode pass over the arriving batch. Redelivered batch ids
    no-op inside lsh_store_append."""
    from ..operators.lsh_index import lsh_store_append

    def hook(table_name: str, rows: DataFrame, batch_id: int) -> None:
        if table_name != table:
            return
        lsh_store_append(
            rows.sparkSession, rows, store_path, f"b{batch_id}",
            id_col=id_col, vec_col=vec_col,
            k_bits=k_bits, n_tables=n_tables,
        )

    return hook


def graph_maintenance(
    store_path: str,
    *,
    table: str,
    bucket_store: str,
    tables_dir: str,
    n_tables: int = 4,
) -> IndexHook:
    """Hook that keeps an appendable kNN-graph CANDIDATE-EDGE store
    fresh under a vector ingest stream (r12 — the streaming-maintained
    analogue of operators/graph_index, the HNSW-insert shape): for each
    committed batch, candidates are the batch's bucket-mates against the
    WHOLE bucket store so far (which, with lsh_maintenance ordered
    before this hook, already includes the batch), scored with the
    shared round(cos, 4) grid in BOTH directions so older nodes receive
    their new candidates too. k-selection per node is a monoid over
    candidate sets, so top-K over the distinct union of partials equals
    the from-scratch graph — a dropped batch, an unfired hook or a
    mis-ordered pipeline all surface as missing edges against the
    flagship oracle.

    Scale: hook work per trigger is |batch| x bucket-mate candidates
    (never all pairs) plus one narrow vector join against the committed
    corpus; partial size is bounded by the batch's candidate count."""
    from ..operators.graph_index import cos4, graph_store_append
    from ..operators.lsh_index import lsh_store_scan

    def hook(table_name: str, rows: DataFrame, batch_id: int) -> None:
        if table_name != table:
            return
        from .exactly_once import read_committed

        spark = rows.sparkSession
        buck = lsh_store_scan(spark, bucket_store).filter(
            F.col("tbl") < n_tables)
        newb = buck.join(rows.select("vec_id"), "vec_id")
        mates = (
            newb.alias("x")
            .join(buck.alias("y"), ["tbl", "bucket"])
            .select(F.col("x.vec_id").alias("node"),
                    F.col("y.vec_id").alias("nbr"))
            .filter(F.col("node") != F.col("nbr"))
            .distinct()
        )
        pairs = mates.union(
            mates.select(F.col("nbr").alias("node"),
                         F.col("node").alias("nbr"))
        ).distinct()
        corpus = read_committed(spark, tables_dir)
        vecs = corpus.select("vec_id", "embedding")
        scored = (
            pairs.join(vecs.select(F.col("vec_id").alias("node"),
                                   F.col("embedding").alias("va")), "node")
            .join(vecs.select(F.col("vec_id").alias("nbr"),
                              F.col("embedding").alias("vb")), "nbr")
            .withColumn("sim", cos4("va", "vb"))
            .select("node", "nbr", "sim")
        )
        graph_store_append(spark, store_path, scored, f"b{batch_id}")

    return hook


def bloom_maintenance(
    base_dir: str,
    *,
    table: str,
    col: str,
) -> IndexHook:
    """Hook that keeps a file-level Bloom sidecar (storage/bloom_index.py)
    fresh under a table_sink ingest stream: after the exactly-once batch
    write, the just-landed `batch_id={N}` files are indexed for `col`.
    Idempotent under redelivery — the data write no-ops on its commit
    marker, so re-indexing the identical files recomputes identical
    bitmaps. Hook work is one narrow pass over the arriving batch's
    files; the sidecar grows by one entry per file, never rewrites old
    entries."""
    from ..storage.bloom_index import bloom_index_update

    def hook(table_name: str, rows: DataFrame, batch_id: int) -> None:
        if table_name != table:
            return
        tbl = os.path.join(base_dir, table)
        bdir = os.path.join(tbl, f"batch_id={batch_id}")
        try:
            files = sorted(
                os.path.join(f"batch_id={batch_id}", e)
                for e in os.listdir(bdir)
                if e.endswith(".parquet") and not e.startswith(("_", "."))
            )
        except OSError:
            return
        if files:
            bloom_index_update(rows.sparkSession, tbl, col, files=files)

    return hook


def trigram_maintenance(
    base_dir: str,
    *,
    table: str,
    col: str,
) -> IndexHook:
    """Hook that keeps a trigram-Bloom sidecar (storage/trigram_index.py)
    fresh under a table_sink ingest stream — the LIKE '%x%' sibling of
    bloom_maintenance, same idempotent batch-id contract: re-indexing a
    redelivered batch's identical files recomputes identical bitmaps.
    Hook work is one narrow trigram pass over the arriving batch's files;
    old entries are never rewritten."""
    from ..storage.trigram_index import trigram_index_update

    def hook(table_name: str, rows: DataFrame, batch_id: int) -> None:
        if table_name != table:
            return
        tbl = os.path.join(base_dir, table)
        bdir = os.path.join(tbl, f"batch_id={batch_id}")
        try:
            files = sorted(
                os.path.join(f"batch_id={batch_id}", e)
                for e in os.listdir(bdir)
                if e.endswith(".parquet") and not e.startswith(("_", "."))
            )
        except OSError:
            return
        if files:
            trigram_index_update(rows.sparkSession, tbl, col, files=files)

    return hook


def projection_maintenance(
    store_path: str,
    *,
    table: str,
    derive: Callable[[DataFrame], DataFrame],
    keys: list[str] | None = None,
    sums: list[str] | None = None,
    source: dict | None = None,
    mins: list[str] | None = None,
    maxs: list[str] | None = None,
    kmvs: list[str] | None = None,
    kmv_k: int | None = None,
    hists: list[str] | None = None,
) -> IndexHook:
    """Hook that maintains a monoid aggregate projection (a
    materialized-view grid: the cents-percentile rollup, per-key token
    counts, min/max extrema, KMV distinct sketches — any
    sum/min/max/bottom-k column class, see storage/rollup.merge_aggs)
    from the ingest stream. `derive` maps one micro-batch's
    typed rows to its partial aggregate (keys + sum columns); the partial
    is published as an immutable segment
    (storage/rollup.projection_append), so a redelivered batch id no-ops
    and the merged read face (projection_scan) equals the from-scratch
    aggregate of everything ingested — the monoid law the rollup
    equivalence tests pin. The serve compaction sweep (or any caller) can
    fold segments with projection_compact without changing results.

    Pass `keys`/`sums` to make the store self-describing (_meta.json): a
    store published under `{data}/{writer}/rollups/{name}` is then
    discoverable by the serve catalog and queryable through /query as
    table `{name}` — and with ``source`` (the raw-table routing contract,
    see storage/rollup.projection_append) a user's MATCHING aggregate
    over the raw table is rewritten onto this grid by the API layer."""
    from ..storage.rollup import projection_append

    def hook(table_name: str, rows: DataFrame, batch_id: int) -> None:
        if table_name != table:
            return
        projection_append(
            rows.sparkSession, store_path, derive(rows), f"b{batch_id}",
            keys=keys, sums=sums, source=source,
            mins=mins, maxs=maxs, kmvs=kmvs, kmv_k=kmv_k, hists=hists,
        )

    return hook


def stage_batch_files(df: DataFrame, landing: str, batch_col,
                      n_batches: int) -> None:
    """Write `df` as one parquet file per batch value into `landing` —
    the replay entries' micro-batch fixture — in ONE distributed pass
    (partitionBy on the batch value) instead of n_batches coalesce(1)
    jobs. File modification times are set in batch order so a
    maxFilesPerTrigger=1 file stream (which orders by modTime, path
    tie-break) processes batch 0 first — the batch that trains
    first-batch-keyed indexes."""
    import shutil
    import time as _time

    staged = landing + ".staging"
    (
        df.withColumn("__b", batch_col)
        .repartition("__b")
        .write.partitionBy("__b").mode("overwrite").parquet(staged)
    )
    os.makedirs(landing, exist_ok=True)
    now = _time.time()
    for b in range(n_batches):
        pdir = os.path.join(staged, f"__b={b}")
        parts = sorted(
            p for p in os.listdir(pdir)
            if p.endswith(".parquet") and not p.startswith(("_", "."))
        )
        assert len(parts) == 1, f"batch {b} split across {len(parts)} files"
        dest = os.path.join(landing, f"batch{b}.parquet")
        os.rename(os.path.join(pdir, parts[0]), dest)
        os.utime(dest, (now + b, now + b))
    shutil.rmtree(staged, ignore_errors=True)


def table_sink(
    rows: DataFrame,
    base_dir: str,
    checkpoint_dir: str,
    table: str,
    *,
    index_hooks: list[IndexHook] | None = None,
    processing_time: str | None = None,
):
    """Streaming sink for ONE typed table (the document/embedding-corpus
    ingest shape a training-data pipeline runs — rows arrive already
    structured, unlike the LP/HEP text paths): each micro-batch lands in
    `{base_dir}/{table}` EXACTLY ONCE (batch-id-keyed directory + commit
    marker, streaming/exactly_once.py), then the index hooks run on the
    SAME batch. Corpus and stores therefore advance in lock-step with
    end-to-end exactly-once semantics: a hook crash fails the batch,
    Spark redelivers the same batch id, the table write no-ops on its
    marker and each hook no-ops on its published batch dir — nothing
    duplicates, nothing is lost (pinned by
    tests/test_round7.py::TestHookCrashReplay). Read the corpus back
    with exactly_once.read_committed. Returns the unstarted writer
    (availableNow by default, like the test-driven ingest sinks)."""
    from .exactly_once import write_batch_exactly_once

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            write_batch_exactly_once(batch, batch_id, f"{base_dir}/{table}")
            for hook in index_hooks or []:
                hook(table, batch, batch_id)
        finally:
            # a hook exception is the DESIGNED crash-redelivery path —
            # without the finally each failed attempt leaks a cached copy
            # of the batch (r07 ADVICE item 5)
            batch.unpersist()

    writer = (
        rows.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer
