"""Persisted sign-LSH bucket index: bucket-at-ingest, query-scans-buckets.

Round-5 closed the recompute-vs-scan gap for PQ codes (operators/
pq_index.py); this module closes the SAME gap for the sign-LSH bucket
tables — the single most-repeated scan in the curation suite. Before it,
`embedding_decontaminate`, `lsh_range_search`, `lsh_range_search_collapsed`
and `knn_graph_build` each recomputed all 10 tables' bucket ids (80
hyperplane dot products per corpus vector, r05 verdict next-round item 1)
on EVERY call. Now the (vec_id, tbl, bucket) rows are written ONCE per
corpus version and every consumer's query plan starts from a 3-column
parquet scan.

Index layout under `<path>/`:
  buckets/  vec_id BIGINT, bucket BIGINT, partitioned by tbl INT —
            consumers that use a table subset (range search / kNN use
            tables 0-3 of the 10) prune whole directories at the scan.

One artifact serves every consumer because they already share the plane
family: dim=64, k_bits=8, seeds 42 + 977*t (operators/similarity.py) —
the n_tables=10 build is a superset of the 4-table consumers.

Freshness/versioning/atomicity are pq_index's exactly: path keyed on the
SOURCE FILE state (size+mtime) + an encoder version, atomic rename
publishes, a concurrent losing builder deletes its temp copy, stale
fingerprints for the same params are pruned after a successful publish.

The bucket math is bit-identical to the inline form
(similarity.with_lsh_bucket), so every consumer keeps its existing DuckDB
oracle unchanged — and `lsh_bucket_stats` (queries/llm11.py) audits the
stored artifact itself against a from-scratch DuckDB re-derivation every
round, the ann_ivfpq_code_stats pattern.

Reference parallel: HEPop's metadata ground truth is the storage file
state re-listed per query (hepop.js re-lists, query.js:36-38 re-reads);
the fingerprint key applies the same policy to derived artifacts.
"""

from __future__ import annotations

import os
import uuid
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .pq_index import (
    corpus_tag,
    index_base_dir,
    prune_stale_siblings,
    source_fingerprint,
)
from .similarity import _hyperplanes, bucket_sql
from ..catalog import read_parquet_memo

# bump when the BUCKET SEMANTICS change (plane derivation, sign rule, bit
# packing): an index built by an older encoder must never answer a newer
# query path, even for identical source data
LSH_INDEX_VERSION = 1

LSH_DIM = 64
LSH_SEED_BASE = 42
LSH_SEED_STEP = 977


def lsh_index_path(sf_dir: str, params: str) -> str:
    """Cache location for the persisted bucket table of `sf_dir`'s
    embeddings table under the given parameter signature."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    key = source_fingerprint(src) if os.path.exists(src) else "nosrc"
    return os.path.join(
        index_base_dir(),
        f"lsh_v{LSH_INDEX_VERSION}_{params}_c{corpus_tag(sf_dir)}_{key}",
    )


def bucket_exprs(vec_col: str, dim: int, k_bits: int,
                 n_tables: int) -> list[Column]:
    """One k-bit sign-LSH bucket expression per table — array-native dot
    products (zip_with + aggregate), zero Python in the scan; identical
    math to similarity.with_lsh_bucket so existing oracles replay it."""
    # r12: one parsed SQL string per table instead of k x (dim literals +
    # 2 lambdas) of py4j round-trips — same expression exactly, shared
    # spelling with similarity.with_lsh_bucket (similarity.bucket_sql)
    cols: list[Column] = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, k_bits, seed=LSH_SEED_BASE + LSH_SEED_STEP * t)
        cols.append(F.expr(bucket_sql(vec_col, planes)))
    return cols


def build_lsh_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = LSH_DIM,
    k_bits: int = 8,
    n_tables: int = 10,
) -> bool:
    """Write the (vec_id, tbl, bucket) table for `corpus` to `path`.

    No-op (returns False) when the index already exists: bucketing cost is
    paid at INGEST, not per query. The build is ONE corpus scan — all
    n_tables bucket ids computed as an array of column expressions and
    posexploded (a per-table union would re-read and re-project the corpus
    n_tables times) — then a hash shuffle on (tbl, bucket) that co-locates
    each bucket's rows before the partitioned write, so the query-side
    equi-joins read contiguous runs. Atomic rename publishes; a concurrent
    losing builder deletes its temp copy."""
    if os.path.isdir(path):
        return False
    buckets = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.array(*bucket_exprs(vec_col, dim, k_bits, n_tables)))
        .alias("tbl", "bucket"),
    )
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    try:
        buckets.repartition("tbl", "bucket").write.mode("overwrite").partitionBy(
            "tbl"
        ).parquet(os.path.join(tmp, "buckets"))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        os.rename(tmp, path)
        prune_stale_siblings(path)
        return True
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        return os.path.isdir(path)  # lost a benign race to another builder


def lsh_buckets_from_index(spark: SparkSession, path: str) -> DataFrame:
    """(vec_id, tbl, bucket) rows of a published index. Filtering on `tbl`
    prunes whole partition directories at the scan."""
    return read_parquet_memo(spark, os.path.join(path, "buckets"))


def lsh_store_append(
    spark: SparkSession,
    batch: DataFrame,
    store: str,
    batch_id: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = LSH_DIM,
    k_bits: int = 8,
    n_tables: int = 10,
) -> bool:
    """Append one ingest batch's (vec_id, tbl, bucket) rows to an
    APPENDABLE bucket store as an immutable `batch=<id>/` segment —
    the minhash_store_append contract for sign-LSH (r07 verdict item 2:
    this was the only persisted artifact without a maintenance path).

    Because the plane family is deterministic (seeds 42 + 977t), every
    batch encodes independently with no train/append asymmetry: the store
    after any prefix of batches equals build_lsh_index over the union of
    those batches' vectors. No-op (False) when the batch id is already
    published — idempotent under foreachBatch redelivery."""
    dest = os.path.join(store, f"batch={batch_id}")
    if os.path.isdir(dest):
        return False
    buckets = batch.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.array(*bucket_exprs(vec_col, dim, k_bits, n_tables)))
        .alias("tbl", "bucket"),
    )
    tmp = os.path.join(store, f".batch_{batch_id}.tmp.{uuid.uuid4().hex[:8]}")
    try:
        buckets.repartition("tbl", "bucket").write.mode("overwrite").partitionBy(
            "tbl"
        ).parquet(tmp)
        os.rename(tmp, dest)
        return True
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        return os.path.isdir(dest)  # lost a benign race to another appender


def lsh_store_scan(spark: SparkSession, store: str) -> DataFrame:
    """(vec_id, tbl, bucket, batch) rows of every published segment — the
    `batch=<id>` dirs read as one partition column, so the whole store is
    a single partition-discovered scan and `tbl` still prunes."""
    return read_parquet_memo(spark, store).select("vec_id", "tbl", "bucket", "batch")


def embeddings_lsh_buckets(
    spark: SparkSession,
    sf_dir: str,
    emb: DataFrame,
    *,
    k_bits: int = 8,
    n_tables: int = 10,
) -> DataFrame:
    """The ingest/query split in one call: build-if-stale (no-op while the
    source file state is unchanged) then scan. All consumers of the shared
    10-table/8-bit/seed-42+977t family route through here so they hit ONE
    artifact per corpus version."""
    path = lsh_index_path(sf_dir, f"d{LSH_DIM}b{k_bits}t{n_tables}")
    build_lsh_index(spark, emb, path, k_bits=k_bits, n_tables=n_tables)
    return lsh_buckets_from_index(spark, path)
