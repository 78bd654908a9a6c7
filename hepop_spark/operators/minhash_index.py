"""Persisted MinHash band index: sign-at-ingest, query-joins-bands.

Third application of the ingest/query split (after pq_index's PQ codes
and lsh_index's sign-LSH buckets, r05 verdict next-round item 3): the
nightly incremental-dedup shape re-MinHashed the ENTIRE existing index
side on every call — 8 md5 minhashes over every doc's trigram shingles —
although the signatures are exactly what a production pipeline persists
between runs (the merge-monoid property is proven by
queries/llm9.minhash_merge_shards). This module writes the index side's
band table ONCE per corpus version; the incremental query then MinHashes
only the NEW batch and equi-joins its bands against the stored table, so
query work scales with |batch| x collision rate, not |corpus|.

Index layout under `<path>/`:
  bands/  doc_id BIGINT, bkey VARCHAR(32), partitioned by band INT.

Freshness/versioning/atomicity are pq_index's exactly: path keyed on the
SOURCE FILE state (size+mtime) + an encoder version, atomic rename
publishes, stale same-params fingerprints are pruned after a successful
publish. The band math is bit-identical to queries/llm.py's inline form
(trigram shingles -> min(md5(seed:shingle)) x 8 -> md5 of 2-row band
concat), so `dedup_incremental_indexed` replays the SAME DuckDB oracle as
the from-scratch twin, and `minhash_band_stats` (queries/llm11.py) audits
the stored artifact against a from-scratch re-derivation every round.
"""

from __future__ import annotations

import os
import uuid
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pq_index import (
    corpus_tag,
    index_base_dir,
    prune_stale_siblings,
    source_fingerprint,
)
from ..catalog import read_parquet_memo

# bump when the SIGNATURE SEMANTICS change (shingle width, seed keying,
# band packing): a store built by an older encoder must never answer a
# newer query path, even for identical source data
MINHASH_INDEX_VERSION = 1


def minhash_index_path(sf_dir: str, params: str) -> str:
    """Cache location for the persisted band table of `sf_dir`'s documents
    table under the given parameter signature."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = source_fingerprint(src) if os.path.exists(src) else "nosrc"
    return os.path.join(
        index_base_dir(),
        f"minhash_v{MINHASH_INDEX_VERSION}_{params}_c{corpus_tag(sf_dir)}_{key}",
    )


def minhash_bands(docs: DataFrame, *, n_seeds: int, band_rows: int,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, band, bkey) LSH band keys for (id, text) rows — the math of
    queries/llm.py:_minhash_pairs stage for stage: RAW trigram shingles
    (min over duplicates is identical, so no distinct shuffle), each
    signature a PURE PER-ROW fold (r13: array_min over a transform of the
    row's own shingle array computes the identical lexicographic minimum
    of the identical md5 multiset — no explode, no exchange, and no
    SortAggregate, which min-over-strings forced), band keys stacked with
    a single explode. Documents shorter than 3 tokens yield no shingles
    and hence no bands (the r04 short-doc rule: empty, never a crash)."""
    with_t = docs.withColumn("t", F.split(text_col, " "))
    shs = with_t.filter(F.size("t") >= 3).select(
        id_col,
        F.expr(
            "transform(sequence(0, size(t) - 3), "
            "i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))"
        ).alias("shs"),
    )
    sig = shs.select(
        id_col,
        *[
            F.array_min(F.expr(
                f"transform(shs, s -> md5(concat('{i}:', s)))")).alias(f"mh{i}")
            for i in range(n_seeds)
        ],
    )
    n_bands = n_seeds // band_rows
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[F.col(f"mh{b * band_rows + r}") for r in range(band_rows)],
                    )
                ).alias("bkey"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(id_col, F.explode(band_structs).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )


def build_minhash_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    *,
    n_seeds: int = 8,
    band_rows: int = 2,
) -> bool:
    """Write the (doc_id, band, bkey) table for `docs` to `path`.

    No-op (returns False) when the index already exists: signature cost is
    paid at INGEST. One corpus scan -> one hash agg on doc_id -> a hash
    shuffle on (band, bkey) that co-locates each bucket's rows before the
    partitioned write. Atomic rename publishes; a concurrent losing
    builder deletes its temp copy."""
    if os.path.isdir(path):
        return False
    bands = minhash_bands(docs, n_seeds=n_seeds, band_rows=band_rows)
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    try:
        bands.repartition("band", "bkey").write.mode("overwrite").partitionBy(
            "band"
        ).parquet(os.path.join(tmp, "bands"))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        os.rename(tmp, path)
        prune_stale_siblings(path)
        return True
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        return os.path.isdir(path)  # lost a benign race to another builder


def minhash_bands_from_index(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id, band, bkey) rows of a published band store."""
    return read_parquet_memo(spark, os.path.join(path, "bands"))


# ---------------------------------------------------------------------------
# Appendable store — the streaming-native variant
# ---------------------------------------------------------------------------
#
# build_minhash_index is a corpus-VERSION artifact (rebuilt when the source
# fingerprint rotates). A live ingest pipeline instead GROWS the store one
# micro-batch at a time: band rows are a pure per-doc function (the merge
# monoid pinned by tests/test_round6.py), so appending batch B's bands to a
# store holding A equals building A ∪ B from scratch — no rescan, no
# rebuild. Idempotence comes from the batch directory: a redelivered batch
# id no-ops, which is the same exactly-once-through-at-least-once contract
# the streaming sinks rely on (streaming/ingest.py). Caller contract:
# batch doc_id sets are disjoint (a doc belongs to exactly one batch).


def minhash_store_append(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    batch_id: str,
    *,
    n_seeds: int = 8,
    band_rows: int = 2,
) -> bool:
    """Sign one ingest batch and publish its band rows under
    `<store>/bands/batch=<batch_id>/`. Returns False (no-op) when the
    batch id was already published — safe under redelivery."""
    dest = os.path.join(store_path, "bands", f"batch={batch_id}")
    if os.path.isdir(dest):
        return False
    bands = minhash_bands(docs, n_seeds=n_seeds, band_rows=band_rows)
    # stage OUTSIDE bands/: a temp dir inside the partition-discovery root
    # would surface to concurrent minhash_store_bands readers as a phantom
    # 'batch=<id>.tmp.<pid>' partition, or vanish mid-scan at the rename
    # (r06 ADVICE, minhash_index:164). `.tmp` is also dot-prefixed, so
    # Spark's file listing skips it even if a reader roots at the store.
    tmp = os.path.join(store_path, ".tmp", f"batch={batch_id}.{uuid.uuid4().hex[:8]}")
    try:
        bands.write.mode("overwrite").parquet(tmp)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.rename(tmp, dest)
        return True
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        return os.path.isdir(dest)


def minhash_store_bands(spark: SparkSession, store_path: str) -> DataFrame:
    """(doc_id, band, bkey) across ALL published batches of an appendable
    store (the `batch` partition column identifies provenance)."""
    return read_parquet_memo(spark, os.path.join(store_path, "bands")).select(
        "doc_id", "band", "bkey"
    )
