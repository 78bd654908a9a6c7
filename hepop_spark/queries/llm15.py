"""Round-9 continuous-aggregation batch II: bounded-state QUANTILES as a
maintained projection column class.

Round 9 gave the projection store (storage/rollup.py) a KMV sketch class —
continuous approx-distinct. This module adds the sibling every monitoring
stack wants next: a HISTOGRAM class (`hists` in _meta.json) holding
DDSketch-style bucket counters as map<bigint,bigint>. The merge is key-wise
counter addition — the free-commutative-monoid product of the sum monoid —
so the maintained sketch is EXACTLY the one-shot sketch of everything
ingested; only the bucket width (1/DD_SUB relative error) bounds quantile
accuracy, never the maintenance path. The class rides the same immutable
segments, exactly-once batch ids, folds (projection_compact), catalog
federation (catalog.py) and streaming maintenance hook
(streaming/index_maint.projection_maintenance) as sums/min/max/KMV.

Bucketing reuses llm14.ddsketch_quantiles' INTEGER-EXACT scheme (bucket =
floor(log2(cents)) * DD_SUB + linear sub-bucket — no transcendental, so
DuckDB replays it bit-for-bit).

Reference scope: north-star extension — the reference (hepop.js) has no
pre-aggregation at all; this is the continuous-aggregation face of
percentile dashboards over 100 TB: state per (key, column) is
O(log(max) * DD_SUB) counters forever, each batch contributes one bounded
partial, and the quantile query reads O(|grid|) rows.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import pandas as pd

from pyspark.sql.functions import pandas_udf

from ..catalog import local_result, load_table
from . import QuerySpec
from .llm14 import DD_SUB

DDM_BATCHES = 4


def _dd_quantiles(exploded: DataFrame, qs=(("p50", 0.5), ("p95", 0.95),
                                           ("p99", 0.99))) -> DataFrame:
    """Quantile estimates from exploded (key, bucket, n) counter rows:
    cumulative weight per key in bucket order, first bucket whose
    cumulative weight reaches ceil(tw * q) wins; the estimate is the
    bucket's exact-integer lower bound ((DD_SUB + sub) * 2^b) div DD_SUB
    — the same selection rule the one-shot ddsketch_quantiles entry and
    its oracle use, so maintained and one-shot paths cannot drift."""
    blow = F.expr(
        f"(({DD_SUB} + bucket % {DD_SUB}) * shiftleft(cast(1 as bigint),"
        f" cast(bucket div {DD_SUB} as int))) div {DD_SUB}"
    )
    ranked = exploded.withColumn("bucket_low", blow)
    wcum = (
        Window.partitionBy("k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = ranked.groupBy("k").agg(F.sum("n").alias("tw"))
    cum = ranked.withColumn("cw", F.sum("n").over(wcum)).join(
        F.broadcast(tot), "k")
    ests = [F.max("tw").alias("tw")]
    for q_name, q in qs:
        ests.append(
            F.min(
                F.when(
                    F.col("cw") * 100 >= F.ceil(F.col("tw") * q * 100),
                    F.col("bucket_low"),
                )
            ).cast("long").alias(f"{q_name}_est")
        )
    return cum.groupBy("k").agg(*ests)


def ddsketch_maintained(spark: SparkSession, sf: str) -> DataFrame:
    """Continuous APPROXIMATE-QUANTILE aggregation (r09): lineitem price
    cents ingested as DDM_BATCHES per-batch partials into a maintained
    projection store whose value columns are a row count (sum class) and
    a DDSketch bucket-counter map (hist class, map<bigint,bigint>). The
    entry pins the full lifecycle in-line — a mid-ingest fold must leave
    the scan invariant, a redelivered batch id must no-op even after its
    segment was folded — then answers per-flag p50/p95/p99 estimates
    PLUS the global row obtained by re-merging the per-flag sketches
    through the same merge_aggs monoid.

    Because counter addition is exact, the maintained sketch equals the
    one-shot sketch of the whole corpus: the DuckDB oracle never
    simulates batches — it buckets the raw table directly and must agree
    bit-for-bit (integer bucket math, integer cumulative ranks).

    Scale: sketch state is O(log(max) * DD_SUB) counters per key
    forever; each micro-batch ships one pre-aggregated partial (map-side
    combinable); the quantile read touches O(|grid| * buckets) counter
    rows — never the raw corpus. This is p99-latency-per-service at
    100 TB without re-scanning events."""
    from ..storage.rollup import (
        merge_aggs,
        projection_append,
        projection_compact,
        projection_scan,
    )

    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    ).filter(F.col("cents") >= 1)
    root = tempfile.mkdtemp(prefix="ddm_store_")
    store = os.path.join(root, "flag_price_sketch")
    try:
        # r12 (second pass): ONE lineitem scan feeds every batch partial
        # (and the redelivered one). The raw file is one unsplittable row
        # group, so the five per-batch bucket aggregations each re-ran the
        # whole scan serially; bucketing per (batch, flag, bucket) once and
        # slicing per batch yields bit-identical partials — the counts are
        # exact integers and filter-then-bucket commutes with
        # bucket-with-batch-key-then-slice. The checkpoint holds
        # ~batches x flags x buckets counter rows, never raw lineitem.
        b_expr = (F.length(F.conv(F.col("cents"), 10, 2)) - 1).cast("int")
        low = F.expr("shiftleft(cast(1 as bigint), b)")
        pre = (
            li.withColumn("bat", F.col("l_orderkey") % DDM_BATCHES)
            .withColumn("b", b_expr).withColumn("low", low)
            .select(
                "bat", "l_returnflag",
                (F.col("b").cast("bigint") * DD_SUB
                 + ((F.col("cents") - F.col("low")) * DD_SUB / F.col("low"))
                 .cast("bigint")).alias("bucket"),
            )
            .groupBy("bat", "l_returnflag", "bucket")
            .agg(F.count("*").alias("n"))
            .localCheckpoint(eager=True)
        )

        def _partial(b: int) -> DataFrame:
            return (
                pre.filter(F.col("bat") == b)
                .groupBy("l_returnflag")
                .agg(
                    F.sum("n").alias("n_rows"),
                    F.map_from_entries(
                        F.collect_list(F.struct("bucket", "n"))).alias("sk"),
                )
            )

        def _append(b: int) -> None:
            assert projection_append(
                spark, store, _partial(b), f"b{b}",
                keys=["l_returnflag"], sums=["n_rows"], hists=["sk"],
            ) is True

        # r12: the lifecycle stays mid-fold-after-two-batches (the pin this
        # entry exists for), but the two appends on each side of the fold
        # are independent micro-batches — overlap them (guide §2.6;
        # projection_append materializes segments outside the store lock)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            list(pool.map(_append, (0, 1)))
        # mid-lifecycle fold: scan must be invariant
        projection_compact(spark, store, ["l_returnflag"],
                           ["n_rows"], hists=["sk"])
        with ThreadPoolExecutor(max_workers=2) as pool:
            list(pool.map(_append, (2, 3)))
        # exactly-once: b0 was folded, so this exercises _folded.json
        redelivered = _partial(0)
        assert projection_append(spark, store, redelivered, "b0") is False
        scan = projection_scan(spark, store, ["l_returnflag"], ["n_rows"],
                               hists=["sk"])
        glob = (
            scan.groupBy()
            .agg(*merge_aggs(["n_rows"], hists=["sk"]))
            .select(F.lit("*").alias("l_returnflag"), "n_rows", "sk")
        )
        both = scan.unionByName(glob)
        exploded = both.select(
            F.col("l_returnflag").alias("k"),
            F.col("n_rows"),
            F.explode("sk").alias("bucket", "n"),
        )
        qd = _dd_quantiles(exploded.select("k", "bucket", "n"))
        out = (
            both.select(F.col("l_returnflag").alias("k"), "n_rows")
            .join(qd, "k")
            .select(
                F.col("k").alias("l_returnflag"), "n_rows", "tw",
                "p50_est", "p95_est", "p99_est",
            )
            .orderBy("l_returnflag")
        )
        rows = out.collect()
        return local_result(spark, 
            rows,
            "l_returnflag string, n_rows bigint, tw bigint, "
            "p50_est bigint, p95_est bigint, p99_est bigint",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


DDM_SQL = f"""
WITH li AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
  WHERE CAST(round(l_extendedprice * 100) AS BIGINT) >= 1
), enc AS (
  SELECT l_returnflag,
         (length(bin(cents)) - 1) * {DD_SUB}
         + ((cents - (1::BIGINT << (length(bin(cents)) - 1))) * {DD_SUB})
           // (1::BIGINT << (length(bin(cents)) - 1)) AS bucket
  FROM li
), keyed AS (
  SELECT l_returnflag AS k, bucket, count(*) AS n FROM enc GROUP BY 1, 2
  UNION ALL
  SELECT '*' AS k, bucket, count(*) AS n FROM enc GROUP BY 1, 2
), ranked AS (
  SELECT k, bucket, n,
         (({DD_SUB} + bucket % {DD_SUB})
          * (1::BIGINT << CAST(bucket // {DD_SUB} AS INTEGER)))
         // {DD_SUB} AS bucket_low
  FROM keyed
), tot AS (
  SELECT k, sum(n) AS tw FROM ranked GROUP BY 1
), cum AS (
  SELECT r.k, r.bucket_low, t.tw,
         sum(r.n) OVER (PARTITION BY r.k ORDER BY r.bucket) AS cw
  FROM ranked r JOIN tot t USING (k)
), est AS (
  SELECT k, CAST(max(tw) AS BIGINT) AS tw,
         CAST(min(CASE WHEN cw * 100 >= ceil(tw * 0.5 * 100)
                       THEN bucket_low END) AS BIGINT) AS p50_est,
         CAST(min(CASE WHEN cw * 100 >= ceil(tw * 0.95 * 100)
                       THEN bucket_low END) AS BIGINT) AS p95_est,
         CAST(min(CASE WHEN cw * 100 >= ceil(tw * 0.99 * 100)
                       THEN bucket_low END) AS BIGINT) AS p99_est
  FROM cum GROUP BY 1
), nr AS (
  SELECT l_returnflag AS k, count(*) AS n_rows FROM li GROUP BY 1
  UNION ALL
  SELECT '*' AS k, count(*) AS n_rows FROM li
)
SELECT nr.k AS l_returnflag,
       CAST(nr.n_rows AS BIGINT) AS n_rows,
       e.tw, e.p50_est, e.p95_est, e.p99_est
FROM nr JOIN est e USING (k)
ORDER BY 1
"""




# --- dedup_unicode_nfc: normalization-aware exact dedup ---------------------

_COMBINING_ACUTE = "\u0301"   # a + U+0301 == NFC => U+00E1 (á)
_A_ACUTE = "\u00e1"


def _nfc_udf():
    """Unicode NFC via the stdlib (UAX #15) — vectorized Arrow batches;
    the one legitimate Python stage (Spark has no normalization
    builtin). Built lazily: pandas_udf registration needs an active
    SparkSession, which does not exist at import time."""

    @pandas_udf("string")
    def nfc(texts: pd.Series) -> pd.Series:
        import unicodedata

        return texts.map(lambda t: unicodedata.normalize("NFC", t)
                         if t is not None else None)

    return nfc


def dedup_unicode_nfc(spark: SparkSession, sf: str) -> DataFrame:
    """Normalization-aware exact dedup (the pass every multilingual
    corpus needs BEFORE hashing): canonically-equivalent strings with
    different codepoint sequences — here composed U+00E1 vs decomposed
    a+U+0301 variants planted per document — hash apart raw and collapse
    under Unicode NFC. Per lang: variant rows, distinct raw hashes,
    distinct NFC hashes; docs containing no 'a' produce byte-identical
    variants (the raw distinct count already collapses those), so the
    three counts pin both the normalization and the planting.

    Oracle: DuckDB's utf8proc nfc_normalize vs Python's unicodedata —
    two independent UAX #15 implementations must agree on every
    document, or the hash mismatches.

    Scale: one narrow map (JVM replace + one Arrow-batched NFC stage) +
    one hash agg; no shuffle beyond the count-distincts."""
    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "text")
    composed = docs.select(
        "doc_id", "lang",
        F.regexp_replace("text", "a", _A_ACUTE).alias("t"))
    decomposed = docs.select(
        "doc_id", "lang",
        F.regexp_replace("text", "a", "a" + _COMBINING_ACUTE).alias("t"))
    variants = composed.unionByName(decomposed)
    nfc = _nfc_udf()
    hashed = variants.select(
        "lang",
        F.md5("t").alias("h_raw"),
        F.md5(nfc(F.col("t"))).alias("h_nfc"),
    )
    return (
        hashed.groupBy("lang")
        .agg(
            F.count("*").alias("n_variants"),
            F.countDistinct("h_raw").alias("distinct_raw"),
            F.countDistinct("h_nfc").alias("distinct_nfc"),
        )
        .orderBy("lang")
    )


NFC_SQL = """
WITH v AS (
  SELECT lang, replace(text, 'a', chr(225)) AS t FROM documents
  UNION ALL
  SELECT lang, replace(text, 'a', 'a' || chr(769)) AS t FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_variants,
       CAST(count(DISTINCT md5(t)) AS BIGINT) AS distinct_raw,
       CAST(count(DISTINCT md5(nfc_normalize(t))) AS BIGINT) AS distinct_nfc
FROM v
GROUP BY lang
ORDER BY lang
"""



QUERIES: dict[str, QuerySpec] = {
    "ddsketch_maintained": QuerySpec(
        ddsketch_maintained, DDM_SQL,
        doc="continuous approx-quantiles: a DDSketch bucket-counter "
            "histogram column class (map<bigint,bigint>, key-wise counter "
            "addition monoid) in the maintained projection store; "
            "fold-invariant, redelivery-idempotent; per-key + merged-"
            "global p50/p95/p99 with integer-exact bucket math",
    ),
    "dedup_unicode_nfc": QuerySpec(
        dedup_unicode_nfc, NFC_SQL,
        doc="normalization-aware dedup: composed vs decomposed variants "
            "hash apart raw and collapse under NFC (stdlib unicodedata "
            "vs DuckDB utf8proc — two independent UAX#15 impls must "
            "agree per document)",
    ),
}
