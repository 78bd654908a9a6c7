"""Round-4 curation batch: normalization-insensitive near-exact dedup
(the C4/RefinedWeb pre-pass), Bloom-sketch benchmark decontamination
(O(1)-memory membership at 100 TB), degenerate-repetition detection
(looping-generation filter), and minhash shard-merge algebra (the
monoid property that makes incremental dedup possible).

Reference scope: the reference (hepop.js) stores payloads and delegates
SQL; none of these curation operators exist there — they are the
LLM-pipeline surface this engine adds on top, per the build brief.

Engine-parity rules as established across llm*.py: md5-derived 48-bit
integer hashes via the '0x'||substr trick, DECIMAL(38,0) accumulators
for hash checksums (BIGINT overflows past ~32k 48-bit terms), exact
integer arithmetic everywhere, RE2-safe regexes only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# dedup_norm_whitespace — normalization-insensitive near-exact dedup
# ---------------------------------------------------------------------------

NORM_PLANT_MOD = 97
NORM_PLANT_OFFSET = 10_000_000


def _with_norm_variants(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus plus planted formatting variants: every 97th doc gets a copy
    whose text differs ONLY in case / punctuation / whitespace (initcap,
    doubled spaces, trailing bang) — the deterministic stand-in for the
    scraped-twice-with-different-markup pages a web corpus contains. Both
    engines replant identically, so the groups are oracle-checkable."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    variants = docs.filter(F.col("doc_id") % NORM_PLANT_MOD == 0).select(
        (F.col("doc_id") + NORM_PLANT_OFFSET).alias("doc_id"),
        F.concat(
            F.initcap(F.regexp_replace("text", " ", "  ")), F.lit(" !")
        ).alias("text"),
    )
    return docs.unionByName(variants)


def dedup_norm_whitespace(spark: SparkSession, sf: str) -> DataFrame:
    """Near-exact dedup on the NORMALIZED text (lowercase, punctuation
    stripped, whitespace collapsed) — the C4-style pre-pass that catches
    re-scrapes and markup variants that raw-hash dedup_exact misses.
    Output: one row per normalized group with >= 2 members (group key =
    md5 of the normal form), member count and id range.

    Scale: one narrow normalize pass + a hash groupBy — exactly
    dedup_exact's shape (map-side combinable, shuffles only
    (hash, count) pairs), so it inherits that entry's 100 TB story."""
    base = _with_norm_variants(spark, sf)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return (
        base.select("doc_id", F.md5(norm).alias("norm_hash"))
        .groupBy("norm_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("rep_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            "norm_hash",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("rep_doc").cast("long").alias("rep_doc"),
            F.col("max_doc").cast("long").alias("max_doc"),
        )
        .orderBy("norm_hash")
    )


_NORM_BASE_SQL = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {NORM_PLANT_OFFSET} AS doc_id,
         -- initcap twin: DuckDB has no initcap; capitalizing each
         -- space-separated word of the doubled-space text reproduces it
         -- exactly on [a-z ]-only corpus text
         array_to_string(
           list_transform(string_split(replace(text, ' ', '  '), ' '),
             w -> CASE WHEN len(w) = 0 THEN w
                       ELSE upper(substr(w, 1, 1)) || substr(w, 2) END),
           ' ') || ' !' AS text
  FROM documents WHERE doc_id % {NORM_PLANT_MOD} = 0
"""

NORM_DEDUP_SQL = f"""
WITH base AS ({_NORM_BASE_SQL}),
normed AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                 ' +', ' ', 'g'))) AS norm_hash
  FROM base
)
SELECT norm_hash, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS rep_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM normed
GROUP BY norm_hash
HAVING count(*) >= 2
ORDER BY norm_hash
"""


# ---------------------------------------------------------------------------
# bloom_decontaminate — Bloom-sketch benchmark-membership scan
# ---------------------------------------------------------------------------

BLOOM_WORDS = 1024  # 1024 words x 61 bits = 62 Kbit sketch (8 KB broadcast)
BLOOM_BITS = 61  # bits per word: prime (decorrelates from the word index),
                 # and < 63 so the shift is legal under checked arithmetic
BLOOM_PROBE_MOD = 211
BLOOM_GRAM = 5


def _shingles(df: DataFrame) -> DataFrame:
    """Distinct 5-token shingles per doc (1-based positions, both engines)."""
    # Short-doc guard: sequence(1, 0) is the DESCENDING [1, 0] in Spark and
    # slice(arr, 0, k) then raises INVALID_PARAMETER_VALUE.START; the oracle's
    # range() yields zero grams instead, so gate on token count explicitly.
    grams = F.expr(
        f"case when size(split(text, ' ')) >= {BLOOM_GRAM} then "
        f"transform(sequence(1, size(split(text, ' ')) - {BLOOM_GRAM - 1}), "
        f"i -> concat_ws(' ', slice(split(text, ' '), i, {BLOOM_GRAM}))) "
        f"else array() end"
    )
    return df.select("doc_id", "source", F.explode(grams).alias("gram")).distinct()


def bloom_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination via a BLOOM SKETCH instead of a set join:
    the benchmark's 5-gram shingles (docs with id % 211 == 0) are folded
    into a fixed 64-Kbit / two-hash Bloom filter; the corpus is then
    scanned for membership. Per source: documents flagged, grams flagged,
    grams scanned. False positives are a property of the SKETCH (identical
    md5-derived bit positions in both engines), so the result is exactly
    reproducible — and the operational point is the memory shape:

    Scale: the sketch is 8 KB regardless of benchmark size (vs
    decontaminate_exact_substring's broadcast of the probe strings
    themselves); build is one aggregation over benchmark shingles, the
    scan is a narrow per-shingle hash + two broadcast-join bit tests.
    At 100 TB the sketch rides the task closure; nothing else moves."""
    docs = load_table(spark, sf, "documents")
    sh = _shingles(docs.select("doc_id", "source", "text"))
    h1 = F.conv(F.substring(F.md5(F.col("gram")), 1, 12), 16, 10).cast("long")
    h2 = F.conv(
        F.substring(F.md5(F.concat(F.lit("s2:"), F.col("gram"))), 1, 12), 16, 10
    ).cast("long")
    hashed = sh.select(
        "doc_id",
        "source",
        (F.floor(h1 / BLOOM_BITS) % BLOOM_WORDS).cast("long").alias("w1"),
        (h1 % BLOOM_BITS).cast("int").alias("b1"),
        (F.floor(h2 / BLOOM_BITS) % BLOOM_WORDS).cast("long").alias("w2"),
        (h2 % BLOOM_BITS).cast("int").alias("b2"),
    )
    bench = hashed.filter(F.col("doc_id") % BLOOM_PROBE_MOD == 0)
    sketch = (
        bench.select(F.col("w1").alias("w"), F.col("b1").alias("b"))
        .unionByName(bench.select(F.col("w2").alias("w"), F.col("b2").alias("b")))
        .groupBy("w")
        .agg(F.bit_or(F.expr("shiftleft(cast(1 as bigint), b)")).alias("bits"))
    )
    s1 = sketch.select(F.col("w").alias("w1"), F.col("bits").alias("bits1"))
    s2 = sketch.select(F.col("w").alias("w2"), F.col("bits").alias("bits2"))
    member = (
        hashed.join(F.broadcast(s1), "w1", "left")
        .join(F.broadcast(s2), "w2", "left")
        .withColumn(
            "hit",
            (
                F.expr("coalesce(bits1, 0L) & shiftleft(cast(1 as bigint), b1)") != 0
            )
            & (
                F.expr("coalesce(bits2, 0L) & shiftleft(cast(1 as bigint), b2)") != 0
            ),
        )
    )
    return (
        member.groupBy("source")
        .agg(
            F.countDistinct(F.when(F.col("hit"), F.col("doc_id"))).alias(
                "n_docs_flagged"
            ),
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_grams_flagged"),
            F.count("*").alias("n_grams_scanned"),
        )
        .select(
            "source",
            F.col("n_docs_flagged").cast("long").alias("n_docs_flagged"),
            F.col("n_grams_flagged").cast("long").alias("n_grams_flagged"),
            F.col("n_grams_scanned").cast("long").alias("n_grams_scanned"),
        )
        .orderBy("source")
    )


BLOOM_DECON_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, source, gram
  FROM (
    SELECT doc_id, source,
           unnest(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - {BLOOM_GRAM - 2}, 1)),
             i -> array_to_string(string_split(text, ' ')[i:i+{BLOOM_GRAM - 1}], ' ')
           )) AS gram
    FROM documents
  )
),
hashed AS (
  SELECT doc_id, source,
         CAST(floor(CAST(('0x' || substr(md5(gram), 1, 12)) AS BIGINT) / {BLOOM_BITS}) AS BIGINT)
           % {BLOOM_WORDS} AS w1,
         CAST(('0x' || substr(md5(gram), 1, 12)) AS BIGINT) % {BLOOM_BITS} AS b1,
         CAST(floor(CAST(('0x' || substr(md5('s2:' || gram), 1, 12)) AS BIGINT) / {BLOOM_BITS}) AS BIGINT)
           % {BLOOM_WORDS} AS w2,
         CAST(('0x' || substr(md5('s2:' || gram), 1, 12)) AS BIGINT) % {BLOOM_BITS} AS b2
  FROM sh
),
bench AS (SELECT * FROM hashed WHERE doc_id % {BLOOM_PROBE_MOD} = 0),
sketch AS (
  SELECT w, bit_or(1::BIGINT << b) AS bits FROM (
    SELECT w1 AS w, b1 AS b FROM bench
    UNION ALL
    SELECT w2 AS w, b2 AS b FROM bench
  ) GROUP BY w
),
member AS (
  SELECT h.doc_id, h.source,
         (coalesce(s1.bits, 0) & (1::BIGINT << h.b1)) != 0
         AND (coalesce(s2.bits, 0) & (1::BIGINT << h.b2)) != 0 AS hit
  FROM hashed h
  LEFT JOIN sketch s1 ON s1.w = h.w1
  LEFT JOIN sketch s2 ON s2.w = h.w2
)
SELECT source,
       CAST(count(DISTINCT CASE WHEN hit THEN doc_id END) AS BIGINT) AS n_docs_flagged,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_grams_flagged,
       CAST(count(*) AS BIGINT) AS n_grams_scanned
FROM member
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# ngram_repetition_loop — degenerate-repetition (looping text) detector
# ---------------------------------------------------------------------------

LOOP_MIN_REPEATS = 4
LOOP_PLANT_MOD = 89
LOOP_PLANT_TAIL = " loop beam" * 6  # 6 repeats of a 2-token phrase


def ngram_repetition_loop(spark: SparkSession, sf: str) -> DataFrame:
    """Looping-generation detector: per document, the dominant 3-gram's
    occurrence count — documents whose single most frequent 3-gram
    appears >= 4 times are flagged (model-generated or boilerplate text
    loops; a standard quality filter beside text_repetition_score's
    character-level ratio). Ties broken by the lexicographically GREATEST
    gram so the reported gram is unique. Every 89th doc gets a planted
    degenerate tail (the testdata corpus's natural top-3-gram count is
    <= 3, so the plant is what a flagged doc looks like; both engines
    replant identically).

    Scale: gram explosion is narrow (n-2 rows per doc), the count is a
    map-side-combinable groupBy, and the per-doc argmax window partitions
    on doc_id — no global operator anywhere."""
    docs = load_table(spark, sf, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % LOOP_PLANT_MOD == 0,
            F.concat(F.col("text"), F.lit(LOOP_PLANT_TAIL)),
        ).otherwise(F.col("text")),
    )
    # Short-doc guard (see _shingles): avoid sequence(1, 0) → [1, 0].
    grams = F.expr(
        "case when size(split(text, ' ')) >= 3 then "
        "transform(sequence(1, size(split(text, ' ')) - 2), "
        "i -> concat_ws(' ', slice(split(text, ' '), i, 3))) "
        "else array() end"
    )
    counts = (
        docs.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("n").desc(), F.col("gram").desc())
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") == 1) & (F.col("n") >= LOOP_MIN_REPEATS))
        .select(
            "doc_id",
            F.col("gram").alias("top_gram"),
            F.col("n").cast("long").alias("n_repeats"),
        )
        .orderBy("doc_id")
    )


LOOP_SQL = f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {LOOP_PLANT_MOD} = 0
              THEN text || '{LOOP_PLANT_TAIL}' ELSE text END AS text
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
           i -> array_to_string(string_split(text, ' ')[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ')
         )) AS gram
  FROM planted
),
counts AS (
  SELECT doc_id, gram, count(*) AS n FROM grams GROUP BY 1, 2
)
SELECT doc_id, gram AS top_gram, CAST(n AS BIGINT) AS n_repeats
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, gram DESC) AS rk
  FROM counts)
WHERE rk = 1 AND n >= {LOOP_MIN_REPEATS}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# minhash_merge_shards — signature merge algebra (incremental dedup)
# ---------------------------------------------------------------------------

MERGE_K = 16
MERGE_MOD = 281474976710656  # 2^48, the hash value space


def minhash_merge_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Proof-by-computation that minhash signatures form a MERGE MONOID:
    each doc's shingles are split into two shards (odd/even positions —
    the stand-in for two ingest batches), per-shard signatures are merged
    by element-wise min, and the merge must equal the signature computed
    directly over all shingles. Per source: docs checked, mismatches
    (must be 0), and a DECIMAL-accumulated checksum of the merged
    signatures (mod 2^48) pinning the actual values.

    This property is WHY 100 TB dedup can run incrementally: shard
    signatures are computed shard-parallel at ingest and merged later —
    no re-scan of old data when a new batch lands (the same algebra
    dedup_incremental exercises operationally).

    Scale: shingle explosion is narrow; signatures are one groupBy(doc,
    hash-index) min; the verification join is per-doc."""
    docs = load_table(spark, sf, "documents").select("doc_id", "source", "text")
    # Short-doc guard (see _shingles): avoid sequence(1, 0) → [1, 0].
    grams = F.expr(
        "case when size(split(text, ' ')) >= 5 then "
        "transform(sequence(1, size(split(text, ' ')) - 4), "
        "i -> concat_ws(' ', slice(split(text, ' '), i, 5))) "
        "else array() end"
    )
    sh = docs.select(
        "doc_id", "source", F.posexplode(grams).alias("pos", "gram")
    )
    idx = F.explode(F.sequence(F.lit(0), F.lit(MERGE_K - 1))).alias("j")
    hashed = sh.select("doc_id", "source", "pos", "gram", idx).select(
        "doc_id",
        "source",
        "pos",
        "j",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("gram"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long").alias("h"),
    )
    direct = hashed.groupBy("doc_id", "source", "j").agg(F.min("h").alias("sig"))
    sha = (
        hashed.filter(F.col("pos") % 2 == 0)
        .groupBy("doc_id", "j")
        .agg(F.min("h").alias("sig_a"))
    )
    shb = (
        hashed.filter(F.col("pos") % 2 == 1)
        .groupBy("doc_id", "j")
        .agg(F.min("h").alias("sig_b"))
    )
    merged = (
        direct.join(sha, ["doc_id", "j"], "left")
        .join(shb, ["doc_id", "j"], "left")
        .withColumn(
            "sig_merged",
            F.least(
                F.coalesce("sig_a", F.lit(MERGE_MOD)),
                F.coalesce("sig_b", F.lit(MERGE_MOD)),
            ),
        )
    )
    return (
        merged.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum(
                F.when(F.col("sig_merged") != F.col("sig"), 1).otherwise(0)
            ).alias("n_mismatch"),
            (
                F.sum(F.col("sig_merged").cast("decimal(38,0)"))
                % F.lit(MERGE_MOD)
            ).cast("long").alias("sig_checksum"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_mismatch").cast("long").alias("n_mismatch"),
            "sig_checksum",
        )
        .orderBy("source")
    )


MERGE_SQL = f"""
WITH sh AS (
  SELECT doc_id, source, t.i - 1 AS pos,
         array_to_string(string_split(text, ' ')[CAST(t.i AS INTEGER):CAST(t.i + 4 AS INTEGER)], ' ') AS gram
  FROM documents,
       unnest(range(1, greatest(len(string_split(text, ' ')) - 3, 1))) t(i)
),
hashed AS (
  SELECT doc_id, source, pos, j.j,
         CAST(('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || gram), 1, 12)) AS BIGINT) AS h
  FROM sh, (SELECT unnest(range({MERGE_K})) AS j) j
),
direct AS (
  SELECT doc_id, source, j, min(h) AS sig FROM hashed GROUP BY 1, 2, 3
),
sa AS (
  SELECT doc_id, j, min(h) AS sig_a FROM hashed WHERE pos % 2 = 0 GROUP BY 1, 2
),
sb AS (
  SELECT doc_id, j, min(h) AS sig_b FROM hashed WHERE pos % 2 = 1 GROUP BY 1, 2
),
merged AS (
  SELECT d.doc_id, d.source, d.j, d.sig,
         least(coalesce(sa.sig_a, {MERGE_MOD}), coalesce(sb.sig_b, {MERGE_MOD})) AS sig_merged
  FROM direct d
  LEFT JOIN sa ON sa.doc_id = d.doc_id AND sa.j = d.j
  LEFT JOIN sb ON sb.doc_id = d.doc_id AND sb.j = d.j
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN sig_merged != sig THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
       CAST(CAST(sum(CAST(sig_merged AS HUGEINT)) AS HUGEINT) % {MERGE_MOD} AS BIGINT) AS sig_checksum
FROM merged
GROUP BY source
ORDER BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "dedup_norm_whitespace": QuerySpec(
        dedup_norm_whitespace, NORM_DEDUP_SQL,
        "normalization-insensitive near-exact dedup (C4-style pre-pass)",
    ),
    "bloom_decontaminate": QuerySpec(
        bloom_decontaminate, BLOOM_DECON_SQL,
        "Bloom-sketch benchmark decontamination, 8 KB membership state",
    ),
    "ngram_repetition_loop": QuerySpec(
        ngram_repetition_loop, LOOP_SQL,
        "dominant-3-gram looping-text detector",
    ),
    "minhash_merge_shards": QuerySpec(
        minhash_merge_shards, MERGE_SQL,
        "minhash shard-merge monoid verification + signature checksum",
    ),
}


# ---------------------------------------------------------------------------
# curriculum_shard_roundrobin — rank-ordered round-robin shard assignment
# ---------------------------------------------------------------------------

CURR_SHARDS = 8


def curriculum_shard_roundrobin(spark: SparkSession, sf: str) -> DataFrame:
    """Curriculum sharding: documents ordered easiest-first (quality proxy
    = n_chars, ties by doc_id) are dealt round-robin into 8 training
    shards, so every shard sees the same difficulty mixture — then each
    shard's size and total quality mass are reported for balance review.

    The scale trick mirrors quantile_bins_equidepth: NO row-level global
    rank is ever computed. Per n_chars value the cumulative window (over
    the bounded distinct-quality grid) gives the group's global position
    range [start+1, start+n]; the number of that group's rows landing in
    shard s is the CLOSED-FORM count of positions p in the range with
    (p-1) % K == s — g(end) - g(start) with g(x) = (x-1-s) div K + 1 for
    x >= s+1 (all operands non-negative, so truncating and flooring
    division agree on both engines). Ties within a group are
    interchangeable for every reported aggregate because they share the
    quality value.

    Scale: one groupBy on the quality grid + a bounded-domain window + an
    8-row broadcast — corpus-linear with no global sort anywhere."""
    docs = load_table(spark, sf, "documents")
    per = docs.groupBy("n_chars").agg(F.count("*").alias("n_c"))
    wcum = Window.orderBy("n_chars")  # distinct n_chars grid: bounded
    cum = per.withColumn("end_pos", F.sum("n_c").over(wcum)).withColumn(
        "start_pos", F.col("end_pos") - F.col("n_c")
    )
    shards = spark.range(CURR_SHARDS).select(F.col("id").cast("long").alias("shard"))
    g_end = F.when(
        F.col("end_pos") >= F.col("shard") + 1,
        F.expr(f"(end_pos - 1 - shard) div {CURR_SHARDS}") + 1,
    ).otherwise(F.lit(0))
    g_start = F.when(
        F.col("start_pos") >= F.col("shard") + 1,
        F.expr(f"(start_pos - 1 - shard) div {CURR_SHARDS}") + 1,
    ).otherwise(F.lit(0))
    return (
        cum.crossJoin(F.broadcast(shards))
        .withColumn("n_in_shard", g_end - g_start)
        .filter(F.col("n_in_shard") > 0)
        .groupBy("shard")
        .agg(
            F.sum("n_in_shard").cast("long").alias("n_docs"),
            F.sum(F.col("n_in_shard") * F.col("n_chars")).cast("long").alias(
                "sum_quality"
            ),
            F.min("n_chars").cast("long").alias("min_quality"),
            F.max("n_chars").cast("long").alias("max_quality"),
        )
        .orderBy("shard")
    )


CURRICULUM_SQL = f"""
WITH per AS (
  SELECT n_chars, count(*) AS n_c FROM documents GROUP BY n_chars
),
cum AS (
  SELECT n_chars, n_c,
         sum(n_c) OVER (ORDER BY n_chars) AS end_pos,
         sum(n_c) OVER (ORDER BY n_chars) - n_c AS start_pos
  FROM per
),
dealt AS (
  SELECT c.n_chars, c.n_c, s.shard,
         (CASE WHEN c.end_pos >= s.shard + 1
               THEN (c.end_pos - 1 - s.shard) // {CURR_SHARDS} + 1 ELSE 0 END)
         - (CASE WHEN c.start_pos >= s.shard + 1
                 THEN (c.start_pos - 1 - s.shard) // {CURR_SHARDS} + 1 ELSE 0 END)
           AS n_in_shard
  FROM cum c CROSS JOIN (SELECT unnest(range({CURR_SHARDS})) AS shard) s
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(sum(n_in_shard) AS BIGINT) AS n_docs,
       CAST(sum(n_in_shard * n_chars) AS BIGINT) AS sum_quality,
       CAST(min(n_chars) AS BIGINT) AS min_quality,
       CAST(max(n_chars) AS BIGINT) AS max_quality
FROM dealt
WHERE n_in_shard > 0
GROUP BY shard
ORDER BY shard
"""

QUERIES["curriculum_shard_roundrobin"] = QuerySpec(
    curriculum_shard_roundrobin, CURRICULUM_SQL,
    "round-robin curriculum sharding on the aggregated quality grid",
)


# ---------------------------------------------------------------------------
# dedup_minhash_recall_eval — ground-truth recall of the minhash pipeline
# ---------------------------------------------------------------------------

DEDUP_EVAL_MOD = 53
DEDUP_EVAL_OFFSET = 20_000_000


def dedup_minhash_recall_eval(spark: SparkSession, sf: str) -> DataFrame:
    """The dedup twin of ann_recall_eval: every 53rd document (with >= 10
    tokens) gets a planted NEAR-duplicate — the same text with its third
    token deleted (shingle-set Jaccard ~0.96, above the pipeline's
    threshold) — and the FULL production minhash pipeline
    (llm.dedup_minhash_lsh's signature -> band -> candidate -> exact-verify
    chain, unchanged) runs over the planted corpus. Reported: planted
    pairs, planted pairs the pipeline recovered (its measured recall on
    known-positive near-dups), and total verified pairs (candidate volume
    sanity). This is the harness that catches a silent banding/threshold
    regression the way ann_recall_eval catches an ANN one.

    Scale: inherits dedup_minhash_lsh's shape exactly (bounded-key hash
    shuffles; quadratic work confined to band buckets); the plant is a
    narrow map over a 1/53 slice."""
    from .llm import _minhash_pairs

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    elig = (F.col("doc_id") % DEDUP_EVAL_MOD == 0) & (
        F.size(F.split("text", " ")) >= 10
    )
    variants = docs.filter(elig).select(
        (F.col("doc_id") + DEDUP_EVAL_OFFSET).alias("doc_id"),
        F.expr(
            "concat_ws(' ', concat(slice(split(text, ' '), 1, 2), "
            "slice(split(text, ' '), 4, size(split(text, ' ')) - 3)))"
        ).alias("text"),
    )
    base = docs.unionByName(variants)
    pairs = _minhash_pairs(base).select("da", "db")
    n_planted = docs.filter(elig).agg(F.count("*").alias("n_planted"))
    return (
        pairs.agg(
            F.count("*").cast("long").alias("n_pairs_total"),
            F.sum(
                F.when(
                    (F.col("db") == F.col("da") + DEDUP_EVAL_OFFSET)
                    & (F.col("da") % DEDUP_EVAL_MOD == 0)
                    & (F.col("da") < DEDUP_EVAL_OFFSET),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_caught"),
        )
        .crossJoin(F.broadcast(n_planted))
        .select(
            F.col("n_planted").cast("long").alias("n_planted"),
            "n_caught",
            "n_pairs_total",
        )
    )


def _dedup_eval_sql() -> str:
    from .llm import DEDUP_MINHASH_SQL

    inner = DEDUP_MINHASH_SQL.replace("FROM documents)", "FROM eval_base)")
    assert inner != DEDUP_MINHASH_SQL, "table substitution failed"
    return f"""
WITH eval_base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {DEDUP_EVAL_OFFSET} AS doc_id,
         array_to_string(list_concat(
           string_split(text, ' ')[1:2],
           string_split(text, ' ')[4:len(string_split(text, ' '))]), ' ') AS text
  FROM documents
  WHERE doc_id % {DEDUP_EVAL_MOD} = 0 AND len(string_split(text, ' ')) >= 10
),
pairs AS (SELECT da, db FROM ({inner}) q),
planted AS (
  SELECT count(*) AS n_planted FROM documents
  WHERE doc_id % {DEDUP_EVAL_MOD} = 0 AND len(string_split(text, ' ')) >= 10
)
SELECT CAST(p.n_planted AS BIGINT) AS n_planted,
       CAST((SELECT count(*) FROM pairs
             WHERE db = da + {DEDUP_EVAL_OFFSET}
               AND da % {DEDUP_EVAL_MOD} = 0
               AND da < {DEDUP_EVAL_OFFSET}) AS BIGINT) AS n_caught,
       CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_pairs_total
FROM planted p
"""


QUERIES["dedup_minhash_recall_eval"] = QuerySpec(
    dedup_minhash_recall_eval, _dedup_eval_sql(),
    "planted near-dup ground truth through the full minhash pipeline",
)


# ---------------------------------------------------------------------------
# length_bucket_padding — length-grouped batching efficiency accounting
# ---------------------------------------------------------------------------

PAD_BATCH = 32


def length_bucket_padding(spark: SparkSession, sf: str) -> DataFrame:
    """Length-grouped batching plan: documents are bucketed by token count
    on a power-of-two grid (the standard trick that keeps sequences of
    similar length together so attention batches waste little padding);
    per bucket: docs, batches of 32, and the EXACT padding waste when
    each bucket pads to ITS OWN longest member — plus the waste a single
    global max-length pad would have cost, the delta a training-infra
    review wants to see (bucket padding can never exceed global padding,
    pinned by test). All exact integer arithmetic (token counts, counts,
    sums), so both engines agree bit-for-bit.

    Scale: one narrow token-count pass + a groupBy on the ~log-many
    bucket key with a broadcast 1-row global max — no sort, no window."""
    docs = load_table(spark, sf, "documents")
    n_toks = F.size(F.split("text", " "))
    bucket_hi = F.pow(F.lit(2.0), F.ceil(F.log2(F.greatest(n_toks, F.lit(1))))).cast(
        "long"
    )
    base = docs.select(
        n_toks.alias("n_toks"), bucket_hi.alias("bucket_hi")
    )
    gmax = base.agg(F.max("n_toks").alias("global_max"))
    return (
        base.crossJoin(F.broadcast(gmax))
        .groupBy("bucket_hi")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("n_toks").alias("bucket_max"),
            F.sum("n_toks").alias("sum_toks"),
            F.max("global_max").alias("global_max"),
        )
        .select(
            F.col("bucket_hi").cast("long").alias("bucket_hi"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.expr(f"cast(ceil(n_docs / {PAD_BATCH}.0) as bigint)").alias("n_batches"),
            (F.col("n_docs") * F.col("bucket_max") - F.col("sum_toks"))
            .cast("long").alias("pad_bucketed"),
            (F.col("n_docs") * F.col("global_max") - F.col("sum_toks"))
            .cast("long").alias("pad_global"),
        )
        .orderBy("bucket_hi")
    )


LENGTH_BUCKET_SQL = f"""
WITH base AS (
  SELECT len(string_split(text, ' ')) AS n_toks,
         CAST(power(2, ceil(log2(greatest(len(string_split(text, ' ')), 1)))) AS BIGINT) AS bucket_hi
  FROM documents
),
gmax AS (SELECT max(n_toks) AS global_max FROM base)
SELECT CAST(bucket_hi AS BIGINT) AS bucket_hi,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(ceil(count(*) / {PAD_BATCH}.0) AS BIGINT) AS n_batches,
       CAST(count(*) * max(n_toks) - sum(n_toks) AS BIGINT) AS pad_bucketed,
       CAST(count(*) * max(global_max) - sum(n_toks) AS BIGINT) AS pad_global
FROM base, gmax
GROUP BY bucket_hi
ORDER BY bucket_hi
"""

QUERIES["length_bucket_padding"] = QuerySpec(
    length_bucket_padding, LENGTH_BUCKET_SQL,
    "power-of-two length-bucketed batching with exact padding-waste accounting",
)
