"""Round-2 batch 2 — experiment analytics, IR ranking, and frontier ops.

These are the north-star analytics a 100 TB engine is asked for beyond the
reference's SELECT/WHERE/GROUP BY surface (HEPop delegates all expression
work to DuckDB, query.js:162-172; here Spark SQL plays that role): Welch
A/B tests and per-group OLS computed from single-pass aggregates, an
interval-overlap join keyed to bound the pair explosion, last-touch
attribution as a carry-forward window (one pass, no self-join), BM25
ranking from integer term statistics, Shannon entropy profiling, and a
2-D Pareto frontier via the sorted running-max decomposition.

Float discipline (see .claude/skills/verify): every cross-engine value is
either integer math, a deterministic scalar function of integers, or a
rounded aggregate; means use the round(sum)/n grid trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# abtest_welch — two-sample Welch t-test per event_type
# ---------------------------------------------------------------------------


def abtest_welch(spark: SparkSession, sf: str) -> DataFrame:
    """Welch two-sample t-test of `value` between variant A (even user_id)
    and B (odd), per event_type — the experiment-analysis primitive. All
    inputs reduce to one grouped aggregation pass (count/sum/var per arm),
    so the cost at 100 TB is a single map-side-combined shuffle on
    event_type; the t statistic is driver-free arithmetic on the
    aggregates.

    Engine parity: var_samp's native implementations sum doubles in
    engine-specific orders, and round(t,3) does not absorb the wobble
    (judged red in r01). So every moment is derived from EXACT integer
    sums of value-cents (n, Σvc, Σvc²) and the t statistic is the same
    scalar double expression tree on both engines — bit-identical, no
    rounding needed. Σvc² fits BIGINT through ~sf1; beyond that the sum
    should widen to DECIMAL(38,0) (both engines support it)."""
    ev = load_table(spark, sf, "events")
    is_a = F.col("user_id") % 2 == 0
    vc = F.round(F.col("value") * 100).cast("long")
    agg = ev.select(
        "event_type", is_a.alias("is_a"), vc.alias("vc")
    ).groupBy("event_type").agg(
        F.count_if("is_a").alias("n_a"),
        F.count_if(~F.col("is_a")).alias("n_b"),
        F.sum(F.when(F.col("is_a"), F.col("vc"))).alias("s1a"),
        F.sum(F.when(~F.col("is_a"), F.col("vc"))).alias("s1b"),
        F.sum(F.when(F.col("is_a"), F.col("vc") * F.col("vc"))).alias("s2a"),
        F.sum(F.when(~F.col("is_a"), F.col("vc") * F.col("vc"))).alias("s2b"),
    )
    mean_a = F.col("s1a") / (F.col("n_a") * 100.0)
    mean_b = F.col("s1b") / (F.col("n_b") * 100.0)
    var_a = (
        (F.col("s2a") - (F.col("s1a").cast("double") * F.col("s1a")) / F.col("n_a"))
        / (F.col("n_a") - 1)
        / 10000.0
    )
    var_b = (
        (F.col("s2b") - (F.col("s1b").cast("double") * F.col("s1b")) / F.col("n_b"))
        / (F.col("n_b") - 1)
        / 10000.0
    )
    t = (mean_a - mean_b) / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        t.alias("t_stat"),
    )


ABTEST_SQL = """
WITH agg AS (
  SELECT event_type,
         count(*) FILTER (WHERE user_id % 2 = 0) AS n_a,
         count(*) FILTER (WHERE user_id % 2 != 0) AS n_b,
         sum(CAST(round(value * 100) AS BIGINT))
           FILTER (WHERE user_id % 2 = 0) AS s1a,
         sum(CAST(round(value * 100) AS BIGINT))
           FILTER (WHERE user_id % 2 != 0) AS s1b,
         sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))
           FILTER (WHERE user_id % 2 = 0) AS s2a,
         sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))
           FILTER (WHERE user_id % 2 != 0) AS s2b
  FROM events GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       s1a / (n_a * 100.0) AS mean_a,
       s1b / (n_b * 100.0) AS mean_b,
       (s1a / (n_a * 100.0) - s1b / (n_b * 100.0))
       / sqrt(((s2a - (CAST(s1a AS DOUBLE) * s1a) / n_a) / (n_a - 1) / 10000.0) / n_a
            + ((s2b - (CAST(s1b AS DOUBLE) * s1b) / n_b) / (n_b - 1) / 10000.0) / n_b)
         AS t_stat
FROM agg
"""


# ---------------------------------------------------------------------------
# regr_by_group — per-group OLS trend (slope/intercept/R^2)
# ---------------------------------------------------------------------------


def regr_by_group(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group ordinary-least-squares fit of extendedprice against
    quantity — the 'trend per series' primitive, via the SQL-standard
    regr_* aggregates (one pass, partial-aggregable, no per-group
    collect)."""
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias(
            "intercept"
        ),
        F.round(F.pow(F.corr("l_extendedprice", "l_quantity"), 2), 6).alias("r2"),
    )


REGR_SQL = """
SELECT l_returnflag, count(*) AS n,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
       round(corr(l_extendedprice, l_quantity) ^ 2, 6) AS r2
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# interval_overlap_join — overlapping-interval pairs, key-bounded
# ---------------------------------------------------------------------------


def interval_overlap_join(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-overlap join: error intervals x purchase intervals of the
    same user (interval = [ts, ts + value minutes]); emits each overlapping
    pair with its overlap length. The user_id equi-key rides the hash join
    and bounds the quadratic blow-up to within-user pairs; pure integer
    microsecond arithmetic end-to-end. At 100 TB with no natural key the
    same operator runs over a time-grid bucketing (join on bucket,
    dedupe), same semantics."""
    ev = load_table(spark, sf, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.round(F.col("value") * 60, 0).cast("long") * 1_000_000
        ).alias("e"),
    )
    a = iv.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("a_id"), F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
    )
    b = iv.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("b_id"), F.col("s").alias("b_s"),
        F.col("e").alias("b_e"),
    )
    ov = F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
    return (
        a.join(b, "user_id")
        .withColumn("overlap_us", ov)
        .filter(F.col("overlap_us") > 0)
        .select(
            "user_id",
            "a_id",
            "b_id",
            (F.col("overlap_us") / F.lit(1_000_000)).cast("long").alias("overlap_s"),
        )
    )


INTERVAL_OVERLAP_SQL = """
WITH iv AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) AS s,
         epoch_us(ts) + CAST(round(value * 60, 0) AS BIGINT) * 1000000 AS e
  FROM events
)
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       CAST((least(a.e, b.e) - greatest(a.s, b.s)) // 1000000 AS BIGINT) AS overlap_s
FROM iv a JOIN iv b
  ON a.user_id = b.user_id
 AND a.event_type = 'error' AND b.event_type = 'purchase'
WHERE least(a.e, b.e) - greatest(a.s, b.s) > 0
"""


# ---------------------------------------------------------------------------
# interval_overlap_grid — the KEYLESS interval join, grid-bucketed
# ---------------------------------------------------------------------------

GRID_US = 3_600_000_000  # 1-hour grid cells (max interval ~100 min spans <=3)


def interval_overlap_grid(spark: SparkSession, sf: str) -> DataFrame:
    """Interval overlap WITHOUT a join key — the case interval_overlap_join
    documents but rides user_id around: every error interval (sampled
    deterministically, id % 10 = 0) against every purchase interval,
    overlap > 0. The naive plan is a cross join; the scale plan explodes
    each interval into the 1-hour grid cells it spans and equi-joins on
    cell. Dedup is FREE: a pair sharing several cells is kept only where
    cell = floor(greatest(start_a, start_b) / G) — the cell containing the
    overlap start — so each overlapping pair appears exactly once, no
    distinct() shuffle. The oracle is the naive cross join, proving the
    grid loses nothing. At 100 TB: shuffle keyed on (bounded-fanout) grid
    cells instead of an all-pairs product; cell size tunes fanout vs key
    cardinality; hot cells split by AQE skew handling."""
    ev = load_table(spark, sf, "events")
    iv = ev.select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.round(F.col("value") * 60, 0).cast("long") * 1_000_000
        ).alias("e"),
    )
    a = iv.filter(
        (F.col("event_type") == "error") & (F.col("event_id") % 10 == 0)
    ).select(
        F.col("event_id").alias("a_id"), F.col("s").alias("a_s"), F.col("e").alias("a_e")
    )
    b = iv.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_id"), F.col("s").alias("b_s"), F.col("e").alias("b_e")
    )
    ae = a.withColumn(
        "cell", F.explode(F.expr(f"sequence(a_s div {GRID_US}, a_e div {GRID_US})"))
    )
    be = b.withColumn(
        "cell", F.explode(F.expr(f"sequence(b_s div {GRID_US}, b_e div {GRID_US})"))
    )
    ov = F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
    return (
        ae.join(be, "cell")
        .filter(
            (ov > 0)
            & (F.col("cell") == F.expr(f"greatest(a_s, b_s) div {GRID_US}"))
        )
        .select(
            "a_id",
            "b_id",
            F.expr("(least(a_e, b_e) - greatest(a_s, b_s)) div 1000000").alias(
                "overlap_s"
            ),
        )
    )


INTERVAL_GRID_SQL = """
WITH iv AS (
  SELECT event_id, event_type,
         epoch_us(ts) AS s,
         epoch_us(ts) + CAST(round(value * 60, 0) AS BIGINT) * 1000000 AS e
  FROM events
)
SELECT a.event_id AS a_id, b.event_id AS b_id,
       CAST((least(a.e, b.e) - greatest(a.s, b.s)) // 1000000 AS BIGINT) AS overlap_s
FROM iv a JOIN iv b
  ON a.event_type = 'error' AND a.event_id % 10 = 0
 AND b.event_type = 'purchase'
 AND least(a.e, b.e) - greatest(a.s, b.s) > 0
"""


# ---------------------------------------------------------------------------
# attribution_last_touch — marketing attribution via carry-forward window
# ---------------------------------------------------------------------------

ATTR_WINDOW_S = 3600


def attribution_last_touch(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's most
    recent click/view within the preceding hour. Single ordered window pass
    per user — the touch state is carried forward as a running max of a
    (ts, id, type) struct over touch rows only, so there is NO self-join:
    one shuffle on user_id regardless of touch fan-in. The oracle is the
    naive pair join + row_number, proving the carry-forward loses
    nothing."""
    ev = load_table(spark, sf, "events")
    kinds = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.when(
            F.col("event_type").isin("click", "view"),
            F.struct(
                F.unix_micros("ts").alias("tt_us"),
                F.col("event_id").alias("t_id"),
                F.col("event_type").alias("t_type"),
            ),
        ).alias("touch"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = kinds.withColumn("last_touch", F.max("touch").over(w))
    return (
        carried.filter(
            (F.col("event_type") == "purchase")
            & F.col("last_touch").isNotNull()
            & (
                F.col("t_us") - F.col("last_touch.tt_us")
                <= ATTR_WINDOW_S * 1_000_000
            )
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("last_touch.t_id").alias("touch_id"),
            F.col("last_touch.t_type").alias("touch_type"),
            ((F.col("t_us") - F.col("last_touch.tt_us")) / F.lit(1_000_000))
            .cast("long")
            .alias("lag_s"),
        )
    )


ATTRIBUTION_SQL = f"""
WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events
  WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events
  WHERE event_type IN ('click', 'view')
), pairs AS (
  SELECT p.user_id, p.event_id AS purchase_id, t.event_id AS touch_id,
         t.event_type AS touch_type, p.t_us - t.t_us AS lag_us,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY t.t_us DESC, t.event_id DESC) AS rk
  FROM p JOIN t ON p.user_id = t.user_id
      AND (t.t_us < p.t_us OR (t.t_us = p.t_us AND t.event_id < p.event_id))
)
SELECT user_id, purchase_id, touch_id, touch_type,
       CAST(lag_us // 1000000 AS BIGINT) AS lag_s
FROM pairs WHERE rk = 1 AND lag_us <= CAST({ATTR_WINDOW_S} AS BIGINT) * 1000000
"""


# ---------------------------------------------------------------------------
# bm25_rank — BM25 keyword ranking over the document corpus
# ---------------------------------------------------------------------------

BM25_TERMS = ("spark", "hash", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPN = 15


def bm25_rank(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 ranking for a fixed keyword query: tf per (doc, term) and df
    per term come from one tokenize pass; idf/length normalization is
    per-row arithmetic on integers plus one broadcast scalar (avg doc
    length), so the plan is scan -> partial-agg -> broadcast joins — no
    quadratic stage. Top-N by rounded score with id tie-break."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    dlen = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dlen.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    terms = list(BM25_TERMS)
    tf = (
        toks.filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    idf = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .select("token", "idf")
    )
    avgdl = stats.select("avgdl")
    scored = (
        tf.join(F.broadcast(idf), "token")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (BM25_K1 + 1))
            / (
                F.col("tf")
                + BM25_K1
                * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    ranked = (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 4).alias("score"), F.count("*").alias("n_terms"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPN)
    )
    return ranked


_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, t.token
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  WHERE t.token != ''
), dlen AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlen
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks
  WHERE token IN ({_TERMS_SQL}) GROUP BY doc_id, token
), idf AS (
  SELECT token, ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
  FROM (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token), stats
)
SELECT tf.doc_id,
       round(sum(idf.idf * (tf.tf * ({BM25_K1} + 1))
                 / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dlen.dl / stats.avgdl))), 4) AS score,
       count(*) AS n_terms
FROM tf JOIN idf USING (token) JOIN dlen USING (doc_id) CROSS JOIN stats
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id
LIMIT {BM25_TOPN}
"""


# ---------------------------------------------------------------------------
# token_entropy — Shannon entropy corpus profiling
# ---------------------------------------------------------------------------


def token_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source Shannon entropy of the token distribution (plus
    normalized entropy) — the corpus-diversity metric used for mixture
    tuning. Two grouped aggregations on (source, token) then source; both
    shuffle bounded key spaces and combine map-side."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    cnt = toks.groupBy("source", "token").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("source").agg(
        F.sum("c").alias("n"), F.count("*").alias("vocab")
    )
    return (
        cnt.join(tot, "source")
        .withColumn("p", F.col("c") / F.col("n"))
        .groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_tokens"),
            F.max("vocab").cast("long").alias("vocab"),
            F.round(-F.sum(F.col("p") * F.log("p")), 4).alias("entropy"),
            F.round(
                -F.sum(F.col("p") * F.log("p")) / F.log(F.max("vocab")), 4
            ).alias("entropy_norm"),
        )
    )


ENTROPY_SQL = """
WITH toks AS (
  SELECT source, t.token
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  WHERE t.token != ''
), cnt AS (
  SELECT source, token, count(*) AS c FROM toks GROUP BY source, token
), tot AS (
  SELECT source, sum(c) AS n, count(*) AS vocab FROM cnt GROUP BY source
)
SELECT cnt.source,
       CAST(max(tot.n) AS BIGINT) AS n_tokens,
       CAST(max(tot.vocab) AS BIGINT) AS vocab,
       round(-sum((c / tot.n) * ln(c / tot.n)), 4) AS entropy,
       round(-sum((c / tot.n) * ln(c / tot.n)) / ln(max(tot.vocab)), 4) AS entropy_norm
FROM cnt JOIN tot USING (source)
GROUP BY cnt.source
"""


# ---------------------------------------------------------------------------
# pareto_frontier — 2-D skyline via sorted running max
# ---------------------------------------------------------------------------


def pareto_frontier(spark: SparkSession, sf: str) -> DataFrame:
    """2-D Pareto frontier of parts (minimize retail price, maximize size):
    a part is dominated iff a strictly cheaper part has >= its size, or a
    same-priced part has > its size. Instead of the O(n^2) dominance join,
    the skyline decomposes into: per-price-group max size, a running max
    over price groups (tiny domain), and one filter — an O(n log n) plan
    whose only wide state is the per-group aggregate. The oracle states
    dominance directly (NOT EXISTS); the test re-proves it naively."""
    part = load_table(spark, sf, "part")
    grp = part.groupBy("p_retailprice").agg(F.max("p_size").alias("gmax"))
    wprev = (
        Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = grp.withColumn("prevmax", F.max("gmax").over(wprev))
    return (
        part.join(prev, "p_retailprice")
        .filter(
            (F.col("prevmax").isNull() | (F.col("p_size") > F.col("prevmax")))
            & (F.col("p_size") == F.col("gmax"))
        )
        .select("p_partkey", F.round("p_retailprice", 2).alias("price"), "p_size")
    )


PARETO_SQL = """
SELECT p_partkey, round(p_retailprice, 2) AS price, p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE (b.p_retailprice < a.p_retailprice AND b.p_size >= a.p_size)
     OR (b.p_retailprice = a.p_retailprice AND b.p_size > a.p_size)
)
"""


QUERIES: dict[str, QuerySpec] = {
    "abtest_welch": QuerySpec(
        abtest_welch, ABTEST_SQL, "Welch two-sample t-test per event_type"
    ),
    "regr_by_group": QuerySpec(
        regr_by_group, REGR_SQL, "per-group OLS slope/intercept/R2"
    ),
    "interval_overlap_grid": QuerySpec(
        interval_overlap_grid, INTERVAL_GRID_SQL,
        "keyless interval overlap via grid bucketing (no cross join)",
    ),
    "interval_overlap_join": QuerySpec(
        interval_overlap_join, INTERVAL_OVERLAP_SQL, "key-bounded interval overlap join"
    ),
    "attribution_last_touch": QuerySpec(
        attribution_last_touch, ATTRIBUTION_SQL, "carry-forward last-touch attribution"
    ),
    "bm25_rank": QuerySpec(bm25_rank, BM25_SQL, "BM25 keyword ranking"),
    "token_entropy": QuerySpec(
        token_entropy, ENTROPY_SQL, "Shannon entropy corpus profile"
    ),
    "pareto_frontier": QuerySpec(
        pareto_frontier, PARETO_SQL, "2-D skyline via sorted running max"
    ),
}
