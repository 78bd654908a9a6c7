"""Round-3 statistics / data-quality batch: distributional audits and
feature-engineering primitives a training-data pipeline runs continuously
(Benford fraud screens, mutual information between label columns, split
quality, probability calibration, k-anonymity, per-column entropy,
equi-depth binning, deterministic winsorization).

Reference scope: the reference exposes only delegated SQL (query.js:162-172)
with no statistics surface; these are north-star extensions expressed as
single-pass aggregations so they inherit Spark's partial->final aggregation
and survive 100 TB (every shuffle key below is bounded: digits 1-9, label
cells, bins, quasi-identifier groups).

Engine-parity rules as established (queries/analytics9.py): exact integer
counts wherever possible, one terminal double division, round(..., 6) only
on ln/ratio outputs whose cross-engine error bound sits orders below the
grid, md5 keys for determinism, BIGINT casts over every DuckDB count/sum.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# benford_first_digit — first-significant-digit audit vs Benford's law
# ---------------------------------------------------------------------------

# expected Benford mass per digit, pinned as literals so both engines see
# identical constants (log10(1+1/d), rounded to the 1e-6 grid)
_BENFORD_P = {d: round(math.log10(1.0 + 1.0 / d), 6) for d in range(1, 10)}


def benford_first_digit(spark: SparkSession, sf: str) -> DataFrame:
    """First-significant-digit distribution of o_totalprice against
    Benford's law — the classic synthetic-data / fraud screen over any
    monetary column. Emits per-digit observed count, observed share, the
    pinned Benford expectation, and the chi-square cell contribution.

    Scale: one narrow map (substring of a formatted number) + one groupBy
    on a 9-value key — fully map-side combined; output is 9 rows whatever
    the corpus size."""
    orders = load_table(spark, sf, "orders")
    # first significant digit is invariant under *100, so extract it from the
    # exact cents integer (no locale/format dependence across engines)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1)
    obs = (
        orders.filter(F.col("o_totalprice") >= 0.01)
        .select(digit.cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    total = obs.agg(F.sum("n").alias("total"))
    exp_p = F.element_at(
        F.array(*[F.lit(_BENFORD_P[d]) for d in range(1, 10)]), F.col("digit")
    )
    return (
        obs.crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("total"), 6).alias("obs_share"),
            exp_p.alias("benford_p"),
            F.round(
                (F.col("n") - exp_p * F.col("total"))
                * (F.col("n") - exp_p * F.col("total"))
                / (exp_p * F.col("total")),
                4,
            ).alias("chi2_cell"),
        )
        .orderBy("digit")
    )


_BENFORD_ARR = ", ".join(str(_BENFORD_P[d]) for d in range(1, 10))

BENFORD_SQL = f"""
WITH obs AS (
  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         count(*) AS n
  FROM orders WHERE o_totalprice >= 0.01 GROUP BY 1
), tot AS (SELECT sum(n) AS total FROM obs)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(n / total, 6) AS obs_share,
       CAST(([{_BENFORD_ARR}])[digit] AS DOUBLE) AS benford_p,
       round((n - CAST(([{_BENFORD_ARR}])[digit] AS DOUBLE) * total)
             * (n - CAST(([{_BENFORD_ARR}])[digit] AS DOUBLE) * total)
             / (CAST(([{_BENFORD_ARR}])[digit] AS DOUBLE) * total), 4) AS chi2_cell
FROM obs, tot
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# mutual_information_cells — MI decomposition between two label columns
# ---------------------------------------------------------------------------


def mutual_information_cells(spark: SparkSession, sf: str) -> DataFrame:
    """Pointwise mutual-information decomposition between o_orderpriority
    and o_orderstatus: one row per joint cell with its count and the cell's
    contribution p_xy * ln(p_xy*N^2 / (n_x*n_y*N)) — summing the column
    gives MI, but the judged output stays cell-level so no cross-engine
    float summation order is involved.

    Scale: three aggregations over bounded key spaces (|priorities| x
    |statuses| cells) — all map-side combined; the joins are broadcasts of
    tiny marginals."""
    orders = load_table(spark, sf, "orders")
    joint = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_xy")
    )
    mx = orders.groupBy("o_orderpriority").agg(F.count("*").alias("n_x"))
    my = orders.groupBy("o_orderstatus").agg(F.count("*").alias("n_y"))
    tot = orders.agg(F.count("*").alias("n_tot"))
    return (
        joint.join(F.broadcast(mx), "o_orderpriority")
        .join(F.broadcast(my), "o_orderstatus")
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderpriority",
            "o_orderstatus",
            F.col("n_xy").cast("long").alias("n_xy"),
            (
                F.round(
                    (F.col("n_xy") / F.col("n_tot"))
                    * F.log(
                        F.col("n_xy") * F.col("n_tot")
                        / (F.col("n_x") * F.col("n_y"))
                    ),
                    6,
                )
                + F.lit(0.0)  # normalize IEEE -0.0 (signed-zero insurance)
            ).alias("mi_cell"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


MI_CELLS_SQL = """
WITH joint AS (
  SELECT o_orderpriority, o_orderstatus, count(*) AS n_xy
  FROM orders GROUP BY 1, 2
), mx AS (SELECT o_orderpriority, count(*) AS n_x FROM orders GROUP BY 1),
   my AS (SELECT o_orderstatus, count(*) AS n_y FROM orders GROUP BY 1),
   tot AS (SELECT count(*) AS n_tot FROM orders)
SELECT j.o_orderpriority, j.o_orderstatus, CAST(j.n_xy AS BIGINT) AS n_xy,
       round((j.n_xy * 1.0 / n_tot) * ln(j.n_xy * 1.0 * n_tot / (n_x * 1.0 * n_y)), 6) + 0.0 AS mi_cell
FROM joint j JOIN mx USING (o_orderpriority) JOIN my USING (o_orderstatus), tot
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# gini_split_eval — decision-split quality sweep over a numeric feature
# ---------------------------------------------------------------------------

_SPLITS = list(range(25, 476, 25))  # candidate thresholds over value in [0, 490]


def gini_split_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Decision-tree split screening in ONE corpus pass: for every candidate
    threshold t over events.value, the weighted Gini impurity of the binary
    partition (value <= t) against the label purchase/not. All counts are
    exact integers; each impurity term is a single division of exact
    integer polynomials, so the doubles are bit-identical across engines.

    Scale: the explode to |splits| rows per event is a narrow map; the
    aggregation key space is |splits| = 19 — constant output, one shuffle
    of pre-aggregated partials."""
    ev = load_table(spark, sf, "events")
    splits = F.array(*[F.lit(t) for t in _SPLITS])
    lab = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    e = ev.select(F.col("value"), lab.alias("y"), F.explode(splits).alias("t"))
    agg = e.groupBy("t").agg(
        F.sum(F.when(F.col("value") <= F.col("t"), 1).otherwise(0)).alias("nl"),
        F.sum(F.when((F.col("value") <= F.col("t")) & (F.col("y") == 1), 1).otherwise(0)).alias("pl"),
        F.sum(F.when(F.col("value") > F.col("t"), 1).otherwise(0)).alias("nr"),
        F.sum(F.when((F.col("value") > F.col("t")) & (F.col("y") == 1), 1).otherwise(0)).alias("pr"),
    )
    # weighted gini = (nl/n)*(1 - (pl/nl)^2 - ((nl-pl)/nl)^2) + symmetric
    #               = (nl^2 - pl^2 - (nl-pl)^2) / (n*nl) + symmetric
    n = F.col("nl") + F.col("nr")
    # an empty side contributes 0 impurity (guard: at tiny scales a
    # threshold can have nl or nr = 0 -> ANSI division-by-zero)
    gl = F.when(
        F.col("nl") > 0,
        (F.col("nl") * F.col("nl") - F.col("pl") * F.col("pl") - (F.col("nl") - F.col("pl")) * (F.col("nl") - F.col("pl"))) / (n * F.col("nl")),
    ).otherwise(F.lit(0.0))
    gr = F.when(
        F.col("nr") > 0,
        (F.col("nr") * F.col("nr") - F.col("pr") * F.col("pr") - (F.col("nr") - F.col("pr")) * (F.col("nr") - F.col("pr"))) / (n * F.col("nr")),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col("t").cast("long").alias("t"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("pl").cast("long").alias("pos_left"),
        F.col("nr").cast("long").alias("n_right"),
        F.col("pr").cast("long").alias("pos_right"),
        F.round(gl + gr, 6).alias("gini_weighted"),
    ).orderBy("t")


_SPLITS_SQL = ", ".join(str(t) for t in _SPLITS)

GINI_SPLIT_SQL = f"""
WITH e AS (
  SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y, t.t
  FROM events, unnest([{_SPLITS_SQL}]) t(t)
), agg AS (
  SELECT t,
         sum(CASE WHEN value <= t THEN 1 ELSE 0 END) AS nl,
         sum(CASE WHEN value <= t AND y = 1 THEN 1 ELSE 0 END) AS pl,
         sum(CASE WHEN value > t THEN 1 ELSE 0 END) AS nr,
         sum(CASE WHEN value > t AND y = 1 THEN 1 ELSE 0 END) AS pr
  FROM e GROUP BY t
)
SELECT CAST(t AS BIGINT) AS t,
       CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
       CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
       round(CASE WHEN nl > 0 THEN (nl * nl - pl * pl - (nl - pl) * (nl - pl)) * 1.0 / ((nl + nr) * nl) ELSE 0.0 END
             + CASE WHEN nr > 0 THEN (nr * nr - pr * pr - (nr - pr) * (nr - pr)) * 1.0 / ((nl + nr) * nr) ELSE 0.0 END, 6) AS gini_weighted
FROM agg
ORDER BY t
"""


# ---------------------------------------------------------------------------
# calibration_bins — probability-calibration table (reliability diagram)
# ---------------------------------------------------------------------------


def calibration_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Model-calibration audit: a deterministic pseudo-score in [0,1) (the
    md5-derived per-event hash every sampling entry uses) is binned into 10
    deciles; per bin: n, mean predicted score (exact integer mean / 1000),
    and empirical purchase rate. The |score_mean - frac_pos| column is the
    per-bin ECE contribution before weighting.

    Scale: narrow map + groupBy on 10 keys; the reliability table is
    constant-size at any corpus scale."""
    ev = load_table(spark, sf, "events")
    mil = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10).cast("long") % 1000
    e = ev.select(
        (mil / 1000).alias("score"),
        mil.alias("mil"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    agg = e.groupBy(F.floor(F.col("mil") / 100).cast("int").alias("bin")).agg(
        F.count("*").alias("n"),
        F.sum("mil").alias("sum_mil"),
        F.sum("y").alias("pos"),
    )
    return agg.select(
        "bin",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("sum_mil") / (F.col("n") * 1000), 6).alias("score_mean"),
        F.round(F.col("pos") / F.col("n"), 6).alias("frac_pos"),
        F.round(
            F.abs(F.col("sum_mil") / (F.col("n") * 1000) - F.col("pos") / F.col("n")), 6
        ).alias("gap"),
    ).orderBy("bin")


CALIBRATION_SQL = """
WITH e AS (
  SELECT CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000 AS mil,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), agg AS (
  SELECT CAST(floor(mil / 100) AS INTEGER) AS bin, count(*) AS n,
         sum(mil) AS sum_mil, sum(y) AS pos
  FROM e GROUP BY 1
)
SELECT bin, CAST(n AS BIGINT) AS n,
       round(sum_mil * 1.0 / (n * 1000), 6) AS score_mean,
       round(pos * 1.0 / n, 6) AS frac_pos,
       round(abs(sum_mil * 1.0 / (n * 1000) - pos * 1.0 / n), 6) AS gap
FROM agg
ORDER BY bin
"""


# ---------------------------------------------------------------------------
# kanonymity_audit — quasi-identifier group-size audit
# ---------------------------------------------------------------------------

K_ANON = 5


def kanonymity_audit(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity screen over customer quasi-identifiers (nation,
    market segment, account-balance sign): group sizes, a violation flag
    for groups smaller than k=5, and each group's share of all violating
    rows — the table a privacy review reads before a dataset release.

    Scale: single groupBy on a bounded QI space; the violating-total is a
    broadcast scalar. Integer-only output plus one exact division."""
    cust = load_table(spark, sf, "customer")
    qi = cust.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("c_acctbal") < 0, F.lit("neg")).otherwise(F.lit("nonneg")).alias("bal_sign"),
    )
    g = qi.groupBy("nation", "segment", "bal_sign").agg(F.count("*").alias("n"))
    viol = g.filter(F.col("n") < K_ANON).agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("viol_rows")
    )
    return (
        g.crossJoin(F.broadcast(viol))
        .select(
            "nation",
            "segment",
            "bal_sign",
            F.col("n").cast("long").alias("n"),
            (F.col("n") < K_ANON).alias("violates_k"),
            F.when(
                F.col("n") < K_ANON, F.round(F.col("n") / F.col("viol_rows"), 6)
            ).otherwise(F.lit(0.0)).alias("viol_share"),
        )
        .orderBy("nation", "segment", "bal_sign")
    )


KANON_SQL = f"""
WITH qi AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END AS bal_sign
  FROM customer
), g AS (
  SELECT nation, segment, bal_sign, count(*) AS n FROM qi GROUP BY 1, 2, 3
), viol AS (
  SELECT coalesce(sum(n), 0) AS viol_rows FROM g WHERE n < {K_ANON}
)
SELECT nation, segment, bal_sign, CAST(n AS BIGINT) AS n,
       n < {K_ANON} AS violates_k,
       CASE WHEN n < {K_ANON} THEN round(n * 1.0 / viol_rows, 6) ELSE 0.0 END AS viol_share
FROM g, viol
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# entropy_by_column — Shannon entropy decomposition per categorical column
# ---------------------------------------------------------------------------


def entropy_by_column(spark: SparkSession, sf: str) -> DataFrame:
    """Per-value Shannon-entropy decomposition for two categorical columns
    (orders.o_orderpriority, orders.o_orderstatus) stacked long: count,
    probability, and the -p*ln(p) contribution — the single-pass profile a
    feature-selection sweep reads. Cell-level output avoids cross-engine
    float summation order.

    Scale: one unpivot (narrow) + one groupBy on (column, value) — both
    key spaces bounded by the vocabulary, fully map-side combined."""
    orders = load_table(spark, sf, "orders")
    stacked = orders.select(
        F.explode(
            F.create_map(
                F.lit("o_orderpriority"), F.col("o_orderpriority"),
                F.lit("o_orderstatus"), F.col("o_orderstatus"),
            )
        ).alias("col_name", "val")
    )
    agg = stacked.groupBy("col_name", "val").agg(F.count("*").alias("n"))
    tot = agg.groupBy("col_name").agg(F.sum("n").alias("n_tot"))
    return (
        agg.join(F.broadcast(tot), "col_name")
        .select(
            "col_name",
            "val",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("n_tot"), 6).alias("p"),
            F.round(
                -(F.col("n") / F.col("n_tot")) * F.log(F.col("n") / F.col("n_tot")), 6
            ).alias("entropy_term"),
        )
        .orderBy("col_name", "val")
    )


ENTROPY_COL_SQL = """
WITH stacked AS (
  SELECT 'o_orderpriority' AS col_name, o_orderpriority AS val FROM orders
  UNION ALL
  SELECT 'o_orderstatus', o_orderstatus FROM orders
), agg AS (
  SELECT col_name, val, count(*) AS n FROM stacked GROUP BY 1, 2
), tot AS (
  SELECT col_name, sum(n) AS n_tot FROM agg GROUP BY 1
)
SELECT a.col_name, a.val, CAST(a.n AS BIGINT) AS n,
       round(a.n * 1.0 / n_tot, 6) AS p,
       round(-(a.n * 1.0 / n_tot) * ln(a.n * 1.0 / n_tot), 6) AS entropy_term
FROM agg a JOIN tot USING (col_name)
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# quantile_bins_equidepth — equi-depth feature binning with bin stats
# ---------------------------------------------------------------------------

N_BINS = 10


def quantile_bins_equidepth(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-depth (NTILE) binning of l_extendedprice on the exact cents
    grid with per-bin count / min / max / integer mean — the binning table
    a feature-discretization step persists. Total order is made unique by
    (cents, l_orderkey, l_linenumber) so NTILE assignment is identical
    across engines.

    Scale: NTILE over raw rows would be a single-task global sort of the
    corpus, so the bins are derived on the AGGREGATED cents grid instead
    (r04 rewrite): groupBy(cents) -> per-value counts, a cumulative window
    over the bounded distinct-cents domain gives each value's global
    position range [start+1, end], and NTILE's closed-form boundaries
    (first N%k bins get ceil(N/k) rows) are intersected with those ranges
    via a 10-row broadcast range join. Rows inside one cents group are
    interchangeable under the (cents, orderkey, linenumber) order — they
    share the value — so every per-bin aggregate is IDENTICAL to row-level
    NTILE, with no corpus-wide sort anywhere."""
    li = load_table(spark, sf, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per = (
        li.select(cents.alias("cents"))
        .groupBy("cents")
        .agg(F.count("*").alias("n_c"))
    )
    wcum = Window.orderBy("cents")  # distinct-cents grid: bounded domain
    cum = per.withColumn("end_pos", F.sum("n_c").over(wcum)).withColumn(
        "start_pos", F.col("end_pos") - F.col("n_c")
    )
    tot = per.agg(F.sum("n_c").alias("n_total"))
    bins = tot.select(
        F.explode(F.sequence(F.lit(1), F.lit(N_BINS))).alias("bin"), "n_total"
    ).select(
        "bin",
        (
            (F.col("bin") - 1) * F.expr(f"n_total div {N_BINS}")
            + F.least(F.col("bin") - 1, F.col("n_total") % N_BINS)
            + 1
        ).alias("bin_start"),
        (
            F.col("bin") * F.expr(f"n_total div {N_BINS}")
            + F.least(F.col("bin"), F.col("n_total") % N_BINS)
        ).alias("bin_end"),
    )
    overlap = (
        F.least(F.col("end_pos"), F.col("bin_end"))
        - F.greatest(F.col("start_pos") + 1, F.col("bin_start"))
        + 1
    )
    return (
        cum.join(
            F.broadcast(bins),
            (F.col("start_pos") + 1 <= F.col("bin_end"))
            & (F.col("end_pos") >= F.col("bin_start")),
        )
        .withColumn("ov", overlap)
        .groupBy("bin")
        .agg(
            F.sum("ov").alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum(F.col("cents") * F.col("ov")).alias("sum_cents"),
        )
        .select(
            "bin",
            F.col("n").cast("long").alias("n"),
            F.col("min_cents").cast("long").alias("min_cents"),
            F.col("max_cents").cast("long").alias("max_cents"),
            F.round(F.col("sum_cents") / F.col("n"), 4).alias("mean_cents"),
        )
        .orderBy("bin")
    )


QUANTILE_BINS_SQL = f"""
WITH binned AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         ntile({N_BINS}) OVER (ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT), l_orderkey, l_linenumber) AS bin
  FROM lineitem
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents,
       round(sum(cents) * 1.0 / count(*), 4) AS mean_cents
FROM binned
GROUP BY bin
ORDER BY bin
"""


# ---------------------------------------------------------------------------
# winsorize_clip — deterministic discrete-quantile winsorization per group
# ---------------------------------------------------------------------------


def winsorize_clip(spark: SparkSession, sf: str) -> DataFrame:
    """Outlier winsorization per event_type with DISCRETE quantiles (the
    value at rank ceil(q*n) under a unique total order), so both engines
    pick the identical cents value — no interpolation, no float quantile
    drift. Emits per-type p05/p95 clip bounds and the exact integer mean
    before/after clipping.

    Scale: one window rank per group (shuffle on event_type) + one
    aggregation; at 100 TB the rank becomes a per-group sort within the
    partition — same plan, and the clip bounds could come from a sketch
    when exactness isn't contractual."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = ev.select("event_type", "event_id", cents.alias("cents")).withColumn(
        "rk", F.row_number().over(w)
    )
    counts = ranked.groupBy("event_type").agg(F.count("*").alias("n"))
    bounds = (
        ranked.join(F.broadcast(counts), "event_type")
        .filter(
            (F.col("rk") == F.ceil(F.col("n") * 0.05)) | (F.col("rk") == F.ceil(F.col("n") * 0.95))
        )
        .groupBy("event_type")
        .agg(F.min("cents").alias("p05"), F.max("cents").alias("p95"))
    )
    clipped = ranked.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "cents",
        F.greatest(F.least(F.col("cents"), F.col("p95")), F.col("p05")).alias("clip"),
        "p05",
        "p95",
    )
    return (
        clipped.groupBy("event_type", "p05", "p95")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("sum_raw"),
            F.sum("clip").alias("sum_clip"),
        )
        .select(
            "event_type",
            F.col("p05").cast("long").alias("p05_cents"),
            F.col("p95").cast("long").alias("p95_cents"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col("sum_raw") / F.col("n"), 4).alias("mean_raw"),
            F.round(F.col("sum_clip") / F.col("n"), 4).alias("mean_clip"),
        )
        .orderBy("event_type")
    )


WINSORIZE_SQL = """
WITH ranked AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type ORDER BY CAST(round(value * 100) AS BIGINT), event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), bounds AS (
  SELECT event_type, min(cents) AS p05, max(cents) AS p95
  FROM ranked
  WHERE rk = CAST(ceil(n * 0.05) AS BIGINT) OR rk = CAST(ceil(n * 0.95) AS BIGINT)
  GROUP BY event_type
), clipped AS (
  SELECT r.event_type, r.cents,
         greatest(least(r.cents, b.p95), b.p05) AS clip, b.p05, b.p95
  FROM ranked r JOIN bounds b USING (event_type)
)
SELECT event_type,
       CAST(p05 AS BIGINT) AS p05_cents, CAST(p95 AS BIGINT) AS p95_cents,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(cents) * 1.0 / count(*), 4) AS mean_raw,
       round(sum(clip) * 1.0 / count(*), 4) AS mean_clip
FROM clipped
GROUP BY event_type, p05, p95
ORDER BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "benford_first_digit": QuerySpec(
        benford_first_digit, BENFORD_SQL,
        "first-significant-digit Benford audit with chi-square cells",
    ),
    "mutual_information_cells": QuerySpec(
        mutual_information_cells, MI_CELLS_SQL,
        "pointwise MI decomposition between two categorical columns",
    ),
    "gini_split_eval": QuerySpec(
        gini_split_eval, GINI_SPLIT_SQL,
        "decision-split Gini sweep over a numeric feature in one pass",
    ),
    "calibration_bins": QuerySpec(
        calibration_bins, CALIBRATION_SQL,
        "probability-calibration (reliability) table with ECE gaps",
    ),
    "kanonymity_audit": QuerySpec(
        kanonymity_audit, KANON_SQL,
        "k-anonymity quasi-identifier group-size audit",
    ),
    "entropy_by_column": QuerySpec(
        entropy_by_column, ENTROPY_COL_SQL,
        "Shannon-entropy decomposition per categorical column",
    ),
    "quantile_bins_equidepth": QuerySpec(
        quantile_bins_equidepth, QUANTILE_BINS_SQL,
        "equi-depth NTILE binning with per-bin stats on the cents grid",
    ),
    "winsorize_clip": QuerySpec(
        winsorize_clip, WINSORIZE_SQL,
        "discrete-quantile winsorization per group, exact integer means",
    ),
}
