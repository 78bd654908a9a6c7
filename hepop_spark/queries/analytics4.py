"""Round-2 batch 3 — observability / BI report shapes: independence
testing, trend movers, contribution (Pareto) analysis, log-template
mining, and SCD2 state-occupancy accounting. All reduce to grouped
aggregates + bounded-domain windows: the raw-data scan happens exactly
once per operator, every later stage runs on key-cardinality-sized
intermediates (the property that survives a 100x scale-up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# chi_square_independence — contingency-table test, closed form
# ---------------------------------------------------------------------------


def chi_square_independence(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson chi-square test of independence between event_type and an
    A/B variant (user_id parity): observed counts in one grouped pass,
    margins by two tiny re-aggregations, expected = row*col/N, then the
    statistic. All counts are integers, so the statistic is deterministic
    arithmetic; per-cell contributions are emitted alongside the total
    (the drill-down an analyst actually wants)."""
    ev = load_table(spark, sf, "events")
    obs = ev.withColumn("variant", (F.col("user_id") % 2).cast("int")).groupBy(
        "event_type", "variant"
    ).agg(F.count("*").alias("o"))
    row_m = obs.groupBy("event_type").agg(F.sum("o").alias("row_tot"))
    col_m = obs.groupBy("variant").agg(F.sum("o").alias("col_tot"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(row_m), "event_type")
        .join(F.broadcast(col_m), "variant")
        .crossJoin(F.broadcast(n))
        .withColumn("e", F.col("row_tot") * F.col("col_tot") / F.col("n"))
        .withColumn("contrib", F.pow(F.col("o") - F.col("e"), 2) / F.col("e"))
    )
    return cells.select(
        "event_type",
        "variant",
        "o",
        F.round("e", 2).alias("expected"),
        F.round("contrib", 4).alias("chi2_contrib"),
        F.round(F.sum("contrib").over(Window.partitionBy()), 3).alias("chi2_total"),
    )


CHI2_SQL = """
WITH obs AS (
  SELECT event_type, CAST(user_id % 2 AS INTEGER) AS variant, count(*) AS o
  FROM events GROUP BY 1, 2
), cells AS (
  SELECT o.event_type, o.variant, o.o,
         r.row_tot * c.col_tot / n.n AS e
  FROM obs o
  JOIN (SELECT event_type, sum(o) AS row_tot FROM obs GROUP BY 1) r USING (event_type)
  JOIN (SELECT variant, sum(o) AS col_tot FROM obs GROUP BY 1) c USING (variant)
  CROSS JOIN (SELECT sum(o) AS n FROM obs) n
)
SELECT event_type, variant, o,
       round(e, 2) AS expected,
       round((o - e) ^ 2 / e, 4) AS chi2_contrib,
       round(sum((o - e) ^ 2 / e) OVER (), 3) AS chi2_total
FROM cells
"""


# ---------------------------------------------------------------------------
# trend_movers_dod — day-over-day movers
# ---------------------------------------------------------------------------


def trend_movers_dod(spark: SparkSession, sf: str) -> DataFrame:
    """Day-over-day trend movers: daily counts per event_type, lag delta,
    percent change — the 'what spiked since yesterday' report. Window runs
    over the types x days domain (tiny after the first aggregate), ordered
    by pct-change magnitude. Integer counts make every value exact."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("event_type").orderBy("d")
    return (
        daily.withColumn("prev", F.lag("c").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "event_type",
            "c",
            "prev",
            (F.col("c") - F.col("prev")).alias("delta"),
            F.round(100.0 * (F.col("c") - F.col("prev")) / F.col("prev"), 2).alias(
                "pct_change"
            ),
        )
    )


TREND_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, event_type, count(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT strftime(d, '%Y-%m-%d') AS day, event_type, c, prev,
       c - prev AS delta,
       round(100.0 * (c - prev) / prev, 2) AS pct_change
FROM (SELECT *, lag(c) OVER (PARTITION BY event_type ORDER BY d) AS prev FROM daily)
WHERE prev IS NOT NULL
"""


# ---------------------------------------------------------------------------
# share_of_total — contribution / Pareto (80-20) analysis
# ---------------------------------------------------------------------------


def share_of_total(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue contribution per nation with cumulative (Pareto) share:
    the 'which 20% produce 80%' report. Per-nation revenue is rounded to
    the cent BEFORE the share/cumulative windows, so every later number is
    arithmetic on a fixed grid — deterministic across engines. The raw
    scan aggregates once; both windows run over the 25-nation domain."""
    li = load_table(spark, sf, "lineitem")
    ord_ = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    nat = load_table(spark, sf, "nation")
    rev = (
        li.join(ord_, li.l_orderkey == ord_.o_orderkey)
        .join(cust, ord_.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy(F.col("revenue").desc(), "n_name").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return rev.select(
        "n_name",
        "revenue",
        F.round(100.0 * F.col("revenue") / F.sum("revenue").over(wall), 4).alias(
            "share_pct"
        ),
        F.round(
            100.0 * F.sum("revenue").over(wcum) / F.sum("revenue").over(wall), 4
        ).alias("cum_share_pct"),
        F.row_number().over(
            Window.orderBy(F.col("revenue").desc(), "n_name")
        ).cast("long").alias("rank"),
    )


SHARE_SQL = """
WITH rev AS (
  SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, revenue,
       round(100.0 * revenue / sum(revenue) OVER (), 4) AS share_pct,
       round(100.0 * sum(revenue) OVER (ORDER BY revenue DESC, n_name
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / sum(revenue) OVER (), 4) AS cum_share_pct,
       CAST(row_number() OVER (ORDER BY revenue DESC, n_name) AS BIGINT) AS rank
FROM rev
"""


# ---------------------------------------------------------------------------
# log_template_mine — log-template extraction by normalization + prefix
# ---------------------------------------------------------------------------

TMPL_PREFIX = 4


def log_template_mine(spark: SparkSession, sf: str) -> DataFrame:
    """Log-template mining (Drain-style step 1): normalize volatile
    fragments (digit runs -> <N>), key each message by its first-4-token
    prefix, count occurrences per template — turning a raw log stream into
    a bounded template catalog. One narrow map + one bounded-key
    aggregate; the regex dialect is the Java/RE2 common subset."""
    docs = load_table(spark, sf, "documents")
    norm = docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "<N>").alias("norm"),
        F.length("text").alias("len"),
    )
    tmpl = norm.select(
        F.concat_ws(
            " ", F.slice(F.split("norm", " "), 1, TMPL_PREFIX)
        ).alias("template"),
        "len",
    )
    return (
        tmpl.groupBy("template")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("len"), 0).cast("long").alias("avg_len"),
        )
        .filter(F.col("n_docs") >= 2)
    )


TEMPLATE_SQL = f"""
WITH norm AS (
  SELECT doc_id,
         regexp_replace(lower(text), '[0-9]+', '<N>', 'g') AS norm,
         length(text) AS len
  FROM documents
), tmpl AS (
  SELECT array_to_string(list_slice(string_split(norm, ' '), 1, {TMPL_PREFIX}), ' ') AS template,
         len
  FROM norm
)
SELECT template, count(*) AS n_docs,
       CAST(round(avg(len), 0) AS BIGINT) AS avg_len
FROM tmpl GROUP BY template
HAVING count(*) >= 2
"""


# ---------------------------------------------------------------------------
# state_occupancy — duration-weighted SCD2 state accounting
# ---------------------------------------------------------------------------


def state_occupancy(spark: SparkSession, sf: str) -> DataFrame:
    """Duration each user population spends in each state (the telco
    'time-in-call-state' report): collapse each user's event_type stream
    to SCD2 change intervals (lag filter), close them with lead, then
    duration-weight per state. Open (last) intervals are excluded —
    occupancy is only defined for closed spans. Two windows over one
    user_id sort + a bounded-key aggregate; pure integer microseconds."""
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .drop("prev_type")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spans = chg.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t0"),
        F.unix_micros(F.lead("ts").over(w2)).alias("t1"),
    ).filter(F.col("t1").isNotNull())
    # integer division end-to-end: µs sums can exceed 2^53 at scale, so a
    # double intermediate would silently lose precision
    return (
        spans.groupBy("event_type")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.col("t1") - F.col("t0")).alias("sum_us"),
        )
        .selectExpr(
            "event_type",
            "n_spans",
            "CAST(sum_us DIV 1000000 AS LONG) AS total_s",
            "CAST(sum_us DIV (n_spans * 1000000) AS LONG) AS mean_span_s",
        )
    )


OCCUPANCY_SQL = """
WITH chg AS (
  SELECT user_id, event_type, ts, event_id
  FROM (
    SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  ) WHERE prev_type IS NULL OR prev_type != event_type
), spans AS (
  SELECT user_id, event_type,
         epoch_us(ts) AS t0,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1
  FROM chg
)
SELECT event_type, count(*) AS n_spans,
       CAST(sum(t1 - t0) // 1000000 AS BIGINT) AS total_s,
       CAST(sum(t1 - t0) // (count(*) * 1000000) AS BIGINT) AS mean_span_s
FROM spans WHERE t1 IS NOT NULL
GROUP BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "chi_square_independence": QuerySpec(
        chi_square_independence, CHI2_SQL, "contingency chi-square with cell drilldown"
    ),
    "trend_movers_dod": QuerySpec(
        trend_movers_dod, TREND_SQL, "day-over-day trend movers"
    ),
    "share_of_total": QuerySpec(
        share_of_total, SHARE_SQL, "Pareto contribution analysis"
    ),
    "log_template_mine": QuerySpec(
        log_template_mine, TEMPLATE_SQL, "log-template normalization mining"
    ),
    "state_occupancy": QuerySpec(
        state_occupancy, OCCUPANCY_SQL, "SCD2 duration-weighted state occupancy"
    ),
}
