"""Round-6 VoIP trunk-health batch: loss-model estimation and capacity
analytics — the panels a capture-store operator reads AFTER the per-call
dashboards (voip_q.py) say something is wrong.

- ``rtp_loss_gilbert`` — 2-state Gilbert(-Elliott) loss-model fit per
  trunk: transition counts received->lost / lost->received from one lag
  pass give p (loss-burst start), 1-q (burst continuation) and the mean
  burst length 1/q — the standard way VoIP monitoring distinguishes
  random loss (codec-concealable) from bursty loss (audible artifacts).
- ``rtcp_xr_burst_gap`` — RFC 3611 §4.7.2-style burst/gap partition of
  each trunk's packet timeline with Gmin=16: loss runs closer than Gmin
  received packets merge into one burst period; isolated single losses
  (>= Gmin clear on both sides) are gap losses. Burst/gap densities are
  THE RTCP-XR VoIP metrics pair.
- ``trunk_busy_hour`` — offered load (Erlangs) per trunk at its busiest
  hour: per-call overlap seconds with each spanned hour, exploded on an
  hour grid, rolled up, argmax per trunk.
- ``trunk_peak_concurrency`` — peak simultaneous calls per trunk via the
  classic +1/-1 boundary sweep (running sum over start/end events) —
  the trunk-sizing number (how many channels do I actually need).

Reference scope: the reference stores SIP/RTCP frames and delegates SQL
(hepop.js:180-184, README.md:158) but ships no QoS analytics; these are
the north-star queries its own users run downstream. Same deterministic
plant device as voip_q.py (exact integer functions of event_id, both
engines replant identically).

Engine-parity rules: all counters are exact BIGINTs; the only doubles are
terminal divisions of those integers (identical IEEE quotients on both
engines, emitted UNROUNDED — the r03 lesson that round() at a half
boundary can flip between engines while the raw quotient cannot);
pseudo-random loss uses (event_id * 48271) % 97 < 8, bounded well inside
64-bit on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec
from .voip_q import _DIALOGS_SQL, _dialogs

# pseudo-random planted loss: ~8.2% of packets, placement scattered by a
# multiplicative hash so real loss RUNS exist (the every-97th plant used
# by capture_seq_gaps makes every run length 1, which would degenerate
# both the Gilbert fit and the burst/gap split)
LOSS_MULT = 48271
LOSS_MOD = 97
LOSS_THRESH = 8
GMIN = 16  # RFC 3611 Gmin: received-run length that terminates a burst


def _packets(spark: SparkSession, sf: str) -> DataFrame:
    """RTP packet stand-ins: events under id 6000 (same device as
    rtp_jitter_rfc3550), trunk = user_id % 20, per-trunk order by
    event_id, planted pseudo-random loss flag."""
    ev = load_table(spark, sf, "events").filter(F.col("event_id") < 6000)
    return ev.select(
        (F.col("user_id") % 20).alias("trunk"),
        F.col("event_id"),
        (((F.col("event_id") * LOSS_MULT) % LOSS_MOD) < LOSS_THRESH)
        .cast("int")
        .alias("lost"),
    )


_PACKETS_SQL = f"""
  SELECT user_id % 20 AS trunk, event_id,
         CASE WHEN (event_id * {LOSS_MULT}) % {LOSS_MOD} < {LOSS_THRESH}
              THEN 1 ELSE 0 END AS lost
  FROM events WHERE event_id < 6000
"""


# ---------------------------------------------------------------------------
# rtp_loss_gilbert — 2-state Gilbert loss-model fit per trunk
# ---------------------------------------------------------------------------


def rtp_loss_gilbert(spark: SparkSession, sf: str) -> DataFrame:
    """Fit the 2-state Gilbert loss model per trunk from one lag pass:
    count the four (prev, cur) loss-flag transitions, then
    p = P(lost | prev received) = n01/(n00+n01) and
    q = P(received | prev lost) = n10/(n10+n11); mean burst length is
    1/q. Random loss shows p ~= overall rate and short bursts; bursty
    loss shows small q / long bursts — the distinction that decides
    whether packet loss is audible after codec concealment.

    Scale: one window lag partitioned by the bounded trunk key + one
    partial-combining groupBy; packets shuffle once on trunk. All
    counters exact BIGINT; p/q/mean-burst are single terminal divisions
    (unrounded — identical IEEE quotients on both engines)."""
    pk = _packets(spark, sf)
    w = Window.partitionBy("trunk").orderBy("event_id")
    tr = pk.withColumn("prev", F.lag("lost").over(w))
    g = tr.groupBy("trunk").agg(
        F.count("*").cast("long").alias("pkts"),
        F.sum("lost").cast("long").alias("lost_pkts"),
        F.sum(F.when((F.col("prev") == 0) & (F.col("lost") == 0), 1).otherwise(0))
        .cast("long").alias("n00"),
        F.sum(F.when((F.col("prev") == 0) & (F.col("lost") == 1), 1).otherwise(0))
        .cast("long").alias("n01"),
        F.sum(F.when((F.col("prev") == 1) & (F.col("lost") == 0), 1).otherwise(0))
        .cast("long").alias("n10"),
        F.sum(F.when((F.col("prev") == 1) & (F.col("lost") == 1), 1).otherwise(0))
        .cast("long").alias("n11"),
    )
    return g.select(
        F.col("trunk").cast("long").alias("trunk"),
        "pkts", "lost_pkts", "n00", "n01", "n10", "n11",
        (F.col("n01") / F.nullif(F.col("n00") + F.col("n01"), F.lit(0))).alias("p_burst_start"),
        (F.col("n10") / F.nullif(F.col("n10") + F.col("n11"), F.lit(0))).alias("q_burst_end"),
        ((F.col("n10") + F.col("n11")) / F.nullif(F.col("n10"), F.lit(0))).alias("mean_burst_len"),
    ).orderBy("trunk")


GILBERT_SQL = f"""
WITH pk AS ({_PACKETS_SQL}),
tr AS (
  SELECT trunk, lost,
         lag(lost) OVER (PARTITION BY trunk ORDER BY event_id) AS prev
  FROM pk
), g AS (
  SELECT trunk,
         CAST(count(*) AS BIGINT) AS pkts,
         CAST(sum(lost) AS BIGINT) AS lost_pkts,
         CAST(sum(CASE WHEN prev = 0 AND lost = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
         CAST(sum(CASE WHEN prev = 0 AND lost = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         CAST(sum(CASE WHEN prev = 1 AND lost = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         CAST(sum(CASE WHEN prev = 1 AND lost = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
  FROM tr GROUP BY trunk
)
SELECT CAST(trunk AS BIGINT) AS trunk, pkts, lost_pkts, n00, n01, n10, n11,
       CAST(n01 AS DOUBLE) / nullif(n00 + n01, 0) AS p_burst_start,
       CAST(n10 AS DOUBLE) / nullif(n10 + n11, 0) AS q_burst_end,
       CAST(n10 + n11 AS DOUBLE) / nullif(n10, 0) AS mean_burst_len
FROM g ORDER BY trunk
"""


# ---------------------------------------------------------------------------
# rtcp_xr_burst_gap — RFC 3611-style burst/gap partition per trunk
# ---------------------------------------------------------------------------


def rtcp_xr_burst_gap(spark: SparkSession, sf: str) -> DataFrame:
    """RFC 3611 §4.7.2-style burst/gap metrics per trunk, Gmin=16: walk
    the loss events in packet order; a new loss PERIOD starts when >= Gmin
    packets were received since the previous loss (or at the first loss).
    Periods with > 1 loss are bursts (span = first..last loss inclusive);
    single-loss periods are ISOLATED losses and belong to the gap (the
    RFC's "isolated lost packets are part of gaps" rule — exactly why the
    every-97th plant would degenerate here). Densities are lost/packets
    within each regime.

    Scale: two window passes (lag + running period-id sum), both
    partitioned by the bounded trunk key, over the LOSSES ONLY (~8% of
    packets) — the per-trunk packet totals come from a separate
    partial-combining groupBy joined back on trunk. Exact integers; the
    two densities are terminal divisions."""
    pk = _packets(spark, sf)
    w = Window.partitionBy("trunk").orderBy("event_id")
    rn = pk.withColumn("rn", F.row_number().over(w))
    losses = rn.filter(F.col("lost") == 1)
    wl = Window.partitionBy("trunk").orderBy("rn")
    per = (
        losses.withColumn("prev_rn", F.lag("rn").over(wl))
        .withColumn(
            "new_period",
            F.when(
                F.col("prev_rn").isNull()
                | (F.col("rn") - F.col("prev_rn") - 1 >= GMIN),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "period",
            F.sum("new_period").over(
                wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    periods = per.groupBy("trunk", "period").agg(
        F.count("*").cast("long").alias("n_losses"),
        (F.max("rn") - F.min("rn") + 1).cast("long").alias("span"),
    )
    agg = periods.groupBy("trunk").agg(
        F.sum(F.when(F.col("n_losses") > 1, 1).otherwise(0)).cast("long").alias("n_bursts"),
        F.sum(F.when(F.col("n_losses") > 1, F.col("span")).otherwise(0))
        .cast("long").alias("burst_pkts"),
        F.sum(F.when(F.col("n_losses") > 1, F.col("n_losses")).otherwise(0))
        .cast("long").alias("burst_lost"),
        F.coalesce(F.max(F.when(F.col("n_losses") > 1, F.col("span"))), F.lit(0))
        .cast("long").alias("max_burst_span"),
        F.sum(F.when(F.col("n_losses") == 1, 1).otherwise(0)).cast("long").alias("gap_lost"),
    )
    totals = pk.groupBy("trunk").agg(F.count("*").cast("long").alias("pkts"))
    return (
        totals.join(agg, "trunk", "left")
        .select(
            F.col("trunk").cast("long").alias("trunk"),
            "pkts",
            F.coalesce("n_bursts", F.lit(0)).cast("long").alias("n_bursts"),
            F.coalesce("burst_pkts", F.lit(0)).cast("long").alias("burst_pkts"),
            F.coalesce("burst_lost", F.lit(0)).cast("long").alias("burst_lost"),
            F.coalesce("max_burst_span", F.lit(0)).cast("long").alias("max_burst_span"),
            F.coalesce("gap_lost", F.lit(0)).cast("long").alias("gap_lost"),
        )
        .withColumn(
            "burst_density",
            F.col("burst_lost") / F.nullif(F.col("burst_pkts"), F.lit(0)),
        )
        .withColumn(
            "gap_density",
            F.col("gap_lost") / F.nullif(F.col("pkts") - F.col("burst_pkts"), F.lit(0)),
        )
        .orderBy("trunk")
    )


BURST_GAP_SQL = f"""
WITH pk AS ({_PACKETS_SQL}),
rn AS (
  SELECT trunk, event_id, lost,
         row_number() OVER (PARTITION BY trunk ORDER BY event_id) AS rn
  FROM pk
), per AS (
  SELECT trunk, rn,
         sum(CASE WHEN prev_rn IS NULL OR rn - prev_rn - 1 >= {GMIN}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY trunk ORDER BY rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS period
  FROM (
    SELECT trunk, rn,
           lag(rn) OVER (PARTITION BY trunk ORDER BY rn) AS prev_rn
    FROM rn WHERE lost = 1
  )
), periods AS (
  SELECT trunk, period,
         CAST(count(*) AS BIGINT) AS n_losses,
         CAST(max(rn) - min(rn) + 1 AS BIGINT) AS span
  FROM per GROUP BY trunk, period
), agg AS (
  SELECT trunk,
         CAST(sum(CASE WHEN n_losses > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bursts,
         CAST(sum(CASE WHEN n_losses > 1 THEN span ELSE 0 END) AS BIGINT) AS burst_pkts,
         CAST(sum(CASE WHEN n_losses > 1 THEN n_losses ELSE 0 END) AS BIGINT) AS burst_lost,
         CAST(coalesce(max(CASE WHEN n_losses > 1 THEN span END), 0) AS BIGINT) AS max_burst_span,
         CAST(sum(CASE WHEN n_losses = 1 THEN 1 ELSE 0 END) AS BIGINT) AS gap_lost
  FROM periods GROUP BY trunk
), totals AS (
  SELECT trunk, CAST(count(*) AS BIGINT) AS pkts FROM pk GROUP BY trunk
)
SELECT CAST(t.trunk AS BIGINT) AS trunk, t.pkts,
       CAST(coalesce(a.n_bursts, 0) AS BIGINT) AS n_bursts,
       CAST(coalesce(a.burst_pkts, 0) AS BIGINT) AS burst_pkts,
       CAST(coalesce(a.burst_lost, 0) AS BIGINT) AS burst_lost,
       CAST(coalesce(a.max_burst_span, 0) AS BIGINT) AS max_burst_span,
       CAST(coalesce(a.gap_lost, 0) AS BIGINT) AS gap_lost,
       CAST(coalesce(a.burst_lost, 0) AS DOUBLE) / nullif(coalesce(a.burst_pkts, 0), 0) AS burst_density,
       CAST(coalesce(a.gap_lost, 0) AS DOUBLE) / nullif(t.pkts - coalesce(a.burst_pkts, 0), 0) AS gap_density
FROM totals t LEFT JOIN agg a ON t.trunk = a.trunk
ORDER BY trunk
"""


# ---------------------------------------------------------------------------
# trunk_busy_hour — offered Erlang load at the busiest hour per trunk
# ---------------------------------------------------------------------------


def trunk_busy_hour(spark: SparkSession, sf: str) -> DataFrame:
    """Busy-hour offered load per trunk: each call [ts, ts+duration)
    contributes its overlap seconds to every hour it spans (calls cap at
    1h so each spans <= 2 hour cells); per (trunk, hour) the load in
    Erlangs is overlap-seconds/3600; the busy hour is the argmax hour.
    THE input to Erlang-B trunk sizing.

    Scale: the hour explode is a bounded sequence() (<= 2 cells/call, no
    shuffle), the rollup partial-combines on (trunk, hour), and the
    argmax is one row_number window over the tiny rollup. Overlap math
    in exact microseconds; Erlangs is the terminal division."""
    d = _dialogs(spark, sf).select(
        "trunk", "call_id",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + F.col("duration_s").cast("long") * 1_000_000).alias("e_us"),
    )
    hours = d.select(
        "trunk", "s_us", "e_us",
        F.explode(
            F.sequence(
                (F.floor(F.col("s_us") / 3_600_000_000) * 3_600_000_000).cast("long"),
                (F.floor((F.col("e_us") - 1) / 3_600_000_000) * 3_600_000_000).cast("long"),
                F.lit(3_600_000_000).cast("long"),
            )
        ).alias("h_us"),
    )
    per_hour = (
        hours.select(
            "trunk", "h_us",
            (
                F.least(F.col("e_us"), F.col("h_us") + 3_600_000_000)
                - F.greatest(F.col("s_us"), F.col("h_us"))
            ).alias("ov_us"),
        )
        .groupBy("trunk", "h_us")
        .agg(
            F.sum("ov_us").cast("long").alias("call_us"),
            F.count("*").cast("long").alias("n_calls"),
        )
    )
    w = Window.partitionBy("trunk").orderBy(F.col("call_us").desc(), F.col("h_us"))
    return (
        per_hour.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("trunk").cast("long").alias("trunk"),
            F.timestamp_micros(F.col("h_us")).alias("busy_hour"),
            "call_us", "n_calls",
            (F.col("call_us") / 3_600_000_000.0).alias("erlangs"),
        )
        .orderBy("trunk")
    )


BUSY_HOUR_SQL = f"""
WITH d AS ({_DIALOGS_SQL}),
iv AS (
  SELECT trunk, call_id, epoch_us(ts) AS s_us,
         epoch_us(ts) + CAST(duration_s AS BIGINT) * 1000000 AS e_us
  FROM d
), hours AS (
  SELECT trunk, s_us, e_us, h_us
  FROM iv, unnest(generate_series((s_us // 3600000000) * 3600000000,
                                  ((e_us - 1) // 3600000000) * 3600000000,
                                  3600000000)) AS t(h_us)
), per_hour AS (
  SELECT trunk, h_us,
         CAST(sum(least(e_us, h_us + 3600000000) - greatest(s_us, h_us)) AS BIGINT) AS call_us,
         CAST(count(*) AS BIGINT) AS n_calls
  FROM hours GROUP BY trunk, h_us
), ranked AS (
  SELECT trunk, h_us, call_us, n_calls,
         row_number() OVER (PARTITION BY trunk ORDER BY call_us DESC, h_us) AS rk
  FROM per_hour
)
SELECT CAST(trunk AS BIGINT) AS trunk,
       make_timestamp(h_us) AS busy_hour,
       call_us, n_calls,
       CAST(call_us AS DOUBLE) / 3600000000.0 AS erlangs
FROM ranked WHERE rk = 1 ORDER BY trunk
"""


# ---------------------------------------------------------------------------
# trunk_peak_concurrency — peak simultaneous calls per trunk (+1/-1 sweep)
# ---------------------------------------------------------------------------


def trunk_peak_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """Peak simultaneous calls per trunk: the classic boundary sweep —
    every call start is +1, every end is -1 (end-exclusive: an end tied
    with a start frees the channel first, so the orders (t, delta, id)
    are deterministic and identical on both engines), running-sum in
    that order, take the max. The channel count the trunk must provision.

    Scale: one window cumulative sum partitioned by the bounded trunk
    key over 2 rows/call + a partial-combining max."""
    d = _dialogs(spark, sf).select(
        "trunk", "call_id",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + F.col("duration_s").cast("long") * 1_000_000).alias("e_us"),
    )
    pts = d.select(
        "trunk", F.col("s_us").alias("t_us"), F.lit(1).alias("delta"), "call_id"
    ).unionAll(
        d.select(
            "trunk", F.col("e_us").alias("t_us"), F.lit(-1).alias("delta"), "call_id"
        )
    )
    w = (
        Window.partitionBy("trunk")
        .orderBy("t_us", "delta", "call_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.withColumn("active", F.sum("delta").over(w))
        .groupBy("trunk")
        .agg(
            F.max("active").cast("long").alias("peak_concurrent"),
            (F.count("*") / 2).cast("long").alias("n_calls"),
        )
        .select(F.col("trunk").cast("long").alias("trunk"), "peak_concurrent", "n_calls")
        .orderBy("trunk")
    )


PEAK_CONC_SQL = f"""
WITH d AS ({_DIALOGS_SQL}),
iv AS (
  SELECT trunk, call_id, epoch_us(ts) AS s_us,
         epoch_us(ts) + CAST(duration_s AS BIGINT) * 1000000 AS e_us
  FROM d
), pts AS (
  SELECT trunk, s_us AS t_us, 1 AS delta, call_id FROM iv
  UNION ALL
  SELECT trunk, e_us AS t_us, -1 AS delta, call_id FROM iv
), sweep AS (
  SELECT trunk,
         sum(delta) OVER (PARTITION BY trunk ORDER BY t_us, delta, call_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active
  FROM pts
)
SELECT CAST(trunk AS BIGINT) AS trunk,
       CAST(max(active) AS BIGINT) AS peak_concurrent,
       CAST(count(*) / 2 AS BIGINT) AS n_calls
FROM sweep GROUP BY trunk ORDER BY trunk
"""


QUERIES = {
    "rtp_loss_gilbert": QuerySpec(
        rtp_loss_gilbert, GILBERT_SQL,
        "2-state Gilbert loss-model fit per trunk from one lag pass",
    ),
    "rtcp_xr_burst_gap": QuerySpec(
        rtcp_xr_burst_gap, BURST_GAP_SQL,
        "RFC 3611 burst/gap partition per trunk (Gmin=16, isolated losses = gap)",
    ),
    "trunk_busy_hour": QuerySpec(
        trunk_busy_hour, BUSY_HOUR_SQL,
        "busy-hour offered Erlang load per trunk via bounded hour-grid explode",
    ),
    "trunk_peak_concurrency": QuerySpec(
        trunk_peak_concurrency, PEAK_CONC_SQL,
        "peak simultaneous calls per trunk via the +1/-1 boundary sweep",
    ),
}
