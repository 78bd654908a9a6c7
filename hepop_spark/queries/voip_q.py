"""Round-3 VoIP-domain analytics: the queries a HEPop (SIP capture store)
operator actually runs — answer/failure rates, post-dial delay, RTCP MOS
quality rollups, call-duration histograms, retransmission rates.

Reference scope: the reference STORES SIP/RTCP frames (hepop.js:180-184)
and delegates SQL, but ships no domain analytics; README.md:158 queries
payload LIKE '%INVITE%' — these entries are what that user graduates to.
Dialog/QoS fields are planted deterministically from `events` (same
device as hep_sip_call_stats, sources_q.py:265, which proves the real
binary HEP path; here the plant is column-native so the domain logic
itself is the judged surface).

Engine-parity rules as established: exact integer plants, discrete
order-statistic percentiles (value at rank under a unique total order),
fixed-point e4 grids for quality scores, one terminal division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# deterministic final-response table: ~70% 200, plus the common failure
# codes a capture store sees (slot = event_id % 10)
_SIP_CODES = [200, 200, 200, 200, 486, 503, 200, 404, 480, 200]


def _dialogs(spark: SparkSession, sf: str) -> DataFrame:
    """Planted SIP dialog table: one dialog per event under id 3000 —
    final code, PDD ms, duration s, source trunk — all exact integer
    functions of event_id (both engines replant identically)."""
    ev = load_table(spark, sf, "events").filter(F.col("event_id") < 3000)
    code = F.element_at(
        F.array(*[F.lit(c) for c in _SIP_CODES]), (F.col("event_id") % 10 + 1).cast("int")
    )
    return ev.select(
        F.col("event_id").alias("call_id"),
        F.col("ts"),
        (F.col("user_id") % 20).alias("trunk"),
        code.alias("final_code"),
        (F.col("event_id") % 2977).alias("pdd_ms"),
        (F.col("event_id") % 3600 + 1).alias("duration_s"),
    )


_DIALOGS_SQL = f"""
  SELECT event_id AS call_id, ts, user_id % 20 AS trunk,
         ([{", ".join(str(c) for c in _SIP_CODES)}])[CAST(event_id % 10 + 1 AS INTEGER)] AS final_code,
         event_id % 2977 AS pdd_ms,
         event_id % 3600 + 1 AS duration_s
  FROM events WHERE event_id < 3000
"""


# ---------------------------------------------------------------------------
# sip_response_class_rates — ASR / failure accounting per trunk
# ---------------------------------------------------------------------------


def sip_response_class_rates(spark: SparkSession, sf: str) -> DataFrame:
    """Per-trunk answer/failure accounting — the first dashboard of any
    SIP operator: calls, answered (200), per-class counts (4xx/5xx), ASR
    (answer-seizure ratio) and failure ratio. Exact integers + terminal
    divisions.

    Scale: one groupBy on the bounded trunk key — partial-aggregated,
    constant output."""
    d = _dialogs(spark, sf)
    cls = (F.col("final_code") / 100).cast("int")
    g = d.select("trunk", "final_code", cls.alias("cls")).groupBy("trunk").agg(
        F.count("*").alias("calls"),
        F.sum(F.when(F.col("final_code") == 200, 1).otherwise(0)).alias("answered"),
        F.sum(F.when(F.col("cls") == 4, 1).otherwise(0)).alias("n_4xx"),
        F.sum(F.when(F.col("cls") == 5, 1).otherwise(0)).alias("n_5xx"),
    )
    return g.select(
        F.col("trunk").cast("long").alias("trunk"),
        F.col("calls").cast("long").alias("calls"),
        F.col("answered").cast("long").alias("answered"),
        F.col("n_4xx").cast("long").alias("n_4xx"),
        F.col("n_5xx").cast("long").alias("n_5xx"),
        F.round(F.col("answered") / F.col("calls"), 6).alias("asr"),
        F.round((F.col("n_4xx") + F.col("n_5xx")) / F.col("calls"), 6).alias("fail_ratio"),
    ).orderBy("trunk")


SIP_RATES_SQL = f"""
WITH d AS ({_DIALOGS_SQL})
SELECT CAST(trunk AS BIGINT) AS trunk,
       CAST(count(*) AS BIGINT) AS calls,
       CAST(sum(CASE WHEN final_code = 200 THEN 1 ELSE 0 END) AS BIGINT) AS answered,
       CAST(sum(CASE WHEN final_code // 100 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_4xx,
       CAST(sum(CASE WHEN final_code // 100 = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_5xx,
       round(sum(CASE WHEN final_code = 200 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS asr,
       round(sum(CASE WHEN final_code // 100 IN (4, 5) THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS fail_ratio
FROM d GROUP BY trunk ORDER BY trunk
"""


# ---------------------------------------------------------------------------
# sip_pdd_percentiles — post-dial delay p50/p95 per hour
# ---------------------------------------------------------------------------


def sip_pdd_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Post-dial-delay health per hour: DISCRETE p50/p95 (the PDD value at
    rank ceil(q*n) under the unique (pdd_ms, call_id) order — identical
    selection on both engines, no interpolation) over answered calls.

    Scale: rank window partitioned by hour (bounded per-partition sort),
    then one groupBy on hours."""
    d = _dialogs(spark, sf).filter(F.col("final_code") == 200)
    hr = F.date_trunc("hour", F.col("ts")).alias("hour")
    w = Window.partitionBy("hour").orderBy("pdd_ms", "call_id")
    ranked = (
        d.select(hr, "pdd_ms", "call_id")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("hour")))
    )
    return (
        ranked.groupBy("hour", "n")
        .agg(
            F.min(F.when(F.col("rk") == F.ceil(F.col("n") * 0.5), F.col("pdd_ms"))).alias("p50_ms"),
            F.min(F.when(F.col("rk") == F.ceil(F.col("n") * 0.95), F.col("pdd_ms"))).alias("p95_ms"),
            F.max("pdd_ms").alias("max_ms"),
        )
        .select(
            "hour",
            F.col("n").cast("long").alias("n_calls"),
            F.col("p50_ms").cast("long").alias("p50_ms"),
            F.col("p95_ms").cast("long").alias("p95_ms"),
            F.col("max_ms").cast("long").alias("max_ms"),
        )
        .orderBy("hour")
    )


SIP_PDD_SQL = f"""
WITH d AS ({_DIALOGS_SQL}),
ranked AS (
  SELECT date_trunc('hour', ts) AS hour, pdd_ms, call_id,
         row_number() OVER (PARTITION BY date_trunc('hour', ts) ORDER BY pdd_ms, call_id) AS rk,
         count(*) OVER (PARTITION BY date_trunc('hour', ts)) AS n
  FROM d WHERE final_code = 200
)
SELECT hour, CAST(n AS BIGINT) AS n_calls,
       CAST(min(CASE WHEN rk = CAST(ceil(n * 0.5) AS BIGINT) THEN pdd_ms END) AS BIGINT) AS p50_ms,
       CAST(min(CASE WHEN rk = CAST(ceil(n * 0.95) AS BIGINT) THEN pdd_ms END) AS BIGINT) AS p95_ms,
       CAST(max(pdd_ms) AS BIGINT) AS max_ms
FROM ranked GROUP BY hour, n ORDER BY hour
"""


# ---------------------------------------------------------------------------
# rtcp_mos_rollup — RTCP-derived MOS quality per hour
# ---------------------------------------------------------------------------


def rtcp_mos_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """RTCP quality rollup: per-call jitter/loss planted as an RTCP-report
    JSON payload (the shape a capture store holds for payload type 5),
    parsed JSON-path-wise, scored with a simplified E-model
    (R = 93.2 - 2.5*loss - 0.1*jitter, MOS = 1 + 0.035R + 7e-6*R(R-60)(100-R)),
    quantized to the e4 grid per call, then rolled up hourly with exact
    integer sums — the "voice quality by hour" panel.

    Scale: JSON parse + polynomial are narrow maps; one bounded-key
    (hour) aggregation. The e4 quantization makes the hourly mean an
    exact integer sum / single division."""
    ev = load_table(spark, sf, "events").filter(F.col("event_id") < 3000)
    rtcp = ev.select(
        F.col("event_id").alias("call_id"),
        "ts",
        F.to_json(
            F.struct(
                (F.col("event_id") % 40).alias("jitter_ms"),
                (F.col("event_id") % 7).alias("loss_pct"),
            )
        ).alias("rtcp_json"),
    )
    jit = F.get_json_object("rtcp_json", "$.jitter_ms").cast("long")
    loss = F.get_json_object("rtcp_json", "$.loss_pct").cast("long")
    r = F.lit(93.2) - 2.5 * loss - 0.1 * jit
    mos = 1 + 0.035 * r + 7e-6 * r * (r - 60) * (100 - r)
    # floor(x + 0.5), not round(): Spark's HALF_UP-on-BigDecimal and
    # DuckDB's double rounding can differ by 1 on the e4 grid (the SQ8
    # quantizer lesson, operators/similarity.py)
    scored = rtcp.select(
        "call_id",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.floor(mos * 10000 + 0.5).cast("long").alias("mos_e4"),
    )
    return (
        scored.groupBy("hour")
        .agg(
            F.count("*").alias("n_calls"),
            F.sum("mos_e4").alias("sum_e4"),
            F.min("mos_e4").alias("min_e4"),
            F.sum(F.when(F.col("mos_e4") < 35000, 1).otherwise(0)).alias("n_poor"),
        )
        .select(
            "hour",
            F.col("n_calls").cast("long").alias("n_calls"),
            # UNROUNDED single division of exact integers (the ohlc_bars
            # lesson): round(x, 6) at a reachable ...5 boundary diverges
            # between Spark's HALF_UP-on-shortest-decimal and DuckDB's
            # binary rounding; the raw quotient is bit-identical
            (F.col("sum_e4") / (F.col("n_calls") * 10000)).alias("avg_mos"),
            (F.col("min_e4") / 10000).alias("min_mos"),
            F.col("n_poor").cast("long").alias("n_poor"),
        )
        .orderBy("hour")
    )


RTCP_MOS_SQL = """
WITH rtcp AS (
  SELECT event_id AS call_id, ts,
         to_json(struct_pack(jitter_ms := event_id % 40, loss_pct := event_id % 7)) AS rtcp_json
  FROM events WHERE event_id < 3000
), parsed AS (
  SELECT call_id, date_trunc('hour', ts) AS hour,
         CAST(json_extract_string(rtcp_json, '$.jitter_ms') AS BIGINT) AS jit,
         CAST(json_extract_string(rtcp_json, '$.loss_pct') AS BIGINT) AS loss
  FROM rtcp
), rr AS (
  -- decimal literals must be forced to DOUBLE: DuckDB parses 93.2/2.5/0.1
  -- as DECIMAL, and mixed decimal/double arithmetic diverges from Spark's
  -- pure-double evaluation in the last ulp
  SELECT call_id, hour,
         CAST(93.2 AS DOUBLE) - CAST(2.5 AS DOUBLE) * loss - CAST(0.1 AS DOUBLE) * jit AS r
  FROM parsed
), scored AS (
  SELECT call_id, hour,
         CAST(floor((1 + CAST(0.035 AS DOUBLE) * r + 7e-6 * r * (r - 60) * (100 - r)) * 10000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mos_e4
  FROM rr
)
SELECT hour, CAST(count(*) AS BIGINT) AS n_calls,
       sum(mos_e4) * 1.0 / (count(*) * 10000) AS avg_mos,
       min(mos_e4) / 10000.0 AS min_mos,
       CAST(sum(CASE WHEN mos_e4 < 35000 THEN 1 ELSE 0 END) AS BIGINT) AS n_poor
FROM scored GROUP BY hour ORDER BY hour
"""


# ---------------------------------------------------------------------------
# call_duration_log_hist — log2-bucketed duration histogram
# ---------------------------------------------------------------------------


def call_duration_log_hist(spark: SparkSession, sf: str) -> DataFrame:
    """Call-duration histogram on log2 buckets — bucket = number of binary
    digits of the duration (length of bin(d), exact on both engines; no
    floating log at power-of-two boundaries). The long-tail view that
    catches both one-ring calls and stuck channels.

    Scale: narrow map + bounded-key (≤13 buckets) groupBy."""
    d = _dialogs(spark, sf)
    bucket = F.length(F.expr("bin(duration_s)")).cast("int")
    g = d.select(bucket.alias("bucket"), "duration_s").groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("duration_s").alias("min_s"),
        F.max("duration_s").alias("max_s"),
    )
    tot = g.agg(F.sum("n").alias("total"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (F.pow(F.lit(2.0), F.col("bucket") - 1).cast("long")).alias("bucket_lo_s"),
            F.col("n").cast("long").alias("n"),
            F.col("min_s").cast("long").alias("min_s"),
            F.col("max_s").cast("long").alias("max_s"),
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
        )
        .orderBy("bucket")
    )


CALL_HIST_SQL = f"""
WITH d AS ({_DIALOGS_SQL}),
g AS (
  SELECT CAST(length(bin(duration_s)) AS INTEGER) AS bucket, count(*) AS n,
         min(duration_s) AS min_s, max(duration_s) AS max_s
  FROM d GROUP BY 1
), tot AS (SELECT sum(n) AS total FROM g)
SELECT bucket, CAST(2 ** (bucket - 1) AS BIGINT) AS bucket_lo_s,
       CAST(n AS BIGINT) AS n, CAST(min_s AS BIGINT) AS min_s,
       CAST(max_s AS BIGINT) AS max_s,
       round(n * 1.0 / total, 6) AS share
FROM g, tot ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# sip_retransmission_rate — transport health per 10-minute bucket
# ---------------------------------------------------------------------------


def sip_retransmission_rate(spark: SparkSession, sf: str) -> DataFrame:
    """UDP retransmission accounting per 10-minute bucket (the reference's
    own storage granularity, hepop.js:116-120): planted retransmit counts
    (every 20th dialog retransmits twice, every 7th once), rate per
    bucket — the transport-health panel that flags packet loss toward a
    trunk.

    Scale: narrow plant + one bounded-key groupBy over 10-min buckets."""
    d = _dialogs(spark, sf)
    retx = (
        F.when(F.col("call_id") % 20 == 0, 2)
        .when(F.col("call_id") % 7 == 0, 1)
        .otherwise(0)
    )
    bucket = F.date_trunc("hour", F.col("ts")) + F.make_interval(
        mins=(F.floor(F.minute("ts") / 10) * 10).cast("int")
    )
    g = d.select(bucket.alias("bucket_10m"), retx.alias("retx")).groupBy(
        "bucket_10m"
    ).agg(
        F.count("*").alias("msgs"),
        F.sum("retx").alias("retx"),
    )
    return g.select(
        "bucket_10m",
        F.col("msgs").cast("long").alias("msgs"),
        F.col("retx").cast("long").alias("retx"),
        F.round(F.col("retx") / F.col("msgs"), 6).alias("retx_rate"),
    ).orderBy("bucket_10m")


SIP_RETX_SQL = f"""
WITH d AS ({_DIALOGS_SQL})
SELECT date_trunc('hour', ts) + INTERVAL (floor(minute(ts) / 10) * 10) MINUTE AS bucket_10m,
       CAST(count(*) AS BIGINT) AS msgs,
       CAST(sum(CASE WHEN call_id % 20 = 0 THEN 2 WHEN call_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS retx,
       round(sum(CASE WHEN call_id % 20 = 0 THEN 2 WHEN call_id % 7 = 0 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS retx_rate
FROM d GROUP BY 1 ORDER BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "sip_response_class_rates": QuerySpec(
        sip_response_class_rates, SIP_RATES_SQL,
        "per-trunk ASR / failure-class accounting",
    ),
    "sip_pdd_percentiles": QuerySpec(
        sip_pdd_percentiles, SIP_PDD_SQL,
        "post-dial-delay discrete p50/p95 per hour",
    ),
    "rtcp_mos_rollup": QuerySpec(
        rtcp_mos_rollup, RTCP_MOS_SQL,
        "RTCP JSON -> E-model MOS hourly quality rollup",
    ),
    "call_duration_log_hist": QuerySpec(
        call_duration_log_hist, CALL_HIST_SQL,
        "log2-bucketed call-duration histogram (exact bin-length buckets)",
    ),
    "sip_retransmission_rate": QuerySpec(
        sip_retransmission_rate, SIP_RETX_SQL,
        "retransmission rate per 10-minute storage bucket",
    ),
}


# ---------------------------------------------------------------------------
# capture_seq_gaps — frame sequence-gap (loss) detection per trunk
# ---------------------------------------------------------------------------


def capture_seq_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Capture-pipeline loss detection: each trunk's frames carry a
    monotonically increasing sequence number (planted: seq = call_id, with
    every 97th frame dropped — the deterministic stand-in for UDP loss);
    a lag() pass finds the gaps. Per trunk: frames seen, gap events,
    frames lost, largest single gap — the capture-health panel that tells
    an operator a probe or link is dropping frames BEFORE queries go
    quietly wrong.

    Scale: one window pass partitioned by the bounded trunk key; the
    rollup partial-combines."""
    d = _dialogs(spark, sf).filter(F.col("call_id") % 97 != 0)
    w = Window.partitionBy("trunk").orderBy("call_id")
    gaps = d.select(
        "trunk",
        "call_id",
        (F.col("call_id") - F.lag("call_id").over(w)).alias("step"),
    )
    return (
        gaps.groupBy("trunk")
        .agg(
            F.count("*").cast("long").alias("frames_seen"),
            F.sum(F.when(F.col("step") > 1, 1).otherwise(0)).cast("long").alias("gap_events"),
            F.sum(F.when(F.col("step") > 1, F.col("step") - 1).otherwise(0))
            .cast("long")
            .alias("frames_lost"),
            F.coalesce(F.max(F.when(F.col("step") > 1, F.col("step") - 1)), F.lit(0))
            .cast("long")
            .alias("max_gap"),
        )
        .orderBy("trunk")
    )


CAPTURE_GAPS_SQL = f"""
WITH d AS ({_DIALOGS_SQL}),
kept AS (
  SELECT trunk, call_id FROM d WHERE call_id % 97 != 0
), gaps AS (
  SELECT trunk, call_id,
         call_id - lag(call_id) OVER (PARTITION BY trunk ORDER BY call_id) AS step
  FROM kept
)
SELECT trunk, CAST(count(*) AS BIGINT) AS frames_seen,
       CAST(sum(CASE WHEN step > 1 THEN 1 ELSE 0 END) AS BIGINT) AS gap_events,
       CAST(sum(CASE WHEN step > 1 THEN step - 1 ELSE 0 END) AS BIGINT) AS frames_lost,
       CAST(coalesce(max(CASE WHEN step > 1 THEN step - 1 END), 0) AS BIGINT) AS max_gap
FROM gaps
GROUP BY trunk
ORDER BY trunk
"""

QUERIES["capture_seq_gaps"] = QuerySpec(
    capture_seq_gaps, CAPTURE_GAPS_SQL,
    "sequence-gap (frame loss) detection per trunk via one lag pass",
)


# ---------------------------------------------------------------------------
# rtp_jitter_rfc3550 — interarrival jitter estimate per trunk
# ---------------------------------------------------------------------------

JITTER_NOMINAL_US = 20_000  # 20 ms packetization interval


def rtp_jitter_rfc3550(spark: SparkSession, sf: str) -> DataFrame:
    """RFC 3550 §6.4.1 interarrival jitter per trunk: D_i = (arrival gap)
    - (nominal 20 ms media gap); the running estimate J += (|D|-J)/16 is
    re-expressed as the closed-form weighted sum J_n = Σ |D_i| · (1/16) ·
    (15/16)^(n-i) — the same recursion-to-window trick as ewma_smooth,
    which turns a sequential per-packet scan into one distributable
    window pass + one aggregation. Weights underflow to exact 0.0 for
    old packets identically in both engines (IEEE pow), so the sum is a
    finite tail either way. The per-trunk jitter is the RTCP field a
    capture store surfaces on its trunk-quality panel.

    Scale: one window rank per bounded trunk key + one groupBy; packets
    shuffle once on trunk. Events stand in for RTP arrivals (same device
    as the rest of voip_q; both engines replant identically)."""
    ev = load_table(spark, sf, "events").filter(F.col("event_id") < 6000)
    pk = ev.select(
        (F.col("user_id") % 20).alias("trunk"),
        F.unix_micros("ts").alias("t_us"),
        "event_id",
    )
    w = Window.partitionBy("trunk").orderBy("t_us", "event_id")
    wn = Window.partitionBy("trunk")
    d = (
        pk.withColumn("gap", F.col("t_us") - F.lag("t_us").over(w))
        .withColumn("i", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wn))
        .filter(F.col("gap").isNotNull())
        .withColumn("absd", F.abs(F.col("gap") - JITTER_NOMINAL_US))
    )
    term = (
        F.col("absd") * F.pow(F.lit(15.0 / 16.0), F.col("n") - F.col("i")) / 16.0
    )
    return (
        d.withColumn("term", term)
        .groupBy("trunk")
        .agg(
            F.count("*").alias("n_gaps"),
            # fold the terms in fixed i-ascending order (same pattern as
            # llm7 pq_encode_stats / scale_paths ADC): a shuffled double SUM
            # accumulates in partition order and can flip the rounded 3rd
            # decimal at a representable boundary between engines
            F.array_sort(F.collect_list(F.struct("i", "term"))).alias("terms"),
        )
        .withColumn(
            "jitter_ms",
            F.round(
                F.aggregate(
                    F.col("terms"), F.lit(0.0), lambda a, s: a + s["term"]
                )
                / 1000.0,
                3,
            ),
        )
        .select(
            F.col("trunk").cast("long").alias("trunk"),
            F.col("n_gaps").cast("long").alias("n_gaps"),
            "jitter_ms",
        )
        .orderBy("trunk")
    )


JITTER_SQL = f"""
WITH pk AS (
  SELECT user_id % 20 AS trunk, epoch_us(ts) AS t_us, event_id
  FROM events WHERE event_id < 6000
), d AS (
  SELECT trunk,
         t_us - lag(t_us) OVER (PARTITION BY trunk ORDER BY t_us, event_id) AS gap,
         row_number() OVER (PARTITION BY trunk ORDER BY t_us, event_id) AS i,
         count(*) OVER (PARTITION BY trunk) AS n
  FROM pk
)
SELECT CAST(trunk AS BIGINT) AS trunk,
       CAST(count(*) AS BIGINT) AS n_gaps,
       round(sum(abs(gap - {JITTER_NOMINAL_US}) * pow(CAST(15 AS DOUBLE) / 16, n - i) / 16)
             / 1000.0, 3) AS jitter_ms
FROM d
WHERE gap IS NOT NULL
GROUP BY trunk
ORDER BY trunk
"""

QUERIES["rtp_jitter_rfc3550"] = QuerySpec(
    rtp_jitter_rfc3550, JITTER_SQL,
    "RFC 3550 interarrival jitter per trunk, closed-form window pass",
)
