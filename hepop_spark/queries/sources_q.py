"""Source-format breadth exposed in the judged inventory.

The reference reads exactly one at-rest format (its own parquet); a Spark
engine serves whatever lands. Each entry here round-trips the same rows
through a different wire/at-rest format — CSV, JSON-lines, and InfluxDB
Line Protocol (the reference's ingest wire format, lineproto.js) — then
aggregates. The oracle aggregates the parquet source directly: a format
round-trip is correct iff it is invisible in the result hash.

Scale notes: CSV/JSON readers are distributed scans with schema enforced
(no inference pass at plan time); the LP path is pure column expressions
(split/regexp/try_cast) — a narrow map, no Python, whole-stage codegen.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import local_result, load_table
from . import QuerySpec

_AGG_ORACLE = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_v
FROM events
WHERE event_id < 2000
GROUP BY event_type
"""


def _slice(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", "event_type", "value")
    )


def _agg(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_v"),
    )


def source_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """parquet -> CSV (header) -> schema-enforced distributed CSV scan ->
    aggregate. Header + explicit schema: no inference job at scale."""
    d = tempfile.mkdtemp(prefix="srccsv_")
    try:
        path = os.path.join(d, "events_csv")
        _slice(spark, sf).write.mode("overwrite").option("header", True).csv(path)
        back = spark.read.schema(
            "event_id bigint, event_type string, value double"
        ).option("header", True).csv(path)
        rows = _agg(back).collect()
        return local_result(spark, 
            rows, "event_type string, n bigint, sum_v double"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def source_jsonl_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """parquet -> JSON lines -> schema-enforced distributed JSON scan ->
    aggregate."""
    d = tempfile.mkdtemp(prefix="srcjson_")
    try:
        path = os.path.join(d, "events_json")
        _slice(spark, sf).write.mode("overwrite").json(path)
        back = spark.read.schema(
            "event_id bigint, event_type string, value double"
        ).json(path)
        rows = _agg(back).collect()
        return local_result(spark, 
            rows, "event_type string, n bigint, sum_v double"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def source_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """parquet -> ORC -> distributed ORC scan -> aggregate. ORC is the
    second first-class columnar at-rest format in Spark (vectorized
    reader, predicate pushdown, zone-map stripe statistics — the same
    properties §4 gets from parquet), so supporting it is a pure
    config-level switch; the hash proves it is result-invisible."""
    d = tempfile.mkdtemp(prefix="srcorc_")
    try:
        path = os.path.join(d, "events_orc")
        _slice(spark, sf).write.mode("overwrite").orc(path)
        back = spark.read.orc(path)
        rows = _agg(back).collect()
        return local_result(spark, 
            rows, "event_type string, n bigint, sum_v double"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def source_lineproto_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """events -> Line Protocol text (the reference's wire format:
    `measurement,tag=v field=v` — A5/A6) -> the engine's column-expression
    LP parser -> typed fields -> aggregate. Formatting AND parsing both
    happen distributed; the hash proves the byte-level grammar round-trips
    losslessly (floats serialized via format_number(17) so the text carries
    full double precision)."""
    from ..sources.lineproto import parse_lines_df

    ev = _slice(spark, sf)
    # format: "ev,event_type=<t> value=<v> " (no ts: server-time semantics
    # are irrelevant to the aggregate; repr-style full-precision float)
    lines = ev.select(
        F.concat(
            F.lit("ev,event_type="),
            F.col("event_type"),
            F.lit(" value="),
            F.format_string("%.17g", F.col("value")),
        ).alias("value")
    )
    parsed = parse_lines_df(lines)
    typed = parsed.select(
        F.col("tags")["event_type"].alias("event_type"),
        F.expr("try_cast(fields['value'] AS DOUBLE)").alias("value"),
    )
    return _agg(typed)


def lp_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """A measurement GAINS A FIELD mid-stream — the evolution path the
    reference cannot take (first-row schema freeze, hepop.js:382-394:
    later rows' unknown fields are silently dropped by the parquetjs
    writer). Here the full ingest machinery runs twice with
    schema_evolution=True: generation 1 lines carry `value` only, then a
    second micro-batch (same checkpoint, availableNow) delivers lines with
    a NEW `value2` field; the registry appends the column, and the
    mergeSchema read (streaming/ingest.read_measurement) presents the
    union — generation-1 rows null-fill value2.

    The oracle recomputes the aggregate straight from events: evolution
    must change NOTHING about the values that flowed through (value2 is
    2*value for the second generation, exact in binary).  Scale shape: the
    evolve step is one bounded per-batch key-type aggregation; mergeSchema
    is a planning-time footer merge, not a data scan."""
    from ..streaming.ingest import lp_sink, read_lp_stream, read_measurement

    ev = (
        load_table(spark, sf, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", "event_type", "value")
    )
    d = tempfile.mkdtemp(prefix="lpevo_")
    landing = os.path.join(d, "landing")
    base = os.path.join(d, "tables")
    ckpt = os.path.join(d, "ckpt")
    try:
        # parity split (NOT an id threshold): both generations must be
        # non-empty at EVERY sf — at sf0.001 ids stop below 1000 and an
        # empty gen2 means value2 never materializes (sf0.001 sweep find)
        gen1 = ev.filter(F.col("event_id") % 2 == 0).select(
            F.format_string(
                "evm,event_type=%s value=%.17g", "event_type", "value"
            ).alias("value")
        )
        gen2 = ev.filter(F.col("event_id") % 2 == 1).select(
            F.format_string(
                "evm,event_type=%s value=%.17g,value2=%.17g",
                "event_type", "value", F.col("value") * 2,
            ).alias("value")
        )
        gen1.write.mode("overwrite").text(landing)
        lp_sink(
            read_lp_stream(spark, landing), base, ckpt,
            processing_time=None, schema_evolution=True,
        ).start().awaitTermination()
        gen2.write.mode("append").text(landing)
        lp_sink(
            read_lp_stream(spark, landing), base, ckpt,
            processing_time=None, schema_evolution=True,
        ).start().awaitTermination()

        back = read_measurement(spark, base, "evm")
        rows = (
            back.select(
                F.get_json_object("tags", "$.event_type").alias("event_type"),
                "value",
                "value2",
            )
            .groupBy("event_type")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.round(F.sum("value"), 2).alias("sum_v"),
                F.count("value2").cast("long").alias("n_v2"),
                F.round(F.coalesce(F.sum("value2"), F.lit(0.0)), 2).alias("sum_v2"),
            )
            .collect()
        )
        return local_result(spark, 
            rows, "event_type string, n bigint, sum_v double, n_v2 bigint, sum_v2 double"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


_LP_EVOLUTION_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_v,
       CAST(count(*) FILTER (WHERE event_id % 2 = 1) AS BIGINT) AS n_v2,
       round(sum(CASE WHEN event_id % 2 = 1 THEN value * 2 ELSE 0 END), 2) AS sum_v2
FROM events
WHERE event_id < 2000
GROUP BY event_type
"""


def source_partitioned_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Hive-style directory partitioning + partition pruning — the layout
    the reference approximates with per-10-minute files and a metadata.json
    time index (hepop.js:114-132, query.js:22-63), done the lakehouse way:
    events rewritten `partitionBy(event_date)`, then a date-range query
    reads ONLY the 4 matching directories (PartitionFilters at plan time —
    pinned by tests/test_storage.py; directories outside the range are
    never listed into the scan). The oracle filters the unpartitioned
    original: the layout must be result-invisible.

    Scale: date partitioning is the first-line pruning axis at 100 TB;
    z-order (storage/zorder.py) then handles dimensions INSIDE a date."""
    ev = load_table(spark, sf, "events").select(
        "event_id",
        "event_type",
        "value",
        F.to_date("ts").cast("string").alias("event_date"),
    )
    d = tempfile.mkdtemp(prefix="part_prune_")
    try:
        path = os.path.join(d, "events_by_date")
        ev.write.partitionBy("event_date").mode("overwrite").parquet(path)
        back = spark.read.parquet(path)
        rows = (
            back.filter(F.col("event_date").between("2024-01-05", "2024-01-08"))
            .groupBy(F.col("event_date").cast("string").alias("event_date"))
            .agg(
                F.count("*").cast("long").alias("n"),
                F.round(F.sum("value"), 2).alias("sum_v"),
            )
            .collect()
        )
        return local_result(spark, rows, "event_date string, n bigint, sum_v double")
    finally:
        shutil.rmtree(d, ignore_errors=True)


_PART_PRUNE_ORACLE = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_v
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-08'
GROUP BY 1
"""


def hep_sip_call_stats(spark: SparkSession, sf: str) -> DataFrame:
    """SIP dialog correlation through the REAL HEP v3 binary path — the
    query a HEPop user actually wants from the capture store (the
    reference stores frames but never correlates; SURVEY §1.2): each
    event under id 2000 becomes a deterministic SIP dialog (INVITE at the
    event time, 200 OK exactly event_id % 97 + 1 seconds later, same
    Call-ID), ENCODED into HEP v3 frames (sources/hep.py encapsulate),
    decoded back through the engine's mapInPandas decoder, correlated by
    the Call-ID header (regexp, JVM-side), and rolled up per hour: calls
    and exact integer setup-time stats.

    The oracle computes the same rollup straight from the events table —
    the binary encode→decode→regex-correlate round-trip must be
    result-invisible. Scale shape: frame codec is the legitimate
    Arrow-batched Python stage (A3); correlation is ONE hash shuffle on
    Call-ID; the rollup is a partial-aggregated groupBy on hours."""
    from ..sources.hep import decode_hep_df, encapsulate

    ev = (
        load_table(spark, sf, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", "user_id", F.unix_timestamp("ts").alias("t_sec"))
    )

    def build_frames(batches):
        import pandas as pd

        for pdf in batches:
            frames = []
            for eid, uid, t in zip(pdf["event_id"], pdf["user_id"], pdf["t_sec"]):
                setup = int(eid) % 97 + 1
                call_id = f"call-{int(eid)}"
                base = {
                    "protocolFamily": 2, "protocol": 17,
                    "srcIp": "192.168.1.10", "dstIp": "10.0.0.5",
                    "srcPort": 5060, "dstPort": 5060,
                    "timeUseconds": 0, "payloadType": 1, "captureId": 2001,
                }
                inv = dict(base, timeSeconds=int(t))
                ok = dict(base, timeSeconds=int(t) + setup)
                frames.append(encapsulate(
                    inv,
                    f"INVITE sip:u{int(uid)}@example.com SIP/2.0\r\n"
                    f"Call-ID: {call_id}\r\n\r\n",
                ))
                frames.append(encapsulate(
                    ok, f"SIP/2.0 200 OK\r\nCall-ID: {call_id}\r\n\r\n",
                ))
            yield pd.DataFrame({"frame": frames})

    frames = ev.mapInPandas(build_frames, "frame binary")
    decoded = decode_hep_df(frames)
    legs = decoded.select(
        F.regexp_extract("payload", r"Call-ID: (\S+)", 1).alias("call_id"),
        F.unix_millis("timestamp").alias("t_ms"),
    )
    calls = legs.groupBy("call_id").agg(
        F.min("t_ms").alias("t_inv"),
        F.max("t_ms").alias("t_ok"),
        F.count("*").alias("n_legs"),
    )
    return (
        calls.filter(F.col("n_legs") == 2)
        .select(
            F.date_format(
                F.date_trunc("hour", F.timestamp_millis("t_inv")),
                "yyyy-MM-dd HH:00",
            ).alias("hour"),
            F.expr("(t_ok - t_inv) div 1000").alias("setup_s"),
        )
        .groupBy("hour")
        .agg(
            F.count("*").alias("n_calls"),
            F.sum("setup_s").alias("sum_setup_s"),
            F.max("setup_s").alias("max_setup_s"),
        )
    )


HEP_SIP_SQL = """
WITH c AS (
  -- floor, not ::BIGINT: DuckDB's double->int cast ROUNDS while Spark's
  -- unix_timestamp truncates; a xx:59:59.5 event would cross the hour
  SELECT strftime(date_trunc('hour', to_timestamp(CAST(floor(epoch(ts)) AS BIGINT))),
                  '%Y-%m-%d %H:00') AS hour,
         event_id % 97 + 1 AS setup_s
  FROM events WHERE event_id < 2000
)
SELECT hour, count(*) AS n_calls,
       CAST(sum(setup_s) AS BIGINT) AS sum_setup_s,
       CAST(max(setup_s) AS BIGINT) AS max_setup_s
FROM c GROUP BY hour
"""




_BLOOM_PROBE_IDS = (11, 123, 456, 789, 877)


def bloom_point_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """File-level Bloom sidecar pruning for point lookups
    (storage/bloom_index.py) — the call-ID-lookup shape HEPop users run
    (the reference's writer bloom option, hepop.js:26-34, works only
    inside an already-opened file; this skips whole files at plan time).
    Events are rewritten as 24 shard files, a per-file bloom sidecar is
    built over a synthetic call_id (one distributed pass: k=4 double-md5
    positions, per-file-sized bitmaps), then five call ids are answered
    through bloom_point_read. The entry ASSERTS pruning really happened
    (files_read < files_live — no false negatives means results cannot
    change, so the oracle is the plain unpruned scan).

    Scale: the sidecar is O(files x bits); the probe is driver-side
    bitmap math with NO Spark job; the read opens only admitted files.
    At 100 TB this is the difference between a point lookup touching a
    handful of files and a full time-partition scan."""
    from ..storage.bloom_index import bloom_index_update, bloom_point_read

    ev = load_table(spark, sf, "events").select(
        "event_id", "event_type", "value",
        F.concat(F.lit("call-"), F.col("event_id")).alias("call_id"),
        F.pmod(F.col("event_id"), F.lit(24)).alias("shard"),
    )
    d = tempfile.mkdtemp(prefix="bloom_idx_")
    try:
        path = os.path.join(d, "events_sharded")
        ev.repartition("shard").write.partitionBy("shard").parquet(path)
        bloom_index_update(spark, path, "call_id")
        probes = [f"call-{i}" for i in _BLOOM_PROBE_IDS]
        out, stats = bloom_point_read(spark, path, "call_id", probes)
        assert stats["files_read"] < stats["files_live"], stats
        assert stats["files_read"] >= 1, stats
        rows = (
            out.select("event_id", "call_id", "event_type", "value")
            .orderBy("event_id")
            .collect()
        )
        return local_result(spark, 
            rows,
            "event_id bigint, call_id string, event_type string, value double",
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


_BLOOM_LOOKUP_ORACLE = f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       'call-' || CAST(event_id AS VARCHAR) AS call_id,
       event_type, value
FROM events
WHERE event_id IN {_BLOOM_PROBE_IDS}
ORDER BY event_id
"""



def retention_expiry(spark: SparkSession, sf: str) -> DataFrame:
    """Retention as a first-class storage mutation (storage/retention.py,
    r09c): events written to the reference's date/bucket layout under a
    manifest, then `apply_retention(cutoff=2024-01-15)` RETIRES the 14
    expired date partitions in one manifest publish — their bytes persist
    through the vacuum grace (pinned in-flight readers keep working), but
    every read from this moment on sees only surviving dates. The entry
    asserts exactly 14 dates dropped, that a second sweep is a no-op
    (idempotent), and returns the per-date rollup of the survivors; the
    oracle recomputes it from the raw events table filtered at the
    cutoff — a retention that dropped too much/little or double-applied
    fails the hash.

    Scale: expiry cost ~ dropped partitions (one CAS publish + deferred
    deletes), never surviving data; the serve sweep runs it before
    compaction (RETENTION_DAYS) so expired data is never compacted into
    survivors first."""
    from ..storage.retention import apply_retention
    from ..storage.writer import read_table, write_partitioned

    ev = load_table(spark, sf, "events").select(
        "event_id", "value", F.col("ts").alias("timestamp"))
    d = tempfile.mkdtemp(prefix="retention_")
    try:
        tbl = os.path.join(d, "ev")
        write_partitioned(ev, tbl, manifest=True)
        res = apply_retention(tbl, "2024-01-15")
        if len(res["dates_dropped"]) != 14 or res["files_retired"] <= 0:
            raise AssertionError(
                f"retention dropped the wrong partitions: {res}")
        res2 = apply_retention(tbl, "2024-01-15")
        if res2["dates_dropped"] or res2["files_retired"]:
            raise AssertionError(f"retention re-applied: {res2}")
        back = read_table(spark, tbl)  # manifest-pinned live files
        rows = (
            back.groupBy(F.col("date").cast("string").alias("d"))
            .agg(
                F.count("*").cast("long").alias("n"),
                F.round(F.sum("value"), 2).alias("sum_v"),
            )
            .orderBy("d")
            .collect()
        )
        return local_result(spark, rows, "d string, n bigint, sum_v double")
    finally:
        shutil.rmtree(d, ignore_errors=True)


_RETENTION_ORACLE = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_v
FROM events
WHERE CAST(ts AS DATE) >= DATE '2024-01-15'
GROUP BY 1
ORDER BY d
"""


QUERIES: dict[str, QuerySpec] = {
    "source_csv_roundtrip": QuerySpec(source_csv_roundtrip, _AGG_ORACLE),
    "source_jsonl_roundtrip": QuerySpec(source_jsonl_roundtrip, _AGG_ORACLE),
    "source_orc_roundtrip": QuerySpec(source_orc_roundtrip, _AGG_ORACLE),
    "source_lineproto_roundtrip": QuerySpec(source_lineproto_roundtrip, _AGG_ORACLE),
    "source_partitioned_prune": QuerySpec(source_partitioned_prune, _PART_PRUNE_ORACLE),
    "retention_expiry": QuerySpec(
        retention_expiry, _RETENTION_ORACLE,
        doc="age-out as a manifest mutation: 14 expired date partitions "
            "retired in one CAS publish (idempotence asserted in-entry); "
            "oracle recomputes the surviving rollup from raw events",
    ),
    "lp_schema_evolution": QuerySpec(
        lp_schema_evolution, _LP_EVOLUTION_ORACLE,
        "measurement gains a field mid-stream: registry evolve + mergeSchema read",
    ),
    "hep_sip_call_stats": QuerySpec(
        hep_sip_call_stats, HEP_SIP_SQL,
        "SIP dialog correlation through the HEP v3 binary codec",
    ),
    "bloom_point_lookup": QuerySpec(
        bloom_point_lookup, _BLOOM_LOOKUP_ORACLE,
        "file-level Bloom sidecar index: point lookups open only "
        "bloom-admitted files (pruning asserted in-entry)",
    ),
}
