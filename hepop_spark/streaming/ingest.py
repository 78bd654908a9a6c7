"""Streaming ingest pipelines.

Reference architecture (SURVEY §3.1-3.2): sockets/HTTP receive -> per-type
row buffer (1000 rows / 10 s, hepop.js:12) -> parquet flush into 10-minute
bucket dirs -> metadata commit. Spark-native equivalent:

  receiver process (thin; HEP decode or raw LP lines) appends to a landing
  directory -> `readStream` file source -> columnar parse -> `writeStream
  .foreachBatch(write_partitioned)` with `trigger(processingTime='10 s')`
  and checkpointing.

Micro-batching replaces the hand-rolled buffer; the checkpoint replaces the
WAL sequence; the output committer replaces tmp+rename metadata swaps.
Delivery contract, stated precisely: within a run each batch lands once
(committer atomicity); across a CRASH between a batch's parquet commit and
its checkpoint commit, the replayed batch re-appends — at-least-once into
the partitioned layout. That window is the trade for keeping the
reference's queryable date/bucket directory layout; the reference itself
LOSES the buffer in the same window (hepop.js:407-457). Pipelines that
need strict exactly-once route through streaming/exactly_once.py (batch-id
dirs + commit markers — used by index_maint.table_sink) or dedup on a key
downstream (queries/pipeline_ops.cdc_keep_latest). Index hooks riding
these sinks are idempotent per batch id regardless. Watermarked windows
supply the late-data policy the reference lacks (SURVEY §2: late rows just
land in their event-time bucket; here they additionally update windowed
aggregates until the watermark).

All builders return the unstarted DataStreamWriter/StreamingQuery handles so
tests can drive them with availableNow triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import json
import os

from ..sources.lineproto import infer_field_type_raw, measurement_table, parse_lines_df
from ..storage.writer import write_partitioned

FLUSH_INTERVAL = "10 seconds"  # reference flushInterval default, hepop.js:12


class SchemaRegistry:
    """Per-measurement frozen field schemas (reference hepop.js:376-409:
    the FIRST row of a new measurement freezes its schema; later rows with
    unknown fields lose them, exactly like the parquetjs writer would).
    Persisted as JSON beside the tables so restarts keep the freeze."""

    def __init__(self, base_dir: str):
        self.path = os.path.join(base_dir, "_schemas.json")
        self.schemas: dict[str, dict[str, str]] = {}
        if os.path.exists(self.path):
            with open(self.path) as fh:
                self.schemas = json.load(fh)

    def ensure(self, measurement: str, first_row_fields: dict[str, str | None]) -> dict[str, str]:
        if measurement not in self.schemas:
            frozen = {}
            for name, raw in first_row_fields.items():
                t = infer_field_type_raw(raw)
                if t is not None:  # undefined -> field dropped (JS semantics)
                    frozen[name] = t
            self.schemas[measurement] = frozen
            self._save()
        return self.schemas[measurement]

    def evolve(self, measurement: str, row_fields: dict[str, str | None]) -> dict[str, str]:
        """Schema EVOLUTION (the path the reference cannot take: its
        parquetjs writer drops unknown fields after the first-row freeze,
        hepop.js:382-394). New fields are APPENDED to the measurement's
        schema with the type inferred from their first observed value;
        existing fields keep their frozen type (a type flip of an existing
        field is still a first-row-wins decision, matching LP semantics).
        Readers see the union via parquet mergeSchema — old files simply
        lack the new columns (null-filled)."""
        schema = self.schemas.setdefault(measurement, {})
        added = False
        for name, raw in row_fields.items():
            if name in schema:
                continue
            t = infer_field_type_raw(raw)
            if t is not None:
                schema[name] = t
                added = True
        if added:
            self._save()
        return schema

    def _save(self):
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.schemas, fh, indent=1)
        os.rename(tmp, self.path)  # atomic, like the reference metadata write


def read_measurement(spark: SparkSession, base_dir: str, measurement: str,
                     merge_schema: bool = True) -> DataFrame:
    """Read one measurement table back, with parquet schema merging so a
    measurement whose schema EVOLVED mid-stream (lp_sink
    schema_evolution=True) presents the union of all file schemas —
    pre-evolution files null-fill the later columns. mergeSchema costs a
    footer read per file at planning time (not a data scan); at 100 TB turn
    it off for frozen tables and on only where evolution is enabled."""
    return (
        spark.read.option("mergeSchema", str(merge_schema).lower())
        .parquet(f"{base_dir}/{measurement}")
    )


def read_lp_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Line-Protocol landing dir (text files of LP lines) -> parsed stream
    (measurement, tags map, fields map, timestamp). The parse is pure column
    expressions — scales as a narrow map."""
    lines = spark.readStream.format("text").load(landing_dir)
    return parse_lines_df(lines)


def lp_sink(parsed: DataFrame, base_dir: str, checkpoint_dir: str,
            processing_time: str | None = FLUSH_INTERVAL,
            schema_evolution: bool = False,
            index_hooks: list | None = None,
            manifest: bool = False):
    """Write each measurement's rows under `{base}/{measurement}/` with the
    date/bucket partition layout and TYPED field columns frozen from the
    first row ever seen for that measurement (reference addLineProtocolBulk,
    hepop.js:376-409). foreachBatch (not a direct parquet sink) because one
    batch fans out to N measurement tables.

    ``schema_evolution=True`` lifts the reference's first-row freeze: a
    measurement gaining a field mid-stream gets the new column appended to
    its registry schema (type from the field's first observed value) and
    subsequent files carry it; read back with mergeSchema (read_measurement)
    for the union view. Default False = exact reference semantics.

    ``index_hooks`` (streaming/index_maint.py) run per measurement AFTER
    its parquet append, on the same typed batch rows — how the persisted
    dedup/ANN stores stay fresh under live ingest instead of going stale
    until a manual rebuild. Hooks are idempotent per batch id, matching
    foreachBatch's at-least-once redelivery."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        # blank lines parse to an empty measurement — the reference filters
        # them before parsing (hepop.js:1063 `.filter(line => line.trim())`);
        # without this they'd write into the table ROOT directory
        batch = batch.filter(
            F.col("measurement").isNotNull() & (F.col("measurement") != "")
        ).persist()
        registry = SchemaRegistry(base_dir)
        now_ms = None  # measurement_table coalesces per-row with batch time
        measurements = [r[0] for r in batch.select("measurement").distinct().collect()]
        for m in measurements:
            if m not in registry.schemas:
                first = (
                    batch.filter(F.col("measurement") == m).select("fields").head()
                )
                registry.ensure(m, dict(first["fields"]) if first else {})
            if schema_evolution:
                # one bounded agg per measurement: each distinct field key's
                # first observed raw value drives type inference for keys
                # the frozen schema doesn't know yet
                kv = (
                    batch.filter(F.col("measurement") == m)
                    .select(F.explode("fields").alias("k", "v"))
                    .groupBy("k")
                    .agg(F.first("v", ignorenulls=True).alias("v"))
                    .collect()
                )
                registry.evolve(m, {r["k"]: r["v"] for r in kv})
            field_types = registry.schemas[m]
            rows = measurement_table(batch, m, field_types)
            rows = rows.withColumn(
                "timestamp", F.coalesce(F.col("timestamp"), F.current_timestamp())
            )
            write_partitioned(rows, f"{base_dir}/{m}",
                              manifest=manifest or None)
            for hook in index_hooks or []:
                hook(m, rows, batch_id)
        batch.unpersist()

    writer = (
        parsed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer


def hep_sink(decoded: DataFrame, base_dir: str, checkpoint_dir: str,
             processing_time: str | None = FLUSH_INTERVAL,
             index_hooks: list | None = None,
             manifest: bool = False):
    """HEP rows (timestamp, rcinfo, payload, type) -> one partitioned table
    per HEP type (`hep_{type}`), mirroring the per-type buffers
    (hepop.js:134-149). ``index_hooks`` as in lp_sink, keyed by the
    `hep_{type}` table name."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        types = [r[0] for r in batch.select("type").distinct().collect()]
        for t in types:
            rows = batch.filter(F.col("type") == t).select("timestamp", "rcinfo", "payload")
            write_partitioned(rows, f"{base_dir}/hep_{t}",
                              manifest=manifest or None)
            for hook in index_hooks or []:
                hook(f"hep_{t}", rows, batch_id)

    writer = (
        decoded.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer


# ---------------------------------------------------------------------------
# Watermarked windowed aggregation (late-data policy the reference lacks)
# ---------------------------------------------------------------------------


def windowed_counts(events: DataFrame, ts_col: str = "timestamp",
                    window: str = "1 hour", watermark: str = "30 minutes",
                    *group_cols: str) -> DataFrame:
    """Tumbling event-time windows with a watermark: late rows within the
    watermark still update their window; older rows are dropped and the
    window state is reclaimed — bounded state at any scale."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), *group_cols, "n")
    )


def sessionized(events: DataFrame, ts_col: str = "timestamp",
                gap: str = "30 minutes", watermark: str = "30 minutes",
                key: str = "user_id") -> DataFrame:
    """Streaming session windows (session_window aggregation) — the
    streaming twin of queries/timeseries.session_windows."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key),
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
        )
    )
