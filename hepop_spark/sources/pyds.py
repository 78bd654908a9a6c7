"""Line Protocol as a first-class Spark data source (Python DataSource API,
Spark 4): `spark.read.format("lineproto").load(dir)` and
`spark.readStream.format("lineproto").load(dir)`.

The reference consumes LP only through its HTTP write path
(hepop.js:1060-1100) — the wire format never exists as a queryable source.
Registering it as a DataSource makes LP files scannable like parquet/CSV:
schema-stable, partition-parallel (one input partition per file — Spark
schedules files across executors), and usable from SQL via a registered
format.

Row semantics are IDENTICAL to the column-expression parser
(sources/lineproto.py parse_lines_df — the hot path for bulk ingest, which
stays zero-Python): single-space token split, comma-split tag/field k=v
pairs with raw (untyped) values, ns→ms integer-division timestamps, blank
lines skipped, absent timestamps NULL. tests/test_pyds.py pins full row
parity between the two parsers, so either path can serve any query.

Scale: the batch reader is file-granular — the natural parallel unit for a
landing zone; per-row Python cost makes this the convenience/interop path,
while parse_lines_df remains the 100 TB path. The stream reader is a
SimpleDataSourceStreamReader whose offset is the set of consumed file
names — a toy WAL, adequate for landing-dir tailing."""

from __future__ import annotations

import os
import re
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_INT_TOKEN = re.compile(r"[+-]?[0-9]+")

LP_SCHEMA = (
    "measurement string, tags map<string,string>, "
    "fields map<string,string>, timestamp timestamp"
)


def _lp_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if os.path.isfile(os.path.join(path, f)) and not f.startswith(("_", "."))
    )


def _kv(section: str) -> dict:
    out: dict = {}
    for part in section.split(","):
        if not part:
            continue
        kv = part.split("=")
        # empty values nullify, matching parse_lines_df's nullif(..., '')
        out[kv[0]] = kv[1] if len(kv) > 1 and kv[1] != "" else None
    return out


def _parse_raw(line: str):
    """One LP line -> (measurement, tags, raw fields, ts) with exactly the
    parse_lines_df semantics (which mirror reference lineproto.js:62-93)."""
    parts = line.split(" ")
    tag_section = parts[0] if parts else ""
    field_section = parts[1] if len(parts) > 1 else ""
    ts_tok = parts[2] if len(parts) > 2 else None

    tag_parts = tag_section.split(",")
    measurement = tag_parts[0] if tag_parts else None
    tags = _kv(",".join(tag_parts[1:])) if len(tag_parts) > 1 else {}
    fields = {k: (v if v != "" else None) for k, v in _kv(field_section).items()}

    ts = None
    if ts_tok is not None and _INT_TOKEN.fullmatch(ts_tok):
        # int() alone is WIDER than Spark's try_cast (it accepts "1_0",
        # unicode digits) and // FLOORS where Spark's `div` truncates
        # toward zero — both would diverge from parse_lines_df
        ns = int(ts_tok)
        q, r = divmod(ns, 1_000_000)
        if ns < 0 and r:
            q += 1  # truncate toward zero, matching `div`
        try:
            ts = datetime.fromtimestamp(q / 1000.0, tz=timezone.utc)
        except (OverflowError, OSError, ValueError):
            ts = None
    # '' measurement stays '' (a ",tag=…"-headed line), matching
    # parse_lines_df; downstream sinks filter empties (ingest.py)
    return (measurement, tags, fields, ts)


def _read_file(path: str):
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.strip()
            if line:
                yield _parse_raw(line)


class _LpFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _LpBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("lineproto source requires a path (.load(path))")

    def partitions(self):
        return [_LpFilePartition(p) for p in _lp_files(self.path)] or [
            _LpFilePartition("")
        ]

    def read(self, partition: _LpFilePartition):
        if partition.path:
            yield from _read_file(partition.path)


class _LpStreamReader(SimpleDataSourceStreamReader):
    """Offset = sorted list of consumed file names; each microbatch is the
    set of files that appeared since."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("lineproto source requires a path (.load(path))")

    def initialOffset(self) -> dict:
        return {"seen": []}

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        new = [p for p in _lp_files(self.path) if os.path.basename(p) not in seen]
        # materialized list, not a generator: Spark's prefetch cache copies
        # the iterator for replay, and generators aren't copyable
        rows = [r for p in new for r in _read_file(p)]
        end = {"seen": sorted(seen | {os.path.basename(p) for p in new})}
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        replay = set(end.get("seen", [])) - set(start.get("seen", []))
        for p in _lp_files(self.path):
            if os.path.basename(p) in replay:
                yield from _read_file(p)

    def commit(self, end: dict) -> None:
        pass


class LineProtocolDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lineproto"

    def schema(self) -> str:
        return LP_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _LpBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _LpStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(LineProtocolDataSource)
