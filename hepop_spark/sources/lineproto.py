"""InfluxDB Line Protocol parsing with the reference's exact semantics
(reference: lineproto.js — behavior reproduced as spec, not code).

Grammar (lineproto.js:62-93): `measurement[,tag=v...] field=v[,f2=v...] [ts]`
 - the point is split on SINGLE spaces into (tags_, fields_, timestamp) —
   no escape handling anywhere (quoted strings containing spaces/commas
   break, exactly as in the reference);
 - tags/fields split on ',' then 'key=value' on '=';
 - value grammar (lineproto.js:27-48):
     /^\\d+i$/            -> int        (parseInt of the digits)
     /^(t|true)$/i        -> True
     /^(f|false)$/i       -> False
     /^"(.*)"$/           -> str        (quotes stripped)
     numeric (not NaN)    -> float
     else                 -> None       (undefined -> field dropped)
 - timestamp: ns integer / 1e6 -> ms float; if absent and addTimestamp,
   server time (lineproto.js:86-91).

Schema inference (hepop.js:382-394): the FIRST row of a new measurement
freezes the schema — number->DOUBLE, bool->BOOLEAN, else UTF8; `tags` is a
JSON string column, `timestamp` TIMESTAMP_MILLIS.

Two implementations:
 - parse_line / parse_lines: pure Python, for the receiver process and tests;
 - parse_lines_df: Spark-native column expressions (regexp/split/CASE), for
   distributed parsing of LP text at scale — no Python UDF in the hot path.
"""

from __future__ import annotations

import json
import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INT_RE = re.compile(r"^\d+i$")
TRUE_RE = re.compile(r"^(t|true)$", re.IGNORECASE)
FALSE_RE = re.compile(r"^(f|false)$", re.IGNORECASE)
STRING_RE = re.compile(r'^"(.*)"$')
# JS isNaN(value) accepts floats, exponents, leading/trailing space, +/-;
# Python float() matches closely enough for the practical grammar
_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def parse_value(value: str | None):
    """Reference value grammar (lineproto.js:27-48)."""
    if value is None:
        return None
    if INT_RE.match(value):
        return int(value[:-1])
    if TRUE_RE.match(value):
        return True
    if FALSE_RE.match(value):
        return False
    m = STRING_RE.match(value)
    if m:
        return m.group(1)
    if _NUM_RE.match(value.strip()):
        return float(value)
    return None


@dataclass
class Point:
    measurement: str
    tags: dict = field(default_factory=dict)
    fields: dict = field(default_factory=dict)
    timestamp_ms: float | None = None  # epoch millis (float, reference keeps /1e6)


def parse_line(line: str, add_timestamp: bool = True, now_ms: float | None = None) -> Point:
    """Parse one LP line (reference parse(), lineproto.js:62-93)."""
    parts = line.split(" ")
    tags_ = parts[0] if len(parts) > 0 else ""
    fields_ = parts[1] if len(parts) > 1 else ""
    timestamp = parts[2] if len(parts) > 2 else None

    tag_parts = (tags_ or "").split(",")
    measurement = tag_parts.pop(0)

    tags: dict = {}
    for tag in tag_parts:
        if not tag:
            continue
        kv = tag.split("=")
        key, value = kv[0], (kv[1] if len(kv) > 1 else None)
        tags[key] = value

    fields: dict = {}
    for f_ in (fields_ or "").split(","):
        if not f_:
            continue
        kv = f_.split("=")
        key, value = kv[0], (kv[1] if len(kv) > 1 else None)
        v = parse_value(value)
        if v is not None:  # undefined fields are dropped (JS object semantics)
            fields[key] = v

    ts: float | None = None
    if timestamp:
        ts = int(timestamp) / 1e6  # ns -> ms (reference keeps the float)
    elif add_timestamp:
        ts = now_ms if now_ms is not None else time.time() * 1000.0

    return Point(measurement=measurement, tags=tags, fields=fields, timestamp_ms=ts)


def parse_lines(text: str, add_timestamp: bool = True, now_ms: float | None = None) -> list[Point]:
    """Parse an LP request body (reference hepop.js:1063-1087: split lines,
    skip blanks; fieldless points are KEPT — the reference pushes
    {timestamp, tags, ...fields} for every non-blank line, and a first
    fieldless row simply freezes a fields-free schema)."""
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            p = parse_line(line, add_timestamp=add_timestamp, now_ms=now_ms)
        except Exception:
            continue
        if p.measurement:
            out.append(p)
    return out


def format_value(v, numeric_type: str = "float") -> str:
    """Reference formatValue (lineproto.js:7-21): numbers honor the
    configured numeric type ('int' -> rounded + `i` suffix), booleans become
    TRUE/FALSE, everything else is JSON-quoted."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        if numeric_type == "int":
            # JS Math.round: half-up (toward +inf)
            import math

            return f"{math.floor(v + 0.5)}i"
        return repr(v) if isinstance(v, float) else str(v)
    return json.dumps(v)


def format_point(point: Point, numeric_type: str = "float") -> str:
    """Reference format() (lineproto.js:95-116): re-serialize a point to LP
    text — `measurement[,tags] fields [ts_ns]` (unused by the server itself;
    kept for round-trip fixtures, SURVEY §2 A6)."""
    s = point.measurement
    if point.tags:
        s += "," + ",".join(f"{k}={v}" for k, v in point.tags.items())
    s += " " + ",".join(
        f"{k}={format_value(v, numeric_type)}" for k, v in point.fields.items()
    )
    if point.timestamp_ms is not None:
        s += f" {int(point.timestamp_ms * 1e6)}"  # ms -> ns (formatDate, lineproto.js:23-25)
    return s


def infer_field_type(value) -> str:
    """First-row schema freeze (reference hepop.js:386-391):
    number -> DOUBLE, boolean -> BOOLEAN, else UTF8."""
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, (int, float)):
        return "double"
    return "string"


def infer_field_type_raw(raw: str | None) -> str | None:
    """Classify a RAW (unparsed) LP value string with the same grammar the
    parser applies (lineproto.js:27-48), returning the frozen column type —
    or None for undefined values (field dropped, JS object semantics)."""
    if raw is None:
        return None
    if INT_RE.match(raw) or _NUM_RE.match(raw.strip()):
        return "double"
    if TRUE_RE.match(raw) or FALSE_RE.match(raw):
        return "boolean"
    if STRING_RE.match(raw):
        return "string"
    return None


def points_to_rows(points: list[Point]) -> dict[str, list[dict]]:
    """Group parsed points by measurement into flat rows shaped like the
    reference's buffer rows (hepop.js:1077-1087): tags JSON-stringified,
    fields spread to top level, timestamp ms."""
    by_measurement: dict[str, list[dict]] = {}
    for p in points:
        row = {"timestamp": p.timestamp_ms, "tags": json.dumps(p.tags, separators=(",", ":"))}
        row.update(p.fields)
        by_measurement.setdefault(p.measurement, []).append(row)
    return by_measurement


# ---------------------------------------------------------------------------
# Spark-native distributed parser
# ---------------------------------------------------------------------------

_LP_INT = r"^\d+i$"
_LP_TRUE = r"^(?i)(t|true)$"
_LP_FALSE = r"^(?i)(f|false)$"
_LP_QUOTED = r'^".*"$'
_LP_NUM = r"^\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?\s*$"


def parse_lines_df(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Distributed LP parse: text lines -> (measurement, tags map, fields
    map<string, string-raw>, field typed columns are applied later per
    measurement). Pure column expressions (split / regexp / CASE) — stays in
    whole-stage codegen; at 100 TB this is a narrow map over the scan with
    zero Python.

    Output schema:
      measurement string, tags map<string,string>, fields map<string,string>
      (raw text values), timestamp timestamp (ms precision, null if absent).
    """
    # `get()` instead of [] indexing and try_cast instead of cast: lines may
    # lack a field/timestamp section (ANSI mode would error), and a quoted
    # string containing a space shifts the timestamp token to garbage — the
    # reference produces NaN there (lineproto.js:87); we produce NULL.
    def kv_map(arr_expr: str) -> F.Column:
        return F.map_from_entries(
            F.expr(
                f"transform(filter(coalesce({arr_expr}, array()), x -> x != ''), "
                "x -> struct(split_part(x, '=', 1) AS key, "
                "nullif(split_part(x, '=', 2), '') AS value))"
            )
        )

    # tag section = first space-token; element 1 is the measurement, the rest
    # are k=v tags; field section = second space-token (reference splits on
    # single spaces with no escapes — lineproto.js:66)
    return lines.select(
        F.expr(f"get(split(get(split({value_col}, ' '), 0), ','), 0)").alias("measurement"),
        kv_map(f"slice(split(get(split({value_col}, ' '), 0), ','), 2, 1000000)").alias("tags"),
        kv_map(f"split(get(split({value_col}, ' '), 1), ',')").alias("fields"),
        # ns -> ms with integer division (reference: parseInt(ts)/1e6 then
        # Date() ms truncation, lineproto.js:86-88)
        F.timestamp_millis(
            F.expr(f"try_cast(get(split({value_col}, ' '), 2) AS BIGINT) div 1000000")
        ).alias("timestamp"),
    )


def typed_field(raw: F.Column | str, target: str):
    """Apply the reference value grammar to a raw field string, producing a
    column of the inferred type (target in {'double','boolean','string'})."""
    col = F.col(raw) if isinstance(raw, str) else raw
    if target == "double":
        return (
            F.when(col.rlike(_LP_INT), F.regexp_replace(col, "i$", "").cast("double"))
            .when(col.rlike(_LP_NUM), col.cast("double"))
            .otherwise(F.lit(None).cast("double"))
        )
    if target == "boolean":
        return (
            F.when(col.rlike(_LP_TRUE), F.lit(True))
            .when(col.rlike(_LP_FALSE), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
    # string: strip surrounding quotes
    return F.when(col.rlike(_LP_QUOTED), F.regexp_extract(col, '^"(.*)"$', 1)).otherwise(col)


def measurement_table(parsed: DataFrame, measurement: str, field_types: dict[str, str],
                      default_now_ms: int | None = None) -> DataFrame:
    """Project one measurement's rows to its frozen schema (reference
    hepop.js:376-409): timestamp, tags JSON string, one typed column per
    field. ``field_types`` comes from first-row inference (infer_field_type)
    or an explicit schema registry."""
    df = parsed.filter(F.col("measurement") == measurement)
    ts = F.col("timestamp")
    if default_now_ms is not None:
        ts = F.coalesce(ts, F.timestamp_millis(F.lit(default_now_ms)))
    cols = [
        ts.alias("timestamp"),
        F.to_json(F.col("tags")).alias("tags"),
    ]
    for name, typ in field_types.items():
        cols.append(typed_field(F.col("fields").getItem(name), typ).alias(name))
    return df.select(*cols)
