"""Line Protocol grammar tests — the reference's parser semantics as spec
(lineproto.js:27-48 value grammar, :62-93 parse; FIXTURES.md F2)."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, strategies as st

from hepop_spark.sources.lineproto import (
    infer_field_type,
    measurement_table,
    parse_line,
    parse_lines,
    parse_lines_df,
    parse_value,
)


class TestParseValue:
    def test_int_suffix(self):
        assert parse_value("42i") == 42
        assert isinstance(parse_value("42i"), int)

    def test_bools(self):
        assert parse_value("t") is True
        assert parse_value("TRUE") is True
        assert parse_value("true") is True
        assert parse_value("f") is False
        assert parse_value("FALSE") is False

    def test_quoted_string(self):
        assert parse_value('"hello"') == "hello"
        assert parse_value('""') == ""

    def test_float(self):
        assert parse_value("7.4") == 7.4
        assert parse_value("-3") == -3.0
        assert parse_value("1e3") == 1000.0

    def test_undefined(self):
        assert parse_value("abc") is None
        assert parse_value(None) is None

    def test_negative_int_suffix_is_not_int(self):
        # /^\d+i$/ — no sign allowed; '-42i' falls through to NaN -> None
        assert parse_value("-42i") is None

    @given(st.integers(min_value=0, max_value=2**53))
    def test_int_roundtrip_property(self, n):
        assert parse_value(f"{n}i") == n

    @given(st.floats(allow_nan=False, allow_infinity=False, width=32))
    def test_float_roundtrip_property(self, x):
        v = parse_value(repr(float(x)))
        assert v == pytest.approx(float(x))


class TestParseLine:
    def test_basic(self):
        p = parse_line("cpu,host=server01,region=us-west usage_idle=87.2,usage_user=7.4 1739043338000000000")
        assert p.measurement == "cpu"
        assert p.tags == {"host": "server01", "region": "us-west"}
        assert p.fields == {"usage_idle": 87.2, "usage_user": 7.4}
        assert p.timestamp_ms == 1739043338000000000 / 1e6

    def test_no_tags(self):
        p = parse_line("home temp=72.5")
        assert p.measurement == "home"
        assert p.tags == {}
        assert p.fields == {"temp": 72.5}

    def test_server_timestamp_when_absent(self):
        p = parse_line("home temp=1", now_ms=1234.0)
        assert p.timestamp_ms == 1234.0

    def test_mixed_field_types(self):
        p = parse_line('m f_int=5i,f_bool=t,f_str="x",f_float=2.5')
        assert p.fields == {"f_int": 5, "f_bool": True, "f_str": "x", "f_float": 2.5}

    def test_undefined_fields_dropped(self):
        p = parse_line("m good=1,bad=zzz")
        assert p.fields == {"good": 1.0}

    def test_parse_lines_skips_blanks_keeps_fieldless(self):
        # reference hepop.js:1063-1087: blanks skipped, fieldless points kept
        pts = parse_lines("home temp=1\n\nmeasonly\nhome temp=2")
        assert len(pts) == 3
        assert pts[1].measurement == "measonly" and pts[1].fields == {}


class TestSchemaInference:
    def test_first_row_freeze_types(self):
        # hepop.js:386-391: number->DOUBLE, bool->BOOLEAN, else UTF8
        assert infer_field_type(5) == "double"
        assert infer_field_type(5.5) == "double"
        assert infer_field_type(True) == "boolean"
        assert infer_field_type("x") == "string"


class TestSparkParser:
    """Distributed parser must agree with the Python reference parser."""

    LINES = [
        "cpu,host=server01,region=us-west usage_idle=87.2,usage_user=7.4 1739043338000000000",
        "cpu,host=server02,region=us-east usage_idle=91.0,usage_user=3.1 1739043339500000000",
        "home,room=Garden temp=62i",
        'logs,level=error msg="diskfull",count=3i 1739043340000000000',
        "memory,host=server01 used_percent=55.5,free=1024",
    ]

    def test_matches_python_parser(self, spark):
        df = spark.createDataFrame([(l,) for l in self.LINES], ["value"])
        got = {
            (r["measurement"], json.dumps(r["tags"], sort_keys=True)): r
            for r in parse_lines_df(df).collect()
        }
        assert len(got) == len(self.LINES)
        for line in self.LINES:
            p = parse_line(line, add_timestamp=False)
            key = (p.measurement, json.dumps({k: v for k, v in p.tags.items()}, sort_keys=True))
            row = got[key]
            # raw field text (typing is applied per measurement schema)
            for fname in p.fields:
                assert fname in row["fields"]
            if p.timestamp_ms is not None:
                assert int(row["timestamp"].timestamp() * 1000) == int(p.timestamp_ms)

    def test_measurement_table_typing(self, spark):
        df = spark.createDataFrame([(l,) for l in self.LINES], ["value"])
        parsed = parse_lines_df(df)
        cpu = measurement_table(
            parsed, "cpu", {"usage_idle": "double", "usage_user": "double"}
        ).collect()
        assert len(cpu) == 2
        vals = {round(r["usage_idle"], 1) for r in cpu}
        assert vals == {87.2, 91.0}
        assert all(json.loads(r["tags"])["host"].startswith("server") for r in cpu)

        logs = measurement_table(
            parsed, "logs", {"msg": "string", "count": "double"}
        ).collect()
        assert logs[0]["msg"] == "diskfull"  # quotes stripped
        assert logs[0]["count"] == 3.0

    def test_int_suffix_typed_as_double(self, spark):
        df = spark.createDataFrame([("home,room=G temp=62i",)], ["value"])
        parsed = parse_lines_df(df)
        home = measurement_table(parsed, "home", {"temp": "double"}).collect()
        assert home[0]["temp"] == 62.0
