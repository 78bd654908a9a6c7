"""Property-based parity: the Python DataSource line parser
(pyds._parse_raw) and the JVM column-expression parser
(lineproto.parse_lines_df) must agree on EVERY input line — grammar-shaped
or garbage. Hypothesis drives both with adversarial lines; timestamps are
compared as formatted strings through each engine's own path.

This is the property that makes the two ingest paths interchangeable: any
line the DataSource accepts, the bulk path parses identically.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from hepop_spark.sources.lineproto import parse_lines_df
from hepop_spark.sources.pyds import _parse_raw

# printable ASCII minus space/comma/equals for atoms; structure added below
_atom = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters=",= "),
    min_size=1,
    max_size=8,
)
_kv = st.tuples(_atom, st.one_of(st.just(""), _atom))
_ts = st.one_of(
    st.integers(min_value=-10**15, max_value=3 * 10**17),  # sane epoch-ns range
    st.just(None),
)


@st.composite
def lp_line(draw):
    meas = draw(_atom)
    tags = draw(st.lists(_kv, max_size=3))
    fields = draw(st.lists(_kv, max_size=3))
    ts = draw(_ts)
    head = ",".join([meas] + [f"{k}={v}" for k, v in tags])
    parts = [head]
    if fields or ts is not None:
        parts.append(",".join(f"{k}={v}" for k, v in fields))
    if ts is not None:
        parts.append(str(ts))
    return " ".join(parts)


# totally unstructured printable-ASCII lines (no newline), stripped
_garbage = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=1,
    max_size=40,
).map(str.strip).filter(bool)

_lines = st.lists(st.one_of(lp_line(), _garbage), min_size=1, max_size=25)

_FMT = "yyyy-MM-dd HH:mm:ss.SSS"


def _canon_py(line: str):
    m, tags, fields, ts = _parse_raw(line)
    return (
        m,
        tuple(sorted(tags.items())),
        tuple(sorted(fields.items())),
        ts.strftime("%Y-%m-%d %H:%M:%S.") + f"{ts.microsecond // 1000:03d}"
        if ts is not None
        else None,
    )


@settings(max_examples=12, deadline=None)
@given(_lines)
def test_parsers_agree(spark, lines):
    df = parse_lines_df(spark.createDataFrame([(l,) for l in lines], "value string"))
    got = [
        (
            r["measurement"],
            tuple(sorted((r["tags"] or {}).items())),
            tuple(sorted((r["fields"] or {}).items())),
            r["ts_s"],
        )
        for r in df.select(
            "measurement", "tags", "fields",
            F.date_format("timestamp", _FMT).alias("ts_s"),
        ).collect()
    ]
    want = [_canon_py(l) for l in lines]
    assert got == want
