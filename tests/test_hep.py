"""HEP v3 codec tests: frame round-trip, chunk semantics, and the
reference's timestamp derivation math as spec (hepop.js:1204-1210)."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, strategies as st

from hepop_spark.sources.hep import (
    HepParseError,
    decapsulate,
    decode_frames,
    decode_hep_df,
    encapsulate,
    hep_timestamp_ms,
    to_row,
)

RCINFO = {
    "protocolFamily": 2,
    "protocol": 17,
    "srcIp": "192.168.1.10",
    "dstIp": "10.0.0.5",
    "srcPort": 5060,
    "dstPort": 5061,
    "timeSeconds": 1739043338,
    "timeUseconds": 978000,
    "payloadType": 1,
    "captureId": 2001,
}
SIP = "INVITE sip:bob@example.com SIP/2.0\r\nCall-ID: abc123\r\n\r\n"


class TestCodec:
    def test_roundtrip(self):
        frame = encapsulate(RCINFO, SIP)
        out = decapsulate(frame)
        assert out["payload"] == SIP
        for k, v in RCINFO.items():
            assert out["rcinfo"][k] == v

    def test_magic_required(self):
        with pytest.raises(HepParseError):
            decapsulate(b"HEP2" + b"\x00" * 10)

    def test_truncated(self):
        frame = encapsulate(RCINFO, SIP)
        with pytest.raises(HepParseError):
            decapsulate(frame[: len(frame) // 2])

    def test_unknown_chunk_skipped(self):
        import struct
        frame = encapsulate(RCINFO, SIP)
        # splice in an unknown vendor chunk before re-totaling the length
        body = frame[6:]
        extra = struct.pack(">HHH", 99, 0x77, 9) + b"xyz"
        new = b"HEP3" + struct.pack(">H", 6 + len(body) + len(extra)) + extra + body
        out = decapsulate(new)
        assert out["payload"] == SIP

    def test_decode_frames_drops_garbage(self):
        frames = [encapsulate(RCINFO, SIP), b"garbage", encapsulate(RCINFO, "BYE")]
        rows = list(decode_frames(iter(frames)))
        assert len(rows) == 2
        assert rows[0].type == 1

    @given(
        st.integers(min_value=1, max_value=2**31 - 1),
        st.integers(min_value=0, max_value=999_999),
    )
    def test_timestamp_math_matches_js(self, sec, usec):
        # new Date(sec*1000 + (((100000+usec)/1000) - 100)) — ToInteger trunc
        expected = int(sec * 1000 + (((100000 + usec) / 1000) - 100))
        assert hep_timestamp_ms({"timeSeconds": sec, "timeUseconds": usec}) == expected

    def test_timestamp_missing_seconds(self):
        assert hep_timestamp_ms({}) is None
        assert hep_timestamp_ms({"timeSeconds": 0}) is None  # falsy -> server time


class TestRowMapping:
    def test_to_row(self):
        row = to_row(encapsulate(RCINFO, SIP))
        assert row.type == 1  # payloadType
        assert row.payload == SIP
        rc = json.loads(row.rcinfo)
        assert rc["srcIp"] == "192.168.1.10"
        assert row.timestamp_ms == 1739043338000 + 978

    def test_empty_payload_becomes_empty_string(self):
        rc = dict(RCINFO)
        row = to_row(encapsulate(rc, ""))
        assert row.payload == ""


class TestSparkDecode:
    def test_decode_hep_df(self, spark):
        frames = [
            (encapsulate({**RCINFO, "timeSeconds": RCINFO["timeSeconds"] + i}, f"INVITE {i}"),)
            for i in range(10)
        ] + [(b"not-hep",)]
        df = spark.createDataFrame(frames, "frame binary")
        out = decode_hep_df(df).collect()
        assert len(out) == 10  # garbage dropped
        assert {r["type"] for r in out} == {1}
        assert sorted(r["payload"] for r in out)[0] == "INVITE 0"
        # timestamps carry the reference ms math
        assert out[0]["timestamp"].microsecond % 1000 == 0
