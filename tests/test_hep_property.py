"""Property-based HEP v3 codec contracts: encapsulate∘decapsulate is the
identity on every well-formed rcinfo/payload, and the decoder never
crashes on arbitrary bytes — it either parses or raises HepParseError
(the dirty-datagram discipline decode_frames relies on)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hepop_spark.sources.hep import HepParseError, decapsulate, encapsulate

_rcinfo = st.fixed_dictionaries(
    {},
    optional={
        "protocolFamily": st.integers(0, 255),
        "protocol": st.integers(0, 255),
        "srcIp": st.tuples(*[st.integers(0, 255)] * 4).map(
            lambda t: ".".join(map(str, t))
        ),
        "dstIp": st.just("10.0.0.1"),
        "srcPort": st.integers(0, 65535),
        "dstPort": st.integers(0, 65535),
        "timeSeconds": st.integers(0, 2**32 - 1),
        "timeUseconds": st.integers(0, 999_999),
        "payloadType": st.integers(0, 255),
        "captureId": st.integers(0, 2**32 - 1),
        "correlation_id": st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=20
        ),
    },
)

_payload = st.text(max_size=200).filter(
    # surrogates don't round-trip utf-8; frame length field is u16
    lambda s: len(s.encode("utf-8", "ignore")) < 60_000
)


@settings(max_examples=300, deadline=None)
@given(_rcinfo, _payload)
def test_roundtrip_identity(rcinfo, payload):
    frame = encapsulate(rcinfo, payload)
    out = decapsulate(frame)
    assert out["rcinfo"] == rcinfo
    assert out["payload"] == payload


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_decoder_total_on_garbage(data):
    try:
        out = decapsulate(data)
    except HepParseError:
        return
    assert isinstance(out["rcinfo"], dict)
    assert isinstance(out["payload"], str)


@settings(max_examples=100, deadline=None)
@given(_rcinfo, _payload, st.integers(1, 30))
def test_truncation_never_crashes(rcinfo, payload, cut):
    frame = encapsulate(rcinfo, payload)
    prefix = frame[: max(0, len(frame) - cut)]
    try:
        decapsulate(prefix)
    except HepParseError:
        pass


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
