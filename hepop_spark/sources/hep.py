"""HEP v3 (Homer Encapsulation Protocol) binary codec + row mapping.

The reference delegates decapsulation to the hep-js library
(hepop.js:1188 `hepjs.decapsulate(data)`); the wire format is public
(HEP/EEP spec, sipcapture): a "HEP3" magic, u16 total length, then a
sequence of chunks — u16 vendor id, u16 type id, u16 chunk length
(including the 6-byte chunk header), payload bytes.

Generic chunk types (vendor 0):
  0x01 protocolFamily u8     0x02 protocol u8
  0x03 srcIp4 (4B)           0x04 dstIp4 (4B)
  0x05 srcIp6 (16B)          0x06 dstIp6 (16B)
  0x07 srcPort u16           0x08 dstPort u16
  0x09 timeSeconds u32       0x0a timeUseconds u32
  0x0b payloadType u8        0x0c captureId u32
  0x0e authKey str           0x0f payload bytes
  0x11 correlation_id str

Row mapping (reference hepop.js:1190-1196): a decoded packet becomes
  {protocol_header: rcinfo, create_date: getHepTimestamp(rcinfo),
   raw: payload, type: rcinfo.payload_type || payloadType || 0}
and is stored as (timestamp TIMESTAMP_MILLIS, rcinfo JSON-string,
payload UTF8) — hepop.js:20-24, :180-184.

Timestamp math (reference hepop.js:1204-1210, reproduced as spec):
  new Date(sec*1000 + (((100000 + usec) / 1000) - 100))
which algebraically equals sec*1000 + usec/1000 (float ms), truncated to
integer ms by the JS Date constructor (ToInteger).
"""

from __future__ import annotations

import ipaddress
import json
import struct
from dataclasses import dataclass
from typing import Iterator

HEP3_MAGIC = b"HEP3"

_CHUNK_PARSERS = {
    0x01: ("protocolFamily", lambda b: b[0]),
    0x02: ("protocol", lambda b: b[0]),
    0x03: ("srcIp", lambda b: str(ipaddress.IPv4Address(b))),
    0x04: ("dstIp", lambda b: str(ipaddress.IPv4Address(b))),
    0x05: ("srcIp", lambda b: str(ipaddress.IPv6Address(b))),
    0x06: ("dstIp", lambda b: str(ipaddress.IPv6Address(b))),
    0x07: ("srcPort", lambda b: struct.unpack(">H", b)[0]),
    0x08: ("dstPort", lambda b: struct.unpack(">H", b)[0]),
    0x09: ("timeSeconds", lambda b: struct.unpack(">I", b)[0]),
    0x0A: ("timeUseconds", lambda b: struct.unpack(">I", b)[0]),
    0x0B: ("payloadType", lambda b: b[0]),
    0x0C: ("captureId", lambda b: struct.unpack(">I", b)[0]),
    0x0E: ("authKey", lambda b: b.decode("utf-8", "replace")),
    0x11: ("correlation_id", lambda b: b.decode("utf-8", "replace")),
}

PAYLOAD_CHUNK = 0x0F


class HepParseError(ValueError):
    pass


def decapsulate(data: bytes) -> dict:
    """Parse a HEP v3 frame -> {"rcinfo": {...}, "payload": str}."""
    if len(data) < 6 or data[:4] != HEP3_MAGIC:
        raise HepParseError("not a HEP3 packet")
    total_len = struct.unpack(">H", data[4:6])[0]
    if total_len > len(data):
        raise HepParseError(f"truncated HEP3 packet: header says {total_len}, got {len(data)}")
    rcinfo: dict = {}
    payload = b""
    off = 6
    while off + 6 <= total_len:
        vendor, ctype, clen = struct.unpack(">HHH", data[off:off + 6])
        if clen < 6 or off + clen > total_len:
            raise HepParseError(f"bad chunk length {clen} at offset {off}")
        body = data[off + 6:off + clen]
        if vendor == 0:
            if ctype == PAYLOAD_CHUNK:
                payload = body
            elif ctype in _CHUNK_PARSERS:
                name, fn = _CHUNK_PARSERS[ctype]
                try:
                    rcinfo[name] = fn(body)
                except Exception as e:  # malformed chunk body
                    raise HepParseError(f"bad chunk 0x{ctype:02x}: {e}") from e
        off += clen
    return {"rcinfo": rcinfo, "payload": payload.decode("utf-8", "replace")}


def encapsulate(rcinfo: dict, payload: str | bytes) -> bytes:
    """Build a HEP v3 frame (inverse of decapsulate; used by tests and the
    loopback fixtures — the reference never needs this because hep-js owns
    both directions)."""
    chunks = b""

    def chunk(ctype: int, body: bytes) -> bytes:
        return struct.pack(">HHH", 0, ctype, len(body) + 6) + body

    enc = {
        "protocolFamily": (0x01, lambda v: bytes([v])),
        "protocol": (0x02, lambda v: bytes([v])),
        "srcIp": (0x03, lambda v: ipaddress.IPv4Address(v).packed),
        "dstIp": (0x04, lambda v: ipaddress.IPv4Address(v).packed),
        "srcPort": (0x07, lambda v: struct.pack(">H", v)),
        "dstPort": (0x08, lambda v: struct.pack(">H", v)),
        "timeSeconds": (0x09, lambda v: struct.pack(">I", v)),
        "timeUseconds": (0x0A, lambda v: struct.pack(">I", v)),
        "payloadType": (0x0B, lambda v: bytes([v])),
        "captureId": (0x0C, lambda v: struct.pack(">I", v)),
        "correlation_id": (0x11, lambda v: v.encode()),
    }
    for key, (ctype, fn) in enc.items():
        if key in rcinfo and rcinfo[key] is not None:
            chunks += chunk(ctype, fn(rcinfo[key]))
    if isinstance(payload, str):
        payload = payload.encode()
    chunks += chunk(PAYLOAD_CHUNK, payload)
    frame = HEP3_MAGIC + struct.pack(">H", 6 + len(chunks)) + chunks
    return frame


def hep_timestamp_ms(rcinfo: dict) -> int | None:
    """Event-time derivation, reproducing hepop.js:1204-1210 exactly:
    sec*1000 + (((100000 + usec)/1000) - 100), truncated to int ms.
    Returns None when timeSeconds is absent (caller uses ingest time)."""
    sec = rcinfo.get("timeSeconds")
    if not sec:
        return None
    usec = rcinfo.get("timeUseconds") or 0
    return int(sec * 1000 + (((100000 + usec) / 1000) - 100))


@dataclass
class HepRow:
    """The reference's stored row (hepop.js:180-184)."""

    timestamp_ms: int | None
    rcinfo: str  # JSON string of the protocol header
    payload: str
    type: int    # table routing key -> hep_{type}


def to_row(data: bytes) -> HepRow:
    """bytes -> storage row, mirroring processHep (hepop.js:1186-1202)."""
    decoded = decapsulate(data)
    rcinfo = decoded["rcinfo"]
    hep_type = rcinfo.get("payload_type") or rcinfo.get("payloadType") or 0
    return HepRow(
        timestamp_ms=hep_timestamp_ms(rcinfo),
        rcinfo=json.dumps(rcinfo, separators=(",", ":")),
        payload=decoded["payload"] or "",
        type=int(hep_type),
    )


def decode_frames(blobs: Iterator[bytes]) -> Iterator[HepRow]:
    """Bulk decode, skipping malformed frames (the reference logs and drops,
    hepop.js:1176-1184)."""
    for b in blobs:
        try:
            yield to_row(b)
        except HepParseError:
            continue


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

HEP_SCHEMA = "timestamp timestamp, rcinfo string, payload string, type int"


def decode_hep_df(df, binary_col: str = "frame"):
    """Decode a DataFrame of raw HEP v3 frames (binary column) into the
    storage schema via mapInPandas — Arrow-batched, one Python pass per
    partition; binary parsing is the one place Python is genuinely needed
    (SURVEY §2 A3). Partitioning of the input carries through."""
    import pandas as pd  # local import: executors only

    def decode(batches):
        for pdf in batches:
            rows = []
            for blob in pdf[binary_col]:
                try:
                    r = to_row(bytes(blob))
                except HepParseError:
                    continue
                rows.append(
                    (
                        pd.Timestamp(r.timestamp_ms, unit="ms") if r.timestamp_ms else None,
                        r.rcinfo,
                        r.payload,
                        r.type,
                    )
                )
            yield pd.DataFrame(rows, columns=["timestamp", "rcinfo", "payload", "type"])

    return df.mapInPandas(decode, schema=HEP_SCHEMA)
