"""Receiver + HTTP front-end tests: UDP/TCP HEP frames -> spool -> decode;
HTTP /write -> landing -> streaming -> /query round-trip (the reference's
loopback_test.sh as an automated test)."""

from __future__ import annotations

import json
import socket
import urllib.parse
import urllib.request

from hepop_spark.sources.hep import decapsulate, encapsulate
from hepop_spark.sources.lineproto import Point, format_point, parse_line
from hepop_spark.sources.receiver import (
    HepTcpReceiver,
    HepUdpReceiver,
    LpLineSpool,
    SegmentSpool,
    read_segments,
)

RC = {"srcIp": "1.2.3.4", "dstIp": "5.6.7.8", "timeSeconds": 1709290800,
      "timeUseconds": 0, "payloadType": 1}


class TestFormatRoundTrip:
    def test_format_parse_roundtrip(self):
        p = Point("cpu", {"host": "s1"}, {"usage": 87.2, "up": True, "n": 3},
                  1709290800000.0)
        line = format_point(p)
        back = parse_line(line)
        assert back.measurement == "cpu"
        assert back.tags == {"host": "s1"}
        assert back.fields["usage"] == 87.2
        assert back.fields["up"] is True
        assert back.timestamp_ms == p.timestamp_ms

    def test_int_type_mapping(self):
        p = Point("m", {}, {"v": 3.6})
        assert "v=4i" in format_point(p, numeric_type="int")  # Math.round


class TestUdpReceiver:
    def test_datagrams_spooled(self, tmp_path):
        spool = SegmentSpool(str(tmp_path / "spool"))
        rx = HepUdpReceiver(spool).start()
        frames = [encapsulate({**RC, "timeSeconds": RC["timeSeconds"] + i}, f"P{i}")
                  for i in range(5)]
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for f in frames:
            tx.sendto(f, ("127.0.0.1", rx.port))
        import time

        time.sleep(0.5)
        rx.stop()
        got = read_segments(str(tmp_path / "spool"))
        assert sorted(got) == sorted(frames)
        assert decapsulate(got[0])["payload"].startswith("P")


class TestTcpReceiver:
    def test_framing_reassembly(self, tmp_path):
        """Frames split/coalesced across TCP chunks must reassemble —
        the reference gets this wrong (one chunk assumed = one packet,
        hepop.js:996-1003); we improve on it."""
        spool = SegmentSpool(str(tmp_path / "spool"))
        rx = HepTcpReceiver(spool).start()
        frames = [encapsulate({**RC, "timeSeconds": RC["timeSeconds"] + i},
                              "INVITE sip:x@y SIP/2.0 " + "pad" * 50)
                  for i in range(4)]
        blob = b"".join(frames)
        tx = socket.create_connection(("127.0.0.1", rx.port))
        # drip-feed in awkward chunk sizes crossing frame boundaries
        for i in range(0, len(blob), 97):
            tx.sendall(blob[i:i + 97])
        tx.close()
        import time

        time.sleep(0.5)
        rx.stop()
        got = read_segments(str(tmp_path / "spool"))
        assert sorted(got) == sorted(frames)


class TestHttpServer:
    def test_query_write_health(self, spark, tmp_path):
        from hepop_spark.plans.http_server import HepopHttpServer
        from hepop_spark.storage.writer import read_table
        from hepop_spark.streaming.ingest import lp_sink, read_lp_stream

        landing = tmp_path / "landing"
        landing.mkdir()
        spool = LpLineSpool(str(landing), rotate_every=10)
        srv = HepopHttpServer(spark, lp_spool=spool, default_window=False).start()
        base = f"http://127.0.0.1:{srv.port}"

        # health
        with urllib.request.urlopen(f"{base}/health") as r:
            assert r.status == 200

        # write LP points (loopback_test.sh shape)
        body = "\n".join(
            f"home,room=Garden temp={60 + i}.0 17092908{i:02d}000000000" for i in range(5)
        )
        req = urllib.request.Request(f"{base}/write", data=body.encode(), method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.status == 201

        # drain landing -> table, register view
        q = lp_sink(
            read_lp_stream(spark, str(landing)), str(tmp_path / "t"), str(tmp_path / "c"), None
        ).start()
        q.awaitTermination(60)
        tbl = read_table(spark, str(tmp_path / "t" / "home"))
        tbl.withColumn("time", tbl["timestamp"]).createOrReplaceTempView("home")

        # query it back over HTTP with HEPop semantics (count())
        url = f"{base}/query?q=" + urllib.parse.quote(
            "SELECT count() AS count FROM home WHERE time >= '2024-01-01'"
        )
        with urllib.request.urlopen(url) as r:
            rows = json.loads(r.read())
        assert rows == [{"count": 5}]

        # error mapping: missing q -> 400; bad SQL -> 500
        try:
            urllib.request.urlopen(f"{base}/query")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            urllib.request.urlopen(f"{base}/query?q=" + urllib.parse.quote("SELECT FROM nope"))
            raise AssertionError("expected 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
        srv.stop()

