"""Query-API semantics tests — the reference's non-ANSI surface as spec:
default 10-minute window (query.js:9, :110-117), `time` aliasing
(README.md:138-147), count() normalization (loopback_test.sh:46), table
resolution (query.js:71-84), OFFSET done right (README.md:135 vs
query.js:129-132)."""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from hepop_spark.catalog import hep_virtual_view
from hepop_spark.plans.api import (
    HepopQueryAPI,
    inject_default_window,
    normalize_count,
    resolve_table,
)

NOW = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def hep_table(spark):
    """HEP-shaped fixture (FIXTURES.md F1): rows straddling the now-10min
    boundary so the default window is observable."""
    rows = []
    for i in range(40):
        ts = NOW - timedelta(minutes=i)  # 0..39 minutes ago
        rcinfo = json.dumps(
            {
                "srcIp": f"192.168.1.{i % 4}",
                "dstIp": "10.0.0.5",
                "srcPort": 5060 + (i % 3),
                "dstPort": 5060,
                "timeSeconds": int(ts.timestamp()),
                "timeUseconds": 0,
                "payloadType": 1,
            }
        )
        payload = f"INVITE sip:u{i}@x SIP/2.0" if i % 2 == 0 else "SIP/2.0 200 OK"
        rows.append((ts, rcinfo, payload))
    df = spark.createDataFrame(rows, "timestamp timestamp, rcinfo string, payload string")
    hep_virtual_view(df).createOrReplaceTempView("hep_1")
    return df


class TestRewrites:
    def test_normalize_count(self):
        assert normalize_count("SELECT count() AS n FROM x") == "SELECT count(*) AS n FROM x"
        assert normalize_count("SELECT COUNT( ) FROM x") == "SELECT count(*) FROM x"
        assert normalize_count("SELECT count(a) FROM x") == "SELECT count(a) FROM x"

    def test_resolve_table(self):
        assert resolve_table("SELECT * FROM hep_1") == ("hep_1", 1)
        assert resolve_table("SELECT * FROM hep_100 WHERE x") == ("hep_100", 100)
        assert resolve_table("SELECT * FROM cpu") == ("cpu", None)

    def test_inject_no_predicate(self):
        q = inject_default_window("SELECT * FROM hep_1", now=NOW)
        assert "time >= TIMESTAMP '2024-03-01 11:50:00" in q
        assert "time <= TIMESTAMP '2024-03-01 12:00:00" in q

    def test_inject_preserves_existing_where(self):
        q = inject_default_window(
            "SELECT * FROM hep_1 WHERE payload LIKE '%INVITE%' ORDER BY time", now=NOW
        )
        assert "AND (payload LIKE '%INVITE%')" in q
        assert q.rstrip().endswith("ORDER BY time")

    def test_no_injection_when_time_present(self):
        sql = "SELECT * FROM hep_1 WHERE time >= '2024-01-01'"
        assert inject_default_window(sql, now=NOW) == sql


class TestEndToEnd:
    """The golden-query corpus (FIXTURES.md F3) against the HEP view."""

    def test_default_window_limits_to_10min(self, spark, hep_table):
        api = HepopQueryAPI(spark)
        rows = api.sql("SELECT time, src_ip FROM hep_1", now=NOW).collect()
        # minutes 0..10 inclusive of both bounds -> 11 rows
        assert len(rows) == 11

    def test_readme_query_virtual_fields(self, spark, hep_table):
        api = HepopQueryAPI(spark)
        rows = api.sql(
            "SELECT time, src_ip, dst_ip, payload FROM hep_1 "
            "WHERE time >= '2024-03-01 00:00:00' AND payload LIKE '%INVITE%' "
            "ORDER BY time DESC",
            now=NOW,
        ).collect()
        assert len(rows) == 20
        assert all(r["payload"].startswith("INVITE") for r in rows)
        assert rows[0]["time"] >= rows[-1]["time"]
        assert rows[0]["src_ip"].startswith("192.168.1.")

    def test_loopback_count_avg_shape(self, spark, hep_table):
        api = HepopQueryAPI(spark)
        out, _ = api.query_json(
            "SELECT count() AS count, min(src_port) AS p FROM hep_1 "
            "WHERE time >= '2024-03-01 00:00:00'",
            now=NOW,
        )
        assert out[0]["count"] == 40
        assert out[0]["p"] == 5060

    def test_offset_implemented(self, spark, hep_table):
        api = HepopQueryAPI(spark)
        rows = api.sql(
            "SELECT time FROM hep_1 WHERE time >= '2024-03-01 00:00:00' "
            "ORDER BY time LIMIT 5 OFFSET 10",
            now=NOW,
        ).collect()
        all_rows = api.sql(
            "SELECT time FROM hep_1 WHERE time >= '2024-03-01 00:00:00' ORDER BY time",
            now=NOW,
        ).collect()
        assert [r["time"] for r in rows] == [r["time"] for r in all_rows[10:15]]

    def test_groupby_over_virtual_field(self, spark, hep_table):
        api = HepopQueryAPI(spark)
        out, _ = api.query_json(
            "SELECT src_ip, count() AS n FROM hep_1 "
            "WHERE time >= '2024-03-01 00:00:00' GROUP BY src_ip ORDER BY n DESC",
            now=NOW,
        )
        assert len(out) == 4
        assert sum(r["n"] for r in out) == 40
