"""Semantic contracts for round-2 batch 7 (queries/analytics8.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hepop_spark.catalog import load_table
from hepop_spark.queries.analytics8 import (
    PATH_STEPS,
    PATH_TOPN,
    latency_bands_hourly,
    session_paths_topk,
)

SF = "/root/testdata/sf0.001"


class TestLatencyBands:
    def test_band_ordering_and_bounds(self, spark):
        ev = load_table(spark, SF, "events")
        lo, hi = ev.agg(F.min("value"), F.max("value")).first()
        rows = latency_bands_hourly(spark, SF).collect()
        assert rows
        for r in rows:
            assert lo - 1e-9 <= r["p50"] <= r["p95"] <= r["p99"] <= hi + 1e-9
            assert r["n"] >= 1


class TestHistogramLe:
    def test_cumulative_monotone_per_type(self, spark):
        from hepop_spark.queries.analytics8 import (
            LE_BOUNDS,
            histogram_cumulative_le,
        )

        rows = histogram_cumulative_le(spark, SF).collect()
        by_type: dict[str, dict[float, int]] = {}
        for r in rows:
            by_type.setdefault(r["event_type"], {})[float(r["le"])] = r["cum_count"]
        for et, buckets in by_type.items():
            assert set(buckets) == set(LE_BOUNDS)
            ordered = [buckets[b] for b in sorted(buckets)]
            assert ordered == sorted(ordered)  # cumulative => monotone
            n_total = {r["n_total"] for r in rows if r["event_type"] == et}.pop()
            assert ordered[-1] <= n_total


class TestSessionPaths:
    def test_paths_bounded_and_ranked(self, spark):
        rows = session_paths_topk(spark, SF).collect()
        assert 0 < len(rows) <= PATH_TOPN
        counts = [r["n_sessions"] for r in rows]
        assert counts == sorted(counts, reverse=True)
        valid = {"click", "view", "signup", "purchase", "error"}
        for r in rows:
            steps = r["path"].split(">")
            assert 1 <= len(steps) <= PATH_STEPS
            assert set(steps) <= valid
