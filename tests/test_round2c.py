"""Semantic contracts for round-2 batch 3 (queries/analytics4.py and the
stateful streaming counter-rate): chi-square margins, Pareto share
monotonicity, occupancy conservation, and the streaming-equals-batch
state handoff.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hepop_spark.catalog import load_table
from hepop_spark.queries.analytics2 import counter_rate
from hepop_spark.queries.analytics4 import (
    chi_square_independence,
    share_of_total,
    state_occupancy,
    trend_movers_dod,
)
from hepop_spark.queries.streaming_q import streaming_counter_rate_replay

SF = "/root/testdata/sf0.001"


class TestChi2:
    def test_cells_and_total(self, spark):
        rows = chi_square_independence(spark, SF).collect()
        n = load_table(spark, SF, "events").count()
        assert sum(r["o"] for r in rows) == n
        # expected margins reproduce observed margins
        assert abs(sum(r["expected"] for r in rows) - n) < 0.5
        totals = {r["chi2_total"] for r in rows}
        assert len(totals) == 1
        assert abs(
            totals.pop() - round(sum(r["chi2_contrib"] for r in rows), 2)
        ) < 0.01


class TestShare:
    def test_shares_sum_and_cum_monotone(self, spark):
        rows = sorted(share_of_total(spark, SF).collect(), key=lambda r: r["rank"])
        assert abs(sum(r["share_pct"] for r in rows) - 100.0) < 0.01
        cums = [r["cum_share_pct"] for r in rows]
        assert cums == sorted(cums)
        assert abs(cums[-1] - 100.0) < 0.01
        revs = [r["revenue"] for r in rows]
        assert revs == sorted(revs, reverse=True)


class TestOccupancyAndTrend:
    def test_occupancy_spans_close(self, spark):
        rows = state_occupancy(spark, SF).collect()
        assert rows
        for r in rows:
            assert r["total_s"] >= r["n_spans"] * 0  # non-negative
            assert r["mean_span_s"] * r["n_spans"] <= r["total_s"] + r["n_spans"]

    def test_trend_delta_consistent(self, spark):
        for r in trend_movers_dod(spark, SF).collect():
            assert r["delta"] == r["c"] - r["prev"]
            assert r["prev"] > 0


class TestStreamingCounterRate:
    def test_stream_equals_batch(self, spark):
        got = {
            r["user_id"]: (r["total_increase"], r["n_resets"], r["n_samples"])
            for r in streaming_counter_rate_replay(spark, SF).collect()
        }
        want = {
            r["user_id"]: (r["total_increase"], r["n_resets"], r["n_samples"])
            for r in counter_rate(spark, SF).collect()
        }
        assert got == want
