"""Semantic contracts for round-2 batch 2 (queries/analytics3.py):
dominance re-proof for the skyline decomposition, attribution windowing
invariants, BM25 monotonicity, entropy bounds, and t-test symmetry.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hepop_spark.catalog import load_table
from hepop_spark.queries.analytics3 import (
    ATTR_WINDOW_S,
    BM25_TOPN,
    abtest_welch,
    attribution_last_touch,
    bm25_rank,
    interval_overlap_join,
    pareto_frontier,
    token_entropy,
)

SF = "/root/testdata/sf0.001"


class TestPareto:
    def test_frontier_matches_naive_dominance(self, spark):
        parts = [
            (r["p_partkey"], r["p_retailprice"], r["p_size"])
            for r in load_table(spark, SF, "part")
            .select("p_partkey", "p_retailprice", "p_size")
            .collect()
        ]
        naive = {
            k
            for (k, pr, sz) in parts
            if not any(
                (pr2 < pr and sz2 >= sz) or (pr2 == pr and sz2 > sz)
                for (_, pr2, sz2) in parts
            )
        }
        got = {r["p_partkey"] for r in pareto_frontier(spark, SF).collect()}
        assert got == naive


class TestAttribution:
    def test_lag_within_window_and_touch_precedes(self, spark):
        rows = attribution_last_touch(spark, SF).collect()
        assert rows
        for r in rows:
            assert 0 <= r["lag_s"] <= ATTR_WINDOW_S
            assert r["touch_type"] in ("click", "view")

    def test_each_purchase_attributed_at_most_once(self, spark):
        rows = attribution_last_touch(spark, SF).collect()
        ids = [r["purchase_id"] for r in rows]
        assert len(ids) == len(set(ids))


class TestOverlap:
    def test_overlap_pairs_actually_overlap(self, spark):
        ev = {
            r["event_id"]: (r["t"], r["d"], r["user_id"])
            for r in load_table(spark, SF, "events")
            .select(
                "event_id",
                "user_id",
                F.unix_micros("ts").alias("t"),
                (F.round(F.col("value") * 60, 0).cast("long") * 1_000_000).alias("d"),
            )
            .collect()
        }
        for r in interval_overlap_join(spark, SF).collect():
            ta, da, ua = ev[r["a_id"]]
            tb, db, ub = ev[r["b_id"]]
            assert ua == ub == r["user_id"]
            ov = min(ta + da, tb + db) - max(ta, tb)
            assert ov > 0
            assert r["overlap_s"] == ov // 1_000_000


class TestRanking:
    def test_bm25_topn_scores_positive_sorted(self, spark):
        rows = bm25_rank(spark, SF).collect()
        assert 0 < len(rows) <= BM25_TOPN
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)


class TestEntropyAndTtest:
    def test_entropy_bounds(self, spark):
        for r in token_entropy(spark, SF).collect():
            assert 0 <= r["entropy"] <= math.log(r["vocab"]) + 1e-9
            assert 0 <= r["entropy_norm"] <= 1.0 + 1e-9

    def test_ttest_consistency(self, spark):
        ev = load_table(spark, SF, "events")
        for r in abtest_welch(spark, SF).collect():
            n = (
                ev.filter(F.col("event_type") == r["event_type"]).count()
            )
            assert r["n_a"] + r["n_b"] == n
            # t statistic sign agrees with the mean difference
            if r["mean_a"] != r["mean_b"]:
                assert (r["t_stat"] > 0) == (r["mean_a"] > r["mean_b"])
