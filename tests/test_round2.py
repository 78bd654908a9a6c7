"""Semantic contracts for the round-2 analytics/mining batch
(queries/analytics2.py, queries/mining_q.py): invariants that hold
independent of the DuckDB hash-parity gate — sweep-decomposition
equivalence, Misra-Gries recall, PageRank mass conservation, assignment
totality, and audit zero-baselines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hepop_spark.catalog import load_table
from hepop_spark.queries.analytics2 import (
    activity_streaks,
    concurrency_sweep,
    counter_rate,
    dq_constraint_suite,
    fk_orphan_audit,
    time_weighted_avg,
)
from hepop_spark.queries.mining_q import (
    HH_DIV,
    KMEANS_K,
    _cosupply_edges,
    heavy_hitters_mg,
    kmeans_assign,
    pagerank_3iter,
    triangle_count,
)

SF = "/root/testdata/sf0.001"


class TestSweep:
    def test_two_pass_equals_naive_global_sweep(self, spark):
        """The day-decomposed sweep must equal a single global window."""
        ev = load_table(spark, SF, "events")
        base = ev.select(
            "event_type",
            F.unix_micros("ts").alias("t0"),
            (
                F.unix_micros("ts")
                + (F.col("value") * 60).cast("long") * 1_000_000
            ).alias("t1"),
            "event_id",
        )
        pts = base.select(
            "event_type", F.col("t0").alias("t_us"), F.lit(1).alias("delta"),
            (F.col("event_id") * 2).alias("uid"),
        ).unionAll(
            base.select(
                "event_type", F.col("t1").alias("t_us"), F.lit(-1).alias("delta"),
                (F.col("event_id") * 2 + 1).alias("uid"),
            )
        )
        w = (
            Window.partitionBy("event_type")
            .orderBy("t_us", "delta", "uid")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        naive = {
            r["event_type"]: r["peak"]
            for r in pts.withColumn("run", F.sum("delta").over(w))
            .groupBy("event_type")
            .agg(F.max("run").alias("peak"))
            .collect()
        }
        got = {
            r["event_type"]: r["peak_concurrency"]
            for r in concurrency_sweep(spark, SF).collect()
        }
        assert got == naive
        assert all(v >= 1 for v in got.values())


class TestCounterAndTwa:
    def test_counter_increase_nonnegative(self, spark):
        rows = counter_rate(spark, SF).collect()
        assert all(r["total_increase"] >= 0 for r in rows)
        assert all(0 <= r["n_resets"] < r["n_samples"] for r in rows)

    def test_twa_within_value_bounds(self, spark):
        ev = load_table(spark, SF, "events")
        lo, hi = ev.agg(F.min("value"), F.max("value")).first()
        rows = time_weighted_avg(spark, SF).collect()
        assert rows
        assert all(lo - 1e-9 <= r["twa"] <= hi + 1e-9 for r in rows)


class TestStreaks:
    def test_streak_bounds(self, spark):
        for r in activity_streaks(spark, SF).collect():
            assert 1 <= r["longest_streak"] <= r["n_active_days"]
            assert r["n_streaks"] >= 1
            # islands partition the active days
            assert r["longest_streak"] * r["n_streaks"] >= r["n_active_days"]


class TestQualityAudits:
    def test_dq_row_count_matches(self, spark):
        ev_n = load_table(spark, SF, "events").count()
        m = {r["metric"]: r["value"] for r in dq_constraint_suite(spark, SF).collect()}
        assert m["row_count"] == float(ev_n)
        assert m["dup_event_ids"] == 0.0
        assert m["props_json_bad"] == 0.0

    def test_fk_base_edges_clean(self, spark):
        m = {r["relation"]: r["orphans"] for r in fk_orphan_audit(spark, SF).collect()}
        assert m["orders->customer"] == 0
        assert m["lineitem->part"] == 0
        assert m["lineitem->supplier"] == 0
        # the restricted dimension must be a superset-orphan count
        assert m["orders->customer_nonneg"] >= 0


class TestGraph:
    def test_triangles_match_naive(self, spark):
        e = _cosupply_edges(spark, SF).collect()
        edges = {(r["u"], r["v"]) for r in e}
        nbrs: dict[int, set[int]] = {}
        for u, v in edges:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        # u<v edge plus common neighbor w>v counts each triangle exactly once
        naive = sum(len({w for w in nbrs[u] & nbrs[v] if w > v}) for (u, v) in edges)
        row = triangle_count(spark, SF).first()
        assert row["n_triangles"] == naive
        assert row["n_edges"] == len(edges)
        assert row["n_nodes"] == len(nbrs)

    def test_pagerank_mass_conserved(self, spark):
        rows = pagerank_3iter(spark, SF).collect()
        # scaled ranks average to ~1.0 (mass conservation, no dangling nodes)
        assert abs(sum(r["rank_scaled"] for r in rows) / len(rows) - 1.0) < 1e-3
        assert all(r["rank_scaled"] > 0 for r in rows)


class TestMl:
    def test_kmeans_assignment_total(self, spark):
        n = load_table(spark, SF, "embeddings").count()
        rows = kmeans_assign(spark, SF).collect()
        assert sum(r["n_assigned"] for r in rows) == n
        assert len(rows) <= KMEANS_K
        assert all(r["avg_dist"] >= 0 for r in rows)

    def test_heavy_hitters_recall_vs_exact(self, spark):
        docs = load_table(spark, SF, "documents")
        toks = docs.select(F.explode(F.split("text", " ")).alias("t")).filter(
            F.col("t") != ""
        )
        total = toks.count()
        exact = {
            r["t"]: r["c"]
            for r in toks.groupBy("t").agg(F.count("*").alias("c")).collect()
            if r["c"] >= total / HH_DIV
        }
        got = {r["token"]: r["cnt"] for r in heavy_hitters_mg(spark, SF).collect()}
        assert got == exact
