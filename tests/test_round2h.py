"""Round-2 operator invariants: curation batch (llm4), the keyless grid
interval join, and the PQ ANN path. Cross-engine value parity is the
oracle sweep's job (tools/check_parity.py); these pin the semantic
invariants that would survive an oracle that was wrong in the same way
on both engines."""

from __future__ import annotations

from pyspark.sql import functions as F

from hepop_spark.queries.analytics3 import interval_overlap_grid
from hepop_spark.queries.llm4 import (
    CONTAINMENT_THRESHOLD,
    boilerplate_ngrams,
    curation_funnel,
    dedup_containment,
    prefix_dup_groups,
    semantic_dedup_cc,
)


class TestCurationBatch:
    def test_funnel_counts_monotone(self, spark, sf_dir):
        rows = {r["stage"]: r for r in curation_funnel(spark, sf_dir).collect()}
        order = ["1_raw", "2_corpus", "3_quality", "4_exact_dedup",
                 "5_fp_dedup", "6_decontaminated"]
        assert set(rows) == set(order)
        for prev, cur in zip(order, order[1:]):
            assert rows[cur]["n_docs"] <= rows[prev]["n_docs"], (prev, cur)
            assert rows[cur]["sum_chars"] <= rows[prev]["sum_chars"]
        assert rows["1_raw"]["n_docs"] > 0

    def test_containment_bounds(self, spark, sf_dir):
        for r in dedup_containment(spark, sf_dir).collect():
            assert CONTAINMENT_THRESHOLD <= r["containment"] <= 1.0
            assert r["da"] < r["db"]

    def test_prefix_groups_are_groups(self, spark, sf_dir):
        for r in prefix_dup_groups(spark, sf_dir).collect():
            assert r["n_docs"] > 1
            assert r["keep_doc"] >= 0

    def test_boilerplate_counts_distinct_docs(self, spark, sf_dir):
        for r in boilerplate_ngrams(spark, sf_dir).collect():
            assert r["n_docs"] >= 2
            assert len(r["ng"].split(" ")) == 5

    def test_semantic_clusters_canonical_is_min(self, spark, sf_dir):
        rows = semantic_dedup_cc(spark, sf_dir).collect()
        by_comp: dict[int, list[int]] = {}
        for r in rows:
            assert r["cluster_size"] >= 2  # only edge-connected vectors appear
            by_comp.setdefault(r["canonical_id"], []).append(r["vec_id"])
        for canon, members in by_comp.items():
            assert canon == min(members)


class TestIntervalGrid:
    def test_grid_equals_naive(self, spark, sf_dir):
        """The grid bucketing must lose no pair and invent none vs the
        naive all-pairs plan on the same slice."""
        from hepop_spark.catalog import load_table

        got = {
            (r["a_id"], r["b_id"], r["overlap_s"])
            for r in interval_overlap_grid(spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events")
        iv = ev.select(
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("s"),
            (
                F.unix_micros("ts")
                + F.round(F.col("value") * 60, 0).cast("long") * 1_000_000
            ).alias("e"),
        )
        a = iv.filter((F.col("event_type") == "error") & (F.col("event_id") % 10 == 0))
        b = iv.filter(F.col("event_type") == "purchase")
        naive = {
            (r["a_id"], r["b_id"], r["ov"])
            for r in a.select(
                F.col("event_id").alias("a_id"), F.col("s").alias("a_s"),
                F.col("e").alias("a_e"),
            )
            .crossJoin(
                b.select(
                    F.col("event_id").alias("b_id"), F.col("s").alias("b_s"),
                    F.col("e").alias("b_e"),
                )
            )
            .filter(F.least("a_e", "b_e") - F.greatest("a_s", "b_s") > 0)
            .select(
                "a_id",
                "b_id",
                F.expr("(least(a_e, b_e) - greatest(a_s, b_s)) div 1000000").alias("ov"),
            )
            .collect()
        }
        assert got == naive
