"""Round-6 closing-batch invariants: repeated-span dedup geometry,
CCNet tertile bucketing, and DSIR importance-weight sanity.

The oracle gate (tools/check_parity.py) pins exact values against DuckDB;
these tests pin the CLAIMED SEMANTICS — properties that must hold on any
corpus, so a future refactor cannot silently keep parity while changing
meaning (both engines drifting together).
"""

from __future__ import annotations

import math

from hepop_spark.queries.llm12 import (
    SPAN_GRAM,
    ccnet_perplexity_buckets,
    dsir_importance_weights,
    repeated_span_dedup,
)


class TestRepeatedSpanDedup:
    def test_span_geometry(self, spark, sf_dir):
        rows = repeated_span_dedup(spark, sf_dir).collect()
        assert rows, "synthetic corpus has repeated phrasing; expect spans"
        for r in rows:
            # every span covers at least one full seed gram
            assert r.longest_span >= SPAN_GRAM
            # maximal spans are disjoint: their union cannot exceed the doc
            assert r.dup_tokens <= r.n_toks
            assert r.n_spans >= 1
            # spans need >= SPAN_GRAM tokens each and pairwise gaps, so the
            # count is bounded by the doc's token budget
            assert r.n_spans * SPAN_GRAM <= r.dup_tokens
            assert 0 < r.dup_token_ppm <= 1_000_000

    def test_cross_doc_only(self, spark, tmp_path, sf_dir, monkeypatch):
        """A phrase repeated WITHIN one doc but nowhere else must not
        produce a span (cross-doc duplication is the judged semantics)."""
        import pyspark.sql.functions as F

        from hepop_spark import catalog

        uniq = "zq%d"  # tokens that cannot occur in the main corpus
        phrase = " ".join(uniq % i for i in range(SPAN_GRAM))
        docs = spark.createDataFrame(
            [
                (1, f"{phrase} mid1 mid2 mid3 {phrase}", "srcA"),
                (2, "other words entirely here now beyond", "srcA"),
            ],
            "doc_id long, text string, source string",
        )
        real_load = catalog.load_table
        monkeypatch.setattr(
            catalog,
            "load_table",
            lambda sp, sf, name: docs if name == "documents" else real_load(sp, sf, name),
        )
        import hepop_spark.queries.llm12 as llm12

        monkeypatch.setattr(llm12, "load_table", catalog.load_table)
        out = llm12.repeated_span_dedup(spark, sf_dir).collect()
        assert out == [], f"within-doc repeat must not span: {out}"


class TestCcnetBuckets:
    def test_tertile_partition(self, spark, sf_dir):
        rows = ccnet_perplexity_buckets(spark, sf_dir).collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r.source, []).append(r)
        from hepop_spark.catalog import load_table

        n_docs = load_table(spark, sf_dir, "documents").count()
        assert sum(r.n_docs for r in rows) == n_docs
        for src, rs in by_src.items():
            buckets = sorted(r.bucket for r in rs)
            assert buckets == list(range(1, len(rs) + 1))
            assert len(rs) <= 3
            # NTILE floor distribution: bucket sizes differ by at most 1,
            # never increasing
            sizes = [r.n_docs for r in sorted(rs, key=lambda r: r.bucket)]
            assert max(sizes) - min(sizes) <= 1
            assert sizes == sorted(sizes, reverse=True)
            # head bucket holds the lowest-nll docs: ranges must be ordered
            ordered = sorted(rs, key=lambda r: r.bucket)
            for a, b in zip(ordered, ordered[1:]):
                assert a.min_nll <= a.max_nll <= b.min_nll + 1e-9
                assert a.min_nll - 1e-9 <= a.mean_nll <= a.max_nll + 1e-9


class TestDsirWeights:
    def test_target_slice_scores_high(self, spark, sf_dir):
        """Importance weights rank target-like docs first; on a corpus where
        every source shares one vocabulary the signal is weak, but the
        output contract (k rows, descending rounded weight, finite values)
        must hold exactly."""
        rows = dsir_importance_weights(spark, sf_dir).collect()
        assert len(rows) == 20
        weights = [r.weight for r in rows]
        assert weights == sorted(weights, reverse=True)
        for r in rows:
            assert math.isfinite(r.weight)
            assert r.n_feats >= 1
