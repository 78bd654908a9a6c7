"""Semantic contracts for the dataset-shaping batch (queries/llm3.py):
chunk coverage, packing conservation, mix-weight bounds, and guaranteed
detection of planted contamination.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hepop_spark.catalog import load_table
from hepop_spark.queries.llm3 import (
    CAP,
    CHUNK,
    STRIDE,
    decontaminate_ngram_overlap,
    mix_sources_weighted,
    pack_sequences,
    text_chunk_windows,
)

SF = "/root/testdata/sf0.001"


class TestChunking:
    def test_counts_and_coverage(self, spark):
        docs = load_table(spark, SF, "documents").select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        )
        want = {
            r["doc_id"]: (r["n"] - 1) // STRIDE + 1 for r in docs.collect()
        }
        out = text_chunk_windows(spark, SF)
        got = {
            r["doc_id"]: r["k"]
            for r in out.groupBy("doc_id").agg(F.count("*").alias("k")).collect()
        }
        assert got == want
        # every chunk within size bound; full chunks are exactly CHUNK
        assert out.filter(F.col("chunk_tokens") > CHUNK).count() == 0
        assert out.filter(F.col("chunk_tokens") < 1).count() == 0


class TestPacking:
    def test_tokens_conserved_and_packs_bounded(self, spark):
        docs = load_table(spark, SF, "documents").select(
            F.least(F.size(F.split("text", " ")), F.lit(CAP)).alias("tok")
        )
        total = docs.agg(F.sum("tok")).first()[0]
        packs = pack_sequences(spark, SF).collect()
        assert sum(r["pack_tokens"] for r in packs) == total
        # a pack never exceeds CAP + one truncated doc's worth (< 2*CAP)
        assert all(r["pack_tokens"] < 2 * CAP for r in packs)
        # pack ids are dense per bucket
        by_bucket: dict[int, list[int]] = {}
        for r in packs:
            by_bucket.setdefault(r["bucket"], []).append(r["pack_id"])
        for ids in by_bucket.values():
            assert sorted(ids) == list(range(len(ids)))


class TestMixing:
    def test_weight_bounds(self, spark):
        per_src = {
            r["source"]: r["n"]
            for r in load_table(spark, SF, "documents")
            .groupBy("source")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        got = {r["source"]: r for r in mix_sources_weighted(spark, SF).collect()}
        for src, n in per_src.items():
            if src in ("src0", "src1", "src2"):
                r = got[src]
                assert 2 * n <= r["n_rows"] <= 3 * n
                assert r["n_docs"] == n
            elif src in ("src3", "src4"):
                assert got[src]["n_rows"] == n == got[src]["n_docs"]
            else:
                # w ≈ 0.4 downsample: subset, never replicated
                r = got.get(src)
                if r is not None:
                    assert r["n_rows"] == r["n_docs"] <= n


class TestIncrementalDedup:
    def test_plants_pair_with_originals(self, spark):
        from pyspark.sql import functions as F2

        from hepop_spark.queries.llm import dedup_incremental

        docs = load_table(spark, SF, "documents")
        plants = [
            r["doc_id"]
            for r in docs.filter(
                (F2.col("doc_id") % 97 == 0) & (F2.col("doc_id") % 10 != 0)
            ).collect()
        ]
        out = {r["batch_doc"]: r for r in dedup_incremental(spark, SF).collect()}
        for p in plants:
            hit = out.get(p + 1000000)
            assert hit is not None, f"planted leak {p} not detected"
            assert hit["index_doc"] == p and hit["jaccard"] == 1.0
        # asymmetry: no index-side doc ever appears as batch_doc
        assert all(b % 10 == 0 or b >= 1000000 for b in out)


class TestDecontamination:
    def test_all_plants_flagged(self, spark):
        bench_ids = [
            r["doc_id"]
            for r in load_table(spark, SF, "documents")
            .filter(F.col("doc_id") % 97 == 0)
            .select("doc_id")
            .collect()
        ]
        out = {r["doc_id"]: r for r in decontaminate_ngram_overlap(spark, SF).collect()}
        for b in bench_ids:
            plant = out.get(b + 1000000)
            assert plant is not None, f"planted copy of {b} not flagged"
            assert plant["n_shared"] >= 1 and plant["is_planted"]
