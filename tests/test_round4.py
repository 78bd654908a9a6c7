"""Round-4 batch semantics: normalization dedup plants, Bloom-sketch
no-false-negative property, looping-text plants, minhash merge monoid,
RFC 3550 jitter sanity, and the equi-depth grid rewrite equivalence."""

from __future__ import annotations

import pytest

from hepop_spark.queries.analytics10 import quantile_bins_equidepth
from hepop_spark.queries.llm9 import (
    BLOOM_PROBE_MOD,
    LOOP_MIN_REPEATS,
    LOOP_PLANT_MOD,
    NORM_PLANT_MOD,
    NORM_PLANT_OFFSET,
    bloom_decontaminate,
    dedup_norm_whitespace,
    minhash_merge_shards,
    ngram_repetition_loop,
)
from hepop_spark.queries.voip_q import rtp_jitter_rfc3550
from hepop_spark.session import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-round4")


class TestNormDedup:
    def test_planted_variants_collapse(self, spark):
        rows = dedup_norm_whitespace(spark, SF).collect()
        # every 97th doc has a planted case/space/punct variant; each must
        # land in the same normalized group as its original
        reps = {r["rep_doc"]: r for r in rows}
        import duckdb

        n_docs = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
        ).fetchone()[0]
        planted = [i for i in range(0, n_docs, NORM_PLANT_MOD)]
        for doc in planted:
            assert doc in reps, f"planted group for doc {doc} missing"
            assert reps[doc]["max_doc"] == doc + NORM_PLANT_OFFSET
            assert reps[doc]["n_docs"] >= 2


class TestBloom:
    def test_no_false_negatives(self, spark):
        """Every benchmark document must flag itself: Bloom filters have
        false positives but NEVER false negatives."""
        rows = {r["source"]: r for r in bloom_decontaminate(spark, SF).collect()}
        import duckdb

        bench_by_source = duckdb.sql(
            f"""SELECT source, count(*) FROM read_parquet('{SF}/documents.parquet')
                WHERE doc_id % {BLOOM_PROBE_MOD} = 0 GROUP BY source"""
        ).fetchall()
        for source, n_bench in bench_by_source:
            assert rows[source]["n_docs_flagged"] >= n_bench
        total_flagged = sum(r["n_grams_flagged"] for r in rows.values())
        total_scanned = sum(r["n_grams_scanned"] for r in rows.values())
        # the sketch is 62 Kbit for a few hundred benchmark grams: the
        # false-positive mass must stay a sliver of the corpus
        assert total_flagged < total_scanned * 0.1


class TestLoopDetect:
    def test_planted_loops_flagged(self, spark):
        rows = {r["doc_id"]: r for r in ngram_repetition_loop(spark, SF).collect()}
        import duckdb

        n_docs = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
        ).fetchone()[0]
        for doc in range(0, n_docs, LOOP_PLANT_MOD):
            assert doc in rows, f"planted looping doc {doc} not flagged"
            assert rows[doc]["n_repeats"] >= LOOP_MIN_REPEATS
            assert "loop" in rows[doc]["top_gram"]


class TestMinhashMerge:
    def test_merge_equals_direct(self, spark):
        rows = minhash_merge_shards(spark, SF).collect()
        assert rows
        assert all(r["n_mismatch"] == 0 for r in rows), (
            "element-wise min of shard signatures must equal the direct "
            "signature (merge monoid property)"
        )
        assert all(r["sig_checksum"] >= 0 for r in rows)


class TestJitter:
    def test_jitter_nonnegative_and_bounded_trunks(self, spark):
        rows = rtp_jitter_rfc3550(spark, SF).collect()
        assert 0 < len(rows) <= 20
        for r in rows:
            assert r["jitter_ms"] >= 0.0
            assert r["n_gaps"] > 0


class TestEquidepthGridRewrite:
    def test_matches_rowlevel_ntile(self, spark):
        """The aggregated-grid derivation must reproduce row-level NTILE
        exactly (DuckDB computes the row-level reference)."""
        got = {
            r["bin"]: (r["n"], r["min_cents"], r["max_cents"])
            for r in quantile_bins_equidepth(spark, SF).collect()
        }
        import duckdb

        ref = duckdb.sql(
            f"""WITH binned AS (
                  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                         ntile(10) OVER (ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT),
                                         l_orderkey, l_linenumber) AS bin
                  FROM read_parquet('{SF}/lineitem.parquet'))
                SELECT bin, count(*), min(cents), max(cents)
                FROM binned GROUP BY bin ORDER BY bin"""
        ).fetchall()
        assert len(got) == 10
        for bin_, n, lo, hi in ref:
            assert got[bin_] == (n, lo, hi)


class TestCurriculumShards:
    def test_balance_and_totals(self, spark):
        from hepop_spark.queries.llm9 import CURR_SHARDS, curriculum_shard_roundrobin

        rows = curriculum_shard_roundrobin(spark, SF).collect()
        assert len(rows) == CURR_SHARDS
        import duckdb

        n_docs, sum_q = duckdb.sql(
            f"SELECT count(*), sum(n_chars) FROM read_parquet('{SF}/documents.parquet')"
        ).fetchone()
        assert sum(r["n_docs"] for r in rows) == n_docs
        assert sum(r["sum_quality"] for r in rows) == sum_q
        # round-robin deal: shard sizes differ by at most 1
        sizes = [r["n_docs"] for r in rows]
        assert max(sizes) - min(sizes) <= 1


class TestDedupRecallEval:
    def test_full_recall_on_planted_neardups(self, spark):
        from hepop_spark.queries.llm9 import dedup_minhash_recall_eval

        row = dedup_minhash_recall_eval(spark, SF).collect()[0]
        assert row["n_planted"] > 0
        # one deleted token out of >=10 leaves shingle Jaccard ~0.96 —
        # the banded pipeline must recover every planted pair
        assert row["n_caught"] == row["n_planted"]
        assert row["n_pairs_total"] >= row["n_caught"]


class TestLengthBuckets:
    def test_padding_accounting(self, spark):
        from hepop_spark.queries.llm9 import length_bucket_padding

        rows = length_bucket_padding(spark, SF).collect()
        assert rows
        import duckdb

        n_docs, max_t = duckdb.sql(
            f"""SELECT count(*), max(len(string_split(text, ' ')))
                FROM read_parquet('{SF}/documents.parquet')"""
        ).fetchone()
        assert sum(r["n_docs"] for r in rows) == n_docs
        for r in rows:
            # bucketed padding never exceeds global-max padding, buckets
            # are powers of two, and waste is non-negative
            assert r["pad_bucketed"] <= r["pad_global"]
            assert r["pad_bucketed"] >= 0
            assert r["bucket_hi"] & (r["bucket_hi"] - 1) == 0
            assert r["bucket_hi"] <= 2 * max_t


class TestClosingAnalytics:
    def test_attribution_credit_conservation(self, spark):
        """Total distributed credit must be exactly 10000 bp per
        converting user with >= 1 preceding touch — the largest-remainder
        construction guarantees it; this is the invariant naive
        percentage splits violate."""
        from pyspark.sql import functions as F

        from hepop_spark.catalog import load_table
        from hepop_spark.queries.analytics17 import (
            CREDIT_BP,
            attribution_position_based,
        )

        rows = attribution_position_based(spark, SF).collect()
        total_credit = sum(r["credit_bp"] for r in rows)
        ev = load_table(spark, SF, "events")
        fp = (
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.min(F.unix_micros("ts")).alias("p_t"))
        )
        n_converters = (
            ev.filter(F.col("event_type").isin("view", "click"))
            .select("user_id", F.unix_micros("ts").alias("t"))
            .join(fp, "user_id")
            .filter(F.col("t") < F.col("p_t"))
            .select("user_id")
            .distinct()
            .count()
        )
        assert total_credit == CREDIT_BP * n_converters

    def test_window_funnel_totals(self, spark):
        from pyspark.sql import functions as F

        from hepop_spark.catalog import load_table
        from hepop_spark.queries.analytics17 import window_funnel_steps

        rows = window_funnel_steps(spark, SF).collect()
        n_funnel_users = sum(r["n_users"] for r in rows)
        ev = load_table(spark, SF, "events")
        expected = (
            ev.filter(F.col("event_type").isin("view", "click", "purchase"))
            .select("user_id")
            .distinct()
            .count()
        )
        assert n_funnel_users == expected
        assert all(0 <= r["depth"] <= 3 for r in rows)

    def test_hhi_bounds(self, spark):
        from hepop_spark.queries.analytics17 import market_concentration_hhi

        for r in market_concentration_hhi(spark, SF).collect():
            # HHI on the bp grid is bounded by the monopoly value, and a
            # floored-share HHI can never exceed 10000
            assert 0 <= r["hhi"] <= 10_000
            assert 0 <= r["top_share_bp"] <= 10_000
            assert r["n_suppliers"] >= 1

    def test_quantile_normalize_partition(self, spark):
        import duckdb

        from hepop_spark.queries.analytics17 import quantile_normalize_feature

        rows = quantile_normalize_feature(spark, SF).collect()
        total = sum(r["n_rows"] for r in rows)
        expected = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
        ).fetchone()[0]
        assert total == expected
        # decile ranges must be disjoint and ordered within each type
        from collections import defaultdict

        by_type = defaultdict(list)
        for r in rows:
            by_type[r["event_type"]].append(r)
        for rs in by_type.values():
            rs.sort(key=lambda r: r["decile"])
            for a, b in zip(rs, rs[1:]):
                assert a["hi_cents"] < b["lo_cents"]

    def test_golden_record_vs_whole_row_latest(self, spark):
        """The per-attribute winner may differ from the whole-row latest
        (that's WHY survivorship exists): golden_cents must equal the
        latest NON-NULL observation, never a planted-null row's value."""
        from pyspark.sql import functions as F

        from hepop_spark.catalog import load_table
        from hepop_spark.queries.analytics17 import (
            GOLDEN_NULL_MOD,
            golden_record_merge,
        )

        got = {r["user_id"]: r for r in golden_record_merge(spark, SF).collect()}
        ev = load_table(spark, SF, "events").orderBy("ts", "event_id").collect()
        from collections import defaultdict

        latest_nonnull: dict = {}
        counts: dict = defaultdict(int)
        for row in ev:
            counts[row["user_id"]] += 1
            if row["event_id"] % GOLDEN_NULL_MOD != 0:
                latest_nonnull[row["user_id"]] = round(row["value"] * 100)
        for uid, r in got.items():
            assert r["n_obs"] == counts[uid]
            assert r["golden_cents"] == latest_nonnull.get(uid)
