"""Round-5 regression tests.

Short-document guards: Spark's sequence(1, 0) is the DESCENDING array
[1, 0], and slice(arr, 0, k) raises INVALID_PARAMETER_VALUE.START — so
every shingle/n-gram generator must yield ZERO grams for a document with
fewer tokens than the gram width (matching the DuckDB oracles' empty
range), not crash. ADVICE r04 medium item.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, "t", s) for i, s in enumerate(texts)],
        "doc_id long, source string, text string",
    )


class TestShortDocShingleGuards:
    def test_bloom_shingles_short_doc_yields_zero_grams(self, spark):
        from hepop_spark.queries.llm9 import _shingles

        # 4 tokens < BLOOM_GRAM=5: crashed with INVALID_PARAMETER_VALUE.START
        # before the guard; must now return no rows for that doc
        df = _docs(spark, ["only four tokens here", "a b c d e f g"])
        rows = _shingles(df).collect()
        assert all(r.doc_id == 1 for r in rows)
        assert len(rows) == 3  # 7 tokens -> 3 distinct 5-grams

    def test_exactly_gram_minus_one_tokens(self, spark):
        from hepop_spark.queries.llm9 import _shingles

        # size == GRAM-1 makes greatest(size-(GRAM-1), 0) == 0 -> the exact
        # sequence(1, 0) repro from the advice
        df = _docs(spark, ["one two three four"])
        assert _shingles(df).count() == 0

    def test_trigram_loop_detector_short_doc(self, spark):
        # the inline 3-gram expr in ngram_repetition_loop, exercised directly
        df = _docs(spark, ["two tokens", "", "a b c d"])
        grams = F.expr(
            "case when size(split(text, ' ')) >= 3 then "
            "transform(sequence(1, size(split(text, ' ')) - 2), "
            "i -> concat_ws(' ', slice(split(text, ' '), i, 3))) "
            "else array() end"
        )
        out = df.select("doc_id", F.explode(grams).alias("g")).collect()
        assert {r.doc_id for r in out} == {2}
        assert len(out) == 2

    def test_no_unguarded_one_based_sequence_left(self):
        """Source lint: any 1-based sequence(1, greatest(...)) gram
        generator without a size() CASE guard is the crash pattern."""
        import pathlib

        bad = []
        for p in pathlib.Path("/root/repo/hepop_spark").rglob("*.py"):
            text = p.read_text()
            for i, ln in enumerate(text.splitlines(), 1):
                if "sequence(1, greatest(" in ln:
                    bad.append(f"{p}:{i}")
        assert not bad, f"unguarded 1-based gram sequences: {bad}"


class TestPersistedIvfpqIndex:
    def _corpus(self, spark, n=80, dim=64):
        import pyspark.sql.functions as F

        return spark.range(n).select(
            F.col("id").alias("c_id"),
            F.expr(
                "transform(sequence(0, 63), "
                "i -> cast(pmod(hash(id, i), 97) / 97.0 as float))"
            ).alias("cv"),
        )

    def test_build_once_then_noop(self, spark, tmp_path):
        from hepop_spark.operators.pq_index import build_ivfpq_index

        corpus = self._corpus(spark)
        path = str(tmp_path / "idx")
        assert build_ivfpq_index(
            spark, corpus, path, n_cells=8, m_sub=8, sub=8, k_codes=16
        )
        # second build is the no-op: encode cost is paid at ingest only
        assert not build_ivfpq_index(
            spark, corpus, path, n_cells=8, m_sub=8, sub=8, k_codes=16
        )
        codes = spark.read.parquet(f"{path}/codes")
        assert codes.count() == 80
        assert set(codes.columns) == {"c_id", "packed", "cell"}
        # 8-byte-per-vector claim: one BIGINT row per corpus vector, and
        # every 6-bit field decodes to a valid codeword id
        import pyspark.sql.functions as F

        bad = codes.filter(
            F.expr(
                "exists(sequence(0, 7), "
                "m -> (shiftright(packed, m * 6) & 63) >= 16)"
            )
        ).count()
        assert bad == 0

    def test_query_matches_inline_recompute(self, spark, tmp_path):
        """The persisted-code query returns EXACTLY what encoding inline
        would: same codebook, same codes, same ADC keys, same rerank."""
        import pyspark.sql.functions as F

        from hepop_spark.operators.pq_index import (
            build_ivfpq_index,
            ivfpq_topk_from_index,
        )

        emb = self._corpus(spark, n=90)
        corpus = emb.filter(F.col("c_id") >= 10)
        queries = emb.filter(F.col("c_id") < 10).select(
            F.col("c_id").alias("q_id"), F.col("cv").alias("qv")
        )
        path = str(tmp_path / "idx2")
        build_ivfpq_index(spark, corpus, path, n_cells=8, m_sub=8, sub=8, k_codes=16)
        out1 = ivfpq_topk_from_index(
            spark, queries, corpus, path, m_sub=8, sub=8, nprobe=4,
            shortlist=20, top_k=3,
        ).collect()
        out2 = ivfpq_topk_from_index(
            spark, queries, corpus, path, m_sub=8, sub=8, nprobe=4,
            shortlist=20, top_k=3,
        ).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        assert len(out1) == 30  # 10 queries x top 3
        fingerprint_rows = {(r.q_id, r.rk): r.c_id for r in out1}
        assert len(fingerprint_rows) == 30

    def test_stale_source_gets_new_cache_key(self, tmp_path):
        import time as _t

        from hepop_spark.operators.pq_index import source_fingerprint

        f = tmp_path / "embeddings.parquet"
        f.write_bytes(b"aaa")
        k1 = source_fingerprint(str(f))
        _t.sleep(0.01)
        f.write_bytes(b"aaab")
        assert source_fingerprint(str(f)) != k1


class TestMultiWriterFederation:
    def test_two_writers_answer_as_one_table(self, spark, tmp_path):
        """r04 verdict item 4: the reference's query layer iterates ALL
        writer directories under the data root (query.js:24-33) — two
        instances sharing storage are one logical table."""
        import pyspark.sql.functions as F

        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.writer import write_partitioned

        data = tmp_path / "data"
        for writer, n0 in (("w1", 0), ("w2", 100)):
            df = spark.createDataFrame(
                [(n0 + i, float(i)) for i in range(3)], "event_id long, v double"
            ).withColumn(
                "timestamp", F.timestamp_micros(F.lit(1_709_290_800_000_000))
            )
            write_partitioned(df, str(data / writer / "dbs" / "gauge"))
        api = HepopQueryAPI(spark, default_window=False, data_dir=str(data))
        rows, _ = api.query_json("SELECT count() AS n FROM gauge")
        assert rows == [{"n": 6}]
        # per-writer rows are all present, not shadowed
        ids = {
            r["event_id"]
            for r in api.query_json("SELECT event_id FROM gauge")[0]
        }
        assert ids == {0, 1, 2, 100, 101, 102}

    def test_schema_drift_across_writers_nullfills(self, spark, tmp_path):
        """Writers may have frozen different first-row schemas; the
        federated view is the by-name union with null-fill."""
        import pyspark.sql.functions as F

        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.writer import write_partitioned

        data = tmp_path / "data"
        ts = F.timestamp_micros(F.lit(1_709_290_800_000_000))
        a = spark.createDataFrame([(1, 1.0)], "event_id long, v double")
        b = spark.createDataFrame([(2, "x")], "event_id long, tagged string")
        write_partitioned(a.withColumn("timestamp", ts), str(data / "w1" / "dbs" / "m"))
        write_partitioned(b.withColumn("timestamp", ts), str(data / "w2" / "dbs" / "m"))
        api = HepopQueryAPI(spark, default_window=False, data_dir=str(data))
        rows, _ = api.query_json("SELECT event_id, v, tagged FROM m ORDER BY event_id")
        assert rows == [
            {"event_id": 1, "v": 1.0, "tagged": None},
            {"event_id": 2, "v": None, "tagged": "x"},
        ]

    def test_missing_table_leaves_existing_view(self, spark, tmp_path):
        from hepop_spark.catalog import discover_table

        spark.createDataFrame([(1,)], "a long").createOrReplaceTempView(
            "manual_view_r5"
        )
        assert not discover_table(spark, str(tmp_path), "manual_view_r5")
        assert spark.table("manual_view_r5").count() == 1


class TestSnapshotDiffDomain:
    def test_v1_only_type_keeps_removed_count(self, spark, tmp_path):
        """A type whose rows were ALL removed in v2 must still report
        n_removed (ADVICE r04: anchoring on v2's domain alone drops it)."""
        import pyspark.sql.functions as F  # noqa: F811

        from hepop_spark.storage.snapshots import commit_snapshot, read_snapshot

        base = str(tmp_path / "snap")
        v1df = spark.createDataFrame(
            [(1, "gone", 1.0), (2, "stay", 2.0)],
            "event_id long, event_type string, value double",
        )
        v1 = commit_snapshot(v1df, base)
        v2df = spark.createDataFrame(
            [(2, "stay", 2.0), (3, "stay", 3.0)],
            "event_id long, event_type string, value double",
        )
        v2 = commit_snapshot(v2df, base, mode="overwrite")
        a = read_snapshot(spark, base, v1)
        b = read_snapshot(spark, base, v2)
        types = (
            a.select("event_type").unionByName(b.select("event_type")).distinct()
        )
        removed = a.join(b.select("event_id"), "event_id", "left_anti")
        out = {
            r.event_type: r.n_removed
            for r in types.join(
                removed.groupBy("event_type").agg(
                    F.count("*").alias("n_removed")
                ),
                "event_type",
                "left",
            )
            .fillna(0, ["n_removed"])
            .collect()
        }
        assert out == {"gone": 1, "stay": 0}


class TestRound5Operators:
    def test_winnowing_guarantee(self, spark):
        """MOSS guarantee: two docs sharing a run of >= w+k-1 tokens share
        at least one selected fingerprint."""
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        from hepop_spark.queries.llm10 import WIN_GRAM, WIN_WINDOW

        shared = " ".join(f"s{i}" for i in range(WIN_GRAM + WIN_WINDOW - 1))
        docs = spark.createDataFrame(
            [
                (1, "alpha beta " + shared + " gamma delta epsilon zeta"),
                (2, "one two three four " + shared + " five six"),
            ],
            "doc_id long, text string",
        )
        grams = F.expr(
            f"transform(sequence(1, size(split(text, ' ')) - {WIN_GRAM - 1}), "
            f"i -> concat_ws(' ', slice(split(text, ' '), i, {WIN_GRAM})))"
        )
        g = docs.select("doc_id", F.posexplode(grams).alias("pos", "g")).select(
            "doc_id", "pos",
            F.conv(F.substring(F.md5("g"), 1, 12), 16, 10).cast("long").alias("h"),
        )
        w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WIN_WINDOW - 1)
        n = Window.partitionBy("doc_id")
        sel = (
            g.withColumn("wmin", F.min("h").over(w))
            .withColumn("n", F.count("*").over(n))
            .filter(F.col("pos") <= F.col("n") - WIN_WINDOW)
            .select("doc_id", "wmin").distinct()
        )
        a = {r.wmin for r in sel.filter("doc_id = 1").collect()}
        b = {r.wmin for r in sel.filter("doc_id = 2").collect()}
        assert a & b, "shared token run must produce a shared fingerprint"

    def test_temperature_mix_weights_sum_to_one(self, spark, sf_dir):
        from hepop_spark.queries.llm10 import source_temperature_mix

        rows = source_temperature_mix(spark, sf_dir).collect()
        s = sum(r.mix_weight for r in rows)
        assert abs(s - 1.0) < 1e-2  # rounded weights, |sources| * 5e-5 slack
        assert all(r.boost > 0 for r in rows)
        # alpha < 1 flattens: smallest source is boosted above proportional
        smallest = min(rows, key=lambda r: r.n_tokens)
        largest = max(rows, key=lambda r: r.n_tokens)
        assert smallest.boost >= largest.boost

    def test_quality_filter_totals(self, spark, sf_dir):
        from hepop_spark.queries.llm10 import quality_logreg_filter

        rows = quality_logreg_filter(spark, sf_dir).collect()
        assert all(r.n_keep + r.n_drop == r.n_docs for r in rows)
        assert all(
            0 <= r.mean_keep_score_e6 <= 1_000_000
            for r in rows if r.n_keep > 0
        )

    def test_embedding_decontaminate_self_similarity_floor(self, spark, sf_dir):
        """Every benchmark vector's candidates bound max_sim to [-1, 1] and
        flagged counts never exceed candidates."""
        from hepop_spark.queries.llm10 import embedding_decontaminate

        rows = embedding_decontaminate(spark, sf_dir).collect()
        assert len(rows) == 10
        assert all(r.n_contaminated <= r.n_candidates for r in rows)
        assert all(-1.0 <= r.max_sim <= 1.0 for r in rows)


class TestDiscoveryFingerprintCache:
    def test_cache_skips_reregistration_until_files_change(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from hepop_spark.catalog import discover_table
        from hepop_spark.storage.writer import write_partitioned

        data = tmp_path / "data"
        ts = F.timestamp_micros(F.lit(1_709_290_800_000_000))
        df = spark.createDataFrame([(1, 1.0)], "event_id long, v double")
        write_partitioned(df.withColumn("timestamp", ts), str(data / "w1" / "dbs" / "cnt"))
        cache: dict = {}
        assert discover_table(spark, str(data), "cnt", cache=cache)
        fp1 = cache["cnt"]
        assert spark.table("cnt").count() == 1
        # unchanged files -> same fingerprint, registration skipped (still True)
        assert discover_table(spark, str(data), "cnt", cache=cache)
        assert cache["cnt"] == fp1
        # new data lands -> fingerprint changes and the view refreshes
        df2 = spark.createDataFrame([(2, 2.0)], "event_id long, v double")
        write_partitioned(df2.withColumn("timestamp", ts), str(data / "w1" / "dbs" / "cnt"))
        assert discover_table(spark, str(data), "cnt", cache=cache)
        assert cache["cnt"] != fp1
        assert spark.table("cnt").count() == 2


class TestClosingBatchInvariants:
    def test_association_rules_bounds(self, spark, sf_dir):
        from hepop_spark.queries.analytics18 import association_rules_brand

        rows = association_rules_brand(spark, sf_dir).collect()
        assert rows, "expected at least one rule at min support"
        for r in rows:
            # support <= confidence (n_a <= n_orders) and sane ranges
            assert r.support_e6 <= r.conf_e6
            assert 0 < r.support_e6 <= 1_000_000
            assert 0 < r.conf_e6 <= 1_000_000
            assert r.brand_a < r.brand_b

    def test_pca_unit_norm_and_bounds(self, spark, sf_dir):
        from hepop_spark.queries.analytics18 import PCA_Q, pca_power_iteration

        rows = pca_power_iteration(spark, sf_dir).collect()
        assert len(rows) == 64
        n2 = sum(r.v_e4 * r.v_e4 for r in rows)
        # unit vector on the 1e4 grid: norm^2 within quantization slack
        assert abs(n2 - PCA_Q * PCA_Q) < 64 * PCA_Q  # |2*v*eps| <= 64 dims * 1e4
        assert all(abs(r.v_e4) <= PCA_Q for r in rows)

    def test_time_split_leak_bounds(self, spark, sf_dir):
        from hepop_spark.queries.analytics18 import time_split_leakage_audit

        for r in time_split_leakage_audit(spark, sf_dir).collect():
            assert r.embargo_leak_users <= min(r.train_users, r.test_users)
            assert r.n_train_rows + r.n_test_rows > 0

    def test_maxsim_bounds_and_agreement_consistency(self, spark, sf_dir):
        from hepop_spark.queries.analytics18 import (
            MAXSIM_SUB,
            maxsim_late_interaction,
            maxsim_vs_cosine_agreement,
        )

        ms = maxsim_late_interaction(spark, sf_dir).collect()
        assert {r.q_id for r in ms} == set(range(10))
        for r in ms:
            # sum of 8 per-part cosines, each in [-1, 1], 1e4-quantized
            assert abs(r.maxsim_e4) <= MAXSIM_SUB * 10_000 + MAXSIM_SUB
        ag = maxsim_vs_cosine_agreement(spark, sf_dir).collect()
        assert len(ag) == 10
        for r in ag:
            assert 0 <= r.overlap5 <= 5
            assert r.top1_agree in (0, 1)
            # jaccard consistent with overlap: j = o / (10 - o) on top-5 sets
            expected = int(r.overlap5 * 10000.0 / (10 - r.overlap5) + 0.5) if r.overlap5 else 0
            assert r.jaccard_e4 == expected

    def test_cond_entropy_nonnegative(self, spark, sf_dir):
        from hepop_spark.queries.analytics18 import ngram_cond_entropy

        for r in ngram_cond_entropy(spark, sf_dir).collect():
            # 0 <= H(w2|w1) <= H(w1,w2); tiny negative slack for rounding
            assert r.h_cond >= -0.0002
            assert r.h_cond <= r.h_joint + 0.0002


class TestThirdEngineReplays:
    """Independent numpy/pandas reimplementations — a third engine beside
    Spark and DuckDB, so a shared misreading of the spec in the SQL pair
    can't self-confirm."""

    def test_pca_matches_numpy_grid_replay(self, spark, sf_dir):
        import numpy as np

        from hepop_spark.queries.analytics18 import PCA_Q, pca_power_iteration

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        X = np.array([list(r.embedding) for r in emb], dtype=np.float64)
        Xq = np.floor(X * PCA_Q + 0.5).astype(np.int64)

        def step(vq):
            s = (Xq * vq[None, :]).sum(axis=1)             # exact ints
            w = (Xq * s[:, None]).sum(axis=0)              # exact ints
            nrm = float(np.sqrt(np.sum(np.square(w.astype(np.float64)))))
            return np.floor(w.astype(np.float64) / (nrm or 1.0) * PCA_Q + 0.5).astype(
                np.int64
            )

        v = np.full(Xq.shape[1], PCA_Q, dtype=np.int64)
        v = step(step(v))
        got = {r.d: r.v_e4 for r in pca_power_iteration(spark, sf_dir).collect()}
        want = {d: int(v[d]) for d in range(Xq.shape[1])}
        assert got == want

    def test_association_rules_match_pandas_bruteforce(self, spark, sf_dir):
        import math

        from hepop_spark.queries.analytics18 import (
            RULE_MIN_SUPPORT,
            RULE_TOP,
            association_rules_brand,
        )

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_partkey"
        ).collect()
        part = {
            r.p_partkey: r.p_brand
            for r in spark.read.parquet(f"{sf_dir}/part.parquet").collect()
        }
        baskets: dict[int, set[str]] = {}
        for r in li:
            baskets.setdefault(r.l_orderkey, set()).add(part[r.l_partkey])
        n_orders = len(baskets)
        from collections import Counter

        brand_n: Counter = Counter()
        pair_n: Counter = Counter()
        for bs in baskets.values():
            for x in bs:
                brand_n[x] += 1
            sb = sorted(bs)
            for i in range(len(sb)):
                for j in range(i + 1, len(sb)):
                    pair_n[(sb[i], sb[j])] += 1
        rules = []
        for (a, b), nab in pair_n.items():
            if nab < RULE_MIN_SUPPORT:
                continue
            rules.append(
                (
                    a, b, nab,
                    math.floor(nab * 1_000_000.0 / n_orders + 0.5),
                    math.floor(nab * 1_000_000.0 / brand_n[a] + 0.5),
                    math.floor(nab * n_orders * 1_000_000.0 / (brand_n[a] * brand_n[b]) + 0.5),
                )
            )
        rules.sort(key=lambda t: (-t[5], t[0], t[1]))
        want = rules[:RULE_TOP]
        got = [tuple(r) for r in association_rules_brand(spark, sf_dir).collect()]
        assert got == want

    def test_winnowing_matches_numpy_replay(self, spark, sf_dir):
        import hashlib

        from hepop_spark.queries.llm10 import (
            WIN_GRAM,
            WIN_WINDOW,
            winnowing_fingerprints,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        ).collect()
        want = {}
        for r in docs:
            toks = r.text.split(" ")
            grams = [
                " ".join(toks[i : i + WIN_GRAM])
                for i in range(len(toks) - WIN_GRAM + 1)
            ] if len(toks) >= WIN_GRAM else []
            hs = [
                int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams
            ]
            sel = {
                min(hs[i : i + WIN_WINDOW])
                for i in range(0, len(hs) - WIN_WINDOW + 1)
            }
            n_fp = len(sel)
            want[r.doc_id] = (
                len(hs),
                n_fp,
                int(n_fp * 10000.0 / len(hs) + 0.5) if hs else 0,
            )
        got = {
            r.doc_id: (r.n_grams, r.n_fp, r.keep_ratio_e4)
            for r in winnowing_fingerprints(spark, sf_dir).collect()
        }
        assert got == want
