"""Operator-module tests: multimodal binary plumbing, LSH similarity
scale-path vs the brute-force baseline, and the judged-query registry
integrity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hepop_spark.catalog import load_table
from hepop_spark.operators.multimodal import (
    decode_image_features,
    frame_sample,
    media_metadata_stats,
)
from hepop_spark.operators.similarity import (
    ivf_topk,
    lsh_topk,
    sq8_topk,
    with_lsh_bucket,
)
from hepop_spark.queries import registry
from hepop_spark.queries.llm import ann_cosine_topk


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, "image/png" if i % 2 == 0 else "image/jpeg",
         bytes([i % 251]) * (100 + i * 7), '{"camera":"x"}')
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "media_id long, mime string, payload binary, meta string"
    )


class TestMultimodal:
    def test_fake_decode_pipeline(self, spark, media):
        out = decode_image_features(media, fake=True).collect()
        assert len(out) == 20
        r = {row["media_id"]: row for row in out}
        assert all(len(row["features"]) == 16 for row in out)
        assert r[0]["n_bytes"] == 100
        # deterministic: same bytes -> same features
        again = {row["media_id"]: row for row in decode_image_features(media, fake=True).collect()}
        assert r[5]["features"] == again[5]["features"]

    def test_real_decode_stubbed(self, spark, media):
        with pytest.raises(Exception) as ei:
            decode_image_features(media, fake=False).collect()
        assert "NotImplementedError" in str(ei.value) or "real image decode" in str(ei.value)

    def test_frame_sample_explosion(self, spark, media):
        frames = frame_sample(media, every_n_bytes=64, max_frames=4).collect()
        by_id = {}
        for f_ in frames:
            by_id.setdefault(f_["media_id"], []).append(f_)
        assert all(1 <= len(v) <= 4 for v in by_id.values())
        assert all(f_["frame_idx"] < 4 for f_ in frames)

    def test_metadata_stats_prune_payload(self, spark, media):
        stats = media_metadata_stats(media)
        rows = {r["mime"]: r for r in stats.collect()}
        assert rows["image/png"]["n"] == 10


class TestLshSimilarity:
    def test_bucket_determinism(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        a = with_lsh_bucket(emb).select("vec_id", "lsh_bucket").collect()
        b = with_lsh_bucket(emb).select("vec_id", "lsh_bucket").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        buckets = {r["lsh_bucket"] for r in a}
        assert len(buckets) > 1, "all vectors hashed to one bucket"

    def test_lsh_recall_on_near_duplicates(self, spark):
        """Sign-LSH's contract: vectors with HIGH cosine land in the same
        bucket with high probability. (The sf testdata embeddings are
        near-random — max cosine ~0.5 — the regime where LSH legitimately
        prunes almost everything, so recall is tested on synthetic clusters
        with true near-duplicates.)"""
        import hashlib
        import struct as st_

        def vec(seed: str, dim: int = 64) -> list[float]:
            out = []
            for j in range(dim):
                h = hashlib.md5(f"{seed}:{j}".encode()).digest()
                (u,) = st_.unpack(">I", h[:4])
                out.append(u / 2**31 - 1.0)
            return out

        rows = []
        vid = 0
        for c in range(10):  # 10 clusters: one query + 3 near-dups + noise
            base = vec(f"c{c}")
            for k in range(4):
                noisy = [x + 0.02 * n for x, n in zip(base, vec(f"c{c}n{k}"))]
                rows.append((vid, [float(x) for x in noisy]))
                vid += 1
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        queries = emb.filter(F.col("vec_id") % 4 == 0)
        corpus = emb.filter(F.col("vec_id") % 4 != 0)
        got = lsh_topk(corpus, queries, top_k=3, multiprobe=True).collect()
        # each query must retrieve its own cluster's 3 near-duplicates
        by_q = {}
        for r in got:
            by_q.setdefault(r["q_id"], set()).add(r["c_id"])
        hits = sum(
            len(by_q.get(q, set()) & {q + 1, q + 2, q + 3}) for q in range(0, 40, 4)
        )
        assert hits / 30 >= 0.9, f"near-dup recall too low: {hits}/30"

    def test_lsh_prunes_on_random_vectors(self, spark, sf_dir):
        """On near-random embeddings the bucket join must score far fewer
        pairs than brute force — that's the point of the operator."""
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 10)
        corpus = emb.filter(F.col("vec_id") >= 10)
        approx = lsh_topk(corpus, queries, top_k=5, multiprobe=True).collect()
        assert len(approx) <= 50
        exact = {(r["q_id"], r["c_id"]) for r in ann_cosine_topk(spark, sf_dir).collect()}
        assert {r["q_id"] for r in approx} <= {q for q, _ in exact} or approx == []


class TestIvfSimilarity:
    def test_ivf_recall_on_clusters(self, spark):
        """IVF's contract: when the data HAS cluster structure, near
        neighbors share a cell. (The sf embeddings are near-random — the
        regime where any cell partition splits true neighbors — so recall
        is pinned on synthetic clusters, like the LSH test.)"""
        import hashlib
        import struct as st_

        def vec(seed: str, dim: int = 64) -> list[float]:
            out = []
            for j in range(dim):
                h = hashlib.md5(f"{seed}:{j}".encode()).digest()
                (u,) = st_.unpack(">I", h[:4])
                out.append(u / 2**31 - 1.0)
            return out

        rows = []
        vid = 0
        for c in range(10):  # 10 clusters: 1 query + 3 near-dups each
            base = vec(f"c{c}")
            for k in range(4):
                noise = vec(f"c{c}:n{k}")
                rows.append(
                    (vid, [b + 0.05 * n for b, n in zip(base, noise)])
                )
                vid += 1
        df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
        queries = df.filter(F.col("vec_id") % 4 == 0)
        corpus = df.filter(F.col("vec_id") % 4 != 0)
        got = ivf_topk(corpus, queries, n_cells=8, nprobe=2, top_k=3).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["q_id"], set()).add(r["c_id"])
        hits = sum(
            len(by_q.get(q, set()) & {q + 1, q + 2, q + 3}) for q in range(0, 40, 4)
        )
        assert hits / 30 >= 0.9, f"cluster recall too low: {hits}/30"

    def test_ivf_determinism_and_nprobe_monotonicity(self, spark, sf_dir):
        """On the near-random sf vectors: output bounded by top-k, identical
        across runs, and recall vs exact grows with nprobe (probing more
        cells can only add candidates)."""
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 10)
        corpus = emb.filter(F.col("vec_id") >= 10)
        exact = {}
        for r in ann_cosine_topk(spark, sf_dir).collect():
            exact.setdefault(r["q_id"], set()).add(r["c_id"])

        def recall(nprobe: int) -> float:
            ap = {}
            for r in ivf_topk(corpus, queries, n_cells=16, nprobe=nprobe,
                              top_k=5).collect():
                ap.setdefault(r["q_id"], set()).add(r["c_id"])
            hits = sum(len(ap.get(q, set()) & cs) for q, cs in exact.items())
            return hits / sum(len(cs) for cs in exact.values())

        a = ivf_topk(corpus, queries, n_cells=16, nprobe=4, top_k=5).collect()
        b = ivf_topk(corpus, queries, n_cells=16, nprobe=4, top_k=5).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert 0 < len(a) <= 50
        assert recall(8) >= recall(4)
        assert recall(16) == 1.0  # probing every cell IS brute force

    def test_seeded_codebook_no_global_sort(self, spark, sf_dir):
        """Production codebook mode (r02 verdict item 7): seeded sample()
        plans a Sample + CollectLimit — no TakeOrderedAndProject / Sort
        anywhere — while the md5 oracle mode IS TakeOrderedAndProject.
        End-to-end, the seeded IVF path stays a working index (every query
        gets k results; probing all cells is exact regardless of which
        vectors seeded the centroids)."""
        from hepop_spark.operators.similarity import codebook_df

        emb = load_table(spark, sf_dir, "embeddings")
        corpus = emb.filter(F.col("vec_id") >= 10)
        queries = emb.filter(F.col("vec_id") < 10)

        seeded_plan = codebook_df(
            corpus, "embedding", "vec_id", 16, "seeded"
        )._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" not in seeded_plan
        assert "Sort" not in seeded_plan
        md5_plan = codebook_df(
            corpus, "embedding", "vec_id", 16, "md5"
        )._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in md5_plan

        got = ivf_topk(corpus, queries, n_cells=16, nprobe=16, top_k=5,
                       codebook_sample="seeded").collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["q_id"], set()).add(r["c_id"])
        assert len(by_q) == 10 and all(len(v) == 5 for v in by_q.values())
        # nprobe == n_cells is brute force: recall 1.0 under ANY codebook
        exact = {}
        for r in ann_cosine_topk(spark, sf_dir).collect():
            exact.setdefault(r["q_id"], set()).add(r["c_id"])
        assert by_q == exact


class TestAudioWindows:
    def test_known_pcm_values(self, spark):
        from hepop_spark.operators.multimodal import audio_pcm_windows

        # constant signal of 3s and 4s: rms known exactly per window
        blob = bytes([3] * 8 + [4] * 8)
        df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, payload binary")
        rows = sorted(
            (r["win_idx"], r["n_samples"], r["rms"], r["peak"])
            for r in audio_pcm_windows(df, window=8, hop=4).collect()
        )
        # windows: [3]*8 rms=3; [3,3,3,3,4,4,4,4] rms=sqrt(12.5); [4]*8 rms=4;
        # tail [4]*4 rms=4
        assert rows[0] == (0, 8, 3.0, 3)
        assert rows[1] == (1, 8, round((12.5) ** 0.5, 4), 4)
        assert rows[2] == (2, 8, 4.0, 4)
        assert rows[3] == (3, 4, 4.0, 4)

    def test_signed_interpretation(self, spark):
        from hepop_spark.operators.multimodal import audio_pcm_windows

        blob = bytes([0x80, 0x7F])  # -128, 127 as int8
        df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, payload binary")
        (r,) = audio_pcm_windows(df, window=2, hop=2).collect()
        assert r["peak"] == 128
        assert r["rms"] == round(((128**2 + 127**2) / 2) ** 0.5, 4)


class TestSq8Similarity:
    def test_recall_vs_exact_and_determinism(self, spark, sf_dir):
        """64-dim SQ8 reconstruction is near-lossless, so the shortlist +
        exact rerank should recover the exact top-5 almost perfectly."""
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 10)
        corpus = emb.filter(F.col("vec_id") >= 10)
        exact = {}
        for r in ann_cosine_topk(spark, sf_dir).collect():
            exact.setdefault(r["q_id"], set()).add(r["c_id"])
        a = sq8_topk(corpus, queries, top_k=5, shortlist=50).collect()
        b = sq8_topk(corpus, queries, top_k=5, shortlist=50).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        ap: dict = {}
        for r in a:
            ap.setdefault(r["q_id"], set()).add(r["c_id"])
        hits = sum(len(ap.get(q, set()) & cs) for q, cs in exact.items())
        total = sum(len(cs) for cs in exact.values())
        assert hits / total >= 0.9, f"sq8 recall {hits}/{total}"


class TestRegistry:
    def test_unique_and_aligned(self):
        reg = registry()
        assert len(reg) >= 51
        for name, spec in reg.items():
            assert callable(spec.fn), name

    def test_oracle_sql_is_ansi_parseable_by_duckdb(self, sf_dir):
        import duckdb

        from hepop_spark import ALL_TABLES

        con = duckdb.connect()
        for t in ALL_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name, spec in registry().items():
            if spec.oracle is None:
                continue
            con.execute(f"EXPLAIN {spec.oracle}")  # parse+bind only
