"""Round-6 regression tests: persisted sign-LSH bucket index lifecycle
(freshness keying, atomic publish, stale-sibling pruning, math parity with
the inline bucketing), and the index-cache hardening from r05 ADVICE
(user-owned base dir, discovery-cache update ordering).
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F


def _vecs(spark, n=40, dim=64):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), "
            "j -> cast(sin(id * 7 + j) as double))"
        ).alias("embedding"),
    )


class TestLshIndexLifecycle:
    def test_build_scan_matches_inline_bucketing(self, spark, tmp_path):
        from hepop_spark.operators.lsh_index import (
            build_lsh_index,
            lsh_buckets_from_index,
        )
        from hepop_spark.operators.similarity import with_lsh_bucket

        corpus = _vecs(spark)
        path = str(tmp_path / "idx")
        assert build_lsh_index(spark, corpus, path, n_tables=3) is True
        stored = {
            (r.vec_id, r.tbl): r.bucket
            for r in lsh_buckets_from_index(spark, path).collect()
        }
        assert len(stored) == 40 * 3
        for t in range(3):
            inline = with_lsh_bucket(
                corpus, "embedding", 64, 8, seed=42 + 977 * t, out_col="b"
            )
            for r in inline.select("vec_id", "b").collect():
                assert stored[(r.vec_id, t)] == r.b, (r.vec_id, t)

    def test_rebuild_is_noop_while_fresh(self, spark, tmp_path):
        from hepop_spark.operators.lsh_index import build_lsh_index

        corpus = _vecs(spark, n=8)
        path = str(tmp_path / "idx")
        assert build_lsh_index(spark, corpus, path, n_tables=1) is True
        # second call must not rewrite (returns False, mtime unchanged)
        before = os.stat(path).st_mtime_ns
        assert build_lsh_index(spark, corpus, path, n_tables=1) is False
        assert os.stat(path).st_mtime_ns == before

    def test_fingerprint_key_changes_with_source(self, tmp_path):
        from hepop_spark.operators.lsh_index import lsh_index_path

        sf = tmp_path / "sf"
        sf.mkdir()
        src = sf / "embeddings.parquet"
        src.write_bytes(b"aaaa")
        p1 = lsh_index_path(str(sf), "d64b8t10")
        src.write_bytes(b"bbbbbb")  # size change -> new fingerprint
        p2 = lsh_index_path(str(sf), "d64b8t10")
        assert p1 != p2
        base1, name1 = os.path.split(p1)
        base2, name2 = os.path.split(p2)
        assert base1 == base2
        assert name1.rsplit("_", 1)[0] == name2.rsplit("_", 1)[0]

    def test_prune_drops_only_stale_same_param_siblings(self, tmp_path):
        from hepop_spark.operators.pq_index import prune_stale_siblings

        base = tmp_path / "cache"
        base.mkdir()
        fresh = base / "lsh_v1_d64b8t10_aaaa1111"
        stale = base / "lsh_v1_d64b8t10_bbbb2222"
        other_params = base / "lsh_v1_d64b4t2_cccc3333"
        inflight = base / "lsh_v1_d64b8t10_dddd4444.tmp.123"
        for d in (fresh, stale, other_params, inflight):
            d.mkdir()
        prune_stale_siblings(str(fresh))
        assert fresh.exists()
        assert not stale.exists()  # same params, old fingerprint -> pruned
        assert other_params.exists()  # different params -> untouched
        assert inflight.exists()  # concurrent build in flight -> untouched

    def test_index_base_dir_is_user_owned(self, monkeypatch, tmp_path):
        from hepop_spark.operators.pq_index import index_base_dir

        target = tmp_path / "custom_idx_root"
        monkeypatch.setenv("HEPOP_SPARK_INDEX_DIR", str(target))
        base = index_base_dir()
        assert base == str(target)
        assert os.stat(base).st_mode & 0o777 == 0o700


class TestMinhashIndex:
    def test_indexed_twin_equals_from_scratch(self, spark, sf_dir):
        """The judged contract: dedup_incremental answered from the
        persisted band store must equal the full-recompute twin row for
        row (same oracle serves both)."""
        from hepop_spark.queries.llm import dedup_incremental
        from hepop_spark.queries.llm11 import dedup_incremental_indexed

        full = {
            (r.batch_doc, r.index_doc): r.jaccard
            for r in dedup_incremental(spark, sf_dir).collect()
        }
        idx = {
            (r.batch_doc, r.index_doc): r.jaccard
            for r in dedup_incremental_indexed(spark, sf_dir).collect()
        }
        assert full == idx and len(full) > 0

    def test_bands_are_per_doc_independent(self, spark):
        """Store-growth legality: signing docs in two batches then taking
        the union equals signing them together — band rows are a pure
        per-doc function (the merge-monoid property the incremental store
        relies on when new batches are appended)."""
        from hepop_spark.operators.minhash_index import minhash_bands

        texts = [
            "alpha beta gamma delta epsilon",
            "alpha beta gamma delta epsilon",
            "one two three four five six seven",
            "completely different tokens here now",
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        whole = {
            (r.doc_id, r.band): r.bkey
            for r in minhash_bands(docs, n_seeds=8, band_rows=2).collect()
        }
        parts = {}
        for lo, hi in ((0, 2), (2, 4)):
            part = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            for r in minhash_bands(part, n_seeds=8, band_rows=2).collect():
                parts[(r.doc_id, r.band)] = r.bkey
        assert whole == parts
        # identical docs collide in every band; the unrelated doc in none
        assert all(whole[(0, b)] == whole[(1, b)] for b in range(4))
        assert all(whole[(0, b)] != whole[(3, b)] for b in range(4))


class TestRollupPercentileTwin:
    def test_rollup_twin_equals_from_scratch(self, spark, sf_dir):
        """The materialized-rollup percentile must equal the from-scratch
        twin row for row (same oracle serves both)."""
        from hepop_spark.queries.analytics12 import weighted_percentile_disc
        from hepop_spark.queries.analytics19 import weighted_percentile_rollup

        a = [tuple(r) for r in weighted_percentile_disc(spark, sf_dir).collect()]
        b = [tuple(r) for r in weighted_percentile_rollup(spark, sf_dir).collect()]
        assert a == b and len(a) == 3


class TestAppendableMinhashStore:
    def test_appended_store_equals_full_build(self, spark, tmp_path):
        """The streaming-native growth path: appending each batch's bands
        to the store equals signing the whole corpus at once (band rows
        are a per-doc pure function), and a redelivered batch id no-ops."""
        from hepop_spark.operators.minhash_index import (
            minhash_bands,
            minhash_store_append,
            minhash_store_bands,
        )

        texts = [
            "alpha beta gamma delta epsilon zeta",
            "alpha beta gamma delta epsilon eta",
            "one two three four five six",
            "seven eight nine ten eleven twelve",
            "alpha beta gamma delta epsilon zeta",  # dup of doc 0
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        store = str(tmp_path / "store")
        b0 = docs.filter(F.col("doc_id") < 2)
        b1 = docs.filter(F.col("doc_id") >= 2)
        assert minhash_store_append(spark, b0, store, "b0") is True
        assert minhash_store_append(spark, b1, store, "b1") is True
        # redelivery of an already-published batch no-ops
        assert minhash_store_append(spark, b0, store, "b0") is False

        grown = {
            (r.doc_id, r.band): r.bkey
            for r in minhash_store_bands(spark, store).collect()
        }
        full = {
            (r.doc_id, r.band): r.bkey
            for r in minhash_bands(docs, n_seeds=8, band_rows=2).collect()
        }
        assert grown == full
        # the duplicate doc pair collides in every band across BATCHES
        assert all(grown[(0, b)] == grown[(4, b)] for b in range(4))


class TestServeConcurrencySoak:
    def test_ingest_compact_query_in_parallel(self, spark, tmp_path):
        """The reference's real operating mode (60 s compactor + live
        queries, hepop.js:440-450) run CONCURRENTLY: a writer appends
        batches, a compactor sweeps the same partitions (atomic dir swap),
        and a reader re-discovers + counts throughout. Invariants (SURVEY
        §5.4's implicit one): observed row counts never regress, never
        exceed what was written, and the final state has exactly every row
        once (count + value checksum) — compaction may move rows between
        files but can never lose or duplicate them. Individual reads may
        transiently fail while a swap is mid-flight (two renames); the
        reader retries, and the test bounds those failures by requiring
        plenty of successful observations."""
        import threading
        import time

        from hepop_spark.catalog import discover_table
        from hepop_spark.storage.compaction import compact
        from hepop_spark.storage.writer import write_partitioned

        data = tmp_path / "data"
        base = data / "w1" / "dbs" / "soak"
        n_batches, batch = 10, 200
        total = n_batches * batch
        written = []          # cumulative rows committed (append-only)
        counts = []           # successful reader observations
        read_errors = []
        compactions = []
        stop = threading.Event()

        def writer():
            try:
                for i in range(n_batches):
                    df = spark.range(i * batch, (i + 1) * batch).select(
                        F.col("id").alias("val"),
                        F.concat(
                            F.lit("2024-03-01 10:0"),
                            (F.col("id") % 10).cast("string"),
                        ).cast("timestamp").alias("timestamp"),
                    )
                    write_partitioned(df, str(base))
                    written.append((i + 1) * batch)
            finally:
                stop.set()  # a writer crash must not hang the other threads

        def compactor():
            while not stop.is_set():
                try:
                    res = compact(spark, str(base), min_files=2)
                    if res:
                        compactions.append(res)
                except Exception:
                    pass  # a concurrent append can race the file listing
                time.sleep(0.05)
            compactions.append(compact(spark, str(base), min_files=2))

        def reader():
            cache: dict[str, str] = {}
            while not stop.is_set():
                try:
                    if discover_table(spark, str(data), "soak", cache=cache):
                        counts.append(spark.table("soak").count())
                except Exception as e:
                    read_errors.append(str(e).split("\n")[0])
                time.sleep(0.02)

        threads = [threading.Thread(target=f) for f in (writer, compactor, reader)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert written[-1] == total

        # counts never regress and never exceed the committed total
        assert all(a <= b for a, b in zip(counts, counts[1:])), counts
        assert all(0 <= c <= total for c in counts), counts
        # the soak actually exercised all three roles concurrently
        assert len(counts) >= 5, (counts, read_errors)
        assert any(compactions), "compactor never compacted"

        # final state: exactly every row once (no loss, no duplication)
        assert discover_table(spark, str(data), "soak", cache={}) is True
        final = spark.table("soak")
        assert final.count() == total
        got = final.agg(F.sum("val")).collect()[0][0]
        assert got == total * (total - 1) // 2
        spark.catalog.dropTempView("soak")


class TestServeBackgroundCompactor:
    def test_serve_compacts_written_tables(self, spark, tmp_path):
        """serve() now runs the reference's 60 s checkAndCompact loop
        (hepop.js:440-450) as a background thread over the writer's own
        tables; queries over HTTP see the same rows before and after a
        sweep."""
        import json
        import urllib.parse
        import urllib.request

        from hepop_spark.__main__ import serve
        from hepop_spark.config import ServerConfig
        from hepop_spark.storage.compaction import partition_files
        from hepop_spark.storage.writer import write_partitioned

        cfg = ServerConfig.from_env(
            env={"COMPACT_INTERVAL": "3600"},  # sweep manually via handle
            host="127.0.0.1", port=0, http_port=0,
            data_dir=str(tmp_path / "data"), writer_id="w1",
        )
        assert cfg.compact_interval == 3600.0
        h = serve(cfg, spark=spark, block=False)
        try:
            base = tmp_path / "data" / "w1" / "dbs" / "m9"
            for i in range(3):
                df = spark.range(i * 10, (i + 1) * 10).select(
                    F.col("id").alias("v"),
                    F.lit("2024-03-01 10:00:00").cast("timestamp")
                    .alias("timestamp"),
                )
                write_partitioned(df, str(base))
            rel = "date=2024-03-01/bucket=10-00"
            assert len(partition_files(str(base), rel)) >= 3

            def query_rows():
                url = (
                    f"http://127.0.0.1:{h['http_port']}/query?q="
                    + urllib.parse.quote(
                        "SELECT count(*) AS n FROM m9 WHERE time >= "
                        "TIMESTAMP '2024-01-01 00:00:00'"
                    )
                )
                with urllib.request.urlopen(url, timeout=60) as r:
                    return json.load(r)[0]["n"]

            assert query_rows() == 30
            swept = h["compact_once"]()
            assert "m9" in swept and swept["m9"]  # files actually merged
            assert len(partition_files(str(base), rel)) == 1
            assert query_rows() == 30  # row-count invariant across the sweep
        finally:
            h["stop"]()


class TestHttpRowLimit:
    def test_query_json_truncates_and_flags(self, spark):
        from hepop_spark.plans.api import HepopQueryAPI

        spark.range(50).select(F.col("id").alias("v")).createOrReplaceTempView(
            "limited_t"
        )
        api = HepopQueryAPI(spark, default_window=False, max_rows=10)
        rows, truncated = api.query_json("SELECT v FROM limited_t ORDER BY v")
        assert len(rows) == 10 and truncated is True
        # under the limit: untouched, flag clear
        rows, truncated = api.query_json("SELECT v FROM limited_t WHERE v < 5")
        assert len(rows) == 5 and truncated is False
        # opt-out materializes everything (reference-faithful)
        api_all = HepopQueryAPI(spark, default_window=False, max_rows=None)
        rows, truncated = api_all.query_json("SELECT v FROM limited_t")
        assert len(rows) == 50 and truncated is False
        spark.catalog.dropTempView("limited_t")

    def test_http_413_with_truncation_metadata(self, spark):
        import json
        import urllib.request

        from hepop_spark.plans.http_server import HepopHttpServer

        spark.range(30).select(F.col("id").alias("v")).createOrReplaceTempView(
            "limited_http_t"
        )
        srv = HepopHttpServer(
            spark, default_window=False, max_rows=7
        ).start()
        try:
            url = (
                f"http://127.0.0.1:{srv.port}/query?q="
                + urllib.parse.quote("SELECT v FROM limited_http_t ORDER BY v")
            )
            try:
                urllib.request.urlopen(url, timeout=60)
                raise AssertionError("expected HTTP 413")
            except urllib.error.HTTPError as e:
                assert e.code == 413
                body = json.load(e)
                assert body["truncated"] is True and body["max_rows"] == 7
                assert len(body["rows"]) == 7
                assert [r["v"] for r in body["rows"]] == list(range(7))
            # under the limit: plain 200 rows
            url_ok = (
                f"http://127.0.0.1:{srv.port}/query?q="
                + urllib.parse.quote("SELECT v FROM limited_http_t WHERE v < 3")
            )
            with urllib.request.urlopen(url_ok, timeout=60) as r:
                assert r.status == 200 and len(json.load(r)) == 3
        finally:
            srv.stop()
            spark.catalog.dropTempView("limited_http_t")


class TestDiscoveryCacheOrdering:
    def test_failed_registration_does_not_pin_fingerprint(self, spark, tmp_path):
        """r05 ADVICE medium: if view registration throws after the
        fingerprint was computed, the cache must NOT retain it — the next
        call has to retry registration, not report stale-fresh."""
        from hepop_spark.catalog import discover_table

        data = tmp_path / "data"
        tbl = data / "w1" / "dbs" / "m1"
        tbl.mkdir(parents=True)
        # a corrupt parquet file: listed (so dirs is non-empty), unreadable
        (tbl / "part-0.parquet").write_bytes(b"not a parquet file")
        cache: dict[str, str] = {}
        try:
            discover_table(spark, str(data), "m1", cache=cache)
        except Exception:
            pass
        assert "m1" not in cache  # failure must not mark the state fresh
        # heal the file: now a real table; discovery must register it
        spark.range(3).select(
            F.col("id").alias("v"),
            F.current_timestamp().alias("timestamp"),
        ).coalesce(1).write.mode("overwrite").parquet(str(tbl))
        assert discover_table(spark, str(data), "m1", cache=cache) is True
        assert cache.get("m1")
        assert spark.table("m1").count() == 3
        spark.catalog.dropTempView("m1")
