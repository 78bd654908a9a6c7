"""Round-8 regression tests: the r07 ADVICE fixes (fold-then-redeliver
double count, training-batch redelivery, stale-listing misclassification,
408-vs-500 attribution, cached-batch leak) and the manifest-pinned serve
read path.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.parse
import urllib.request

import pyspark.sql.functions as F


def _vecs(spark, n=40, dim=64, id_col="c_id", vec_col="cv"):
    return spark.range(n).select(
        F.col("id").alias(id_col),
        F.expr(
            f"transform(sequence(0, {dim - 1}), "
            "j -> cast(sin(id * 7 + j) as double))"
        ).alias(vec_col),
    )


class TestProjectionFoldRedelivery:
    def test_batch_redelivered_after_fold_still_noops(self, spark, tmp_path):
        """r07 ADVICE item 1: projection_compact folds seg_<id>/ dirs into
        base/, erasing the per-batch idempotency markers. A batch
        redelivered AFTER the fold (crash between hook effect and
        streaming checkpoint commit, serve sweep folds in between) must
        still no-op — the folded ids live on in _folded.json."""
        from hepop_spark.storage.rollup import (
            projection_append,
            projection_compact,
            projection_scan,
        )

        store = str(tmp_path / "store")
        part = spark.createDataFrame([(0, 10), (1, 20)], "k long, v long")
        assert projection_append(spark, store, part, "b0") is True
        assert projection_append(spark, store, part, "b1") is True
        assert projection_compact(spark, store, ["k"], ["v"]) is True
        # folded seg dirs persist on disk for the vacuum grace (readers
        # pinned to the pre-fold view must finish), but leave the LIVE view
        from hepop_spark.storage.rollup import (
            _projection_segments,
            projection_vacuum,
        )

        assert not any(
            os.path.basename(s).startswith("seg_")
            for s in _projection_segments(store)
        ), "fold left segments in the live view"
        removed = projection_vacuum(store, grace_s=0)
        assert any(n.startswith("seg_") for n in removed)
        assert not any(e.startswith("seg_") for e in os.listdir(store))
        # the redelivered batch must not double-count
        assert projection_append(spark, store, part, "b0") is False
        got = {
            (r.k, r.v)
            for r in projection_scan(spark, store, ["k"], ["v"]).collect()
        }
        assert got == {(0, 20), (1, 40)}

    def test_fold_crash_keeps_markers_consistent(self, spark, tmp_path,
                                                 monkeypatch):
        """A fold that fails AFTER recording folded ids but BEFORE
        retiring segments restores cleanly: appends still no-op (both via
        the surviving seg dirs and the manifest), scans are unchanged."""
        from hepop_spark.storage import rollup
        from hepop_spark.storage.rollup import (
            projection_append,
            projection_compact,
            projection_scan,
        )

        store = str(tmp_path / "store")
        part = spark.createDataFrame([(0, 5)], "k long, v long")
        projection_append(spark, store, part, "b0")
        projection_append(spark, store, part, "b1")

        real_rename = os.rename

        def failing_rename(src, dst):
            if os.path.basename(dst).startswith("base_v"):
                raise OSError("injected swap failure")
            return real_rename(src, dst)

        monkeypatch.setattr(rollup.os, "rename", failing_rename)
        assert projection_compact(spark, store, ["k"], ["v"]) is False
        monkeypatch.setattr(rollup.os, "rename", real_rename)
        assert projection_append(spark, store, part, "b0") is False
        got = {(r.k, r.v)
               for r in projection_scan(spark, store, ["k"], ["v"]).collect()}
        assert got == {(0, 10)}


class TestIvfpqTrainingRedelivery:
    def test_redelivered_training_batch_noops(self, spark, tmp_path):
        """r07 ADVICE item 2: the index publishing and the streaming
        checkpoint commit are separate effects; a crash between them
        redelivers the TRAINING batch to an existing index. The persisted
        trained-batch marker (written inside the staged dir, atomic with
        the publish) turns that into a no-op instead of a code segment
        duplicating every trained vector."""
        from hepop_spark.operators.pq_index import (
            _read_code_store,
            read_trained_marker,
        )
        from hepop_spark.streaming.index_maint import ivfpq_maintenance

        path = str(tmp_path / "idx")
        hook = ivfpq_maintenance(
            path, table="vecs", id_col="c_id", vec_col="cv",
            n_cells=4, m_sub=8, sub=8, k_codes=16,
        )
        b0 = _vecs(spark, n=20)
        hook("vecs", b0, 0)
        assert read_trained_marker(path) == "b0"
        n_before = _read_code_store(spark, path).count()
        assert n_before == 20
        # crash-redelivery of batch 0: must not append codes_b0
        hook("vecs", b0, 0)
        assert not os.path.isdir(os.path.join(path, "codes_b0"))
        assert _read_code_store(spark, path).count() == 20
        # a genuinely new batch still appends
        b1 = spark.range(20, 25).select(
            F.col("id").alias("c_id"),
            F.expr("transform(sequence(0, 63), "
                   "j -> cast(sin(id * 7 + j) as double))").alias("cv"),
        )
        hook("vecs", b1, 1)
        assert _read_code_store(spark, path).count() == 25


class TestStaleListingClassifier:
    def test_missing_table_is_not_a_compaction_race(self, spark, tmp_path):
        """r07 ADVICE item 3: a missing-table/missing-path error must
        surface immediately, not retry 4x with fingerprint invalidation."""
        from hepop_spark.plans.api import (
            HepopQueryAPI,
            _is_stale_listing_error,
        )

        assert not _is_stale_listing_error(
            Exception("[TABLE_OR_VIEW_NOT_FOUND] The table or view "
                      "`nope` cannot be found... does not exist")
        )
        assert not _is_stale_listing_error(
            OSError("No such file or directory: '/gone'")
        )
        assert _is_stale_listing_error(
            Exception("java.io.FileNotFoundException: File file:/x.parquet "
                      "does not exist ... REFRESH TABLE")
        )
        api = HepopQueryAPI(spark, default_window=False,
                            data_dir=str(tmp_path))
        calls = {"n": 0}
        real = api._run_json

        def counting(q, now):
            calls["n"] += 1
            return real(q, now)

        api._run_json = counting
        try:
            api.query_json("SELECT 1 FROM definitely_absent_t8")
        except Exception:
            pass
        else:
            raise AssertionError("missing table should raise")
        assert calls["n"] == 1, f"retried {calls['n']} times"


class TestTimeoutAttribution:
    def test_unrelated_cancelled_message_is_500_not_408(self, spark):
        """r07 ADVICE item 4: only a watchdog that actually FIRED may
        answer 408; an unrelated failure whose message contains
        'cancelled' is a plain 500."""
        from hepop_spark.plans.http_server import HepopHttpServer

        spark.range(1).createOrReplaceTempView("t8_cancel_msg")
        srv = HepopHttpServer(spark, default_window=False,
                              query_timeout_s=300.0).start()
        try:
            sql = ("SELECT assert_true(id > 0, 'operation cancelled by peer')"
                   " FROM t8_cancel_msg")
            url = (f"http://127.0.0.1:{srv.port}/query?q="
                   + urllib.parse.quote(sql))
            try:
                with urllib.request.urlopen(url, timeout=120) as r:
                    raise AssertionError(f"expected failure, got {r.status}")
            except urllib.error.HTTPError as e:
                body = json.load(e)
                assert e.code == 500, (e.code, body)
                assert "timeout" not in body
        finally:
            srv.stop()


class TestTableSinkUnpersist:
    def test_failed_hook_does_not_leak_cached_batch(self, spark, tmp_path):
        """r07 ADVICE item 5: the designed crash-redelivery path (hook
        raises) must not leave the micro-batch pinned in storage memory."""
        from hepop_spark.streaming.index_maint import table_sink

        def cached_ids():
            it = (spark.sparkContext._jsc.sc()
                  .getPersistentRDDs().keysIterator())
            ids = set()
            while it.hasNext():
                ids.add(it.next())
            return ids

        before = cached_ids()  # other suite tests may own live caches
        src_dir = tmp_path / "src"
        src_dir.mkdir()
        spark.range(5).select(F.col("id").alias("doc_id")).coalesce(1) \
            .write.parquet(str(src_dir / "b0.parquet"))
        stream = spark.readStream.schema("doc_id long").parquet(str(src_dir))

        def bomb(table, rows, batch_id):
            raise RuntimeError("injected hook crash")

        q = table_sink(
            stream, str(tmp_path / "data"), str(tmp_path / "ckpt"),
            "docs", index_hooks=[bomb],
        ).start()
        try:
            q.awaitTermination(120)
        except Exception:
            pass
        # every cached RDD from the failed attempt must be released
        leaked = cached_ids() - before
        assert not leaked, f"leaked cached RDD ids {sorted(leaked)}"


def _write_soak(spark, base, lo, hi, manifest=None):
    from hepop_spark.storage.writer import write_partitioned

    ts = F.lit("2024-03-01 10:00:00").cast("timestamp")
    write_partitioned(
        spark.range(lo, hi).select(F.col("id").alias("v"),
                                   ts.alias("timestamp")),
        str(base), manifest=manifest,
    )


class TestManifestLifecycle:
    def test_append_compact_vacuum_roundtrip(self, spark, tmp_path):
        """Appends publish versions; manifest-mode compaction retires
        instead of deleting; pinned reads see exactly the live set; vacuum
        reclaims expired bytes and empties nothing live."""
        from hepop_spark.storage.compaction import compact, partition_files
        from hepop_spark.storage.manifest import (
            latest,
            live_files,
            vacuum,
        )

        base = tmp_path / "t"
        _write_soak(spark, base, 0, 10, manifest=True)
        v1, man1 = latest(str(base))
        assert man1["files"] and not man1["retired"]
        _write_soak(spark, base, 10, 20)  # auto-publish: already enabled
        v2, man2 = latest(str(base))
        assert v2 > v1 and len(man2["files"]) > len(man1["files"])

        res = compact(spark, str(base))
        assert res, "partition should be eligible"
        live = live_files(str(base))
        assert len(live) == 1
        # old bytes still on disk (grace default), manifest marks retired
        rel = "date=2024-03-01/bucket=10-00"
        assert len(partition_files(str(base), rel)) > 1
        _v, man = latest(str(base))
        assert set(man["retired"]) == set(man2["files"])
        # the pinned read equals the data
        df = spark.read.option("basePath", str(base)).parquet(
            *[str(base / f) for f in live])
        assert df.count() == 20
        assert {r.v for r in df.collect()} == set(range(20))
        # vacuum with zero grace deletes retired bytes, keeps live
        removed = vacuum(str(base), grace_s=0)
        assert set(removed) == set(man["retired"])
        assert len(partition_files(str(base), rel)) == 1
        assert spark.read.parquet(str(base)).count() == 20

    def test_crashed_replace_rolls_back(self, spark, tmp_path):
        """A replace intent whose publish never happened is rolled back:
        the half-moved new files are deleted and the live set is the
        pre-replace one."""
        import json as _json

        from hepop_spark.storage.manifest import (
            latest,
            live_files,
            recover,
        )

        base = tmp_path / "t"
        _write_soak(spark, base, 0, 10, manifest=True)
        _v, man = latest(str(base))
        rel = "date=2024-03-01/bucket=10-00"
        stray = base / rel / "c_deadbeef_0.parquet"
        stray.write_bytes(b"not a parquet file")
        ipath = base / "_manifest" / "intent_deadbeef.json"
        ipath.write_text(_json.dumps(
            {"new": [f"{rel}/c_deadbeef_0.parquet"], "old": man["files"]}))
        actions = recover(str(base))
        assert list(actions.values()) == ["rolled-back"]
        assert not stray.exists()
        assert live_files(str(base)) == man["files"]
        assert spark.read.parquet(str(base)).count() == 10

    def test_committed_replace_intent_is_dropped(self, spark, tmp_path):
        import json as _json

        from hepop_spark.storage.compaction import compact
        from hepop_spark.storage.manifest import latest, recover

        base = tmp_path / "t"
        _write_soak(spark, base, 0, 10, manifest=True)
        _write_soak(spark, base, 10, 20)
        compact(spark, str(base))
        _v, man = latest(str(base))
        live_new = [f for f in man["files"] if "/c_" in f]
        ipath = base / "_manifest" / "intent_cafecafe.json"
        ipath.write_text(_json.dumps(
            {"new": live_new, "old": list(man["retired"])}))
        actions = recover(str(base))
        assert list(actions.values()) == ["committed"]
        assert not ipath.exists()
        assert spark.read.option("basePath", str(base)).parquet(
            *[str(base / f) for f in man["files"]]).count() == 20

    def test_ladder_manifest_mode(self, spark, tmp_path):
        """Re-bucketing in manifest mode: rows move to the hour bucket
        logically (live set), bytes linger until vacuum, results are
        invariant."""
        from hepop_spark.storage.compaction import compact_ladder
        from hepop_spark.storage.manifest import live_files, vacuum
        from hepop_spark.storage.writer import write_partitioned

        base = tmp_path / "t"
        df = spark.createDataFrame(
            [(1, "2024-03-01 10:05:00"), (2, "2024-03-01 10:25:00"),
             (3, "2024-03-01 10:45:00")], "v long, s string",
        ).select("v", F.col("s").cast("timestamp").alias("timestamp"))
        write_partitioned(df, str(base), manifest=True)
        res = compact_ladder(spark, str(base), level="hour")
        assert res == {"date=2024-03-01/bucket=10-00": 3}
        live = live_files(str(base))
        assert len(live) == 1 and live[0].startswith(
            "date=2024-03-01/bucket=10-00/")
        pinned = spark.read.option("basePath", str(base)).parquet(
            str(base / live[0]))
        assert {r.v for r in pinned.collect()} == {1, 2, 3}
        vacuum(str(base), grace_s=0)
        import os as _os

        assert not _os.path.isdir(str(base / "date=2024-03-01/bucket=10-10"))
        assert spark.read.parquet(str(base)).count() == 3

    def test_discover_table_pins_manifest_and_federates(self, spark, tmp_path):
        """A manifest-mode writer dir and a plain writer dir federate as
        one table; the manifest dir's rows come from the pinned live set,
        not a listing (retired duplicates are invisible)."""
        from hepop_spark.catalog import discover_table
        from hepop_spark.storage.compaction import compact

        data = tmp_path / "data"
        b1 = data / "w1" / "dbs" / "m"
        b2 = data / "w2" / "dbs" / "m"
        _write_soak(spark, b1, 0, 10, manifest=True)
        _write_soak(spark, b1, 10, 20)
        compact(spark, str(b1))  # retired bytes now on disk beside live
        _write_soak(spark, b2, 100, 105)  # legacy listing dir
        cache: dict = {}
        assert discover_table(spark, str(data), "m", cache=cache)
        got = {r.v for r in spark.table("m").select("v").collect()}
        assert got == set(range(20)) | set(range(100, 105))
        fp1 = cache["m"]
        # a new append bumps the manifest version -> cache invalidates
        _write_soak(spark, b1, 20, 25)
        assert discover_table(spark, str(data), "m", cache=cache)
        assert cache["m"] != fp1
        assert spark.table("m").count() == 30


class TestLshMaintenance:
    def test_append_idempotent_and_equals_build(self, spark, tmp_path):
        """r07 verdict item 2: the appendable sign-LSH store. Appending
        batches then scanning equals the one-shot build over the union;
        redelivered batch ids no-op."""
        from hepop_spark.operators.lsh_index import (
            bucket_exprs,
            lsh_store_append,
            lsh_store_scan,
        )

        store = str(tmp_path / "lsh")
        vecs = _vecs(spark, n=30, id_col="vec_id", vec_col="embedding")
        for b in range(3):
            batch = vecs.filter(F.col("vec_id") % 3 == b)
            assert lsh_store_append(
                spark, batch, store, f"b{b}", k_bits=4, n_tables=2) is True
        # redelivery no-ops
        assert lsh_store_append(
            spark, vecs, store, "b0", k_bits=4, n_tables=2) is False
        got = {
            (r.vec_id, r.tbl, r.bucket)
            for r in lsh_store_scan(spark, store)
            .select("vec_id", "tbl", "bucket").collect()
        }
        direct = vecs.select(
            F.col("vec_id"),
            F.posexplode(F.array(
                *bucket_exprs("embedding", 64, 4, 2))).alias("tbl", "bucket"),
        )
        want = {(r.vec_id, r.tbl, r.bucket) for r in direct.collect()}
        assert got == want and len(got) == 60


class TestRollupRouting:
    def _tree(self, spark, tmp_path):
        from hepop_spark.storage.rollup import projection_append

        data = str(tmp_path / "data")
        raw = spark.createDataFrame(
            [(i, ["en", "de", "fr"][i % 3], ["web", "book"][i % 2], 10 + i)
             for i in range(60)],
            "doc_id long, lang string, source string, n_chars long",
        )
        raw.write.mode("overwrite").parquet(
            os.path.join(data, "w1", "dbs", "docs_t8"))
        store = os.path.join(data, "w1", "rollups", "docs_t8_grid")
        for b in range(2):
            part = (
                raw.filter(F.col("doc_id") % 2 == b)
                .groupBy("lang", "source")
                .agg(F.count("*").alias("n"),
                     F.sum("n_chars").alias("chars"))
            )
            projection_append(
                spark, store, part, f"b{b}",
                keys=["lang", "source"], sums=["n", "chars"],
                source={"table": "docs_t8",
                        "keys": {"lang": "lang", "source": "source"},
                        "sums": {"n": "count(*)",
                                 "chars": "sum(n_chars)"}},
            )
        return data, raw

    def test_exact_and_subset_grouping_route(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data, raw = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        # subset of the grid keys -> re-aggregated grid
        rows, _ = api.query_json(
            "SELECT lang, count(*) AS n, sum(n_chars) AS chars "
            "FROM docs_t8 GROUP BY lang ORDER BY lang")
        assert api.last_routed_rollup == "docs_t8_grid"
        want = {
            (r.lang, r.n, r.chars)
            for r in raw.groupBy("lang").agg(
                F.count("*").alias("n"),
                F.sum("n_chars").alias("chars")).collect()
        }
        assert {(r["lang"], r["n"], r["chars"]) for r in rows} == want
        # exact grid keys -> straight rename off the merged view
        rows, _ = api.query_json(
            "SELECT lang, source, count() AS n FROM docs_t8 "
            "GROUP BY lang, source")
        assert api.last_routed_rollup == "docs_t8_grid"
        assert len(rows) == 6 and sum(r["n"] for r in rows) == 60

    def test_non_matching_shapes_fall_back_to_raw(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data, raw = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        for sql in (
            # WHERE on a measure column: the grid cannot answer it
            "SELECT lang, count(*) AS n FROM docs_t8 "
            "WHERE n_chars = 11 GROUP BY lang",
            # avg is not a declared monoid column
            "SELECT lang, avg(n_chars) AS a FROM docs_t8 GROUP BY lang",
            # grouping key outside the grid
            "SELECT doc_id % 7 AS k, count(*) AS n FROM docs_t8 "
            "GROUP BY doc_id % 7",
            # plain scan, no aggregate
            "SELECT doc_id, lang FROM docs_t8",
        ):
            rows, _ = api.query_json(sql)
            assert api.last_routed_rollup is None, sql
            assert rows, sql
        # the measure-filtered fallback is CORRECT, not just unrouted
        rows, _ = api.query_json(
            "SELECT lang, count(*) AS n FROM docs_t8 "
            "WHERE n_chars = 11 GROUP BY lang ORDER BY lang")
        assert api.last_routed_rollup is None
        want = {(r.lang, r.n)
                for r in raw.filter(F.col("n_chars") == 11)
                .groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert {(r["lang"], r["n"]) for r in rows} == want

    def test_default_window_blocks_routing_for_time_tables(
            self, spark, tmp_path):
        """With the serve default window ON, a time-bearing raw table's
        aggregate must NOT be widened to the all-time grid."""
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.rollup import projection_append
        from hepop_spark.storage.writer import write_partitioned

        data = str(tmp_path / "data")
        ts = F.lit("2024-03-01 10:00:00").cast("timestamp")
        raw = spark.range(20).select(
            F.col("id").alias("v"), (F.col("id") % 2).alias("k"),
            ts.alias("timestamp"))
        write_partitioned(raw, os.path.join(data, "w1", "dbs", "ev_t8"))
        store = os.path.join(data, "w1", "rollups", "ev_t8_grid")
        part = raw.groupBy("k").agg(F.count("*").alias("n"))
        projection_append(
            spark, store, part, "b0", keys=["k"], sums=["n"],
            source={"table": "ev_t8", "keys": {"k": "k"},
                    "sums": {"n": "count(*)"}})
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        rows, _ = api.query_json(
            "SELECT k, count(*) AS n FROM ev_t8 GROUP BY k")
        assert api.last_routed_rollup is None
        # raw rows are from 2024 -> outside the implicit window
        assert rows == []
        # same deployment, window off: routing applies
        api2 = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api2.query_json(
            "SELECT k, count(*) AS n FROM ev_t8 GROUP BY k")
        assert api2.last_routed_rollup == "ev_t8_grid"
        assert sorted((r["k"], r["n"]) for r in rows) == [(0, 10), (1, 10)]

    def test_filtered_aggregates_route_on_grid_keys(self, spark, tmp_path):
        """WHERE conjuncts on GRID KEYS route (equality and IN); filters
        on measure columns fall back to raw — both with correct results."""
        from hepop_spark.plans.api import HepopQueryAPI

        data, raw = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT source, count(*) AS n FROM docs_t8 "
            "WHERE lang = 'en' GROUP BY source ORDER BY source")
        assert api.last_routed_rollup == "docs_t8_grid"
        want = {(r.source, r.n)
                for r in raw.filter(F.col("lang") == "en")
                .groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert {(r["source"], r["n"]) for r in rows} == want
        # IN over two keys + both keys grouped
        rows, _ = api.query_json(
            "SELECT lang, source, sum(n_chars) AS chars FROM docs_t8 "
            "WHERE lang IN ('en', 'fr') AND source = 'web' "
            "GROUP BY lang, source")
        assert api.last_routed_rollup == "docs_t8_grid"
        want = {(r.lang, r.source, r.chars)
                for r in raw.filter(F.col("lang").isin("en", "fr")
                                    & (F.col("source") == "web"))
                .groupBy("lang", "source")
                .agg(F.sum("n_chars").alias("chars")).collect()}
        assert {(r["lang"], r["source"], r["chars"]) for r in rows} == want
        # filter on a MEASURE column: falls back to raw, still correct
        rows, _ = api.query_json(
            "SELECT lang, count(*) AS n FROM docs_t8 "
            "WHERE n_chars = 10 GROUP BY lang")
        assert api.last_routed_rollup is None
        want = {(r.lang, r.n)
                for r in raw.filter(F.col("n_chars") == 10)
                .groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert {(r["lang"], r["n"]) for r in rows} == want
        # r10: OR across GRID KEYS routes (key-only predicates are
        # constant per grid cell, so the tree rewrite is exact) — and
        # the routed result matches raw
        rows, _ = api.query_json(
            "SELECT lang, count(*) AS n FROM docs_t8 "
            "WHERE lang = 'en' OR source = 'web' GROUP BY lang")
        assert api.last_routed_rollup == "docs_t8_grid"
        want = {(r.lang, r.n)
                for r in raw.filter((F.col("lang") == "en")
                                    | (F.col("source") == "web"))
                .groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert {(r["lang"], r["n"]) for r in rows} == want
        # an OR touching a MEASURE column still falls back to raw
        rows, _ = api.query_json(
            "SELECT lang, count(*) AS n FROM docs_t8 "
            "WHERE lang = 'en' OR n_chars = 10 GROUP BY lang")
        assert api.last_routed_rollup is None


class TestJpegCodec:
    """r07 verdict item 4: pure-numpy baseline JFIF. The judged entry pins
    the exact-roundtrip fixture class; these tests pin the GENERAL decode
    paths (non-constant blocks, byte stuffing, restart markers, gray)."""

    def _q8(self):
        from hepop_spark.operators.jpeg import QUANT_CHROMA, QUANT_LUMA

        ql = QUANT_LUMA.copy()
        ql[0, 0] = 8
        qc = QUANT_CHROMA.copy()
        qc[0, 0] = 8
        return ql, qc

    def test_constant_blocks_roundtrip_exactly(self):
        import numpy as np

        from hepop_spark.operators.jpeg import (
            decode_baseline_jpeg,
            encode_baseline_jpeg,
            rgb_to_ycbcr,
            ycbcr_to_rgb,
        )

        ql, qc = self._q8()
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        for k, c in enumerate([(10, 200, 30), (250, 5, 128),
                               (66, 66, 66), (0, 255, 17)]):
            by, bx = divmod(k, 2)
            img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = c
        dec = decode_baseline_jpeg(encode_baseline_jpeg(img, ql, qc))
        assert np.array_equal(dec, ycbcr_to_rgb(rgb_to_ycbcr(img)))

    def test_smooth_gradient_error_bound(self):
        import numpy as np

        from hepop_spark.operators.jpeg import (
            decode_baseline_jpeg,
            encode_baseline_jpeg,
        )

        x = np.linspace(0, np.pi * 2, 32)
        img = (128 + 60 * np.sin(np.add.outer(x, x))).astype(np.uint8)
        dec = decode_baseline_jpeg(encode_baseline_jpeg(img))
        assert dec.shape == img.shape
        assert int(np.max(np.abs(dec.astype(int) - img.astype(int)))) <= 12

    def test_byte_stuffing_and_noise(self):
        """Seed 1 provably produces 0xFF bytes in the entropy stream
        (stuffed as FF00); the decoder must unstuff and still bound the
        reconstruction error of a noise image."""
        import numpy as np

        from hepop_spark.operators.jpeg import (
            decode_baseline_jpeg,
            encode_baseline_jpeg,
        )

        g = np.random.RandomState(1).randint(0, 256, (16, 16)).astype(np.uint8)
        data = encode_baseline_jpeg(g)
        assert b"\xff\x00" in data.split(b"\xff\xda")[1]
        dec = decode_baseline_jpeg(data)
        assert dec.shape == g.shape
        assert int(np.max(np.abs(dec.astype(int) - g.astype(int)))) <= 120

    def test_restart_markers_roundtrip(self):
        import numpy as np

        from hepop_spark.operators.jpeg import (
            decode_baseline_jpeg,
            encode_baseline_jpeg,
        )

        x = np.linspace(0, np.pi * 2, 32)
        img = (128 + 50 * np.cos(np.add.outer(x, 2 * x))).astype(np.uint8)
        plain = decode_baseline_jpeg(encode_baseline_jpeg(img))
        rst = encode_baseline_jpeg(img, restart_interval=2)
        assert any(bytes([0xFF, 0xD0 + i]) in rst.split(b"\xff\xda")[1]
                   for i in range(8))
        assert np.array_equal(decode_baseline_jpeg(rst), plain)

    def test_unsupported_shapes_fail_loudly(self):
        import numpy as np
        import pytest

        from hepop_spark.operators.jpeg import (
            decode_baseline_jpeg,
            encode_baseline_jpeg,
        )

        with pytest.raises(ValueError, match="SOI"):
            decode_baseline_jpeg(b"\x89PNG\r\n\x1a\n")
        # progressive SOF2 rejected: patch the SOF0 marker byte
        img = np.zeros((8, 8), dtype=np.uint8) + 100
        data = bytearray(encode_baseline_jpeg(img))
        data[data.index(b"\xff\xc0") + 1] = 0xC2
        with pytest.raises(ValueError, match="non-baseline"):
            decode_baseline_jpeg(bytes(data))


class TestPngCodec:
    """PNG joins the real-decode set (stdlib zlib IS the codec): exact
    lossless roundtrips across color types and every filter type, CRC
    enforcement, loud gates for unsupported shapes."""

    def test_roundtrips_exact_all_filters_and_color_types(self):
        import numpy as np

        from hepop_spark.operators.png import decode_png, encode_png

        rng = np.random.RandomState(7)
        rgb = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        for ft in (0, 1, 2, 3, 4):
            assert np.array_equal(decode_png(encode_png(rgb, ft)), rgb), ft
        assert np.array_equal(
            decode_png(encode_png(rgb, lambda y: y % 5)), rgb)
        gray = rng.randint(0, 256, (8, 12)).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(gray, 4)), gray)
        pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
        idx = rng.randint(0, 16, (8, 8)).astype(np.uint8)
        assert np.array_equal(
            decode_png(encode_png(idx, 3, palette=pal)), pal[idx])
        rgba = rng.randint(0, 256, (8, 8, 4)).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(rgba, 2)), rgba)
        ga = rng.randint(0, 256, (8, 8, 2)).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(ga, 1)), ga)

    def test_crc_and_unsupported_shapes_fail_loudly(self):
        import struct
        import zlib

        import numpy as np
        import pytest

        from hepop_spark.operators.png import _chunk, decode_png, encode_png

        g = np.zeros((8, 8), dtype=np.uint8) + 7
        data = bytearray(encode_png(g))
        data[40] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(data))
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"\xff\xd8\xff\xe0 not a png")
        # ILLEGAL depth/color combos and unknown interlace methods
        # rejected, not mis-decoded (Adam7 decodes for real since r09;
        # ALL legal bit depths decode for real since late r09 —
        # tests/test_round9b.py::TestPngBitDepths)
        sig = b"\x89PNG\r\n\x1a\n"
        deep = sig + _chunk(
            b"IHDR", struct.pack(">IIBBBBB", 8, 8, 4, 2, 0, 0, 0))
        with pytest.raises(ValueError, match="bit depth"):
            decode_png(deep)
        bad_im = sig + _chunk(
            b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 2))
        with pytest.raises(ValueError, match="interlace"):
            decode_png(bad_im)
        # a headers-only Adam7 stream fails on the missing IDAT, as a
        # ValueError (not a zlib.error escape)
        adam = sig + _chunk(
            b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 1))
        with pytest.raises(ValueError, match="IDAT"):
            decode_png(adam)
        # truncated IDAT (inflates to the wrong length) is caught
        bad = sig + _chunk(
            b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
        ) + _chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="length"):
            decode_png(bad)



class TestManifestPutIfAbsent:
    def test_concurrent_writer_detected_not_clobbered(self, spark, tmp_path):
        """Version publish is create-if-absent: a second writer racing on
        the same tree fails loudly instead of silently overwriting a
        committed version (the object-store conditional-put shape)."""
        import json as _json

        import pytest

        from hepop_spark.storage.manifest import latest, publish_append

        base = tmp_path / "t"
        _write_soak(spark, base, 0, 10, manifest=True)
        v, man = latest(str(base))
        # simulate the OTHER writer publishing v+1 out from under us
        rogue = dict(man, version=v + 1)
        (base / "_manifest" / f"v{v + 1}.json").write_text(_json.dumps(rogue))
        # our next publish computes v+1 from ... the rogue's latest, so it
        # lands at v+2 cleanly; force the collision by racing the SAME
        # prev_version
        from hepop_spark.storage import manifest as m

        with pytest.raises(RuntimeError, match="single-writer"):
            m._publish(str(base), man["files"], {}, v)
        # the committed rogue version was not clobbered
        got = _json.loads(
            (base / "_manifest" / f"v{v + 1}.json").read_text())
        assert got == rogue
        # and a normal append continues from the true latest
        _write_soak(spark, base, 10, 20)
        v2, man2 = latest(str(base))
        assert v2 == v + 2 and len(man2["files"]) > len(man["files"])
