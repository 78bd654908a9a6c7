"""Round-9 third session: trigram-Bloom sidecar — substring-search
(`LIKE '%needle%'`) file skipping (storage/trigram_index.py), routed by
the query API and maintained through ingest/compaction/serve-sweep like
the point-bloom and zone sidecars it composes with.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F


def _write_corpus(spark, base, lo, hi, shards=8):
    df = spark.range(lo, hi).select(
        (F.col("id") % shards).alias("shard"),
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox row "),
            F.col("id").cast("string"),
            F.when(F.col("id") % 97 == 0,
                   F.concat(F.lit(" needle-"), F.col("id").cast("string"),
                            F.lit("#"))).otherwise(F.lit("")),
        ).alias("body"),
    )
    df.repartition("shard").write.mode("append").partitionBy(
        "shard").parquet(base)


class TestLikeRuns:
    def test_literal_runs(self):
        from hepop_spark.storage.trigram_index import like_runs

        assert like_runs("%marker-0#%") == ["marker-0#"]
        assert like_runs("abc%def") == ["abc", "def"]
        assert like_runs("a_bcd_e") == ["bcd"]  # underscores split runs
        assert like_runs("%ab%") == []          # too short for a trigram
        assert like_runs("") == []
        # escape syntax changes run boundaries: refuse, raw scan answers
        assert like_runs(r"100\%%x") is None

    def test_trigrams_of(self):
        from hepop_spark.storage.trigram_index import trigrams_of

        assert trigrams_of("abcd") == ["abc", "bcd"]
        assert trigrams_of("aaaa") == ["aaa"]  # deduplicated
        assert trigrams_of("ab") == []


class TestTrigramSidecarIndex:
    def test_prune_never_loses_rows(self, spark, tmp_path):
        from hepop_spark.storage.trigram_index import (
            trigram_candidates,
            trigram_index_update,
        )

        base = str(tmp_path / "tbl")
        _write_corpus(spark, base, 0, 400)
        assert trigram_index_update(spark, base, "body") > 0
        # a rare needle prunes to the files that really hold it; every
        # matching row survives (no false negatives)
        kept, live, pruned = trigram_candidates(base, "body", ["needle-97#"])
        assert pruned > 0 and len(kept) >= 1
        df = spark.read.option("basePath", base).parquet(
            *[os.path.join(base, f) for f in kept])
        assert [r.doc_id for r in
                df.filter(F.col("body").like("%needle-97#%")).collect()
                ] == [97]
        # a needle present in every shard prunes nothing and loses nothing
        kept2, live2, _ = trigram_candidates(base, "body", ["brown fox"])
        assert len(kept2) == live2
        # an absent needle prunes everything (modulo bloom FPs)
        kept3, _, _ = trigram_candidates(base, "body", ["zzqxv##absent"])
        n = spark.read.option("basePath", base).parquet(
            *[os.path.join(base, f) for f in kept3]).filter(
            F.col("body").like("%zzqxv##absent%")).count() if kept3 else 0
        assert n == 0

    def test_short_needles_and_unindexed_files(self, spark, tmp_path):
        from hepop_spark.storage.trigram_index import (
            load_trigram,
            trigram_candidates,
            trigram_index_update,
        )

        base = str(tmp_path / "tbl")
        _write_corpus(spark, base, 0, 160)
        trigram_index_update(spark, base, "body")
        n_first = len(load_trigram(base, "body")["files"])
        # needles under 3 chars carry no trigram: everything must scan
        kept, live, pruned = trigram_candidates(base, "body", ["ab"])
        assert pruned == 0 and len(kept) == live
        # files landing after the index build are always kept
        _write_corpus(spark, base, 160, 200)
        kept, live, _ = trigram_candidates(base, "body", ["zzqxv##absent"])
        assert live > n_first and len(kept) >= live - n_first
        # incremental: default files=None indexes only the new ones
        assert trigram_index_update(spark, base, "body") == live - n_first
        assert trigram_index_update(spark, base, "body") == 0

    def test_null_and_short_values(self, spark, tmp_path):
        from hepop_spark.storage.trigram_index import (
            trigram_candidates,
            trigram_index_update,
        )

        base = str(tmp_path / "tbl")
        df = spark.createDataFrame(
            [(0, None), (0, "hit-me-here"), (1, None), (2, "ab")],
            "shard int, body string",
        )
        df.repartition("shard").write.partitionBy("shard").parquet(base)
        trigram_index_update(spark, base, "body")
        # the all-NULL and all-short files carry empty bitmaps => pruned
        kept, live, pruned = trigram_candidates(base, "body", ["hit-me"])
        assert pruned >= 2
        got = spark.read.option("basePath", base).parquet(
            *[os.path.join(base, f) for f in kept])
        assert got.filter(F.col("body").like("%hit-me%")).count() == 1


class TestTrigramApiRouting:
    def _serve_tree(self, spark, tmp_path, index=True):
        from hepop_spark.storage.trigram_index import trigram_index_update

        data = str(tmp_path / "data")
        tbl = os.path.join(data, "w1", "dbs", "corpus")
        _write_corpus(spark, tbl, 0, 400)
        if index:
            trigram_index_update(spark, tbl, "body")
        return data

    def test_like_routes_and_matches_raw(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data = self._serve_tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        sql = ("SELECT doc_id FROM corpus WHERE body LIKE '%needle-291#%' "
               "ORDER BY doc_id")
        got = [r.doc_id for r in api.sql(sql).collect()]
        bp = api.last_bloom_pruned
        assert bp and ("trigram", "body") in bp["probes"]
        assert bp["files_read"] < bp["files_live"]
        assert got == [291]
        # the raw (un-routed) answer is identical
        raw = [r.doc_id for r in spark.sql(
            "SELECT doc_id FROM corpus WHERE body LIKE '%needle-291#%' "
            "ORDER BY doc_id").collect()]
        assert raw == got

    def test_unroutable_shapes_fall_back(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data = self._serve_tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        # escape syntax: refuse analysis, answer from raw (correctly)
        out = api.sql(
            r"SELECT count() AS n FROM corpus WHERE body LIKE '%100\%%'")
        assert api.last_bloom_pruned is None
        assert out.collect()[0].n == 0
        # short runs only: no trigram to require
        api.sql("SELECT count() AS n FROM corpus WHERE body LIKE '%ab%'")
        assert api.last_bloom_pruned is None
        # non-string column never routes
        api.sql("SELECT count() AS n FROM corpus WHERE doc_id LIKE '%12%'")
        assert api.last_bloom_pruned is None

    def test_two_like_conjuncts_intersect(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data = self._serve_tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        sql = ("SELECT doc_id FROM corpus WHERE body LIKE '%needle-%' "
               "AND body LIKE '%row 97 %' ORDER BY doc_id")
        got = [r.doc_id for r in api.sql(sql).collect()]
        bp = api.last_bloom_pruned
        assert bp and bp["probes"].count(("trigram", "body")) == 2
        raw = [r.doc_id for r in spark.sql(sql).collect()]
        assert got == raw == [97]

    def test_prefix_like_prunes_via_string_zone(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.bloom_index import zone_index_update

        data = str(tmp_path / "data")
        tbl = os.path.join(data, "w1", "dbs", "logs")
        df = spark.range(0, 400).select(
            F.col("id").alias("rid"),
            F.concat(
                F.element_at(
                    F.array(F.lit("alpha"), F.lit("bravo"),
                            F.lit("charlie"), F.lit("delta")),
                    (F.col("id") % 4 + 1).cast("int")),
                F.lit("-line-"), F.col("id").cast("string"),
            ).alias("line"),
        )
        # range layout on the string column: the zone map's companion
        df.repartitionByRange(8, "line").write.parquet(tbl)
        zone_index_update(spark, tbl, "line")
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        sql = ("SELECT count(*) AS n FROM logs "
               "WHERE line LIKE 'charlie-%' ")
        n = api.sql(sql).collect()[0].n
        bp = api.last_bloom_pruned
        assert bp and ("zone", "line") in bp["probes"]
        assert bp["files_read"] < bp["files_live"]
        assert n == 100

    def test_contains_routes_like_a_like(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data = self._serve_tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        sql = ("SELECT doc_id FROM corpus "
               "WHERE contains(body, 'needle-194#') ORDER BY doc_id")
        got = [r.doc_id for r in api.sql(sql).collect()]
        bp = api.last_bloom_pruned
        assert bp and ("trigram", "body") in bp["probes"]
        assert bp["files_read"] < bp["files_live"]
        assert got == [194]
        # a short literal carries no trigram: falls back, still correct
        api.sql("SELECT count(*) AS n FROM corpus "
                "WHERE contains(body, 'ab')")
        assert api.last_bloom_pruned is None

    def test_map_key_like_routes(self, spark, tmp_path):
        """LIKE over one key of a map column (the LP tags storage):
        sidecar spec `tags.host`, conjunct `tags['host'] LIKE '%...%'`."""
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.trigram_index import trigram_index_update

        data = str(tmp_path / "data")
        tbl = os.path.join(data, "w1", "dbs", "lp")
        df = spark.range(0, 200).select(
            (F.col("id") % 8).alias("shard"),
            F.col("id").alias("rid"),
            F.create_map(
                F.lit("host"),
                F.concat(F.lit("node-"), (F.col("id") % 50).cast("string"),
                         F.lit(".example.invalid")),
            ).alias("tags"),
        )
        df.repartition("shard").write.partitionBy("shard").parquet(tbl)
        trigram_index_update(spark, tbl, "tags.host")
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        sql = ("SELECT rid FROM lp WHERE tags['host'] LIKE '%node-37.%' "
               "ORDER BY rid")
        got = [r.rid for r in api.sql(sql).collect()]
        bp = api.last_bloom_pruned
        assert bp and ("trigram", "tags.host") in bp["probes"]
        assert got == [37, 87, 137, 187]

    def test_composes_with_zone_probe(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.bloom_index import zone_index_update

        data = self._serve_tree(spark, tmp_path)
        tbl = os.path.join(data, "w1", "dbs", "corpus")
        zone_index_update(spark, tbl, "doc_id")
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        sql = ("SELECT doc_id FROM corpus WHERE body LIKE '%needle-%' "
               "AND doc_id BETWEEN 0 AND 120 ORDER BY doc_id")
        got = [r.doc_id for r in api.sql(sql).collect()]
        bp = api.last_bloom_pruned
        assert bp and ("trigram", "body") in bp["probes"]
        assert ("zone", "doc_id") in bp["probes"]
        assert got == [0, 97]


class TestTrigramLifecycle:
    def test_compaction_reindexes_replacements(self, spark, tmp_path):
        from hepop_spark.storage.bloom_index import bloom_reindex_files
        from hepop_spark.storage.trigram_index import (
            load_trigram,
            trigram_candidates,
            trigram_index_update,
        )

        base = str(tmp_path / "tbl")
        _write_corpus(spark, base, 0, 200)
        trigram_index_update(spark, base, "body")
        # simulate a compaction replacement: new file, reindex hook
        _write_corpus(spark, base, 200, 240)
        new = [f for f in
               [os.path.relpath(os.path.join(r, f), base)
                for r, _, fs in os.walk(base) for f in fs
                if f.endswith(".parquet")]
               if f not in load_trigram(base, "body")["files"]]
        assert new
        assert bloom_reindex_files(spark, base, new) >= len(new)
        kept, live, _ = trigram_candidates(base, "body", ["zzqxv##absent"])
        assert len(load_trigram(base, "body")["files"]) == live

    def test_refresh_indexes_and_vacuums(self, spark, tmp_path):
        from hepop_spark.storage.bloom_index import bloom_index_refresh
        from hepop_spark.storage.trigram_index import (
            load_trigram,
            trigram_index_update,
        )

        base = str(tmp_path / "tbl")
        _write_corpus(spark, base, 0, 80)
        trigram_index_update(spark, base, "body")
        # plant a dead entry (a file compaction retired) — via the r10
        # sharded store, the only write face the sidecars have now
        from hepop_spark.storage import sidecar
        sidecar.update_entries(
            base, "trigram", "body",
            {"shard=0/retired-file.parquet": {"m": 1024, "bits": "0"}})
        _write_corpus(spark, base, 80, 120)  # new unindexed files
        out = bloom_index_refresh(spark, base)
        tri = out.get("trigram:body")
        assert tri and tri["indexed"] > 0 and tri["vacuumed"] == 1
        assert "shard=0/retired-file.parquet" not in load_trigram(
            base, "body")["files"]

    def test_streaming_hook_maintains_sidecar(self, spark, tmp_path):
        from hepop_spark.storage.trigram_index import (
            load_trigram,
            trigram_candidates,
        )
        from hepop_spark.streaming.index_maint import (
            stage_batch_files,
            table_sink,
            trigram_maintenance,
        )

        base = str(tmp_path / "data")
        landing = str(tmp_path / "landing")
        rows = spark.range(0, 90).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("payload sip:user"), F.col("id").cast("string"),
                     F.lit("@example.invalid SIP/2.0")).alias("payload"),
            (F.col("id") % 3).alias("b"),
        )
        stage_batch_files(rows, landing, F.col("doc_id") % 3, 3)
        stream = (
            spark.readStream.schema("doc_id long, payload string, b long")
            .option("maxFilesPerTrigger", "1").parquet(landing)
        )
        hook = trigram_maintenance(base, table="sip", col="payload")
        q = table_sink(stream, base, str(tmp_path / "ckpt"), "sip",
                       index_hooks=[hook]).start()
        q.awaitTermination(120)
        tbl = os.path.join(base, "sip")
        sc = load_trigram(tbl, "payload")
        assert sc is not None and len(sc["files"]) >= 3
        kept, live, pruned = trigram_candidates(
            tbl, "payload", ["sip:user41@"])
        assert pruned > 0
        got = spark.read.option("basePath", tbl).parquet(
            *[os.path.join(tbl, f) for f in kept])
        assert got.filter(
            F.col("payload").contains("sip:user41@")).count() == 1
        # redelivery: re-running the hook recomputes identical bitmaps
        before = load_trigram(tbl, "payload")
        hook("sip", rows.filter(F.col("doc_id") % 3 == 0), 0)
        assert load_trigram(tbl, "payload") == before

    def test_serve_config_declares_trigram_cols(self):
        from hepop_spark.config import ServerConfig

        cfg = ServerConfig.from_env(
            {"TRIGRAM_COLS": "sip:payload,logs:line"})
        assert cfg.trigram_cols == (("sip", "payload"), ("logs", "line"))


class TestRetention:
    """r09c: age-out as a storage mutation (storage/retention.py)."""

    def _write(self, spark, base, manifest):
        from hepop_spark.storage.writer import write_partitioned

        df = spark.range(0, 300).select(
            F.col("id").alias("v"),
            F.expr("timestamp'2024-03-01 00:00:00' + "
                   "make_interval(0, 0, 0, CAST(id % 6 AS INT), 0, 0, 0)")
            .alias("timestamp"),
        )
        write_partitioned(df, base, manifest=manifest)

    def test_manifest_retire_is_graceful_and_idempotent(
            self, spark, tmp_path):
        from hepop_spark.storage.retention import apply_retention
        from hepop_spark.storage.writer import read_table

        base = str(tmp_path / "tbl")
        self._write(spark, base, manifest=True)
        res = apply_retention(base, "2024-03-04")
        assert res["dates_dropped"] == [
            "date=2024-03-01", "date=2024-03-02", "date=2024-03-03"]
        assert res["files_retired"] > 0
        # pinned reads exclude retired files immediately...
        back = read_table(spark, base)
        dates = sorted(r.d for r in back.select(
            F.col("date").cast("string").alias("d")).distinct().collect())
        assert dates == ["2024-03-04", "2024-03-05", "2024-03-06"]
        assert back.count() == 150
        # ...while the bytes persist through the default grace
        assert any(d.startswith("date=2024-03-01")
                   for d in os.listdir(base))
        # re-application is a reported no-op
        res2 = apply_retention(base, "2024-03-04")
        assert res2 == {"dates_dropped": [], "files_retired": 0}
        # zero-grace vacuum reclaims the bytes (hadoop .crc siblings may
        # keep the emptied dirs themselves from rmdir — that's fine, the
        # walk skips them and no parquet remains)
        from hepop_spark.storage.manifest import vacuum
        vacuum(base, grace_s=0)
        old = os.path.join(base, "date=2024-03-01")
        left = [f for _r, _d, fs in os.walk(old) for f in fs
                if f.endswith(".parquet")] if os.path.isdir(old) else []
        assert left == []

    def test_listing_mode_removes_dirs(self, spark, tmp_path):
        from hepop_spark.storage.retention import apply_retention
        from hepop_spark.storage.writer import read_table

        base = str(tmp_path / "tbl")
        self._write(spark, base, manifest=False)
        res = apply_retention(base, "2024-03-06")
        assert len(res["dates_dropped"]) == 5
        assert res["files_retired"] > 0
        assert read_table(spark, base).count() == 50
        left = [d for d in os.listdir(base) if d.startswith("date=")]
        assert left == ["date=2024-03-06"]

    def test_cutoff_beyond_data_is_noop(self, spark, tmp_path):
        from hepop_spark.storage.retention import apply_retention

        base = str(tmp_path / "tbl")
        self._write(spark, base, manifest=True)
        assert apply_retention(base, "2024-01-01") == {
            "dates_dropped": [], "files_retired": 0}

    def test_serve_sweep_ages_out_under_ingest(self, spark, tmp_path):
        """RETENTION_DAYS live: a serve process ingests points 10 days
        old and points from now; the sweep expires the old date
        partitions while the fresh ones keep answering — the capture
        store's rotation loop, end-to-end."""
        import json as _json
        import time as _time
        import urllib.parse
        import urllib.request

        from hepop_spark.__main__ import serve
        from hepop_spark.config import ServerConfig
        from hepop_spark.storage.writer import read_table

        cfg = ServerConfig.from_env(
            env={"RETENTION_DAYS": "5"},
            host="127.0.0.1", port=0, http_port=0,
            data_dir=str(tmp_path / "data"), writer_id="w1",
            compact_interval=0,
        )
        assert cfg.retention_days == 5.0
        h = serve(cfg, spark=spark, block=False)
        try:
            now_ns = _time.time_ns()
            old_ns = now_ns - 10 * 86400 * 10**9
            body = "\n".join(
                [f"mem,host=old-h{i} usage={i}.0 {old_ns + i * 1000}"
                 for i in range(12)]
                + [f"mem,host=new-h{i} usage={i}.0 {now_ns + i * 1000}"
                   for i in range(12)]
            ).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{h['http_port']}/write", data=body,
                method="POST")
            with urllib.request.urlopen(req, timeout=10) as r:
                assert r.status == 201
            tdir = os.path.join(cfg.table_root(), "mem")
            deadline = _time.time() + 240
            while _time.time() < deadline:
                try:
                    if read_table(spark, tdir).count() >= 24:
                        break
                except Exception:
                    pass
                _time.sleep(1)
            assert read_table(spark, tdir).count() == 24
            h["compact_once"]()  # sweep: retention BEFORE compaction
            assert read_table(spark, tdir).count() == 12
            url = (f"http://127.0.0.1:{h['http_port']}/query?q="
                   + urllib.parse.quote(
                       "SELECT count() AS n FROM mem "
                       "WHERE time >= '2000-01-01'"))
            with urllib.request.urlopen(url, timeout=60) as r:
                assert _json.load(r) == [{"n": 12}]
            h["compact_once"]()  # stable on re-application
            assert read_table(spark, tdir).count() == 12
        finally:
            h["stop"]()

    def test_serve_config_parses_retention(self):
        from hepop_spark.config import ServerConfig

        assert ServerConfig.from_env({}).retention_days is None
        assert ServerConfig.from_env(
            {"RETENTION_DAYS": "30"}).retention_days == 30.0
        assert ServerConfig.from_env(
            {"RETENTION_DAYS": "0"}).retention_days is None


class TestExplainEndpoint:
    """r09c: GET /explain — routing decision, pruning accounting, the
    rewritten SQL and the physical plan, without executing the query."""

    def _fetch(self, port, path):
        import json as _json
        import urllib.error
        import urllib.request

        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}", timeout=120) as r:
                return r.status, _json.load(r)
        except urllib.error.HTTPError as e:
            return e.code, _json.load(e)

    def test_explain_reports_pruning_and_plan(self, spark, tmp_path):
        import urllib.parse

        from hepop_spark.plans.http_server import HepopHttpServer
        from hepop_spark.storage.trigram_index import trigram_index_update

        data = str(tmp_path / "data")
        tbl = os.path.join(data, "w1", "dbs", "corpus")
        _write_corpus(spark, tbl, 0, 200)
        trigram_index_update(spark, tbl, "body")
        srv = HepopHttpServer(spark, default_window=False,
                              data_dir=data).start()
        try:
            q = urllib.parse.quote(
                "SELECT doc_id FROM corpus WHERE body LIKE '%needle-97#%'")
            code, body = self._fetch(srv.port, f"/explain?q={q}")
            assert code == 200
            assert body["routed_rollup"] is None
            bp = body["pruning"]
            assert bp and bp["files_read"] < bp["files_live"]
            assert ["trigram", "body"] in bp["probes"]
            assert "FROM corpus__pruned_" in body["executed_sql"]
            assert "Scan parquet" in body["plan"] or "FileScan" in body["plan"]
            # missing q -> 400; broken SQL -> 500
            assert self._fetch(srv.port, "/explain")[0] == 400
            bad = urllib.parse.quote("SELECT nope FROM missing_table")
            assert self._fetch(srv.port, f"/explain?q={bad}")[0] == 500
        finally:
            srv.stop()

    def test_explain_reports_rollup_route(self, spark, tmp_path):
        import urllib.parse

        from hepop_spark.plans.http_server import HepopHttpServer
        from hepop_spark.storage.rollup import projection_append

        data = str(tmp_path / "data")
        raw = spark.range(0, 300).select(
            (F.col("id") % 5).alias("k"), F.col("id").alias("v"))
        raw.write.parquet(os.path.join(data, "w1", "dbs", "mtable"))
        store = os.path.join(data, "w1", "rollups", "m_grid")
        part = raw.groupBy("k").agg(F.sum("v").alias("sv"))
        projection_append(
            spark, store, part, "b0", keys=["k"], sums=["sv"],
            source={"table": "mtable", "keys": {"k": "k"},
                    "sums": {"sv": "sum(v)"}})
        srv = HepopHttpServer(spark, default_window=False,
                              data_dir=data).start()
        try:
            q = urllib.parse.quote(
                "SELECT k, sum(v) AS sv FROM mtable GROUP BY k")
            code, body = self._fetch(srv.port, f"/explain?q={q}")
            assert code == 200
            assert body["routed_rollup"] == "m_grid"
            assert "FROM m_grid" in body["executed_sql"]
        finally:
            srv.stop()


class TestJoinRouting:
    """r09c: star-join aggregate routing — aggregate-before-join MV
    rewrite onto a maintained grid keyed by the join key."""

    def _tree(self, spark, tmp_path):
        from hepop_spark.storage.rollup import projection_append

        data = str(tmp_path / "data")
        fact = spark.range(0, 600).select(
            F.col("id").alias("fid"),
            (F.col("id") % 7).alias("k"),
            (F.col("id") * 3 % 101).alias("v"),
        )
        dim = spark.createDataFrame(
            [(i, f"grp-{i % 3}", i * 10) for i in range(7)],
            "dk int, label string, weight int",
        )
        fact.write.parquet(os.path.join(data, "w1", "dbs", "facts"))
        dim.write.parquet(os.path.join(data, "w1", "dbs", "dims"))
        store = os.path.join(data, "w1", "rollups", "fact_k_grid")
        for b in range(2):
            part = fact.filter(F.col("fid") % 2 == b).groupBy("k").agg(
                F.count("*").alias("n"),
                F.sum("v").alias("sv"),
                F.count("v").alias("cv"),
                F.min("v").alias("mnv"),
            )
            projection_append(
                spark, store, part, f"b{b}", keys=["k"],
                sums=["n", "sv", "cv"], mins=["mnv"],
                source={
                    "table": "facts",
                    "keys": {"k": "k"},
                    "sums": {"n": "count(*)", "sv": "sum(v)",
                             "cv": "count(v)"},
                    "mins": {"mnv": "min(v)"},
                },
            )
        return data

    def _api(self, spark, data):
        from hepop_spark.plans.api import HepopQueryAPI

        return HepopQueryAPI(spark, default_window=False, data_dir=data)

    SQL = ("SELECT d.label AS label, count(*) AS n, sum(f.v) AS sv, "
           "avg(f.v) AS av, min(f.v) AS mnv "
           "FROM facts f JOIN dims d ON f.k = d.dk "
           "GROUP BY d.label ORDER BY label")

    def test_join_routes_and_matches_raw(self, spark, tmp_path):
        data = self._tree(spark, tmp_path)
        api = self._api(spark, data)
        df = api.sql(self.SQL)
        assert api.last_routed_rollup == "fact_k_grid"
        # the rewritten SQL aggregates the grid through the join (the
        # executed-plan path check lives in the judged entry — deep
        # pytest tmp paths truncate FileScan locations)
        assert "FROM fact_k_grid JOIN dims" in api.last_sql
        assert "SUM(fact_k_grid.sv)" in api.last_sql
        got = [tuple(r) for r in df.collect()]
        raw = [tuple(r) for r in spark.sql(self.SQL).collect()]
        assert got == raw  # integer sums: exact equality, no FP slack

    def test_where_on_dim_and_grid_key_routes(self, spark, tmp_path):
        data = self._tree(spark, tmp_path)
        api = self._api(spark, data)
        sql = ("SELECT d.label AS label, sum(f.v) AS sv "
               "FROM facts f JOIN dims d ON f.k = d.dk "
               "WHERE d.weight >= 20 AND f.k IN (2, 3, 4) "
               "GROUP BY d.label ORDER BY label")
        df = api.sql(sql)
        assert api.last_routed_rollup == "fact_k_grid"
        got = [tuple(r) for r in df.collect()]
        raw = [tuple(r) for r in spark.sql(sql).collect()]
        assert got == raw

    def test_inner_join_spelling_routes(self, spark, tmp_path):
        data = self._tree(spark, tmp_path)
        api = self._api(spark, data)
        sql = ("SELECT d.label AS label, sum(f.v) AS sv "
               "FROM facts f INNER JOIN dims d ON f.k = d.dk "
               "GROUP BY d.label ORDER BY label")
        df = api.sql(sql)
        assert api.last_routed_rollup == "fact_k_grid"
        assert [tuple(r) for r in df.collect()] == \
            [tuple(r) for r in spark.sql(sql).collect()]

    def test_sides_swap(self, spark, tmp_path):
        """dim JOIN fact (reversed order) routes too."""
        data = self._tree(spark, tmp_path)
        api = self._api(spark, data)
        sql = ("SELECT d.label AS label, sum(f.v) AS sv "
               "FROM dims d JOIN facts f ON d.dk = f.k "
               "GROUP BY d.label ORDER BY label")
        df = api.sql(sql)
        assert api.last_routed_rollup == "fact_k_grid"
        got = [tuple(r) for r in df.collect()]
        raw = [tuple(r) for r in spark.sql(sql).collect()]
        assert got == raw

    def test_group_by_grid_key_and_dim_attr(self, spark, tmp_path):
        data = self._tree(spark, tmp_path)
        api = self._api(spark, data)
        sql = ("SELECT d.label AS label, f.k AS k, count(*) AS n "
               "FROM facts f JOIN dims d ON f.k = d.dk "
               "GROUP BY d.label, f.k ORDER BY label, k")
        df = api.sql(sql)
        assert api.last_routed_rollup == "fact_k_grid"
        got = [tuple(r) for r in df.collect()]
        raw = [tuple(r) for r in spark.sql(sql).collect()]
        assert got == raw

    def test_unroutable_shapes_fall_back(self, spark, tmp_path):
        data = self._tree(spark, tmp_path)
        api = self._api(spark, data)
        fallback = [
            # aggregate over a DIM column: not in the grid
            "SELECT d.label AS label, sum(d.weight) AS sw "
            "FROM facts f JOIN dims d ON f.k = d.dk GROUP BY d.label",
            # aggregate over a fact column the grid does not carry
            "SELECT d.label AS label, sum(f.fid) AS sf "
            "FROM facts f JOIN dims d ON f.k = d.dk GROUP BY d.label",
            # WHERE on a raw fact measure: not a grid key
            "SELECT d.label AS label, sum(f.v) AS sv "
            "FROM facts f JOIN dims d ON f.k = d.dk "
            "WHERE f.fid = 3 GROUP BY d.label",
            # HAVING: join routing refuses (scope), raw answers
            "SELECT d.label AS label, sum(f.v) AS sv "
            "FROM facts f JOIN dims d ON f.k = d.dk "
            "GROUP BY d.label HAVING sum(f.v) > 10",
            # ORDER BY a non-alias raw expression
            "SELECT d.label AS label, sum(f.v) AS sv "
            "FROM facts f JOIN dims d ON f.k = d.dk "
            "GROUP BY d.label ORDER BY sum(f.v)",
            # join on a non-grid fact column
            "SELECT d.label AS label, sum(f.v) AS sv "
            "FROM facts f JOIN dims d ON f.fid = d.dk GROUP BY d.label",
        ]
        for sql in fallback:
            df = api.sql(sql)
            assert api.last_routed_rollup is None, sql
            # the raw answer is still produced (both views discovered)
            assert df.count() >= 0, sql

    def test_serve_discovers_every_from_join_target(self, spark, tmp_path):
        """Raw multi-table SQL (shapes the join-route grammar does NOT
        parse) still answers in serve mode: every FROM/JOIN target is
        discovered, not just the first (r09c)."""
        data = self._tree(spark, tmp_path)
        api = self._api(spark, data)
        for v in ("facts", "dims"):
            spark.catalog.dropTempView(v)  # force discovery through sql()
        sql = ("SELECT d.label AS label, count(*) AS n "
               "FROM facts f RIGHT JOIN dims d ON f.k = d.dk "
               "GROUP BY d.label ORDER BY label")
        got = [tuple(r) for r in api.sql(sql).collect()]
        assert api.last_routed_rollup is None  # RIGHT JOIN never routes
        assert len(got) == 3 and sum(n for _, n in got) == 600

    def test_left_join_routes_fact_side_only(self, spark, tmp_path):
        """fact LEFT JOIN dim routes (unmatched fact rows ride their grid
        cells into the NULL-label group); dim LEFT JOIN fact does not."""
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.rollup import projection_append

        data = str(tmp_path / "data")
        fact = spark.range(0, 210).select(
            (F.col("id") % 7).alias("k"), F.col("id").alias("v"))
        dim = spark.createDataFrame(  # key 6 missing: LEFT keeps its rows
            [(i, f"g{i % 2}") for i in range(6)], "dk int, label string")
        fact.write.parquet(os.path.join(data, "w1", "dbs", "lfacts"))
        dim.write.parquet(os.path.join(data, "w1", "dbs", "ldims"))
        store = os.path.join(data, "w1", "rollups", "lf_grid")
        part = fact.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("v").alias("sv"))
        projection_append(
            spark, store, part, "b0", keys=["k"], sums=["n", "sv"],
            source={"table": "lfacts", "keys": {"k": "k"},
                    "sums": {"n": "count(*)", "sv": "sum(v)"}})
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        sql = ("SELECT d.label AS label, count(*) AS n, sum(f.v) AS sv "
               "FROM lfacts f LEFT JOIN ldims d ON f.k = d.dk "
               "GROUP BY d.label ORDER BY label")
        df = api.sql(sql)
        assert api.last_routed_rollup == "lf_grid"
        assert "LEFT JOIN ldims" in api.last_sql
        got = [tuple(r) for r in df.collect()]
        raw = [tuple(r) for r in spark.sql(sql).collect()]
        assert got == raw
        assert any(label is None for label, _n, _sv in got)
        # the dim-on-the-left orientation must NOT route
        sql2 = ("SELECT d.label AS label, count(*) AS n "
                "FROM ldims d LEFT JOIN lfacts f ON d.dk = f.k "
                "GROUP BY d.label ORDER BY label")
        df2 = api.sql(sql2)
        assert api.last_routed_rollup is None
        assert [tuple(r) for r in df2.collect()] == \
            [tuple(r) for r in spark.sql(sql2).collect()]

    def test_time_faced_fact_never_routes_under_default_window(
            self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.rollup import projection_append

        data = str(tmp_path / "data")
        fact = spark.range(0, 50).select(
            F.col("id").alias("fid"), (F.col("id") % 3).alias("k"),
            F.col("id").alias("v"),
            F.lit("2024-03-01 10:00:00").cast("timestamp").alias("time"),
        )
        dim = spark.createDataFrame([(i, f"g{i}") for i in range(3)],
                                    "dk int, label string")
        fact.write.parquet(os.path.join(data, "w1", "dbs", "tfacts"))
        dim.write.parquet(os.path.join(data, "w1", "dbs", "dims"))
        store = os.path.join(data, "w1", "rollups", "tfact_grid")
        part = fact.groupBy("k").agg(F.sum("v").alias("sv"))
        projection_append(
            spark, store, part, "b0", keys=["k"], sums=["sv"],
            source={"table": "tfacts", "keys": {"k": "k"},
                    "sums": {"sv": "sum(v)"}})
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        api.sql("SELECT d.label AS label, sum(f.v) AS sv "
                "FROM tfacts f JOIN dims d ON f.k = d.dk GROUP BY d.label")
        # routing refused: the implicit last-10-minutes window would be
        # silently widened to all-time by the timeless grid
        assert api.last_routed_rollup is None
