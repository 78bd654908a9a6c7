"""Round-12 pins: CTE chain / CTE+JOIN routing, zone-complement NOT
pruning, the anchored /explain guard, and the sidecar GC low-churn
backstop (r11 verdict items 1-2 + the four r11 ADVICE lows)."""

import os

import pytest
from pyspark.sql import functions as F


class TestCteChainParsing:
    def test_split_cte_chain_shapes(self):
        from hepop_spark.plans.api import split_cte_chain

        assert split_cte_chain(
            "WITH a AS (SELECT 1), b AS (SELECT x FROM a) "
            "SELECT * FROM b") == (
            [("a", "SELECT 1"), ("b", "SELECT x FROM a")],
            "SELECT * FROM b")
        # three links
        defs, outer = split_cte_chain(
            "WITH a AS (SELECT 1), b AS (SELECT x FROM a), "
            "c AS (SELECT y FROM b) SELECT * FROM c")
        assert [n for n, _ in defs] == ["a", "b", "c"]
        assert outer == "SELECT * FROM c"
        # literal-aware: ')' and a doubled quote inside a body
        defs, _ = split_cte_chain(
            "WITH a AS (SELECT 'it''s)' AS x) SELECT * FROM a")
        assert defs == [("a", "SELECT 'it''s)' AS x")]
        # not a WITH / unbalanced
        assert split_cte_chain("SELECT 1") is None
        assert split_cte_chain("WITH a AS (SELECT 1 SELECT 2") is None

    def test_skip_literal_spark_lexer_rules(self):
        from hepop_spark.plans.api import _skip_literal

        # '' doubling continues the literal
        s = "'it''s' rest"
        assert s[_skip_literal(s, 0):] == " rest"
        # backslash escape continues the literal (Spark lexer)
        s2 = r"'a\'b' rest"
        assert s2[_skip_literal(s2, 0):] == " rest"
        # unterminated runs to end, no exception
        assert _skip_literal("'abc", 0) == 4

    def test_from_clause_comma_detection(self):
        from hepop_spark.plans.api import _from_clause_has_comma

        assert _from_clause_has_comma("SELECT a.x FROM agg a, agg b")
        assert _from_clause_has_comma(
            "SELECT d.lang FROM agg, documents d WHERE agg.lang = d.lang")
        # commas in IN-lists, GROUP BY, and function args never trip it
        assert not _from_clause_has_comma(
            "SELECT x FROM agg WHERE y IN (1, 2)")
        assert not _from_clause_has_comma(
            "SELECT x FROM agg GROUP BY x, y")
        assert not _from_clause_has_comma(
            "SELECT x FROM agg JOIN dim ON a = b WHERE f(1, 2) = 3")


class TestExplainAnchoredGuard:
    def test_statement_classifier(self):
        from hepop_spark.plans.api import statement_is_select_only

        ok = statement_is_select_only
        assert ok("SELECT 1") == (True, "")
        assert ok("  (SELECT 1)") == (True, "")
        assert ok("WITH t AS (SELECT 1) SELECT * FROM t") == (True, "")
        # r11 ADVICE false-400: identifiers literally named update/delete
        assert ok("SELECT update, delete FROM t WHERE drop = 1") == \
            (True, "")
        # DML keywords inside literals of EITHER escape dialect stay legal
        assert ok("SELECT 1 WHERE a = 'ins''ert' AND b = 'dr\\'op'") == \
            (True, "")
        # the r11 ADVICE desync: literal ending in a lone backslash —
        # Spark's lexer reads \' as an escaped quote, so the literal
        # continues to the next quote and the DROP stays inside it
        assert ok(r"SELECT 1 WHERE p = 'C:\' AND q = ' AND DROP_it = 2") \
            == (True, "")
        # comments never desync the scan
        assert ok("-- don't drop\nSELECT 1") == (True, "")
        assert ok("SELECT 1 /* it's fine */") == (True, "")
        # smuggled DML after the CTE list still rejects, by token
        assert ok("WITH t AS (SELECT 1) INSERT INTO x SELECT * FROM t") \
            == (False, "INSERT")
        assert ok("WITH t AS (SELECT 1) CREATE TABLE n AS SELECT 1") == \
            (False, "CREATE")
        assert ok("DROP TABLE x") == (False, "DROP")
        # statement smuggling behind a semicolon
        assert ok("SELECT 1; DROP TABLE x") == (False, ";")
        # a trailing semicolon alone is fine
        assert ok("SELECT 1;") == (True, "")
        # unparseable WITH stays conservative
        assert ok("WITH t AS (SELECT 1 SELECT 2") == (False, "WITH")

    def test_explain_accepts_identifier_named_update(self, tmp_path):
        """HTTP-level regression for the r11 ADVICE false-400."""
        import json as _json
        import urllib.request

        from hepop_spark.plans.http_server import HepopHttpServer
        from hepop_spark.session import get_spark

        spark = get_spark("test-round12-explain")
        data = str(tmp_path / "data")
        tbl = os.path.join(data, "w1", "dbs", "t12")
        spark.range(5).select(
            F.col("id").alias("update"), F.col("id").alias("v")
        ).write.parquet(tbl)
        srv = HepopHttpServer(spark, default_window=False,
                              data_dir=data).start()
        try:
            import urllib.parse

            # backtick-quoted identifier named `update`: the old guard's
            # anywhere-keyword scan 400'd it; the anchored guard must not
            q = urllib.parse.quote(
                "SELECT `update`, count(*) AS n FROM t12 "
                "WHERE `update` >= 0 GROUP BY `update`")
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{srv.port}/explain?q={q}",
                    timeout=120) as r:
                assert r.status == 200
                body = _json.load(r)
            assert "plan" in body or "executed_sql" in body
        finally:
            srv.stop()


class TestCteChainRouting:
    @pytest.fixture(scope="class")
    def spark(self):
        from hepop_spark.session import get_spark

        return get_spark("test-round12-chain")

    def test_chain_routes_and_matches_raw(self, spark):
        import shutil

        from hepop_spark.catalog import load_table
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.queries.routing_q import _build_rollup_serve_tree

        root, data = _build_rollup_serve_tree(spark, "/root/testdata/sf0.001")
        try:
            api = HepopQueryAPI(spark, default_window=False, data_dir=data)
            df = api.sql(
                "WITH agg AS (SELECT lang, source, count(*) AS n FROM "
                "documents GROUP BY lang, source), "
                "filt AS (SELECT lang, n FROM agg WHERE n >= 3) "
                "SELECT lang, count(*) AS n_src FROM filt GROUP BY lang "
                "ORDER BY lang")
            assert api.last_routed_rollup == "doc_lang_rollup"
            got = {(r["lang"], r["n_src"]) for r in df.collect()}
            raw = load_table(spark, "/root/testdata/sf0.001", "documents")
            want = {
                (r["lang"], r["n_src"])
                for r in raw.groupBy("lang", "source")
                .agg(F.count("*").alias("n")).filter(F.col("n") >= 3)
                .groupBy("lang").agg(F.count("*").alias("n_src"))
                .collect()
            }
            assert got == want and got
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def test_cte_join_routes_and_discovers_dim(self, spark):
        import shutil

        from hepop_spark.catalog import load_table
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.queries.routing_q import _build_rollup_serve_tree

        root, data = _build_rollup_serve_tree(spark, "/root/testdata/sf0.001")
        try:
            docs = load_table(spark, "/root/testdata/sf0.001", "documents")
            dim = docs.select("lang").distinct().select(
                "lang",
                F.when(F.col("lang") == "zh", F.lit("asia"))
                .otherwise(F.lit("europe")).alias("region"))
            dim.write.parquet(os.path.join(data, "w1", "dbs", "ldim"))
            api = HepopQueryAPI(spark, default_window=False, data_dir=data)
            df = api.sql(
                "WITH agg AS (SELECT lang, count(*) AS n FROM documents "
                "GROUP BY lang) "
                "SELECT d.region AS region, sum(agg.n) AS n FROM agg "
                "JOIN ldim d ON agg.lang = d.lang GROUP BY d.region "
                "ORDER BY region")
            assert api.last_routed_rollup == "doc_lang_rollup"
            got = {(r["region"], r["n"]) for r in df.collect()}
            want = {
                (r["region"], r["n"])
                for r in docs.groupBy("lang").agg(F.count("*").alias("n"))
                .join(dim, "lang")
                .groupBy("region").agg(F.sum("n").alias("n")).collect()
            }
            assert got == want and got
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def test_chain_tail_join_routes(self, spark):
        """r12 extension: the outer of a CHAIN may also JOIN discovered
        dims — same substitution argument, dims discovered by the
        route; mid-chain bodies stay JOIN-free (pinned below)."""
        import shutil

        from hepop_spark.catalog import load_table
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.queries.routing_q import _build_rollup_serve_tree

        root, data = _build_rollup_serve_tree(spark, "/root/testdata/sf0.001")
        try:
            docs = load_table(spark, "/root/testdata/sf0.001", "documents")
            dim = docs.select("lang").distinct().select(
                "lang",
                F.when(F.col("lang") == "zh", F.lit("asia"))
                .otherwise(F.lit("europe")).alias("region"))
            dim.write.parquet(os.path.join(data, "w1", "dbs", "ldim2"))
            api = HepopQueryAPI(spark, default_window=False, data_dir=data)
            df = api.sql(
                "WITH agg AS (SELECT lang, count(*) AS n FROM documents "
                "GROUP BY lang), "
                "filt AS (SELECT lang, n FROM agg WHERE n >= 60) "
                "SELECT d.region AS region, sum(filt.n) AS n FROM filt "
                "JOIN ldim2 d ON filt.lang = d.lang GROUP BY d.region "
                "ORDER BY region")
            assert api.last_routed_rollup == "doc_lang_rollup"
            got = {(r["region"], r["n"]) for r in df.collect()}
            want = {
                (r["region"], r["n"])
                for r in docs.groupBy("lang").agg(F.count("*").alias("n"))
                .filter(F.col("n") >= 60).join(dim, "lang")
                .groupBy("region").agg(F.sum("n").alias("n")).collect()
            }
            assert got == want and got
            # mid-chain JOIN still falls back
            api.sql(
                "WITH agg AS (SELECT lang, count(*) AS n FROM documents "
                "GROUP BY lang), "
                "filt AS (SELECT agg.lang, agg.n FROM agg JOIN ldim2 d "
                "ON agg.lang = d.lang) "
                "SELECT lang, n FROM filt ORDER BY lang").collect()
            assert api.last_routed_rollup is None
        finally:
            shutil.rmtree(root, ignore_errors=True)

    @pytest.mark.parametrize("q", [
        # chain whose SECOND body reads the raw table (undiscovered on
        # the routed path) — must fall back
        "WITH agg AS (SELECT lang, count(*) AS n FROM documents GROUP "
        "BY lang), x AS (SELECT lang FROM documents) "
        "SELECT lang FROM x",
        # chain whose outer SKIPS the last CTE (non-linear)
        "WITH agg AS (SELECT lang, count(*) AS n FROM documents GROUP "
        "BY lang), x AS (SELECT lang, n FROM agg) "
        "SELECT lang FROM agg",
        # outer comma-joins the chain tail to a raw table
        "WITH agg AS (SELECT lang, count(*) AS n FROM documents GROUP "
        "BY lang), x AS (SELECT lang, n FROM agg) "
        "SELECT x.lang FROM x, documents d WHERE x.lang = d.lang "
        "LIMIT 1",
        # mid-CTE references the first twice (self-join inside chain)
        "WITH agg AS (SELECT lang, count(*) AS n FROM documents GROUP "
        "BY lang), x AS (SELECT a.lang FROM agg a JOIN agg b ON "
        "a.lang = b.lang) SELECT lang FROM x",
    ])
    def test_unproven_chain_shapes_fall_back(self, spark, q):
        import shutil

        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.queries.routing_q import _build_rollup_serve_tree

        root, data = _build_rollup_serve_tree(spark, "/root/testdata/sf0.001")
        try:
            api = HepopQueryAPI(spark, default_window=False, data_dir=data)
            api.sql(q).collect()  # raw path still answers
            assert api.last_routed_rollup is None
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def test_duplicate_cte_names_refused_at_route(self, spark):
        """Shadowed names are a parse error in Spark itself — the route
        must refuse them BEFORE any rewrite (never route a statement the
        engine will reject differently than the raw text would)."""
        import shutil

        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.queries.routing_q import _build_rollup_serve_tree

        root, data = _build_rollup_serve_tree(spark, "/root/testdata/sf0.001")
        try:
            api = HepopQueryAPI(spark, default_window=False, data_dir=data)
            assert api._try_cte_route(
                "WITH agg AS (SELECT lang, count(*) AS n FROM documents "
                "GROUP BY lang), agg AS (SELECT 1 AS one) "
                "SELECT lang FROM agg") is None
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def test_join_to_unresolvable_dim_falls_back(self, spark):
        """The route must refuse (None) when a JOIN target neither
        discovers nor resolves — conservative fallback, not an
        AnalysisException after the rewrite."""
        import shutil

        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.queries.routing_q import _build_rollup_serve_tree

        root, data = _build_rollup_serve_tree(spark, "/root/testdata/sf0.001")
        try:
            api = HepopQueryAPI(spark, default_window=False, data_dir=data)
            routed = api._try_cte_route(
                "WITH agg AS (SELECT lang, count(*) AS n FROM documents "
                "GROUP BY lang) SELECT d.x FROM agg JOIN nosuch_dim_12 d "
                "ON agg.lang = d.lang")
            assert routed is None
        finally:
            shutil.rmtree(root, ignore_errors=True)


class TestZoneComplement:
    def test_zone_complement_candidates_semantics(self, tmp_path):
        from hepop_spark.storage import sidecar
        from hepop_spark.storage.bloom_index import (
            zone_complement_candidates,
        )

        base = str(tmp_path / "t")
        os.makedirs(os.path.join(base, "p"))
        # plant four zone entries by hand: contained / straddling /
        # outside / all-null, plus one file with NO entry
        for name in ("a", "b", "c", "d", "e"):
            open(os.path.join(base, "p", f"{name}.parquet"), "w").close()
        sidecar.update_entries(base, "zone", "v", {
            "p/a.parquet": {"lo": 20.0, "hi": 80.0},   # contained: skip
            "p/b.parquet": {"lo": 5.0, "hi": 50.0},    # mixed: keep
            "p/c.parquet": {"lo": 200.0, "hi": 300.0},  # outside: keep
            "p/d.parquet": {"lo": None, "hi": None},   # all-null: skip
        })
        within = [f"p/{n}.parquet" for n in ("a", "b", "c", "d", "e")]
        kept, live, pruned = zone_complement_candidates(
            base, "v", 10.0, 100.0, within=within)
        assert set(kept) == {"p/b.parquet", "p/c.parquet", "p/e.parquet"}
        assert (live, pruned) == (5, 2)
        # an open end disables the complement (one-sided negations are
        # plain ranges, expressed elsewhere)
        kept2, _, pruned2 = zone_complement_candidates(
            base, "v", None, 100.0, within=within)
        assert pruned2 == 0 and len(kept2) == 5

    @pytest.fixture(scope="class")
    def spark(self):
        from hepop_spark.session import get_spark

        return get_spark("test-round12-zone")

    def _tree(self, spark, tmp_path):
        from hepop_spark.storage.bloom_index import (
            bloom_index_update,
            zone_index_update,
        )

        data = str(tmp_path / "data")
        tbl = f"{data}/w1/dbs/nz12"
        (
            spark.range(1600)
            .select(
                F.col("id").alias("event_id"),
                F.concat(F.lit("c-"), F.col("id")).alias("call_id"),
                (F.col("id") % 400).cast("double").alias("v"),
            )
            .repartitionByRange(8, "v")
            .write.parquet(tbl)
        )
        bloom_index_update(spark, tbl, "call_id")
        zone_index_update(spark, tbl, "v")
        return data

    def test_not_between_prunes_and_mixed_file_survives(self, spark,
                                                        tmp_path):
        """The no-false-negative pin (r11 verdict item 2 done-criterion):
        boundary files hold rows on BOTH sides of [a, b] and must
        survive; interior files are skipped; the count is exact."""
        from hepop_spark.plans.api import HepopQueryAPI

        data = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        # v is id % 400 over 8 range files (~50-wide zones): [60, 340]
        # contains several whole files; the files holding v<60 / v>340
        # straddle the bounds -> mixed, must be scanned
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM nz12 "
            "WHERE NOT (v BETWEEN 60.0 AND 340.0)")
        # per wheel of 400: v in {0..59} u {341..399} = 119 values x 4
        assert rows == [{"n": 476}]
        bp = api.last_bloom_pruned
        assert bp and ("zone_not", "v") in bp["probes"]
        assert 0 < bp["files_read"] < bp["files_live"]

    def test_neq_and_not_eq_prune_constant_file(self, spark, tmp_path):
        """x != c skips only files whose zone is the single point c —
        build one such file and watch it drop; results stay exact."""
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.bloom_index import zone_index_update

        data = str(tmp_path / "data")
        tbl = f"{data}/w1/dbs/cz12"
        base = spark.range(100).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 10).cast("double").alias("v"))
        const = spark.range(100, 150).select(
            F.col("id").alias("event_id"),
            F.lit(77.0).alias("v"))
        base.coalesce(1).write.parquet(tbl)
        const.coalesce(1).write.mode("append").parquet(tbl)
        zone_index_update(spark, tbl, "v")
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        for sql in (
            "SELECT count(*) AS n FROM cz12 WHERE v != 77.0",
            "SELECT count(*) AS n FROM cz12 WHERE v <> 77.0",
            "SELECT count(*) AS n FROM cz12 WHERE NOT v = 77.0",
            "SELECT count(*) AS n FROM cz12 WHERE NOT (v = 77.0)",
        ):
            rows, _ = api.query_json(sql)
            assert rows == [{"n": 100}], sql
            bp = api.last_bloom_pruned
            assert bp and ("zone_not", "v") in bp["probes"], sql
            assert bp["files_read"] < bp["files_live"], sql

    def test_not_under_or_restricts_when_provable(self, spark, tmp_path):
        """r12: a PROVABLE negated leaf restricts its own OR branch
        (union algebra), instead of poisoning the disjunction."""
        from hepop_spark.plans.api import HepopQueryAPI

        data = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM nz12 "
            "WHERE call_id = 'c-200' OR NOT (v BETWEEN 50.0 AND 399.0)")
        # c-200 (v=200, inside the interval) + v in {0..49} x 4 = 201
        assert rows == [{"n": 201}]
        bp = api.last_bloom_pruned
        assert bp and ("bloom", "call_id") in bp["probes"] \
            and ("zone_not", "v") in bp["probes"]
        assert bp["files_read"] < bp["files_live"]
        # one-sided negation stays UNSERVED: poison under OR, exactly
        # the r11 pin (kept here against the r12 leaf grammar)
        rows2, _ = api.query_json(
            "SELECT count(*) AS n FROM nz12 "
            "WHERE call_id = 'c-200' OR NOT v >= 1.0")
        assert rows2 == [{"n": 5}]
        assert api.last_bloom_pruned is None


class TestSidecarGcBackstop:
    def test_low_churn_store_prunes_heads(self, tmp_path, monkeypatch):
        """r11 ADVICE: with GC_EVERY effectively disabled, the overgrown
        backstop alone must keep head count bounded."""
        from hepop_spark.storage import sidecar

        monkeypatch.setattr(sidecar, "GC_EVERY", 10**9)
        base = str(tmp_path / "t")
        os.makedirs(base)
        for i in range(20):
            sidecar.update_entries(
                base, "bloom", "key",
                {f"shard={i % 4}/f{i}.parquet": {"m": 1024, "bits": "1"}})
        d = sidecar.sidecar_dir(base, "bloom", "key")
        heads = sidecar._head_versions(d)
        assert len(heads) <= sidecar.KEEP_HEADS + sidecar.GC_SLACK
        # and the store still answers completely
        got = sidecar.load_entries(base, "bloom", "key")
        assert len(got) == 20


class TestGraphAnn:
    @pytest.fixture(scope="class")
    def spark(self):
        from hepop_spark.session import get_spark

        return get_spark("test-round12-graph")

    def test_beam_search_navigates_clustered_corpus(self, spark):
        """Navigability proof on data WITH local structure (the regime
        graph ANN exists for): 8 well-separated clusters, exact kNN
        graph, md5 entry points — beam search must reach >=0.9 recall@5
        while visiting a fraction of the corpus. (On the near-uniform
        synthetic embeddings table the walk is weakly guided — that
        floor is pinned separately against ann_recall_eval.)"""
        import numpy as np

        from hepop_spark.queries.llm7 import graph_beam_search

        # 6 clusters x 40 points, moderately separated so the kNN graph
        # keeps SOME cross-cluster edges — a flat (single-layer) graph
        # needs either entry coverage or connectivity to reach every
        # cluster; fully disjoint islands are the regime HNSW's upper
        # layers exist for, out of scope for this walk
        rng = np.random.RandomState(7)
        centers = rng.randn(6, 16) * 2.0
        pts, ids = [], []
        vid = 100
        for ci in range(6):
            for _ in range(40):
                pts.append(centers[ci] + rng.randn(16) * 0.7)
                ids.append(vid)
                vid += 1
        corpus = np.stack(pts)
        qvecs = centers + rng.randn(6, 16) * 0.47

        def cos_matrix(a, b):
            an = a / np.linalg.norm(a, axis=1, keepdims=True)
            bn = b / np.linalg.norm(b, axis=1, keepdims=True)
            return np.round(an @ bn.T, 4)

        # exact kNN graph (degree 8), symmetrized
        cs = cos_matrix(corpus, corpus)
        np.fill_diagonal(cs, -2.0)
        edges = set()
        for i in range(len(ids)):
            for j in np.argsort(-cs[i])[:8]:
                edges.add((ids[i], ids[int(j)]))
                edges.add((ids[int(j)], ids[i]))
        # exact answers
        qc = cos_matrix(qvecs, corpus)
        exact = {
            q: {ids[int(j)] for j in np.argsort(-qc[q])[:5]}
            for q in range(6)
        }
        vecs = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, corpus)],
            "vec_id long, embedding array<double>")
        qs = spark.createDataFrame(
            [(int(q), [float(x) for x in qvecs[q]]) for q in range(6)],
            "q_id long, qv array<double>")
        graph = spark.createDataFrame(
            [(int(a), int(b)) for a, b in sorted(edges)],
            "node long, nbr long")
        import hashlib

        eps_ids = sorted(
            ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
        )[:12]
        eps = spark.createDataFrame([(int(i),) for i in eps_ids],
                                    "node long")
        out = graph_beam_search(vecs, qs, graph, eps, hops=4, beam=24,
                                k=5).collect()
        got = {}
        for r in out:
            got.setdefault(r["q_id"], set()).add(r["c_id"])
        hits = sum(len(exact[q] & got.get(q, set())) for q in range(6))
        assert hits / 30 >= 0.9, f"clustered recall {hits / 30}"

    def test_refine_round_is_monotone(self, spark):
        """NN-descent invariant: the refined top-K per node dominates
        the base graph's (old edges stay candidates, so per-node mean
        similarity can only rise)."""
        from pyspark.sql import functions as F

        from hepop_spark.queries.llm7 import knn_graph_build, knn_graph_refine

        sf = "/root/testdata/sf0.001"
        base = knn_graph_build(spark, sf).groupBy("node").agg(
            F.sum("sim").alias("s0"), F.count("*").alias("n0"))
        ref = knn_graph_refine(spark, sf).groupBy("node").agg(
            F.sum("sim").alias("s1"), F.count("*").alias("n1"))
        j = base.join(ref, "node")
        worse = j.filter((F.col("n1") == F.col("n0"))
                         & (F.col("s1") < F.col("s0") - 1e-9)).count()
        assert worse == 0
        improved = j.filter(F.col("s1") > F.col("s0") + 1e-9).count()
        assert improved > 0  # the round actually finds better neighbors

    def test_recall_floor_includes_graph_path(self, spark):
        """The six-path recall harness carries recall_graph; pin its
        floor (deterministic end-to-end: 0.60 measured at sf0.001 with
        GRAPH_DEGREE=12, E=8, B=24, H=4 — the floor leaves headroom for
        testdata regen)."""
        import statistics

        from hepop_spark.queries.analytics5 import ann_recall_eval

        rows = ann_recall_eval(spark, "/root/testdata/sf0.001").collect()
        assert rows and "recall_graph" in rows[0].asDict()
        mean_graph = statistics.mean(r["recall_graph"] for r in rows)
        assert mean_graph >= 0.4, f"graph recall floor broken: {mean_graph}"
