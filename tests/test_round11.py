"""Round-11 regression pins: the r10 ADVICE items.

1 (high). AND/OR precedence in the proven WHERE/HAVING parsers — OR
   binds loosest in SQL, so `a = 1 OR b = 2 AND c = 3` means
   a OR (b AND c). The r10 parsers split depth-0 ANDs first and
   mis-grouped it as (a OR b) AND c, which reached rollup-grid routing
   (wrong aggregates) and sidecar file pruning (false-negative file
   skipping). Tests here cover the UNPARENTHESIZED mixes the r10 suite
   missed, unit + end-to-end on both consumers.
2 (low). /explain CTE smuggling: `WITH t AS (...) INSERT ...` passed
   the head-token SELECT guard and executed eagerly.
3 (low). sidecar _gc vs a slow publisher: a writer stalled > the age
   bound between _write_segment and _publish_head had its segments
   reaped; heads then referenced missing segments (pruning silently
   degrades). Writers now register in-flight segments via .pending
   markers that _gc honors.
"""

from __future__ import annotations

import os

import pytest
import pyspark.sql.functions as F


class TestPrecedenceParsers:
    """Unit pins for the OR-binds-loosest fix (unparenthesized mixes)."""

    def test_conjunct_parser_rejects_mixed_or_and(self):
        # the exact ADVICE repro: used to return [(a, IN (1,2)), (c, =3)]
        from hepop_spark.plans.api import _parse_where_conjuncts

        assert _parse_where_conjuncts("a = 1 OR a = 2 AND c = 3") is None
        assert _parse_where_conjuncts("a = 1 OR b = 2 AND c = 3") is None
        # pure forms keep working
        assert _parse_where_conjuncts("a = 1 OR a = 2") == \
            [("a", "IN (1, 2)")]
        assert _parse_where_conjuncts("a = 1 AND c = 3") == \
            [("a", "= 1"), ("c", "= 3")]
        # parenthesized mixed still flattens to conjuncts
        assert _parse_where_conjuncts("(a = 1 OR a = 2) AND c = 3") == \
            [("a", "IN (1, 2)"), ("c", "= 3")]
        # BETWEEN's AND never splits
        assert _parse_where_conjuncts(
            "x BETWEEN 1 AND 5 AND y = 2") == \
            [("x", "BETWEEN 1 AND 5"), ("y", "= 2")]

    def test_where_tree_precedence(self):
        from hepop_spark.plans.api import _where_tree

        assert _where_tree("a = 1 OR b = 2 AND c = 3") == (
            "or", [("leaf", "a", "= 1"),
                   ("and", [("leaf", "b", "= 2"), ("leaf", "c", "= 3")])])
        assert _where_tree("a = 1 AND b = 2 OR c = 3") == (
            "or", [("and", [("leaf", "a", "= 1"), ("leaf", "b", "= 2")]),
                   ("leaf", "c", "= 3")])
        # parens flip it back
        assert _where_tree("(a = 1 OR b = 2) AND c = 3") == (
            "and", [("or", [("leaf", "a", "= 1"), ("leaf", "b", "= 2")]),
                    ("leaf", "c", "= 3")])
        # BETWEEN inside a disjunct-then-conjunct mix
        assert _where_tree("a = 1 AND b BETWEEN 2 AND 3 OR c = 4") == (
            "or", [("and", [("leaf", "a", "= 1"),
                            ("leaf", "b", "BETWEEN 2 AND 3")]),
                   ("leaf", "c", "= 4")])

    def test_not_leaves_parse_and_bind_tight(self):
        from hepop_spark.plans.api import _where_tree

        assert _where_tree("NOT lang = 'en'") == (
            "not", [("leaf", "lang", "= 'en'")])
        # NOT binds tighter than AND: (NOT a) AND b
        assert _where_tree("NOT lang = 'en' AND source = 'x'") == (
            "and", [("not", [("leaf", "lang", "= 'en'")]),
                    ("leaf", "source", "= 'x'")])
        # NOT over a parenthesized disjunction
        assert _where_tree("NOT (lang = 'en' OR source = 'x')") == (
            "not", [("or", [("leaf", "lang", "= 'en'"),
                            ("leaf", "source", "= 'x'")])])
        # rewrite onto grid columns handles the not node
        from hepop_spark.plans.api import _tree_rewrite_sql

        km = {"lang": "lang", "source": "source"}
        assert _tree_rewrite_sql(
            _where_tree("NOT (lang = 'en' OR source = 'x')"), km) == \
            "(NOT (lang = 'en' OR source = 'x'))"
        # a NOT over a non-key leaf still refuses
        assert _tree_rewrite_sql(
            _where_tree("NOT n_chars = 5"), km) is None

    def test_not_branch_never_contributes_sidecar_restriction(self):
        """A probe proves may-contain; its complement proves nothing —
        NOT under AND is skipped, NOT under OR disables pruning."""
        # covered end-to-end below via the pruning fixture; here pin the
        # parser-side invariant that NOT never reaches a leaf probe
        from hepop_spark.plans.api import _where_tree

        t = _where_tree("call_id = 'c-1' OR NOT v = 2.0")
        assert t == ("or", [("leaf", "call_id", "= 'c-1'"),
                            ("not", [("leaf", "v", "= 2.0")])])

    def test_simple_aggregate_mixed_where_parses_to_correct_tree(self):
        from hepop_spark.plans.api import WhereTree, parse_simple_aggregate

        p = parse_simple_aggregate(
            "SELECT k, count(*) AS n FROM t "
            "WHERE a = 1 OR b = 2 AND c = 3 GROUP BY k")
        assert isinstance(p[4], WhereTree)
        assert p[4].tree[0] == "or"
        assert p[4].tree[1][1][0] == "and"

    def test_having_mixed_or_and_parses_to_correct_tree(self):
        from hepop_spark.plans.api import WhereTree, parse_simple_aggregate

        p = parse_simple_aggregate(
            "SELECT k, count(*) AS n FROM t GROUP BY k "
            "HAVING count(*) > 5 OR k >= 2 AND count(*) < 3")
        assert isinstance(p[5], WhereTree)
        t = p[5].tree
        assert t[0] == "or" and t[1][0] == ("leaf", "count(*)", "> 5")
        assert t[1][1] == ("and", [("leaf", "k", ">= 2"),
                                   ("leaf", "count(*)", "< 3")])


class TestPrecedenceRollupRouting:
    """End-to-end: an unparenthesized `x OR y AND z` WHERE over a
    maintained grid must produce the SAME rows as the raw scan —
    under the r10 parser it silently returned (x OR y) AND z."""

    @pytest.fixture(scope="class")
    def spark(self):
        from hepop_spark.session import get_spark

        return get_spark("test-round11-routing")

    def test_routed_mixed_precedence_matches_raw(self, spark):
        import shutil

        from hepop_spark.catalog import load_table
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.queries.routing_q import _build_rollup_serve_tree

        root, data = _build_rollup_serve_tree(spark, "/root/testdata/sf0.001")
        try:
            api = HepopQueryAPI(spark, default_window=False, data_dir=data)
            sql = ("SELECT lang, count(*) AS n FROM documents "
                   "WHERE lang = 'en' OR lang = 'de' AND source = 'web' "
                   "GROUP BY lang ORDER BY lang")
            df = api.sql(sql)
            assert api.last_routed_rollup == "doc_lang_rollup"
            got = {(r["lang"], r["n"]) for r in df.collect()}
            raw = load_table(spark, "/root/testdata/sf0.001", "documents")
            want = {
                (r["lang"], r["n"])
                for r in raw.filter(
                    (F.col("lang") == "en")
                    | ((F.col("lang") == "de") & (F.col("source") == "web")))
                .groupBy("lang").agg(F.count("*").alias("n")).collect()
            }
            assert got == want and got
            # the buggy grouping would ALSO have returned 'de' rows from
            # non-web sources or dropped them — assert the distinguishing
            # row explicitly: 'de' count == de-web only
            de_web = raw.filter((F.col("lang") == "de")
                                & (F.col("source") == "web")).count()
            de_all = raw.filter(F.col("lang") == "de").count()
            assert de_web != de_all  # fixture is non-degenerate
            assert dict(got).get("de", 0) == de_web
        finally:
            shutil.rmtree(root, ignore_errors=True)


class TestPrecedencePruning:
    """End-to-end: the ADVICE false-negative — a file whose rows satisfy
    only the first OR branch must NOT be skipped when the second branch
    carries an unparenthesized AND."""

    @pytest.fixture(scope="class")
    def spark(self):
        from hepop_spark.session import get_spark

        return get_spark("test-round11-pruning")

    def _tree(self, spark, tmp_path):
        from hepop_spark.storage.bloom_index import (
            bloom_index_update,
            zone_index_update,
        )

        data = str(tmp_path / "data")
        tbl = f"{data}/w1/dbs/mix11"
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

    def test_or_and_mix_does_not_false_negative_prune(self, spark,
                                                      tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        # true predicate: call_id='c-9' OR (call_id='c-1300' AND
        # v BETWEEN 300 AND 301). c-9 lives in the low-v file (v=9);
        # c-1300 has v=100, which fails the BETWEEN -> exactly 1 row.
        # The r10 parse intersected the zone probe over BOTH branches
        # and pruned c-9's file -> 0 rows.
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM mix11 "
            "WHERE call_id = 'c-9' OR call_id = 'c-1300' "
            "AND v BETWEEN 300.0 AND 301.0")
        assert rows == [{"n": 1}]
        bp = api.last_bloom_pruned
        # pruning still engages (both branches restrict) and still skips
        # files — just never the c-9 file
        assert bp and bp["files_read"] < bp["files_live"]

    def test_not_under_or_disables_pruning_under_and_skips(self, spark,
                                                           tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        # NOT branch of an OR cannot restrict -> whole OR falls back
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM mix11 "
            "WHERE call_id = 'c-9' OR NOT v >= 1.0")
        assert rows == [{"n": 5}]  # c-9 + ids {0,400,800,1200} (v=0)
        assert api.last_bloom_pruned is None
        # NOT conjunct under AND is skipped; the bloom conjunct prunes
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM mix11 "
            "WHERE call_id = 'c-9' AND NOT v >= 100.0")
        assert rows == [{"n": 1}]
        bp = api.last_bloom_pruned
        assert bp and bp["files_read"] < bp["files_live"]

    def test_or_with_unindexed_like_branch_disables_pruning(self, spark,
                                                            tmp_path):
        """The no-false-negatives pin for sidecar_routed_or_like: a LIKE
        on a column with NO trigram sidecar cannot restrict its branch,
        so the whole OR must fall back to the full file list."""
        from hepop_spark.plans.api import HepopQueryAPI

        data = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM mix11 "
            "WHERE call_id = 'c-9' OR call_id LIKE '%c-123%'")
        # c-9 + {c-123, c-1230..c-1239} = 12 rows; call_id has a bloom
        # but NO trigram sidecar, so the LIKE branch cannot restrict
        assert rows == [{"n": 12}]
        assert api.last_bloom_pruned is None

    def test_and_or_mix_exact_too(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        # (c-9 AND v<=200) OR v BETWEEN 399 AND 399 -> 1 + 4 rows
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM mix11 "
            "WHERE call_id = 'c-9' AND v <= 200.0 "
            "OR v BETWEEN 399.0 AND 399.0")
        assert rows == [{"n": 5}]


class TestCteRouting:
    """r10 verdict item 6: single-CTE wrappers route their aggregate
    body onto the grid; every unproven shape falls back to raw."""

    @pytest.fixture(scope="class")
    def spark(self):
        from hepop_spark.session import get_spark

        return get_spark("test-round11-cte")

    def test_split_single_cte_shapes(self):
        from hepop_spark.plans.api import split_single_cte

        assert split_single_cte(
            "WITH a AS (SELECT 1) SELECT * FROM a") == \
            ("a", "SELECT 1", "SELECT * FROM a")
        # nested parens and quoted ')' inside the body
        assert split_single_cte(
            "WITH a AS (SELECT count(*) FROM t WHERE x = ')') "
            "SELECT * FROM a")[1] == \
            "SELECT count(*) FROM t WHERE x = ')'"
        # comma chain -> None
        assert split_single_cte(
            "WITH a AS (SELECT 1), b AS (SELECT 2) SELECT * FROM a") \
            is None
        # no WITH -> None
        assert split_single_cte("SELECT 1") is None
        # unbalanced -> None
        assert split_single_cte("WITH a AS (SELECT 1 SELECT 2") is None

    def test_cte_routes_and_matches_raw(self, spark):
        import shutil

        from hepop_spark.catalog import load_table
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.queries.routing_q import _build_rollup_serve_tree

        root, data = _build_rollup_serve_tree(spark, "/root/testdata/sf0.001")
        try:
            api = HepopQueryAPI(spark, default_window=False, data_dir=data)
            df = api.sql(
                "WITH agg AS (SELECT lang, count(*) AS n FROM documents "
                "GROUP BY lang) "
                "SELECT lang, n FROM agg WHERE n >= 74 ORDER BY lang")
            assert api.last_routed_rollup == "doc_lang_rollup"
            got = {(r["lang"], r["n"]) for r in df.collect()}
            raw = load_table(spark, "/root/testdata/sf0.001", "documents")
            want = {
                (r["lang"], r["n"])
                for r in raw.groupBy("lang")
                .agg(F.count("*").alias("n")).filter(F.col("n") >= 74)
                .collect()
            }
            assert got == want and got
        finally:
            shutil.rmtree(root, ignore_errors=True)

    @pytest.mark.parametrize("q", [
        # comma-chained CTEs: a later CTE could read the first
        "WITH agg AS (SELECT lang, count(*) AS n FROM documents GROUP BY "
        "lang), x AS (SELECT 1 AS one) SELECT lang FROM agg",
        # self-join of the CTE (referenced twice)
        "WITH agg AS (SELECT lang, count(*) AS n FROM documents GROUP BY "
        "lang) SELECT a.lang FROM agg a, agg b LIMIT 1",
        # comma-style join back to a raw table (r11 ADVICE): the JOIN-
        # keyword check misses it, so the FROM-clause depth-0 comma
        # check must reject it (r12 routes keyword JOINs by discovering
        # the dim, so the comma spelling is the remaining unproven one)
        "WITH agg AS (SELECT lang, count(*) AS n FROM documents GROUP BY "
        "lang) SELECT d.lang FROM agg, documents d WHERE agg.lang = "
        "d.lang LIMIT 1",
        # nested WITH in the outer statement
        "WITH agg AS (SELECT lang, count(*) AS n FROM documents GROUP BY "
        "lang) SELECT lang FROM (WITH z AS (SELECT 1) SELECT lang FROM "
        "agg) LIMIT 1",
        # body not routable (raw measure column filter)
        "WITH agg AS (SELECT lang, count(*) AS n FROM documents WHERE "
        "n_chars > 100000000 GROUP BY lang) SELECT lang FROM agg",
    ])
    def test_unproven_cte_shapes_fall_back(self, spark, q):
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


class TestExplainCteDmlGuard:
    """r10 ADVICE (low): WITH-headed DML must 400 on /explain, not run."""

    @pytest.fixture(scope="class")
    def spark(self):
        from hepop_spark.session import get_spark

        return get_spark("test-round11-explain")

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

    def test_with_cte_dml_rejected_without_execution(self, spark,
                                                     tmp_path):
        import urllib.parse

        from hepop_spark.plans.http_server import HepopHttpServer

        data = str(tmp_path / "data")
        tbl = os.path.join(data, "w1", "dbs", "t11")
        spark.range(5).select(F.col("id").alias("v")) \
            .write.parquet(tbl)
        srv = HepopHttpServer(spark, default_window=False,
                              data_dir=data).start()
        try:
            sink = str(tmp_path / "smuggled")
            q = urllib.parse.quote(
                "WITH t AS (SELECT 1 AS x) "
                f"INSERT OVERWRITE DIRECTORY '{sink}' USING parquet "
                "SELECT * FROM t")
            code, body = self._fetch(srv.port, f"/explain?q={q}")
            assert code == 400 and "INSERT" in body["error"]
            assert not os.path.exists(sink)  # nothing executed
            # CREATE behind WITH also rejected
            q2 = urllib.parse.quote(
                "WITH t AS (SELECT 1 AS x) CREATE TABLE nope AS "
                "SELECT * FROM t")
            assert self._fetch(srv.port, f"/explain?q={q2}")[0] == 400
            # the keywords INSIDE string literals stay legal
            q3 = urllib.parse.quote(
                "SELECT count(*) AS n FROM t11 WHERE 'insert' <> 'drop'")
            code3, body3 = self._fetch(srv.port, f"/explain?q={q3}")
            assert code3 == 200
        finally:
            srv.stop()


class TestTwoLevelHeads:
    """r10 verdict item 7: past FLAT_MAX_PARTS partitions the head holds
    {group: map-file} hash buckets instead of the O(partitions) inline
    segments map — updates rewrite only touched groups."""

    def _seed(self, base, n_parts, files_per_part=2):
        from hepop_spark.storage import sidecar as sc

        entries = {
            f"date=2024-{1 + (p % 12):02d}-{1 + (p % 28):02d}/p{p}"
            f"/f{i}.parquet": {"v": p * 100 + i}
            for p in range(n_parts) for i in range(files_per_part)
        }
        sc.update_entries(base, "bloom", "k", entries)
        return entries

    def test_small_store_stays_flat(self, tmp_path):
        from hepop_spark.storage import sidecar as sc

        base = str(tmp_path / "t")
        self._seed(base, 10)
        _v, head = sc.load_head(base, "bloom", "k")
        assert "groups" not in head and len(head["segments"]) == 10

    def test_promotion_and_full_read_equivalence(self, tmp_path):
        from hepop_spark.storage import sidecar as sc

        base = str(tmp_path / "t")
        entries = self._seed(base, sc.FLAT_MAX_PARTS + 40)
        _v, head = sc.load_head(base, "bloom", "k")
        assert "segments" not in head and head["groups"]
        assert len(head["groups"]) <= sc.N_GROUPS
        got = sc.load_entries(base, "bloom", "k")
        assert got == entries

    def test_grouped_update_touches_only_its_group(self, tmp_path):
        from hepop_spark.storage import sidecar as sc

        base = str(tmp_path / "t")
        self._seed(base, sc.FLAT_MAX_PARTS + 40)
        _v1, h1 = sc.load_head(base, "bloom", "k")
        rel = "date=2024-01-01/p0/extra.parquet"
        sc.update_entries(base, "bloom", "k", {rel: {"v": -1}})
        _v2, h2 = sc.load_head(base, "bloom", "k")
        changed = [g for g in h2["groups"]
                   if h2["groups"][g] != h1["groups"].get(g)]
        assert changed == [sc._group_of("date=2024-01-01/p0")]
        # targeted read opens only the wanted group's map
        got = sc.load_entries(base, "bloom", "k", files=[rel])
        assert got == {rel: {"v": -1}}

    def test_grouped_drop_and_empty_group_removal(self, tmp_path):
        from hepop_spark.storage import sidecar as sc

        base = str(tmp_path / "t")
        entries = self._seed(base, sc.FLAT_MAX_PARTS + 40, files_per_part=1)
        victim_part = "date=2024-01-01/p0"
        victims = {f for f in entries if f.startswith(victim_part + "/")}
        assert victims
        sc.update_entries(base, "bloom", "k", {}, drop=victims)
        got = sc.load_entries(base, "bloom", "k")
        assert set(got) == set(entries) - victims
        # the partition is gone from its group map
        _v, head = sc.load_head(base, "bloom", "k")
        d = sc.sidecar_dir(base, "bloom", "k")
        gm = sc._load_map(d, head["groups"][sc._group_of(victim_part)])
        assert victim_part not in gm

    def test_gc_reaps_old_maps_keeps_referenced(self, tmp_path):
        import os as _os

        from hepop_spark.storage import sidecar as sc

        base = str(tmp_path / "t")
        self._seed(base, sc.FLAT_MAX_PARTS + 40)
        d = sc.sidecar_dir(base, "bloom", "k")
        objs = _os.path.join(d, sc.OBJS_SUBDIR)
        # churn one partition many times -> many superseded map files
        for i in range(3 + sc.KEEP_HEADS):
            sc.update_entries(base, "bloom", "k",
                              {f"date=2024-01-01/p0/c{i}.parquet":
                               {"v": i}})
        maps = [f for f in _os.listdir(objs) if f.startswith("map-")]
        # age everything so the 60 s guard doesn't hide the logic
        old = sc.time.time() - 120
        for f in _os.listdir(objs):
            if f.startswith(("map-", "seg-")):
                _os.utime(_os.path.join(objs, f), (old, old))
        sc._gc(d)
        kept = {f for f in _os.listdir(objs) if f.startswith("map-")}
        # every map referenced by a kept head survives; stale ones go
        referenced = set()
        for v in sc._head_versions(d):
            import json as _json
            with open(_os.path.join(d, f"head_v{v}.json")) as fh:
                referenced.update(_json.load(fh).get("groups", {}).values())
        assert kept == referenced and len(kept) < len(maps)
        # reads still complete through the survivors
        got = sc.load_entries(
            base, "bloom", "k",
            files=[f"date=2024-01-01/p0/c{3 + sc.KEEP_HEADS - 1}.parquet"])
        assert got


class TestSidecarPendingGc:
    """r10 ADVICE (low): in-flight segment registration vs _gc."""

    def test_pending_marker_blocks_reap_until_cleared(self, tmp_path):
        from hepop_spark.storage import sidecar as sc

        d = str(tmp_path / "_bloom" / "c.d")
        name = sc._write_segment(d, "p=1", {"f1": {"x": 1}})
        seg = os.path.join(d, sc.OBJS_SUBDIR, name)
        marker = seg + ".pending"
        assert os.path.exists(marker)
        # age the SEGMENT past the 60 s bound (the stalled-writer case:
        # written long ago, head not yet published, marker still live)
        old = sc.time.time() - 120
        os.utime(seg, (old, old))
        sc._gc(d)
        assert os.path.exists(seg), \
            "pending segment reaped despite in-flight marker"
        # writer finishes: marker cleared -> next gc reaps the (still
        # unreferenced) segment
        sc._clear_pending(d, [name])
        sc._gc(d)
        assert not os.path.exists(seg)

    def test_stale_marker_of_dead_writer_is_reaped(self, tmp_path):
        from hepop_spark.storage import sidecar as sc

        d = str(tmp_path / "_zone" / "c.d")
        name = sc._write_segment(d, "p=1", {"f1": {"x": 1}})
        seg = os.path.join(d, sc.OBJS_SUBDIR, name)
        marker = seg + ".pending"
        dead = sc.time.time() - (sc.PENDING_TTL + 60)
        os.utime(marker, (dead, dead))
        os.utime(seg, (dead, dead))
        sc._gc(d)
        assert not os.path.exists(marker)
        sc._gc(d)  # marker gone -> age bound applies -> segment reaped
        assert not os.path.exists(seg)

    def test_update_entries_leaves_no_markers(self, tmp_path):
        from hepop_spark.storage import sidecar as sc

        base = str(tmp_path / "tbl")
        sc.update_entries(base, "bloom", "c",
                          {"2024-01-01/f1.parquet": {"bits": "AA=="}})
        sc.update_entries(base, "bloom", "c",
                          {"2024-01-02/f2.parquet": {"bits": "AB=="}})
        d = sc.sidecar_dir(base, "bloom", "c")
        leftover = [f for f in os.listdir(os.path.join(d, sc.OBJS_SUBDIR))
                    if f.endswith(".pending")]
        assert leftover == []
        # both entries readable through the published head
        got = sc.load_entries(base, "bloom", "c")
        assert set(got) == {"2024-01-01/f1.parquet",
                            "2024-01-02/f2.parquet"}
