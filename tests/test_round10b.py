"""Round 10: routable-WHERE grammar notch (OR-of-equalities -> IN,
parenthesized AND groups) and the public hepop_spark.sql() entry point.

The prove-or-fall-back discipline is the contract under test: everything
the canonicalizer cannot PROVE routable must return None (raw scan), and
the proven shapes must parse to the exact preds the router rewrites.
"""

from __future__ import annotations

import pytest

from hepop_spark.plans.api import (
    _or_in_canonical,
    _parse_where_conjuncts,
    parse_simple_aggregate,
)


class TestOrInCanonical:
    def test_or_of_equalities_merges(self):
        got = _or_in_canonical("k = 'a' OR k = 'b' OR k = 'c'")
        assert got == ("k", ["'a'", "'b'", "'c'"])

    def test_mixed_in_and_equality(self):
        got = _or_in_canonical("(k IN ('a', 'b') OR k = 'c')")
        assert got == ("k", ["'a'", "'b'", "'c'"])

    def test_numeric_literals(self):
        assert _or_in_canonical("n = 1 OR n = 2") == ("n", ["1", "2"])

    @pytest.mark.parametrize("bad", [
        "k = 'a' OR j = 'b'",          # mixed columns
        "k = 'a' OR k > 'b'",          # range disjunct
        "k = 'a' OR k BETWEEN 1 AND 2",  # BETWEEN disjunct
        "k = 'a'",                     # single disjunct: not an OR group
        "k = 'a' OR (k = 'b' AND j = 'c')",  # nested AND
        "k = 'a' OR k LIKE 'b%'",      # LIKE disjunct
    ])
    def test_rejections(self, bad):
        assert _or_in_canonical(bad) is None


class TestParseWhereConjuncts:
    def test_flat_conjuncts_unchanged(self):
        got = _parse_where_conjuncts("a = 1 AND b BETWEEN 2 AND 3")
        assert got == [("a", "= 1"), ("b", "BETWEEN 2 AND 3")]

    def test_paren_and_group_unwraps(self):
        got = _parse_where_conjuncts("(a = 1 AND b = 2) AND c = 3")
        assert got == [("a", "= 1"), ("b", "= 2"), ("c", "= 3")]

    def test_or_group_canonicalizes(self):
        got = _parse_where_conjuncts(
            "(k = 'x' OR k = 'y') AND (s IN ('p') OR s = 'q')")
        assert got == [("k", "IN ('x', 'y')"), ("s", "IN ('p', 'q')")]

    @pytest.mark.parametrize("bad", [
        "a = 1 OR b = 2",              # top-level mixed-column OR
        "(a = 1 OR b = 2) AND c = 3",  # grouped mixed-column OR
        "NOT a = 1",                   # negation
        "a = 1 AND (b = 2 OR c > 3)",  # OR-of-range in a group
    ])
    def test_rejections_fall_back(self, bad):
        assert _parse_where_conjuncts(bad) is None


class TestParseSimpleAggregateOrIn:
    def test_or_group_routes_through_full_parse(self):
        sql = ("SELECT s, count(*) AS n FROM t "
               "WHERE (k = 'a' OR k = 'b') AND (s = 'w') "
               "GROUP BY s")
        got = parse_simple_aggregate(sql)
        assert got is not None
        table, _items, _gb, _tail, preds, _hav = got
        assert table == "t"
        assert preds == [("k", "IN ('a', 'b')"), ("s", "= 'w'")]

    def test_mixed_or_parses_to_tree_not_preds(self):
        # r10 second notch: a mixed-key OR is no longer a rejection —
        # it parses to a WhereTree the router may rewrite IF every leaf
        # is a grid key (rewrite gate pinned in TestWhereTree)
        from hepop_spark.plans.api import WhereTree

        sql = ("SELECT s, count(*) AS n FROM t "
               "WHERE k = 'a' OR s = 'w' GROUP BY s")
        got = parse_simple_aggregate(sql)
        assert got is not None and isinstance(got[4], WhereTree)

    def test_or_in_select_items_still_rejects(self):
        # OR outside the proven WHERE must still hit the forbidden scan
        sql = ("SELECT s OR q AS x, count(*) AS n FROM t "
               "WHERE k = 'a' GROUP BY s OR q")
        assert parse_simple_aggregate(sql) is None

    def test_plain_shapes_unchanged(self):
        sql = ("SELECT s, count(*) AS n FROM t "
               "WHERE k IN ('a', 'b') AND v >= 3 GROUP BY s")
        got = parse_simple_aggregate(sql)
        assert got is not None
        assert got[4] == [("k", "IN ('a', 'b')"), ("v", ">= 3")]


class TestWhereTree:
    def test_mixed_key_or_parses_to_tree(self):
        from hepop_spark.plans.api import WhereTree

        sql = ("SELECT k, count(*) AS n FROM t "
               "WHERE k = 'a' OR s IN ('x', 'y') GROUP BY k")
        got = parse_simple_aggregate(sql)
        assert got is not None and isinstance(got[4], WhereTree)
        assert got[4].tree == (
            "or", [("leaf", "k", "= 'a'"), ("leaf", "s", "IN ('x', 'y')")])

    def test_nested_tree(self):
        from hepop_spark.plans.api import _where_tree

        t = _where_tree("(a = 1 OR b = 2) AND (c >= 3 OR d BETWEEN 4 AND 5)")
        assert t == ("and", [
            ("or", [("leaf", "a", "= 1"), ("leaf", "b", "= 2")]),
            ("or", [("leaf", "c", ">= 3"),
                    ("leaf", "d", "BETWEEN 4 AND 5")]),
        ])

    @pytest.mark.parametrize("bad", [
        "a = 1 OR b LIKE 'x%'",
        "a = 1 OR exists(SELECT 1)",
        "a = 1 OR b = c",            # non-literal RHS
    ])
    def test_unprovable_trees_reject(self, bad):
        from hepop_spark.plans.api import _where_tree

        assert _where_tree(bad) is None

    def test_not_now_parses_to_a_tree(self):
        # r11 obsoleted the r10 "NOT rejects" pin: NOT over a literal
        # comparison is a proven ('not', [child]) node (negation of a
        # key-only predicate routes exactly; the probe planner still
        # never serves it — tests/test_round11.py)
        from hepop_spark.plans.api import _where_tree

        assert _where_tree("a = 1 OR NOT b = 2") == (
            "or", [("leaf", "a", "= 1"),
                   ("not", [("leaf", "b", "= 2")])])

    def test_rewrite_requires_every_leaf_on_a_key(self):
        from hepop_spark.plans.api import _tree_rewrite_sql, _where_tree

        key_map = {"k": "grid_k", "s": "grid_s"}
        t = _where_tree("k = 'a' OR s = 'b'")
        assert _tree_rewrite_sql(t, key_map) == \
            "(grid_k = 'a' OR grid_s = 'b')"
        t2 = _where_tree("k = 'a' OR measure = 3")
        assert _tree_rewrite_sql(t2, key_map) is None  # falls back to raw


class TestHavingTreeRouting:
    """r10: HAVING boolean trees route — group-level filters of mapped
    comparisons are exact for ANY boolean structure (HAVING runs on the
    re-aggregated grid rows)."""

    @pytest.fixture(scope="class")
    def spark(self):
        from hepop_spark.session import get_spark

        return get_spark("test-round10b-having")

    def test_having_or_routes_and_matches_raw(self, spark):
        import pyspark.sql.functions as F

        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.queries.routing_q import _build_rollup_serve_tree

        import shutil

        root, data = _build_rollup_serve_tree(spark, "/root/testdata/sf0.001")
        try:
            api = HepopQueryAPI(spark, default_window=False, data_dir=data)
            sql = ("SELECT lang, count(*) AS n FROM documents "
                   "GROUP BY lang "
                   "HAVING count(*) >= 60 OR avg(n_chars) > 480 "
                   "ORDER BY lang")
            df = api.sql(sql)
            assert api.last_routed_rollup == "doc_lang_rollup"
            got = {(r["lang"], r["n"]) for r in df.collect()}
            from hepop_spark.catalog import load_table

            raw = load_table(spark, "/root/testdata/sf0.001", "documents")
            want = {
                (r["lang"], r["n"])
                for r in raw.groupBy("lang")
                .agg(F.count("*").alias("n"),
                     F.avg("n_chars").alias("a"))
                .filter((F.col("n") >= 60) | (F.col("a") > 480))
                .collect()
            }
            assert got == want and got  # non-degenerate
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def test_having_or_with_unmapped_leaf_falls_back(self, spark):
        import shutil

        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.queries.routing_q import _build_rollup_serve_tree

        root, data = _build_rollup_serve_tree(spark, "/root/testdata/sf0.001")
        try:
            api = HepopQueryAPI(spark, default_window=False, data_dir=data)
            # sum(doc_id) is not a grid column: the tree cannot map -> raw
            df = api.sql(
                "SELECT lang, count(*) AS n FROM documents GROUP BY lang "
                "HAVING count(*) >= 60 OR sum(doc_id) > 5")
            assert api.last_routed_rollup is None
            assert df.count() >= 1  # raw path still answers
        finally:
            shutil.rmtree(root, ignore_errors=True)


class TestSidecarOrUnion:
    """r10: disjunctive file skipping — OR unions branch candidates and
    engages only when every branch restricts."""

    @pytest.fixture(scope="class")
    def spark(self):
        from hepop_spark.session import get_spark

        return get_spark("test-round10b-union")

    def _tree(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from hepop_spark.storage.bloom_index import (
            bloom_index_update,
            zone_index_update,
        )

        data = str(tmp_path / "data")
        tbl = f"{data}/w1/dbs/mix"
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

    def test_or_union_prunes_and_is_exact(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM mix "
            "WHERE call_id = 'c-9' OR v BETWEEN 100.0 AND 101.0")
        # c-9 (1 row) + v in {100, 101} (4 each of 1600/400... exact):
        # v == id % 400; ids with v in [100,101] -> 8 rows; c-9 has v=9
        assert rows == [{"n": 9}]
        bp = api.last_bloom_pruned
        assert bp and ("bloom", "call_id") in bp["probes"] \
            and ("zone", "v") in bp["probes"]
        assert bp["files_read"] < bp["files_live"]

    def test_or_with_unindexed_branch_disables_pruning(self, spark,
                                                       tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        # event_id has NO sidecar: a file matching that branch must be
        # scanned, so the whole OR cannot restrict — falls back, exact
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM mix "
            "WHERE call_id = 'c-9' OR event_id = 12")
        assert rows == [{"n": 2}]
        assert api.last_bloom_pruned is None

    def test_public_sql_surface_prunes_too(self, spark, tmp_path):
        """hepop_spark.sql() applies the SAME sidecar pruning as the
        HTTP endpoint — the judged entry proves rollup routing; this
        pins the file-skipping half of the public surface."""
        import hepop_spark as hs

        data = self._tree(spark, tmp_path)
        df = hs.sql(spark, "SELECT count(*) AS n FROM mix "
                           "WHERE call_id = 'c-9'", data_dir=data)
        assert df.collect()[0]["n"] == 1
        api = hs._SQL_APIS[(spark, data, False)]
        bp = api.last_bloom_pruned
        assert bp and bp["files_read"] < bp["files_live"]
        hs._SQL_APIS.pop((spark, data, False), None)

    def test_and_of_or_groups_composes(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM mix "
            "WHERE (call_id = 'c-9' OR v BETWEEN 100.0 AND 100.0) "
            "AND v <= 200.0")
        # c-9 has v=9 <= 200 -> 1; v==100 -> 4 rows, all <= 200
        assert rows == [{"n": 5}]
        bp = api.last_bloom_pruned
        assert bp and bp["files_read"] < bp["files_live"]


class TestRotatedOutGateSmoke:
    """r09 ADVICE: names rotated OUT of GATE_WINDOW_50 must not silently
    regress between full sweeps — pin them with a cheap oracle run at
    the smallest scale through the canonical parity harness."""

    ROTATED_OUT = ("dedup_simhash", "ann_cosine_topk",
                   "rollup_routed_aggregate",
                   # rotated out r10 for the or_in/sql-entrypoint flagships
                   "zone_routed_range", "rollup_routed_having",
                   # rotated out r11 for the precedence/HAVING-tree trio
                   "bloom_routed_lookup", "rollup_routed_or_in",
                   "sql_routed_entrypoint", "trigram_routed_like",
                   "interval_overlap_join",
                   # rotated out r12 for the CTE-chain/join, NOT and
                   # graph-ANN flagships
                   "rollup_routed_cte", "rollup_routed_having_or",
                   "sidecar_routed_or_like", "semantic_dedup_cc",
                   "weighted_percentile_maintained",
                   # rotated out r12b for the grouping-sets/derived/
                   # union-all flagships
                   "rollup_routed_where_precedence", "merge_upsert",
                   "embedding_neardup",
                   # rotated out r12c for the parallel-CTE/derived-join
                   # flagships
                   "dedup_incremental_indexed", "kmv_distinct_maintained")

    def test_rotated_out_entries_stay_oracle_green(self):
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "check_parity.py"),
             "/root/testdata/sf0.001", *self.ROTATED_OUT],
            capture_output=True, text=True, timeout=600, cwd=repo,
        )
        want = f"{len(self.ROTATED_OUT)}/{len(self.ROTATED_OUT)} passed"
        assert want in proc.stdout, proc.stdout[-2000:] + proc.stderr[-500:]


class TestAdviceLowItems:
    def test_retention_days_tolerant_parse(self, monkeypatch):
        from hepop_spark.config import ServerConfig, _parse_pos_float

        assert _parse_pos_float("7") == 7.0
        assert _parse_pos_float(" 1.5 ") == 1.5
        assert _parse_pos_float("banana") is None
        assert _parse_pos_float("") is None
        assert _parse_pos_float("-3") is None
        monkeypatch.setenv("RETENTION_DAYS", "not-a-number")
        cfg = ServerConfig.from_env()  # must not raise
        assert cfg.retention_days is None

    def test_retention_counts_only_renamed(self, tmp_path, monkeypatch):
        """Legacy listing-mode retention: a failed rename must not count
        toward files_retired/dates_dropped (r09 ADVICE)."""
        import os

        from hepop_spark.storage import retention

        base = tmp_path / "t"
        for d in ("date=2020-01-01", "date=2020-01-02"):
            p = base / d / "bucket=00-00"
            p.mkdir(parents=True)
            (p / "x.parquet").write_bytes(b"PAR1")
        real_rename = os.rename

        def flaky(src, dst):
            if "date=2020-01-01" in src:
                raise OSError("concurrent writer won")
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", flaky)
        out = retention.apply_retention(str(base), "2021-01-01")
        assert out["dates_dropped"] == ["date=2020-01-02"]
        assert out["files_retired"] == 1


class TestPublicSqlEntrypoint:
    @pytest.fixture(scope="class")
    def spark(self):
        from hepop_spark.session import get_spark

        return get_spark("test-round10b")

    def test_no_data_dir_degrades_to_plain_sql(self, spark):
        import hepop_spark as hs

        df = hs.sql(spark, "SELECT 1 AS one")
        assert df.collect()[0]["one"] == 1

    def test_count_normalization_applies(self, spark):
        import hepop_spark as hs

        spark.range(5).createOrReplaceTempView("t10b")
        try:
            df = hs.sql(spark, "SELECT count() AS n FROM t10b")
            assert df.collect()[0]["n"] == 5
        finally:
            spark.catalog.dropTempView("t10b")

    def test_api_cache_reuse_and_key_isolation(self, spark):
        import hepop_spark as hs

        hs.sql(spark, "SELECT 1 AS one")
        a = hs._SQL_APIS[(spark, None, False)]
        hs.sql(spark, "SELECT 2 AS two")
        assert hs._SQL_APIS[(spark, None, False)] is a
        hs.sql(spark, "SELECT 3 AS three", default_window=False)
        assert hs._SQL_APIS[(spark, None, False)] is a
