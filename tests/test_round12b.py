"""Round-12b pins: GROUPING SETS / ROLLUP / CUBE routing, derived-table
lifting, and UNION ALL branch routing (plans/api.py r12b extensions).

Parse-level pins run without Spark; the router rejection pins build one
small serve tree and assert the conservative fallbacks the judged
entries' docstrings promise — each unroutable shape must answer
CORRECTLY from the raw scan with last_routed_rollup None."""

import os
import shutil

import pytest


class TestGroupingConstructParse:
    def test_rollup_cube(self):
        from hepop_spark.plans.api import (GroupingSpec,
                                           _parse_grouping_construct)

        g = _parse_grouping_construct("ROLLUP(lang, source)")
        assert isinstance(g, GroupingSpec)
        assert list(g) == ["lang", "source"] and g.kind == "ROLLUP"
        assert g.mapped(lambda e: f"g_{e}") == "ROLLUP(g_lang, g_source)"
        c = _parse_grouping_construct("CUBE(a, b)")
        assert c.kind == "CUBE" and c.mapped(str.upper) == "CUBE(A, B)"

    def test_grouping_sets_elements(self):
        from hepop_spark.plans.api import _parse_grouping_construct

        # parenthesized sets, a bare element, and the empty grand total
        g = _parse_grouping_construct(
            "GROUPING SETS ((lang, source), lang, ())")
        assert g.sets == (("lang", "source"), ("lang",), ())
        assert list(g) == ["lang", "source"]
        assert g.mapped(lambda e: f"g_{e}") == \
            "GROUPING SETS ((g_lang, g_source), (g_lang), ())"

    def test_rollup_dup_args_kept_in_construct(self):
        from hepop_spark.plans.api import _parse_grouping_construct

        g = _parse_grouping_construct("ROLLUP(a, b, a)")
        assert list(g) == ["a", "b"]  # coverage proof sees unique keys
        assert g.mapped(str) == "ROLLUP(a, b, a)"  # construct verbatim

    def test_rejections(self):
        from hepop_spark.plans.api import _parse_grouping_construct

        # mixes, nesting, trailing text, empty arg lists all fall back
        for s in ("lang, ROLLUP(source)", "ROLLUP(lang), source",
                  "GROUPING SETS ((ROLLUP(a)))", "ROLLUP()",
                  "ROLLUP(lang) x", "GROUPING SETS ()",
                  "ROLLUP(f(lang))"):
            assert _parse_grouping_construct(s) is None, s

    def test_parse_simple_aggregate_returns_spec(self):
        from hepop_spark.plans.api import (GroupingSpec,
                                           parse_simple_aggregate)

        p = parse_simple_aggregate(
            "SELECT lang, count(*) AS n FROM documents "
            "GROUP BY ROLLUP(lang) ORDER BY lang")
        assert isinstance(p[2], GroupingSpec)
        p2 = parse_simple_aggregate(
            "SELECT lang, count(*) AS n FROM documents GROUP BY lang")
        assert not isinstance(p2[2], GroupingSpec)


class TestUnionSplit:
    def test_split_union_all(self):
        from hepop_spark.plans.api import _split_union_all

        assert _split_union_all(
            "SELECT a FROM t UNION ALL SELECT b FROM u") == [
            "SELECT a FROM t", "SELECT b FROM u"]
        # three branches; keyword case-insensitive
        got = _split_union_all("SELECT 1 union all SELECT 2 "
                               "UNION ALL SELECT 3")
        assert got and len(got) == 3

    def test_union_split_guards(self):
        from hepop_spark.plans.api import _split_union_all

        # bare UNION / INTERSECT / EXCEPT poison the whole statement
        assert _split_union_all(
            "SELECT a FROM t UNION SELECT b FROM u") is None
        assert _split_union_all(
            "SELECT a FROM t INTERSECT SELECT b FROM u") is None
        assert _split_union_all(
            "SELECT a FROM t UNION ALL SELECT b FROM u "
            "EXCEPT SELECT c FROM v") is None
        # no set operator at all
        assert _split_union_all("SELECT a FROM t") is None
        # UNION ALL inside parens / a literal is NOT a boundary
        assert _split_union_all(
            "SELECT 'UNION ALL' AS s FROM t") is None
        assert _split_union_all(
            "SELECT a FROM (SELECT b FROM u UNION ALL "
            "SELECT c FROM v) w") is None


@pytest.fixture(scope="module")
def serve_api(spark, sf_dir):
    from hepop_spark.plans.api import HepopQueryAPI
    from hepop_spark.queries.routing_q import _build_rollup_serve_tree

    root, data = _build_rollup_serve_tree(spark, sf_dir)
    api = HepopQueryAPI(spark, default_window=False, data_dir=data)
    yield api
    shutil.rmtree(root, ignore_errors=True)


class TestRouterRejections:
    """Each unroutable shape answers from the raw scan (breadcrumb
    None) — never a wrong routed answer, never an error."""

    def _raw(self, serve_api, q):
        df = serve_api.sql(q)
        assert serve_api.last_routed_rollup is None, q
        return df

    def test_grouping_function_falls_back(self, serve_api):
        df = self._raw(serve_api,
                       "SELECT lang, GROUPING(lang) AS g, count(*) AS n "
                       "FROM documents GROUP BY ROLLUP(lang)")
        assert df.count() == 6  # 5 langs + grand total

    def test_count_distinct_under_rollup_falls_back(self, serve_api):
        # grid rows repeat the counted key across collapsed subsets:
        # routing would overcount, so the distinct trick must refuse
        df = self._raw(serve_api,
                       "SELECT lang, count(distinct source) AS ns "
                       "FROM documents GROUP BY ROLLUP(lang)")
        rows = {r["lang"]: r["ns"] for r in df.collect()}
        assert rows[None] == 20  # exact distinct at the grand total

    def test_bare_union_falls_back(self, serve_api):
        self._raw(serve_api,
                  "SELECT lang, count(*) AS n FROM documents "
                  "WHERE source = 'src3' GROUP BY lang "
                  "UNION SELECT lang, count(*) AS n FROM documents "
                  "WHERE source = 'src4' GROUP BY lang")

    def test_union_with_unroutable_branch_falls_back(self, serve_api):
        # branch 2 filters a raw MEASURE column — not grid-answerable,
        # so the WHOLE statement must fall back, not half-route
        self._raw(serve_api,
                  "SELECT lang, count(*) AS n FROM documents "
                  "WHERE source = 'src3' GROUP BY lang "
                  "UNION ALL SELECT lang, count(*) AS n FROM documents "
                  "WHERE n_chars > 100 GROUP BY lang")

    def test_unaliased_derived_falls_back(self, serve_api):
        self._raw(serve_api,
                  "SELECT lang FROM (SELECT lang, count(*) AS n "
                  "FROM documents GROUP BY lang) WHERE n > 0")

    def test_two_derived_tables_fall_back(self, serve_api):
        self._raw(serve_api,
                  "SELECT a.lang FROM (SELECT lang FROM documents) a, "
                  "(SELECT lang FROM documents) b")

    def test_derived_with_comma_join_falls_back(self, serve_api):
        # the lifted CTE's outer carries a depth-0 comma join — the
        # delegated _try_cte_route obligation (r11 ADVICE) rejects it
        self._raw(serve_api,
                  "SELECT agg.lang FROM (SELECT lang, count(*) AS n "
                  "FROM documents GROUP BY lang) agg, documents d")

    def test_mixed_group_by_falls_back(self, serve_api):
        df = self._raw(serve_api,
                       "SELECT lang, source, count(*) AS n FROM documents "
                       "GROUP BY lang, ROLLUP(source)")
        assert df.count() > 0


class TestRoutedGroupingSetsExactness:
    def test_cube_matches_raw(self, spark, serve_api):
        # the routed CUBE and the raw-scan CUBE agree cell-for-cell
        q = ("SELECT lang, source, count(*) AS n_docs "
             "FROM documents GROUP BY CUBE(lang, source)")
        routed = serve_api.sql(q)
        assert serve_api.last_routed_rollup == "doc_lang_rollup"
        raw = spark.sql(q)  # `documents` view registered by discovery
        def key(rows):
            return sorted(
                tuple("\x00N" if c is None else str(c) for c in r)
                for r in rows)

        r, w = key(routed.collect()), key(raw.collect())
        assert r == w
        # subset cells present: per-lang (5), per-source (20), total (1)
        assert len(r) >= 26
