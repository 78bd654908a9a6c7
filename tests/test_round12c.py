"""Round-12c pins: parallel-CTE JOIN routing and multi-derived-table
lifting (plans/api.py _try_parallel_cte + the generalized
_try_derived_route). Rejection pins assert the conservative fallbacks
the judged entries' docstrings promise."""

import shutil

import pytest


@pytest.fixture(scope="module")
def serve_api(spark, sf_dir):
    from hepop_spark.plans.api import HepopQueryAPI
    from hepop_spark.queries.routing_q import _build_rollup_serve_tree

    root, data = _build_rollup_serve_tree(spark, sf_dir)
    api = HepopQueryAPI(spark, default_window=False, data_dir=data)
    yield api
    shutil.rmtree(root, ignore_errors=True)


class TestParallelCteRouting:
    def test_parallel_cte_routes(self, serve_api):
        from hepop_spark.queries.routing_q import CTE_PARALLEL_SQL_TEXT

        df = serve_api.sql(CTE_PARALLEL_SQL_TEXT)
        assert serve_api.last_routed_rollup == "doc_lang_rollup"
        assert df.count() == 5

    def test_derived_join_same_rows_as_cte_spelling(self, serve_api):
        from hepop_spark.queries.routing_q import (CTE_PARALLEL_SQL_TEXT,
                                                   DERIVED_JOIN_SQL_TEXT)

        a = sorted(map(tuple, serve_api.sql(CTE_PARALLEL_SQL_TEXT).collect()))
        assert serve_api.last_routed_rollup == "doc_lang_rollup"
        b = sorted(map(tuple, serve_api.sql(DERIVED_JOIN_SQL_TEXT).collect()))
        assert serve_api.last_routed_rollup == "doc_lang_rollup"
        assert a == b

    def test_left_join_type_preserved(self, serve_api):
        # join text runs verbatim: a LEFT JOIN keeps unmatched groups
        q = ("WITH a AS (SELECT lang, count(*) AS n_a FROM documents "
             "GROUP BY lang), "
             "b AS (SELECT lang, count(*) AS n_b FROM documents "
             "WHERE source = 'src3' AND lang = 'en' GROUP BY lang) "
             "SELECT a.lang AS lang, a.n_a AS n_a, b.n_b AS n_b "
             "FROM a LEFT JOIN b ON a.lang = b.lang")
        df = serve_api.sql(q)
        assert serve_api.last_routed_rollup == "doc_lang_rollup"
        rows = {r["lang"]: r["n_b"] for r in df.collect()}
        assert len(rows) == 5 and rows["de"] is None and rows["en"]


class TestParallelCteRejections:
    def _raw(self, serve_api, q):
        df = serve_api.sql(q)
        assert serve_api.last_routed_rollup is None, q
        return df

    def test_one_raw_branch_falls_whole_statement_back(self, serve_api):
        # branch b filters a raw MEASURE column: not grid-answerable
        self._raw(serve_api,
                  "WITH a AS (SELECT lang, count(*) AS n_a FROM documents "
                  "WHERE source = 'src3' GROUP BY lang), "
                  "b AS (SELECT lang, count(*) AS n_b FROM documents "
                  "WHERE n_chars > 50 GROUP BY lang) "
                  "SELECT a.lang, a.n_a, b.n_b "
                  "FROM a JOIN b ON a.lang = b.lang")

    def test_cte_self_join_falls_back(self, serve_api):
        # one CTE consumed twice: not the exactly-once proof
        self._raw(serve_api,
                  "WITH a AS (SELECT lang, count(*) AS n_a FROM documents "
                  "GROUP BY lang) "
                  "SELECT x.lang FROM a x JOIN a y ON x.lang = y.lang")

    def test_unconsumed_cte_falls_back(self, serve_api):
        self._raw(serve_api,
                  "WITH a AS (SELECT lang, count(*) AS n_a FROM documents "
                  "GROUP BY lang), "
                  "b AS (SELECT lang, count(*) AS n_b FROM documents "
                  "GROUP BY lang) "
                  "SELECT a.lang, a.n_a FROM a")

    def test_join_to_undiscoverable_table_refuses_route(self, serve_api):
        # the route refuses (dim does not discover); the raw engine then
        # reports its own missing-table error — an error, never a
        # half-routed answer (same failure direction as the r11 ADVICE
        # comma-join fix)
        assert serve_api._try_cte_route(
            "WITH a AS (SELECT lang, count(*) AS n_a FROM documents "
            "GROUP BY lang), "
            "b AS (SELECT lang, count(*) AS n_b FROM documents "
            "GROUP BY lang) "
            "SELECT a.lang, a.n_a, b.n_b FROM a JOIN b "
            "ON a.lang = b.lang JOIN no_such_dim d "
            "ON d.lang = a.lang") is None

    def test_duplicate_derived_aliases_fall_back(self, serve_api):
        # duplicate aliases shadow each other: the lift refuses before
        # any rewrite (the raw engine then reports its own ambiguity
        # error — never a silently mis-routed answer)
        assert serve_api._try_derived_route(
            "SELECT t.lang FROM (SELECT lang, count(*) AS n FROM "
            "documents GROUP BY lang) t JOIN (SELECT lang, "
            "count(*) AS n FROM documents GROUP BY lang) t "
            "ON t.lang = t.lang") is None

    def test_outer_subquery_in_join_falls_back(self, serve_api):
        # JOIN (SELECT ...) inside the OUTER of a WITH: the inner FROM
        # breaks the single-FROM proof — no half-routed statement
        self._raw(serve_api,
                  "WITH a AS (SELECT lang, count(*) AS n_a FROM documents "
                  "GROUP BY lang) "
                  "SELECT a.lang FROM a JOIN "
                  "(SELECT lang FROM documents) x ON x.lang = a.lang")
