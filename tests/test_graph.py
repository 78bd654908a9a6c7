"""Connected-components operator tests (operators/graph.py)."""

from __future__ import annotations

from hepop_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r["node"]: r["comp"]
        for r in connected_components(df).collect()
    }


class TestConnectedComponents:
    def test_chain_collapses_to_min(self, spark):
        # 1-2-3-4-5 chain: diameter > 1 forces multiple propagation rounds
        got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}

    def test_two_components(self, spark):
        got = _cc(spark, [(10, 11), (11, 12), (20, 21)])
        assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    def test_triangle_plus_isolate_edge(self, spark):
        got = _cc(spark, [(3, 1), (1, 2), (2, 3), (7, 9)])
        assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}

    def test_compress_long_chain_converges_fast(self, spark):
        # 0-1-2-...-12 chain, diameter 12: pointer jumping squares path
        # lengths, so max_iter=5 (< diameter) must still converge
        edges = [(i, i + 1) for i in range(12)]
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {
            r["node"]: r["comp"]
            for r in connected_components(df, max_iter=5, compress=True).collect()
        }
        assert got == {i: 0 for i in range(13)}
