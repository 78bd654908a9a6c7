"""Semantic contracts for round-2 batch 5 (queries/analytics6.py): the
grid prefilter must lose no geo pair vs a naive python recomputation, and
the strict-order funnel must be monotone and consistent with the
unordered funnel bound.
"""

from __future__ import annotations

import math

from hepop_spark.catalog import load_table
from hepop_spark.queries.analytics6 import (
    GEO_RADIUS_KM,
    geo_distance_join,
    pattern_3step_funnel,
)

SF = "/root/testdata/sf0.001"


def _coords(key: int, a: int, b: int) -> tuple[float, float]:
    return ((key * a) % 12000) / 100.0 - 60.0, ((key * b) % 36000) / 100.0 - 180.0


def _haversine(lat1, lon1, lat2, lon2) -> float:
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    h = math.sin(dlat / 2) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon / 2) ** 2
    return 2 * 6371.0 * math.asin(math.sqrt(h))


class TestGeo:
    def test_grid_join_equals_naive(self, spark):
        custs = [
            r["c_custkey"]
            for r in load_table(spark, SF, "customer").select("c_custkey").collect()
        ]
        supps = [
            r["s_suppkey"]
            for r in load_table(spark, SF, "supplier").select("s_suppkey").collect()
        ]
        naive: dict[int, int] = {}
        for sk in supps:
            slat, slon = _coords(sk, 6151, 9973)
            n = 0
            for ck in custs:
                clat, clon = _coords(ck, 7919, 104729)
                if round(_haversine(clat, clon, slat, slon), 1) <= GEO_RADIUS_KM:
                    n += 1
            if n:
                naive[sk] = n
        got = {
            r["s_suppkey"]: r["n_within"]
            for r in geo_distance_join(spark, SF).collect()
        }
        assert got == naive


class TestPattern:
    def test_funnel_monotone(self, spark):
        r = pattern_3step_funnel(spark, SF).first()
        assert (
            r["stage1_signup"]
            >= r["stage2_click_after"]
            >= r["stage3_purchase_after"]
            >= r["converted_within_budget"]
            >= 0
        )
        assert r["stage1_signup"] > 0
