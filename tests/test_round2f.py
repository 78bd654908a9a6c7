"""Semantic contracts for round-2 batch 6 (queries/analytics7.py):
incremental-MV == full-recompute equality (the IVM invariant) and
cumulative-distinct monotonicity/conservation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hepop_spark.catalog import load_table
from hepop_spark.queries.analytics7 import (
    cumulative_distinct_users,
    mv_join_refresh,
)

SF = "/root/testdata/sf0.001"


class TestCumulativeDistinct:
    def test_monotone_and_conserving(self, spark):
        rows = sorted(
            cumulative_distinct_users(spark, SF).collect(), key=lambda r: r["day"]
        )
        cums = [r["cum_distinct_users"] for r in rows]
        assert cums == sorted(cums)
        assert sum(r["new_users"] for r in rows) == cums[-1]
        total_users = (
            load_table(spark, SF, "events").select("user_id").distinct().count()
        )
        assert cums[-1] == total_users


class TestMvRefresh:
    def test_incremental_equals_full(self, spark):
        ord_ = load_table(spark, SF, "orders").withColumn(
            "cents", F.round(F.col("o_totalprice") * 100).cast("long")
        )
        cust = load_table(spark, SF, "customer")
        nat = load_table(spark, SF, "nation")
        full = {
            r["n_name"]: (r["revenue"], r["n_orders"])
            for r in ord_.join(cust, ord_.o_custkey == cust.c_custkey)
            .join(nat, cust.c_nationkey == nat.n_nationkey)
            .groupBy("n_name")
            .agg(
                (F.sum("cents") / 100.0).alias("revenue"),
                F.count("*").cast("long").alias("n_orders"),
            )
            .collect()
        }
        got = {
            r["n_name"]: (r["revenue"], r["n_orders"])
            for r in mv_join_refresh(spark, SF).collect()
        }
        assert got == full
