"""Bucketed co-located join tests: the join of two same-key bucketed
tables must plan with ZERO shuffle exchanges — the storage layout IS the
shuffle, paid once at write time."""

from __future__ import annotations

from pyspark.sql import functions as F

from hepop_spark.catalog import load_table
from hepop_spark.storage.bucketing import bucketed_join, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestBucketedJoin:
    def test_join_has_no_shuffle_exchange(self, spark, sf_dir):
        # warehouse.dir is a static conf — tables land in the session
        # default warehouse; scrub catalog AND filesystem remnants (a
        # failed prior run can leave the dir without the catalog entry)
        import shutil
        for t in ("li_b", "ord_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        ).withColumnRenamed("o_orderkey", "l_orderkey")
        write_bucketed(li, "li_b", "l_orderkey", 8)
        write_bucketed(orders, "ord_b", "l_orderkey", 8)

        joined = bucketed_join(spark, "li_b", "ord_b", "l_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # the whole point: no exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
        # and it still computes the right thing
        n = joined.count()
        direct = li.join(orders, "l_orderkey").count()
        assert n == direct
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")

    def test_unbucketed_same_join_does_shuffle(self, spark, sf_dir):
        """Control: the identical join over plain parquet shuffles both
        sides — proving the zero-exchange plan above comes from the bucket
        layout, not from data size or AQE."""
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        orders = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
        )
        joined = li.hint("merge").join(orders, "l_orderkey")
        assert "Exchange hashpartitioning" in _plan(joined)
