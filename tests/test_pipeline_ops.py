"""Semantic contracts for the pipeline-maintenance operators
(queries/pipeline_ops.py) beyond the DuckDB hash parity the sweep pins:
merge op accounting, SCD2 interval structure, salting invisibility,
redaction completeness, and HLL merge exactness in the sparse regime.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from hepop_spark.catalog import load_table
from hepop_spark.queries.pipeline_ops import (
    hll_partitioned_distinct,
    merge_upsert,
    salted_join_skew,
    scd2_history,
    text_redact_pii,
)

SF = "/root/testdata/sf0.001"


class TestMergeUpsert:
    def test_op_accounting(self, spark):
        ev = load_table(spark, SF, "events").select("event_id")
        n = ev.count()
        n_t = ev.filter(F.col("event_id") % 3 != 0).count()
        n_insert = ev.filter(
            (F.col("event_id") % 2 == 0) & (F.col("event_id") % 3 == 0)
        ).count()
        n_update = ev.filter(
            (F.col("event_id") % 2 == 0) & (F.col("event_id") % 3 != 0)
        ).count()
        got = {
            r["op"]: r["n"]
            for r in merge_upsert(spark, SF).groupBy("op").agg(F.count("*").alias("n")).collect()
        }
        assert got.get("insert", 0) == n_insert
        assert got.get("update", 0) == n_update
        assert got.get("keep", 0) == n_t - n_update
        assert sum(got.values()) == n_t + n_insert
        assert n > 0

    def test_merge_key_unique(self, spark):
        df = merge_upsert(spark, SF)
        assert df.count() == df.select("event_id").distinct().count()


class TestScd2:
    def test_versions_dense_and_intervals_chain(self, spark):
        rows = scd2_history(spark, SF).collect()
        by_user: dict[int, list] = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        assert by_user
        for _u, vs in by_user.items():
            vs.sort(key=lambda r: r["version"])
            assert [r["version"] for r in vs] == list(range(1, len(vs) + 1))
            # exactly one open interval (the latest)
            assert [r["valid_to"] is None for r in vs] == [False] * (len(vs) - 1) + [True]
            # intervals chain: each valid_to == next valid_from
            for a, b in zip(vs, vs[1:]):
                assert a["valid_to"] == b["valid_from"]
            # consecutive versions always change type
            for a, b in zip(vs, vs[1:]):
                assert a["event_type"] != b["event_type"]


class TestSaltedJoin:
    def test_equals_unsalted(self, spark):
        ev = load_table(spark, SF, "events")
        plain = (
            ev.select(
                F.when(F.col("user_id") % 10 < 7, F.lit(0).cast("long"))
                .otherwise(F.col("user_id") % 10)
                .alias("k"),
                "value",
            )
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_v"))
        )
        want = {r["k"]: (r["n"], r["sum_v"]) for r in plain.collect()}
        got = {r["k"]: (r["n"], r["sum_v"]) for r in salted_join_skew(spark, SF).collect()}
        assert got == want


class TestRedaction:
    def test_no_pii_survives(self, spark):
        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        out = text_redact_pii(spark, SF)
        # every doc got at least the planted email+phone counted
        assert out.filter((F.col("n_email") < 1) | (F.col("n_phone") < 1)).count() == 0
        # recompute the redacted text and assert the regexes find nothing
        planted = docs.withColumn(
            "t2",
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        red = planted.select(
            F.regexp_replace(
                F.regexp_replace(
                    "t2", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
                ),
                r"555-[0-9]{4}",
                "<PHONE>",
            ).alias("redacted")
        )
        email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
        phone = re.compile(r"555-[0-9]{4}")
        for r in red.collect():
            assert not email.search(r["redacted"])
            assert not phone.search(r["redacted"])


class TestHll:
    def test_merge_equals_exact_in_sparse_regime(self, spark):
        ev = load_table(spark, SF, "events")
        exact = ev.agg(
            F.countDistinct("user_id").alias("u"),
            F.countDistinct("event_type").alias("t"),
        ).first()
        got = hll_partitioned_distinct(spark, SF).first()
        assert got["n_users"] == exact["u"]
        assert got["n_types"] == exact["t"]
        assert got["n_partitions"] >= 1
