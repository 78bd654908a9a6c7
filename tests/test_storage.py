"""Storage lifecycle tests: partitioned writes, compaction equivalence
(the reference's implicit invariant — query results identical before and
after compaction, hepop.js:703-785), partition pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hepop_spark.storage.compaction import compact, list_partitions, partition_files, table_stats
from hepop_spark.storage.writer import read_table, with_time_partitions, write_partitioned


def _mkevents(spark, n=500, start="2024-03-01 10:00:00"):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.to_timestamp(F.lit(start)) + F.make_interval(secs=F.col("id") * 97)).alias(
            "timestamp"
        ),
        (F.col("id") % 7).alias("user_id"),
        F.round(F.rand(seed=1) * 100, 2).alias("value"),
    )


class TestWriter:
    def test_bloom_filter_option_applied(self, spark, tmp_path):
        """Bloom-filter write parity with the reference (hepop.js:26-34):
        the option must reach the parquet writer. Neither pyarrow 16 nor
        duckdb 1.0 expose bloom offsets in footer metadata, so assert the
        observable effects: identical data, strictly larger files (bloom
        bitsets are appended after row groups)."""
        plain, bloomed = str(tmp_path / "nb"), str(tmp_path / "wb")
        df = _mkevents(spark, 1000).withColumn(
            "call_id", F.concat(F.lit("call-"), F.col("event_id"))
        )
        write_partitioned(df, plain)
        write_partitioned(df, bloomed, bloom_cols=("call_id",))

        def psize(base):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(base)
                for f in fs
                if f.endswith(".parquet")
            )

        assert read_table(spark, bloomed).count() == df.count()
        assert sorted(read_table(spark, bloomed).drop("date", "bucket").collect()) == \
            sorted(read_table(spark, plain).drop("date", "bucket").collect())
        assert psize(bloomed) > psize(plain)

    def test_bucket_layout(self, spark, tmp_path):
        base = str(tmp_path / "t1")
        write_partitioned(_mkevents(spark), base)
        parts = list_partitions(base)
        assert parts, "no partitions written"
        # bucket dirs follow HH-M0 (reference hepop.js:116-126)
        for rel in parts:
            bucket = rel.split("bucket=")[1]
            hh, mm = bucket.split("-")
            assert 0 <= int(hh) < 24
            assert int(mm) in {0, 10, 20, 30, 40, 50}

    def test_bucket_expression_matches_reference_floor(self, spark):
        df = spark.createDataFrame(
            [("2024-03-01 10:09:59",), ("2024-03-01 10:10:00",), ("2024-03-01 23:59:59",)],
            ["s"],
        ).select(F.to_timestamp("s").alias("timestamp"))
        rows = with_time_partitions(df).select("bucket").collect()
        assert [r[0] for r in rows] == ["10-00", "10-10", "23-50"]

    def test_append_roundtrip(self, spark, tmp_path):
        base = str(tmp_path / "t2")
        write_partitioned(_mkevents(spark, 100), base)
        write_partitioned(_mkevents(spark, 100, start="2024-03-02 00:00:00"), base)
        got = read_table(spark, base)
        assert got.count() == 200


class TestCompaction:
    def test_equivalence_and_file_reduction(self, spark, tmp_path):
        base = str(tmp_path / "t3")
        # several small appends -> many files per partition
        for i in range(4):
            write_partitioned(_mkevents(spark, 200), base)
        before = read_table(spark, base)
        before_rows = sorted(
            (r["event_id"], str(r["timestamp"]), r["user_id"], r["value"])
            for r in before.collect()
        )
        stats_before = table_stats(base)
        assert any(
            p["files"] >= 2 for p in stats_before["partitions"].values()
        ), "test setup: expected multi-file partitions"

        result = compact(spark, base, min_files=2, target_files=1)
        assert result, "nothing compacted"

        after = read_table(spark, base)
        after_rows = sorted(
            (r["event_id"], str(r["timestamp"]), r["user_id"], r["value"])
            for r in after.collect()
        )
        assert before_rows == after_rows  # the reference's invariant
        stats_after = table_stats(base)
        assert stats_after["total_files"] < stats_before["total_files"]
        for p in stats_after["partitions"].values():
            assert p["files"] == 1

    def test_idempotent(self, spark, tmp_path):
        base = str(tmp_path / "t4")
        for _ in range(3):
            write_partitioned(_mkevents(spark, 100), base)
        compact(spark, base)
        assert compact(spark, base) == {}  # second sweep: nothing to do


class TestLadder:
    def test_hour_rebucket_equivalence(self, spark, tmp_path):
        from hepop_spark.storage.compaction import compact_ladder

        base = str(tmp_path / "ladder")
        # events spanning several 10-min buckets within a few hours
        write_partitioned(_mkevents(spark, 800), base)
        before_parts = list_partitions(base)
        assert any(not p.endswith("-00") for p in before_parts), "need non-hour buckets"
        before_rows = sorted(
            (r["event_id"], str(r["timestamp"])) for r in read_table(spark, base).collect()
        )

        res = compact_ladder(spark, base, level="hour")
        assert res, "hour ladder compacted nothing"
        after_parts = list_partitions(base)
        # all buckets now at HH-00 (reference hepop.js:687-701)
        assert all(p.split("bucket=")[1] == p.split("bucket=")[1][:2] + "-00" for p in after_parts)
        after_rows = sorted(
            (r["event_id"], str(r["timestamp"])) for r in read_table(spark, base).collect()
        )
        assert before_rows == after_rows

        # day level folds everything into 00-00
        res2 = compact_ladder(spark, base, level="day")
        day_parts = list_partitions(base)
        if res2:
            assert all(p.endswith("bucket=00-00") for p in day_parts)
        final_rows = sorted(
            (r["event_id"], str(r["timestamp"])) for r in read_table(spark, base).collect()
        )
        assert before_rows == final_rows


class TestPruning:
    def test_partition_pruning_in_plan(self, spark, tmp_path):
        base = str(tmp_path / "t5")
        write_partitioned(_mkevents(spark, 2000), base)
        df = read_table(spark, base).filter(F.col("date") == "2024-03-01")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the date filter must prune at the partition level, not post-scan
        assert "PartitionFilters" in plan
        got = df.count()
        assert 0 < got <= 2000

    def test_hive_partition_prune_skips_files(self, spark, tmp_path):
        # the source_partitioned_prune query shape: hive-style partitionBy
        # directories + a range predicate on the partition column must list
        # strictly fewer files into the scan, with a real PartitionFilter
        base = str(tmp_path / "by_date")
        ev = _mkevents(spark, 2000).withColumn(
            "date", F.to_date("timestamp").cast("string")
        )
        ev.write.partitionBy("date").parquet(base)
        back = spark.read.parquet(base)
        sel = back.filter(F.col("date") == "2024-03-01")
        plan = sel._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        scanned = sel.select(F.input_file_name()).distinct().count()
        total = back.select(F.input_file_name()).distinct().count()
        assert 0 < scanned < total
        # pruning is result-invisible
        assert sel.count() == ev.filter(F.col("date") == "2024-03-01").count()
