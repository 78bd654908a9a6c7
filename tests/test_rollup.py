"""Incremental rollup equivalence tests (storage/rollup.py): after any
sequence of batches, the rollup equals the direct aggregate of all data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hepop_spark.storage.rollup import read_rollup, rollup_batch, rollup_sink

T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _rows(spec):
    # spec: list of (minutes_offset, event_type, value)
    return [(T0 + dt.timedelta(minutes=m), et, float(v)) for m, et, v in spec]


def _direct(df):
    return {
        (r["hour_bucket"], r["k"]): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in (
            df.withColumn("hour_bucket", F.date_format("ts", "yyyy-MM-dd-HH"))
            .groupBy("hour_bucket", F.col("event_type").alias("k"))
            .agg(
                F.count("*").alias("n"),
                F.sum("value").alias("sum_v"),
                F.min("value").alias("min_v"),
                F.max("value").alias("max_v"),
            )
            .collect()
        )
    }


def _stored(spark, rollup_dir):
    return {
        (r["hour_bucket"], r["k"]): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in read_rollup(spark, rollup_dir).collect()
    }


SCHEMA = "ts timestamp, event_type string, value double"


class TestRollupBatch:
    def test_two_batches_equal_direct_aggregate(self, spark, tmp_path):
        rdir = str(tmp_path / "rollup")
        b1 = spark.createDataFrame(
            _rows([(0, "click", 1), (5, "click", 3), (10, "view", 2), (70, "click", 5)]),
            SCHEMA,
        )
        b2 = spark.createDataFrame(
            # same hours arrive again (merge path) + a brand-new hour
            _rows([(20, "click", 7), (75, "view", 4), (130, "click", 9)]),
            SCHEMA,
        )
        rollup_batch(spark, rdir, b1)
        rollup_batch(spark, rdir, b2)
        assert _stored(spark, rdir) == _direct(b1.unionByName(b2))

    def test_untouched_hours_survive_partition_overwrite(self, spark, tmp_path):
        rdir = str(tmp_path / "rollup2")
        b1 = spark.createDataFrame(_rows([(0, "click", 1)]), SCHEMA)      # hour 10
        b2 = spark.createDataFrame(_rows([(120, "click", 2)]), SCHEMA)    # hour 12
        rollup_batch(spark, rdir, b1)
        rollup_batch(spark, rdir, b2)
        got = _stored(spark, rdir)
        assert ("2024-03-01-10", "click") in got  # hour-10 row not clobbered
        assert ("2024-03-01-12", "click") in got

    def test_avg_derived_at_read(self, spark, tmp_path):
        rdir = str(tmp_path / "rollup3")
        b = spark.createDataFrame(_rows([(0, "x", 2), (1, "x", 4)]), SCHEMA)
        rollup_batch(spark, rdir, b)
        row = read_rollup(spark, rdir).collect()[0]
        assert row["avg_v"] == 3.0


class TestRollupStreaming:
    def test_streaming_sink_matches_direct(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        all_rows = _rows(
            [(0, "click", 1), (5, "view", 2), (61, "click", 3), (62, "click", 4)]
        )
        spark.createDataFrame(all_rows[:2], SCHEMA).write.parquet(str(src / "b0.parquet"))
        spark.createDataFrame(all_rows[2:], SCHEMA).write.parquet(str(src / "b1.parquet"))
        stream = spark.readStream.schema(SCHEMA).parquet(str(src / "*.parquet"))
        q = rollup_sink(
            stream, str(tmp_path / "rollup_s"), str(tmp_path / "ck"), available_now=True
        )
        q.awaitTermination()
        direct = _direct(spark.createDataFrame(all_rows, SCHEMA))
        assert _stored(spark, str(tmp_path / "rollup_s")) == direct
