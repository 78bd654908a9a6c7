"""Exactly-once sink contracts (streaming/exactly_once.py): replay is a
no-op, torn writes are invisible then repaired, and an end-to-end
availableNow stream lands each row exactly once."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hepop_spark.streaming.exactly_once import (
    exactly_once_sink,
    read_committed,
    write_batch_exactly_once,
)


def _batch(spark, n=100, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("event_id"), (F.col("id") % 5).alias("k")
    )


class TestIdempotentWrite:
    def test_replay_is_noop(self, spark, tmp_path):
        base = str(tmp_path / "t")
        b = _batch(spark)
        assert write_batch_exactly_once(b, 0, base) is True
        assert write_batch_exactly_once(b, 0, base) is False  # replay
        assert read_committed(spark, base).count() == 100

    def test_torn_write_invisible_then_repaired(self, spark, tmp_path):
        base = str(tmp_path / "t")
        write_batch_exactly_once(_batch(spark, 50), 0, base)
        # simulate a crash mid-batch-1: data (partially) written, no marker
        torn = _batch(spark, 999)
        torn.write.mode("overwrite").parquet(os.path.join(base, "batch_id=1"))
        assert read_committed(spark, base).count() == 50  # torn dir ignored
        # replay of batch 1 with the REAL data repairs via overwrite
        assert write_batch_exactly_once(_batch(spark, 70, offset=50), 1, base) is True
        got = read_committed(spark, base)
        assert got.count() == 120
        assert got.agg(F.countDistinct("event_id")).first()[0] == 120

    def test_end_to_end_stream(self, spark, tmp_path):
        landing = tmp_path / "in"
        landing.mkdir()
        (landing / "a.json").write_text(
            "\n".join('{"event_id": %d}' % i for i in range(40))
        )
        src = spark.readStream.schema("event_id long").json(str(landing))
        base = str(tmp_path / "out")
        q = exactly_once_sink(src, base, str(tmp_path / "ckpt")).start()
        q.awaitTermination(60)
        got = read_committed(spark, base)
        assert got.count() == 40
        assert got.agg(F.countDistinct("event_id")).first()[0] == 40
