"""Streaming join/dedup shape tests (streaming/joins.py)."""

from __future__ import annotations

import datetime as dt

from hepop_spark.streaming.joins import (
    stream_static_enrich,
    stream_stream_join,
    watermark_dedup,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _file_stream(spark, path, rows, schema):
    path.mkdir(parents=True, exist_ok=True)
    spark.createDataFrame(rows, schema).write.parquet(str(path / "b0.parquet"))
    return spark.readStream.schema(schema).parquet(str(path / "*.parquet"))


def _run(df, tmp_path, name, out_mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(out_mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.sql(f"SELECT * FROM {name}")


class TestStreamStatic:
    def test_broadcast_enrich(self, spark, tmp_path):
        schema = "h string, ts timestamp, payload string"
        stream = _file_stream(
            spark, tmp_path / "src",
            [("a", _ts(0), "p1"), ("b", _ts(1), "p2"), ("zz", _ts(2), "p3")],
            schema,
        )
        dim = spark.createDataFrame(
            [("a", "alpha"), ("b", "beta")], "h string, label string"
        )
        out = _run(stream_static_enrich(stream, dim), tmp_path, "enriched")
        got = {r["h"]: r["label"] for r in out.collect()}
        assert got == {"a": "alpha", "b": "beta", "zz": None}  # left join


class TestStreamStream:
    def test_interval_join(self, spark, tmp_path):
        schema = "h string, ts timestamp, payload string"
        left = _file_stream(
            spark, tmp_path / "l",
            [("k", _ts(0), "req")], schema,
        )
        right = _file_stream(
            spark, tmp_path / "r",
            [
                ("k", _ts(5), "resp-in-window"),
                ("k", _ts(30), "resp-too-late"),   # outside 10-minute skew
                ("x", _ts(5), "wrong-key"),
            ],
            schema,
        )
        out = _run(stream_stream_join(left, right), tmp_path, "ssj")
        rows = out.collect()
        assert len(rows) == 1
        assert rows[0]["r_payload"] == "resp-in-window"


class TestWatermarkDedup:
    def test_first_wins_within_horizon(self, spark, tmp_path):
        schema = "h string, ts timestamp, payload string"
        stream = _file_stream(
            spark, tmp_path / "d",
            [
                ("a", _ts(0), "first-a"),
                ("a", _ts(1), "dup-a"),
                ("b", _ts(2), "first-b"),
            ],
            schema,
        )
        out = _run(watermark_dedup(stream), tmp_path, "wmdedup")
        rows = sorted((r["h"], r["payload"]) for r in out.collect())
        assert rows == [("a", "first-a"), ("b", "first-b")]
