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


class TestStreamStreamOuter:
    def test_left_outer_emits_timeout_rows_after_watermark(self, spark, tmp_path):
        """Unmatched left rows must surface (with null right columns) once
        the watermark passes their join window. Two traps pinned here:
        outer-null results emit only in a batch AFTER the watermark
        advances (availableNow stops when drained, so the flush needs a
        follow-up run), and the global watermark is min() across sources —
        a drained side freezes it until that side sees data again."""
        schema = "h string, ts timestamp, payload string"
        lsrc, rsrc = tmp_path / "lo_l", tmp_path / "lo_r"
        out_dir, ck = str(tmp_path / "lo_out"), str(tmp_path / "ck_outer")
        lsrc.mkdir(), rsrc.mkdir()
        spark.createDataFrame(
            [("match", _ts(0), "req-m"), ("orphan", _ts(0), "req-o")], schema
        ).write.parquet(str(lsrc / "b0.parquet"))
        spark.createDataFrame(
            [("match", _ts(5), "resp-m")], schema
        ).write.parquet(str(rsrc / "b0.parquet"))
        # late right event 2h ahead drags the watermark far past t0+skew
        spark.createDataFrame(
            [("wm-pusher", _ts(120), "resp-late")], schema
        ).write.parquet(str(rsrc / "b1.parquet"))

        def run():
            left = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(lsrc / "*.parquet"))
            )
            right = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(rsrc / "*.parquet"))
            )
            out = stream_stream_join(left, right, watermark="20 minutes",
                                     how="left_outer")
            q = (
                out.writeStream.format("parquet")
                .outputMode("append")
                .trigger(availableNow=True)
                .option("path", out_dir)
                .option("checkpointLocation", ck)
                .start()
            )
            q.awaitTermination()

        run()
        # the global watermark is min(left wm, right wm): BOTH sources must
        # see later data or the drained side's frozen watermark pins state
        # forever. New files on both sides advance it; Spark then runs a
        # no-data batch that evicts and emits the orphan with nulls.
        spark.createDataFrame(
            [("wm-pusher-l", _ts(240), "req-later")], schema
        ).write.parquet(str(lsrc / "b1.parquet"))
        spark.createDataFrame(
            [("wm-pusher2", _ts(240), "resp-later")], schema
        ).write.parquet(str(rsrc / "b2.parquet"))
        run()
        rows = {(r["h"], r["r_payload"]) for r in
                spark.read.parquet(out_dir).collect()}
        assert ("match", "resp-m") in rows           # matched pair joins
        assert ("orphan", None) in rows              # timeout row surfaced
        assert ("orphan", "resp-late") not in rows   # wrong key never joins
