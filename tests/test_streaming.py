"""Streaming ingest tests: LP landing-dir -> parse -> partitioned parquet
(the reference's §3.2 pipeline), HEP binary stream decode, watermarked
windows, streaming sessionization. All driven with availableNow triggers."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from hepop_spark.sources.hep import encapsulate
from hepop_spark.storage.writer import read_table
from hepop_spark.streaming.ingest import (
    hep_sink,
    lp_sink,
    read_lp_stream,
    sessionized,
    windowed_counts,
)

LP_LINES = [
    "cpu,host=server01 usage_idle=87.2 1709290800000000000",
    "cpu,host=server02 usage_idle=91.0 1709290860000000000",
    "memory,host=server01 used_percent=55.5 1709290800000000000",
    "home,room=Garden temp=72.5 1709290920000000000",
    "home,room=Kitchen temp=68.0 1709290980000000000",
]


class TestLpPipeline:
    def test_landing_to_partitioned_tables(self, spark, tmp_path):
        landing = tmp_path / "landing"
        landing.mkdir()
        (landing / "batch1.lp").write_text("\n".join(LP_LINES))

        parsed = read_lp_stream(spark, str(landing))
        assert parsed.isStreaming
        q = lp_sink(
            parsed,
            str(tmp_path / "tables"),
            str(tmp_path / "ckpt"),
            processing_time=None,  # availableNow for the test
        ).start()
        q.awaitTermination(60)

        cpu = read_table(spark, str(tmp_path / "tables" / "cpu")).collect()
        assert len(cpu) == 2
        tags = {json.loads(r["tags"])["host"] for r in cpu}
        assert tags == {"server01", "server02"}
        # first-row schema freeze: usage_idle typed DOUBLE (hepop.js:386-391)
        assert {round(r["usage_idle"], 1) for r in cpu} == {87.2, 91.0}

        home = read_table(spark, str(tmp_path / "tables" / "home")).collect()
        assert len(home) == 2
        assert {r["temp"] for r in home} == {72.5, 68.0}
        # partition layout carries the 10-min bucket (ts = 11:02/11:03 UTC)
        assert {r["bucket"] for r in home} == {"11-00"}

    def test_incremental_batches(self, spark, tmp_path):
        landing = tmp_path / "landing2"
        landing.mkdir()
        (landing / "a.lp").write_text(LP_LINES[0])
        base, ckpt = str(tmp_path / "tables2"), str(tmp_path / "ckpt2")

        q = lp_sink(read_lp_stream(spark, str(landing)), base, ckpt, None).start()
        q.awaitTermination(60)
        assert read_table(spark, f"{base}/cpu").count() == 1

        # second file arrives; checkpoint resumes exactly-once
        (landing / "b.lp").write_text(LP_LINES[1])
        q = lp_sink(read_lp_stream(spark, str(landing)), base, ckpt, None).start()
        q.awaitTermination(60)
        assert read_table(spark, f"{base}/cpu").count() == 2

    def test_schema_freeze_drops_new_field(self, spark, tmp_path):
        """Default semantics = the reference's first-row freeze
        (hepop.js:382-394): a field appearing after the freeze is dropped."""
        landing = tmp_path / "landing3"
        landing.mkdir()
        (landing / "a.lp").write_text("cpu,host=h1 usage=1.0 1709290800000000000")
        base, ckpt = str(tmp_path / "tables3"), str(tmp_path / "ckpt3")
        q = lp_sink(read_lp_stream(spark, str(landing)), base, ckpt, None).start()
        q.awaitTermination(60)

        (landing / "b.lp").write_text(
            "cpu,host=h2 usage=2.0,temp=9.5 1709290860000000000"
        )
        q = lp_sink(read_lp_stream(spark, str(landing)), base, ckpt, None).start()
        q.awaitTermination(60)
        back = read_table(spark, f"{base}/cpu")
        assert "temp" not in back.columns  # frozen schema, field dropped
        assert back.count() == 2

    def test_schema_evolution_adds_field(self, spark, tmp_path):
        """schema_evolution=True lifts the freeze: the measurement gains the
        new column; pre-evolution rows read as NULL via mergeSchema."""
        from hepop_spark.streaming.ingest import read_measurement

        landing = tmp_path / "landing4"
        landing.mkdir()
        (landing / "a.lp").write_text("cpu,host=h1 usage=1.0 1709290800000000000")
        base, ckpt = str(tmp_path / "tables4"), str(tmp_path / "ckpt4")
        q = lp_sink(
            read_lp_stream(spark, str(landing)), base, ckpt, None,
            schema_evolution=True,
        ).start()
        q.awaitTermination(60)

        (landing / "b.lp").write_text(
            "cpu,host=h2 usage=2.0,temp=9.5 1709290860000000000\n"
            "cpu,host=h3 usage=3.0,temp=8.5,on=true 1709290920000000000"
        )
        q = lp_sink(
            read_lp_stream(spark, str(landing)), base, ckpt, None,
            schema_evolution=True,
        ).start()
        q.awaitTermination(60)

        back = read_measurement(spark, base, "cpu")
        assert {"usage", "temp", "on"} <= set(back.columns)
        rows = {json.loads(r["tags"])["host"]: r for r in back.collect()}
        assert rows["h1"]["temp"] is None  # pre-evolution row null-fills
        assert rows["h2"]["temp"] == 9.5
        assert rows["h3"]["on"] is True  # boolean inference on evolved field
        # existing fields keep their frozen type across evolution
        assert dict(back.dtypes)["usage"] == "double"


class TestHepPipeline:
    def test_binary_stream_decode(self, spark, tmp_path):
        from hepop_spark.sources.hep import decode_hep_df

        frames = [
            encapsulate(
                {
                    "srcIp": "1.2.3.4",
                    "dstIp": "5.6.7.8",
                    "timeSeconds": 1709290800 + i,
                    "timeUseconds": 500000,
                    "payloadType": 1 if i % 2 == 0 else 100,
                },
                f"INVITE {i}",
            )
            for i in range(6)
        ]
        src = tmp_path / "hep_landing"
        src.mkdir()
        df = spark.createDataFrame([(f,) for f in frames], "frame binary")
        df.write.parquet(str(src / "b0.parquet"))

        stream = spark.readStream.schema("frame binary").parquet(str(src / "*.parquet"))
        decoded = decode_hep_df(stream)
        q = hep_sink(
            decoded, str(tmp_path / "hep_tables"), str(tmp_path / "hep_ckpt"), None
        ).start()
        q.awaitTermination(60)

        t1 = read_table(spark, str(tmp_path / "hep_tables" / "hep_1")).collect()
        t100 = read_table(spark, str(tmp_path / "hep_tables" / "hep_100")).collect()
        assert len(t1) == 3 and len(t100) == 3
        assert json.loads(t1[0]["rcinfo"])["srcIp"] == "1.2.3.4"


class TestWindowedStreaming:
    def _event_stream(self, spark, tmp_path, name):
        src = tmp_path / name
        src.mkdir()
        rows = [
            (i, f"2024-03-01 10:{i % 60:02d}:00", i % 3)
            for i in range(90)
        ]
        spark.createDataFrame(rows, "event_id long, ts_s string, user_id long").withColumn(
            "timestamp", F.to_timestamp("ts_s")
        ).drop("ts_s").write.parquet(str(src / "p0.parquet"))
        return spark.readStream.schema("event_id long, user_id long, timestamp timestamp").parquet(
            str(src / "*.parquet")
        )

    def test_windowed_counts(self, spark, tmp_path):
        stream = self._event_stream(spark, tmp_path, "ev1")
        agg = windowed_counts(stream, "timestamp", "10 minutes", "5 minutes")
        q = (
            agg.writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        out = spark.sql("SELECT * FROM win_counts ORDER BY win_start").collect()
        assert sum(r["n"] for r in out) == 90
        assert len(out) == 6  # 10:00-10:59 -> six 10-min windows

    def test_streaming_sessions(self, spark, tmp_path):
        stream = self._event_stream(spark, tmp_path, "ev2")
        sess = sessionized(stream, "timestamp", gap="5 minutes", watermark="10 minutes")
        q = (
            sess.writeStream.format("memory")
            .queryName("sessions")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        out = spark.sql("SELECT * FROM sessions").collect()
        assert len(out) > 0
        assert sum(r["n_events"] for r in out) == 90
