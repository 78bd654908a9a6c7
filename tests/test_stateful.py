"""Custom stateful streaming operator tests (applyInPandasWithState)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hepop_spark.streaming.stateful import streaming_dedup


class TestStreamingDedup:
    def _stream(self, spark, tmp_path, batches):
        src = tmp_path / "dedup_src"
        src.mkdir()
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, "h string, payload string").write.parquet(
                str(src / f"b{i}.parquet")
            )
        return spark.readStream.schema("h string, payload string").parquet(
            str(src / "*.parquet")
        )

    def test_first_arrival_wins_with_dup_counts(self, spark, tmp_path):
        stream = self._stream(
            spark,
            tmp_path,
            [
                [("k1", "first-k1"), ("k1", "dup-k1"), ("k2", "first-k2"),
                 ("k1", "dup2-k1"), ("k3", "first-k3")],
            ],
        )
        # ttl_ms=None (NoTimeout): availableNow terminates once drained —
        # with a TTL, timeout batches keep the query alive forever.
        out = streaming_dedup(stream, ttl_ms=None)
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination()
        rows = {r["h"]: r for r in spark.sql("SELECT * FROM dedup_out").collect()}
        assert set(rows) == {"k1", "k2", "k3"}
        assert rows["k1"]["payload"] == "first-k1"  # first arrival wins
        assert rows["k1"]["n_dups"] == 2
        assert rows["k2"]["n_dups"] == 0

    def test_state_suppresses_across_batches(self, spark, tmp_path):
        # The memory sink can't recover from a checkpoint, so the restart
        # test uses a parquet sink (which can).
        src = tmp_path / "src2"
        out = tmp_path / "out2"
        src.mkdir()
        spark.createDataFrame(
            [("a", "v1")], "h string, payload string"
        ).write.parquet(str(src / "b0.parquet"))

        def run():
            stream = spark.readStream.schema("h string, payload string").parquet(
                str(src / "*.parquet")
            )
            q = (
                streaming_dedup(stream, ttl_ms=None)
                .writeStream.format("parquet")
                .outputMode("append")
                .trigger(availableNow=True)
                .option("path", str(out))
                .option("checkpointLocation", str(tmp_path / "ck2"))
                .start()
            )
            q.awaitTermination()

        run()
        assert spark.read.parquet(str(out)).count() == 1
        # same key arrives again in a later run: checkpointed state suppresses it
        spark.createDataFrame(
            [("a", "v2"), ("b", "new")], "h string, payload string"
        ).write.parquet(str(src / "b1.parquet"))
        run()
        rows = {r["h"]: r["payload"]
                for r in spark.read.parquet(str(out)).collect()}
        assert rows == {"a": "v1", "b": "new"}  # 'a' emitted once, with v1
