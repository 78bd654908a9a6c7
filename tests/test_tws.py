"""transformWithStateInPandas contracts (streaming/tws.py): cumulative
state survives across micro-batches and the final emission per key equals
the global aggregate."""

from __future__ import annotations

import importlib.util
import json
import time

import pytest

from hepop_spark.streaming.tws import running_totals, use_rocksdb

def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


pytestmark = pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs the protobuf runtime "
    "(absent in this container; standard pyspark installs ship it)",
)


class TestRunningTotals:
    def test_cumulative_across_microbatches(self, spark, tmp_path):
        landing = tmp_path / "in"
        landing.mkdir()
        batch1 = [{"event_type": "click", "value": 1.5}] * 3 + [
            {"event_type": "buy", "value": 10.0}
        ]
        (landing / "a.json").write_text("\n".join(json.dumps(r) for r in batch1))

        use_rocksdb(spark)
        src = (
            spark.readStream.schema("event_type string, value double")
            .option("maxFilesPerTrigger", 1)
            .json(str(landing))
        )
        out = running_totals(src)
        assert out.isStreaming

        emitted: list[tuple] = []

        def sink(batch, batch_id):
            emitted.extend(
                (r["event_type"], r["n"], r["sum_v"]) for r in batch.collect()
            )

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + 90
            while time.time() < deadline and len(emitted) < 2:
                time.sleep(1)
            assert ("click", 3, 4.5) in emitted
            assert ("buy", 1, 10.0) in emitted

            # second file: state must CONTINUE, not restart
            batch2 = [{"event_type": "click", "value": 0.5}] * 2
            (landing / "b.json").write_text("\n".join(json.dumps(r) for r in batch2))
            deadline = time.time() + 90
            while time.time() < deadline and ("click", 5, 5.5) not in emitted:
                time.sleep(1)
            assert ("click", 5, 5.5) in emitted
        finally:
            q.stop()
