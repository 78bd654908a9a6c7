"""Python DataSource tests (sources/pyds.py): batch read parity with the
column-expression parser, file-level partitioning, and landing-dir
streaming with the file-set offset."""

from __future__ import annotations

from pyspark.sql import functions as F

from hepop_spark.sources.lineproto import parse_lines_df
from hepop_spark.sources.pyds import register

LP_LINES = [
    "cpu,host=server01 usage_idle=87.2 1709290800000000000",
    "cpu,host=server02 usage_idle=91.0,n=3i 1709290860000000000",
    "memory,host=server01 used_percent=55.5 1709290800000000000",
    'home,room=Garden temp=72.5,note="ok" 1709290920000000000',
    "home,room=Kitchen temp=68.0",          # no timestamp -> NULL
    "bare_measurement",                      # no fields at all
    "weird,tag_only= empty=,x=1 1709290980000000000",
]


def _canon(df):
    return sorted(
        (
            r["measurement"],
            tuple(sorted((r["tags"] or {}).items())),
            tuple(sorted((r["fields"] or {}).items())),
            r["timestamp"],
        )
        for r in df.collect()
    )


class TestBatch:
    def test_row_parity_with_column_parser(self, spark, tmp_path):
        d = tmp_path / "lp"
        d.mkdir()
        (d / "a.lp").write_text("\n".join(LP_LINES[:4]) + "\n\n")
        (d / "b.lp").write_text("\n".join(LP_LINES[4:]))
        register(spark)
        via_ds = spark.read.format("lineproto").load(str(d))
        via_cols = parse_lines_df(
            spark.read.text(str(d)).filter(F.trim("value") != "")
        )
        assert via_ds.schema.simpleString() == via_cols.schema.simpleString()
        assert _canon(via_ds) == _canon(via_cols)

    def test_partition_per_file(self, spark, tmp_path):
        d = tmp_path / "lp2"
        d.mkdir()
        for i in range(5):
            (d / f"f{i}.lp").write_text(LP_LINES[0])
        register(spark)
        df = spark.read.format("lineproto").load(str(d))
        assert df.rdd.getNumPartitions() == 5
        assert df.count() == 5


class TestStream:
    def test_landing_dir_microbatches(self, spark, tmp_path):
        d = tmp_path / "lp3"
        d.mkdir()
        (d / "a.lp").write_text("\n".join(LP_LINES[:2]))
        register(spark)
        src = spark.readStream.format("lineproto").load(str(d))
        assert src.isStreaming
        sink = str(tmp_path / "mem")
        q = (
            src.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            import time

            deadline = time.time() + 60
            while time.time() < deadline:
                try:
                    if spark.read.parquet(sink).count() >= 2:
                        break
                except Exception:
                    pass
                time.sleep(1)
            assert spark.read.parquet(sink).count() == 2
            # a file landing mid-stream is picked up by the next offset
            (d / "b.lp").write_text("\n".join(LP_LINES[2:4]))
            deadline = time.time() + 60
            while time.time() < deadline:
                if spark.read.parquet(sink).count() >= 4:
                    break
                time.sleep(1)
            assert spark.read.parquet(sink).count() == 4
        finally:
            q.stop()
