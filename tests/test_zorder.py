"""Z-order clustering tests (storage/zorder.py): Morton-code math and the
data-skipping property — per-file min/max spans must shrink on BOTH
clustered dimensions versus an unclustered layout."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from hepop_spark.storage.zorder import with_zvalue, z_value, zorder_write


class TestZValue:
    def test_interleave_known_bits(self, spark):
        # 2 dims: bit i of dim d lands at position 2i+d.
        # x=3 (bits 0,1) -> z bits 0 and 2; y=1 (bit 0) -> z bit 1
        # => z = 1 + 2 + 4 = 7
        df = spark.range(1).select(
            z_value([F.lit(3).cast("long"), F.lit(1).cast("long")], bits=2).alias("z")
        )
        assert df.first()["z"] == 7

    def test_zvalue_monotone_in_coarse_bits(self, spark):
        # points in the same coarse quadrant must be z-closer than points
        # in opposite quadrants
        df = spark.createDataFrame(
            [(0, 0), (1, 1), (100, 100)], "a long, b long"
        )
        z = {
            (r["a"], r["b"]): r["_z"]
            for r in with_zvalue(df, ["a", "b"], bits=8).collect()
        }
        assert abs(z[(0, 0)] - z[(1, 1)]) < abs(z[(0, 0)] - z[(100, 100)])


class TestZorderWrite:
    def _file_spans(self, spark, path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
        )
        rows = per_file.collect()
        return sum(r["span"] for r in rows) / len(rows)

    def test_spans_shrink_on_both_dims(self, spark):
        # a 2-d grid shuffled into hash order: an unclustered write leaves
        # every file covering nearly the full range of both columns; the
        # z-ordered write must tighten both dramatically
        n = 64
        grid = spark.sql(f"""
            SELECT id DIV {n} AS a, id % {n} AS b,
                   md5(CAST(id AS STRING)) AS shuffle_key
            FROM range({n * n})
        """).repartition(8, "shuffle_key").drop("shuffle_key")
        d = tempfile.mkdtemp(prefix="zorder_")
        try:
            plain, zed = os.path.join(d, "plain"), os.path.join(d, "zed")
            grid.write.parquet(plain)
            zorder_write(grid, zed, ["a", "b"], n_files=8)
            for col in ("a", "b"):
                span_plain = self._file_spans(spark, plain, col)
                span_zed = self._file_spans(spark, zed, col)
                assert span_zed < span_plain * 0.6, (col, span_zed, span_plain)
            # layout must be result-invisible
            assert (
                spark.read.parquet(zed).agg(F.sum("a"), F.sum("b")).first()
                == grid.agg(F.sum("a"), F.sum("b")).first()
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)
