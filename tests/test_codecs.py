"""Parquet compression-codec matrix: every codec Spark ships for parquet
round-trips losslessly, and the codec choice is result-invisible. At 100 TB
the codec is a first-order cost knob (zstd ≈ gzip ratio at snappy-like
speed); this pins that the engine can write/read all of them."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

CODECS = ["snappy", "zstd", "gzip", "lz4", "uncompressed"]


def _du(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


class TestCodecs:
    def test_roundtrip_all_codecs(self, spark, tmp_path):
        df = spark.range(50_000).select(
            F.col("id"),
            (F.col("id") % 97).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        want = df.agg(
            F.sum("id"), F.countDistinct("payload"), F.sum("k")
        ).first()
        sizes = {}
        for codec in CODECS:
            out = str(tmp_path / codec)
            df.write.option("compression", codec).parquet(out)
            back = spark.read.parquet(out)
            got = back.agg(
                F.sum("id"), F.countDistinct("payload"), F.sum("k")
            ).first()
            assert got == want, codec
            sizes[codec] = _du(out)
        # compressed beats uncompressed on md5-text payloads
        assert sizes["zstd"] < sizes["uncompressed"]
        assert sizes["gzip"] < sizes["uncompressed"]
        assert sizes["snappy"] < sizes["uncompressed"]
