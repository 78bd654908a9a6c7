"""Round-9 regression tests: the five r08 ADVICE items.

1 (medium) plans/api.py — rollup routing of an UNALIASED expression key
  produced unparseable SQL (`grid AS upper(lang)`); now falls back to raw.
2 (medium) storage/writer.read_table — plain directory read double-counted
  manifest-mode tables during the retire grace; now pinned to live_files.
3 (low) operators/multimodal.py module doc — PNG listed as gated while
  decode_png_stats is real; doc fixed (asserted here so it can't regress).
4 (low) catalog.discover_table — a manifest dir with NO published version
  (crash inside enable_manifest) silently hid a table with live parquet.
5 (low) operators/jpeg.py — truncated/corrupt payloads raised IndexError /
  struct.error engine failures; now the documented ValueError, tagged
  with the media id.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest


def _write_ts(spark, base, lo, hi, manifest=None):
    from hepop_spark.storage.writer import write_partitioned

    ts = F.lit("2024-03-01 10:00:00").cast("timestamp")
    write_partitioned(
        spark.range(lo, hi).select(F.col("id").alias("v"),
                                   ts.alias("timestamp")),
        str(base), manifest=manifest,
    )


class TestExpressionKeyRouting:
    def _tree(self, spark, tmp_path):
        from hepop_spark.storage.rollup import projection_append

        data = str(tmp_path / "data")
        raw = spark.createDataFrame(
            [(i, ["en", "de", "fr"][i % 3], 10 + i) for i in range(30)],
            "doc_id long, lang string, n_chars long",
        )
        raw.write.mode("overwrite").parquet(
            os.path.join(data, "w1", "dbs", "docs_t9"))
        grid = (
            raw.groupBy(F.upper("lang").alias("lang_u"))
            .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        )
        projection_append(
            spark, os.path.join(data, "w1", "rollups", "docs_t9_grid"),
            grid, "b0", keys=["lang_u"], sums=["n", "chars"],
            source={"table": "docs_t9",
                    "keys": {"lang_u": "upper(lang)"},
                    "sums": {"n": "count(*)", "chars": "sum(n_chars)"}},
        )
        return data, raw

    def test_unaliased_expression_key_falls_back_to_raw(self, spark, tmp_path):
        """r08 ADVICE medium #1: the unaliased expression key must NOT
        produce `grid AS upper(lang)` SQL — the query that worked before
        the rollup existed keeps working, answered from the raw scan."""
        from hepop_spark.plans.api import HepopQueryAPI

        data, raw = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT upper(lang), count(*) AS n FROM docs_t9 "
            "GROUP BY upper(lang) ORDER BY n DESC")
        assert api.last_routed_rollup is None
        want = {
            (r[0], r[1])
            for r in raw.groupBy(F.upper("lang")).agg(F.count("*")).collect()
        }
        assert {(r["upper(lang)"], r["n"]) for r in rows} == want

    def test_aliased_expression_key_still_routes(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data, raw = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT upper(lang) AS lang_u, count(*) AS n, "
            "sum(n_chars) AS chars FROM docs_t9 "
            "GROUP BY upper(lang) ORDER BY lang_u")
        assert api.last_routed_rollup == "docs_t9_grid"
        want = [
            (r[0], r[1], r[2])
            for r in sorted(
                raw.groupBy(F.upper("lang")).agg(
                    F.count("*"), F.sum("n_chars")).collect())
        ]
        assert [(r["lang_u"], r["n"], r["chars"]) for r in rows] == want


class TestReadTableManifestPinned:
    def test_no_double_count_during_retire_grace(self, spark, tmp_path):
        """r08 ADVICE medium #2: between a compaction and its vacuum,
        retired bytes sit beside the compacted file; read_table must see
        the LIVE set only."""
        from hepop_spark.storage.compaction import compact
        from hepop_spark.storage.writer import read_table

        base = tmp_path / "t"
        _write_ts(spark, base, 0, 10, manifest=True)
        _write_ts(spark, base, 10, 20)
        compact(spark, str(base))  # retires originals, grace-deferred
        got = read_table(spark, str(base))
        assert got.count() == 20
        assert {r.v for r in got.select("v").collect()} == set(range(20))
        # raw directory read really would have double-counted (the hazard)
        assert spark.read.parquet(str(base)).count() > 20
        # partition columns survive the pinned read (basePath semantics)
        assert {"date", "bucket"} <= set(got.columns)
        assert got.filter(F.col("bucket") == "10-00").count() == 20

    def test_plain_table_unchanged(self, spark, tmp_path):
        from hepop_spark.storage.writer import read_table

        base = tmp_path / "plain"
        _write_ts(spark, base, 0, 7)
        assert read_table(spark, str(base)).count() == 7

    def test_empty_live_set_reads_empty(self, spark, tmp_path):
        """All files retired, grace unexpired: the pinned read returns
        zero rows even though retired bytes are still on disk."""
        from hepop_spark.storage.manifest import latest, replace_files
        from hepop_spark.storage.writer import read_table

        base = tmp_path / "t"
        _write_ts(spark, base, 0, 5, manifest=True)
        _v, man = latest(str(base))
        replace_files(str(base), [], man["files"])  # logical delete-all
        assert read_table(spark, str(base)).count() == 0
        assert spark.read.parquet(str(base)).count() == 5  # bytes remain


class TestManifestCrashWindowDiscovery:
    def test_enabled_but_unpublished_falls_back_to_listing(
            self, spark, tmp_path):
        """r08 ADVICE low #4: `_manifest/` exists (mkdir landed) but no
        version was ever published (crash before first publish) — the
        table's parquet data must still be discoverable."""
        from hepop_spark.catalog import discover_table

        data = tmp_path / "data"
        base = data / "w1" / "dbs" / "m9"
        _write_ts(spark, base, 0, 8)  # plain table with data
        (base / "_manifest").mkdir()  # simulate crashed enable_manifest
        assert discover_table(spark, str(data), "m9", cache={})
        assert spark.table("m9").count() == 8

    def test_read_table_same_crash_window(self, spark, tmp_path):
        from hepop_spark.storage.writer import read_table

        base = tmp_path / "t"
        _write_ts(spark, base, 0, 8)
        (base / "_manifest").mkdir()
        assert read_table(spark, str(base)).count() == 8


class TestMalformedMediaPayloads:
    def test_truncated_jpeg_raises_valueerror(self):
        import numpy as np

        from hepop_spark.operators.jpeg import (
            decode_baseline_jpeg,
            encode_baseline_jpeg,
        )

        img = np.full((8, 8, 3), 128, dtype=np.uint8)
        blob = encode_baseline_jpeg(img)
        with pytest.raises(ValueError):
            decode_baseline_jpeg(blob[:len(blob) - 6])  # cut scan + EOI

    def test_jpeg_stats_tags_media_id(self, spark):
        from hepop_spark.operators.multimodal import decode_jpeg_stats

        bad = spark.createDataFrame(
            [(7, bytearray(b"\xff\xd8\xff\xdb garbage"))],
            "media_id long, payload binary",
        )
        with pytest.raises(Exception) as ei:
            decode_jpeg_stats(bad).collect()
        assert "ValueError" in str(ei.value) and "media_id=7" in str(ei.value)

    def test_wav_short_fmt_is_valueerror(self, spark):
        """A fmt chunk shorter than 16 bytes used to struct.error; and a
        non-RIFF payload keeps its ValueError, now id-tagged."""
        import struct

        from hepop_spark.operators.multimodal import decode_wav_stats

        short_fmt = (b"RIFF" + struct.pack("<I", 16) + b"WAVE"
                     + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x02\x00")
        bad = spark.createDataFrame(
            [(3, bytearray(short_fmt)), (4, bytearray(b"nope"))],
            "media_id long, payload binary",
        )
        for mid in (3, 4):
            with pytest.raises(Exception) as ei:
                decode_wav_stats(
                    bad.filter(F.col("media_id") == mid)).collect()
            assert "ValueError" in str(ei.value)
            assert f"media_id={mid}" in str(ei.value)

    def test_png_truncated_is_valueerror(self, spark):
        from hepop_spark.operators.multimodal import decode_png_stats

        bad = spark.createDataFrame(
            [(9, bytearray(b"\x89PNG\r\n\x1a\n\x00\x00"))],
            "media_id long, payload binary",
        )
        with pytest.raises(Exception) as ei:
            decode_png_stats(bad).collect()
        assert "ValueError" in str(ei.value) and "media_id=9" in str(ei.value)

    def test_module_doc_matches_decode_reality(self):
        """ADVICE low #3: the module header must not claim PNG is gated."""
        import hepop_spark.operators.multimodal as mm

        doc = mm.__doc__
        assert "decode_png_stats" in doc
        assert "PNG needs a zlib-inflate path" not in doc


class TestVideoCodecs:
    """r09: real YUV4MPEG2 video decode + ISO BMFF container parsing
    (operators/video.py) — the uncompressed-video de-fake."""

    def test_y4m_roundtrip_c444_and_c420(self):
        import numpy as np

        from hepop_spark.operators.video import build_y4m, iter_y4m_frames

        k = np.arange(64, dtype=np.int64)
        frames = []
        for f in range(3):
            frames.append((
                ((5 * 31 + f * 17 + k * 7) % 256).astype(np.uint8).reshape(8, 8),
                ((5 * 57 + f * 29 + k * 11) % 256).astype(np.uint8).reshape(8, 8),
                ((5 * 83 + f * 41 + k * 13) % 256).astype(np.uint8).reshape(8, 8),
            ))
        got = list(iter_y4m_frames(build_y4m(8, 8, frames, chroma="444")))
        assert [g[0] for g in got] == [0, 1, 2]
        for (_, y, u, v), (ey, eu, ev) in zip(got, frames):
            assert np.array_equal(y, ey)
            assert np.array_equal(u, eu)
            assert np.array_equal(v, ev)
        # C420: chroma planes are quarter-size
        f420 = [(np.full((8, 8), 10, np.uint8),
                 np.full((4, 4), 20, np.uint8),
                 np.full((4, 4), 30, np.uint8))]
        (_, y, u, v), = list(iter_y4m_frames(build_y4m(8, 8, f420, chroma="420")))
        assert u.shape == (4, 4) and int(v.sum()) == 30 * 16

    def test_y4m_malformed(self):
        import numpy as np

        from hepop_spark.operators.video import build_y4m, iter_y4m_frames

        blob = build_y4m(4, 4, [(np.zeros((4, 4), np.uint8),
                                 np.zeros((4, 4), np.uint8),
                                 np.zeros((4, 4), np.uint8))])
        with pytest.raises(ValueError):
            list(iter_y4m_frames(blob[:-3]))  # truncated frame
        with pytest.raises(ValueError):
            list(iter_y4m_frames(b"JUNK" + blob))  # bad magic
        with pytest.raises(ValueError):
            list(iter_y4m_frames(
                blob.replace(b"C444", b"C422")))  # unsupported chroma

    def test_mp4_meta_both_mvhd_versions(self):
        from hepop_spark.operators.video import (
            build_minimal_mp4,
            parse_mp4_meta,
        )

        for v1 in (False, True):
            m = parse_mp4_meta(build_minimal_mp4(
                600, 54321, 3, 640, 368, mvhd_v1=v1))
            assert m["brand"] == "isom"
            assert (m["timescale"], m["duration"]) == (600, 54321)
            assert m["n_tracks"] == 1 and m["video_track_id"] == 3
            assert (m["width"], m["height"]) == (640, 368)
            assert m["handlers"] == ["vide"]

    def test_mp4_malformed(self):
        import struct

        from hepop_spark.operators.video import parse_mp4_meta

        with pytest.raises(ValueError):
            parse_mp4_meta(b"\x00\x00\x00\x10ftypisom")  # box overruns
        with pytest.raises(ValueError):
            parse_mp4_meta(  # well-framed but no moov/mvhd
                struct.pack(">I", 12) + b"ftypisom" * 1 + b"")

    def test_spark_wrappers_roundtrip(self, spark):
        from hepop_spark.operators.multimodal import (
            decode_mp4_meta,
            decode_y4m_frames,
            synthesize_meta_mp4s,
            synthesize_y4m_videos,
        )

        ids = spark.range(5).select(F.col("id").alias("media_id"))
        fr = decode_y4m_frames(
            synthesize_y4m_videos(ids, n_frames=2, side=4)).collect()
        assert len(fr) == 10
        r = next(x for x in fr if x.media_id == 3 and x.frame_idx == 1)
        want_y = sum((3 * 31 + 17 + k * 7) % 256 for k in range(16))
        assert (r.width, r.height, r.sum_y) == (4, 4, want_y)
        mp = decode_mp4_meta(synthesize_meta_mp4s(ids)).collect()
        assert {(m.media_id, m.duration) for m in mp} == {
            (i, 1000 + (i * 37) % 100000) for i in range(5)}
        assert all(m.duration_ms == m.duration * 1000 // 600 for m in mp)

    def test_y4m_stats_tags_media_id(self, spark):
        from hepop_spark.operators.multimodal import decode_y4m_frames

        bad = spark.createDataFrame(
            [(11, bytearray(b"YUV4MPEG2 W4 H4 F25:1\nFRAME\nxx"))],
            "media_id long, payload binary",
        )
        with pytest.raises(Exception) as ei:
            decode_y4m_frames(bad).collect()
        assert "ValueError" in str(ei.value)
        assert "media_id=11" in str(ei.value)
