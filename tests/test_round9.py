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


class TestMinMaxProjections:
    """r09: MIN/MAX monoid columns in maintained projection stores —
    append/fold/federation/routing must never SUM-merge an extremum."""

    def _store(self, spark, tmp_path, writer="w1"):
        from hepop_spark.storage.rollup import projection_append

        data = str(tmp_path / "data")
        raw = spark.createDataFrame(
            [(i, ["a", "b"][i % 2], 10 + (i * 7) % 50) for i in range(40)],
            "doc_id long, k string, v long",
        )
        raw.write.mode("append").parquet(
            os.path.join(data, writer, "dbs", "mm_docs"))
        store = os.path.join(data, writer, "rollups", "mm_grid")
        for b in range(3):
            part = (
                raw.filter(F.col("doc_id") % 3 == b)
                .groupBy("k")
                .agg(F.count("*").alias("n"), F.sum("v").alias("sv"),
                     F.min("v").alias("mn"), F.max("v").alias("mx"))
            )
            projection_append(
                spark, store, part, f"b{b}",
                keys=["k"], sums=["n", "sv"], mins=["mn"], maxs=["mx"],
                source={"table": "mm_docs", "keys": {"k": "k"},
                        "sums": {"n": "count(*)", "sv": "sum(v)"},
                        "mins": {"mn": "min(v)"},
                        "maxs": {"mx": "max(v)"}},
            )
        return data, store, raw

    def _want(self, raw):
        return {
            (r[0], r[1], r[2], r[3], r[4])
            for r in raw.groupBy("k").agg(
                F.count("*"), F.sum("v"), F.min("v"), F.max("v")).collect()
        }

    def test_scan_fold_invariant(self, spark, tmp_path):
        from hepop_spark.storage.rollup import (
            projection_compact,
            projection_scan,
        )

        data, store, raw = self._store(spark, tmp_path)
        args = (["k"], ["n", "sv"], ["mn"], ["mx"])
        got = {
            tuple(r) for r in projection_scan(
                spark, store, *args).select("k", "n", "sv", "mn", "mx")
            .collect()
        }
        assert got == self._want(raw)
        assert projection_compact(spark, store, *args) is True
        got2 = {
            tuple(r) for r in projection_scan(
                spark, store, *args).select("k", "n", "sv", "mn", "mx")
            .collect()
        }
        assert got2 == got

    def test_federation_and_routing(self, spark, tmp_path):
        from hepop_spark.catalog import discover_table
        from hepop_spark.plans.api import HepopQueryAPI

        data, _s1, raw1 = self._store(spark, tmp_path, "w1")
        # second writer: shifted values so extrema differ across writers
        from hepop_spark.storage.rollup import projection_append

        raw2 = spark.createDataFrame(
            [(100 + i, ["a", "b"][i % 2], 200 + i) for i in range(10)],
            "doc_id long, k string, v long",
        )
        raw2.write.mode("append").parquet(
            os.path.join(data, "w2", "dbs", "mm_docs"))
        part2 = raw2.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("v").alias("sv"),
            F.min("v").alias("mn"), F.max("v").alias("mx"))
        projection_append(
            spark, os.path.join(data, "w2", "rollups", "mm_grid"),
            part2, "b0", keys=["k"], sums=["n", "sv"],
            mins=["mn"], maxs=["mx"],
            source={"table": "mm_docs", "keys": {"k": "k"},
                    "sums": {"n": "count(*)", "sv": "sum(v)"},
                    "mins": {"mn": "min(v)"}, "maxs": {"mx": "max(v)"}},
        )
        both = raw1.unionByName(raw2)
        # federated view (two writers' grids monoid-merged by the catalog)
        assert discover_table(spark, data, "mm_grid", cache={})
        got = {
            tuple(r) for r in spark.table("mm_grid")
            .select("k", "n", "sv", "mn", "mx").collect()
        }
        assert got == self._want(both)
        # routed: user min/max over the raw table answered from the grids
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT k, min(v) AS mn, max(v) AS mx, sum(v) AS sv "
            "FROM mm_docs GROUP BY k ORDER BY k")
        assert api.last_routed_rollup == "mm_grid"
        want = {(r[0], r[1], r[2], r[3]) for r in both.groupBy("k").agg(
            F.min("v"), F.max("v"), F.sum("v")).collect()}
        assert {(r["k"], r["mn"], r["mx"], r["sv"]) for r in rows} == want

    def test_avg_never_routes_to_extrema(self, spark, tmp_path):
        """avg is not a monoid and has no grid column — must fall back."""
        from hepop_spark.plans.api import HepopQueryAPI

        data, _store, raw = self._store(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT k, avg(v) AS av FROM mm_docs GROUP BY k ORDER BY k")
        assert api.last_routed_rollup is None
        want = {(r[0], r[1]) for r in raw.groupBy("k").agg(F.avg("v")).collect()}
        assert {(r["k"], r["av"]) for r in rows} == want


class TestManifestMultiWriterCAS:
    """r09: version publish is a bounded CAS — a writer losing the
    put-if-absent race re-derives against the winner's version and
    retries, so a SHARED table tree converges without losing either
    writer's files; a compaction whose inputs were already replaced
    rolls back instead of double-applying."""

    def _stale_once(self, monkeypatch):
        """Make manifest.latest return the PREVIOUS version once — the
        cross-process race (a winner landing between the mutation's read
        and its publish) reproduced deterministically in-process."""
        from hepop_spark.storage import manifest as m

        real = m.latest
        state = {"armed": True}

        def stale(table_dir):
            got = real(table_dir)
            if state["armed"] and got and got[0] > 1:
                state["armed"] = False
                import json as _json
                with open(os.path.join(table_dir, "_manifest",
                                       f"v{got[0] - 1}.json")) as fh:
                    return got[0] - 1, _json.load(fh)
            return got

        monkeypatch.setattr(m, "latest", stale)
        return state

    def _plant(self, base, rel):
        p = base / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"PAR1 dummy")
        return rel

    def test_publish_append_retries_and_adopts_winner(
            self, spark, tmp_path, monkeypatch):
        import json as _json

        from hepop_spark.storage.manifest import latest, publish_append

        base = tmp_path / "t"
        _write_ts(spark, base, 0, 10, manifest=True)
        v1, man1 = latest(str(base))
        # concurrent winner: an append publishing v2 with an extra file
        extra = self._plant(base, "date=2024-03-01/bucket=10-00/w2.parquet")
        rogue = {"version": v1 + 1, "ts": 0,
                 "files": sorted(man1["files"] + [extra]), "retired": {}}
        (base / "_manifest" / f"v{v1 + 1}.json").write_text(
            _json.dumps(rogue))
        self._stale_once(monkeypatch)  # our writer still sees v1
        v = publish_append(str(base))  # CAS: conflict at v2, lands at v3
        assert v == v1 + 2
        _v, man = latest(str(base))
        assert extra in man["files"]  # the winner's file was not lost
        assert set(man1["files"]) <= set(man["files"])

    def test_replace_files_retries_while_inputs_live(
            self, spark, tmp_path, monkeypatch):
        import json as _json

        from hepop_spark.storage.manifest import latest, replace_files

        base = tmp_path / "t"
        _write_ts(spark, base, 0, 10, manifest=True)
        v1, man1 = latest(str(base))
        old = man1["files"][0]
        extra = self._plant(base, "date=2024-03-01/bucket=10-00/w2.parquet")
        rogue = {"version": v1 + 1, "ts": 0,
                 "files": sorted(man1["files"] + [extra]), "retired": {}}
        (base / "_manifest" / f"v{v1 + 1}.json").write_text(
            _json.dumps(rogue))
        self._stale_once(monkeypatch)
        staged = base / ".staged_c.parquet"
        staged.write_bytes(b"PAR1 dummy")
        dst = base / "date=2024-03-01/bucket=10-00/c_r9.parquet"
        v = replace_files(str(base), [(str(staged), str(dst))], [old])
        assert v == v1 + 2
        _v, man = latest(str(base))
        assert old not in man["files"] and old in man["retired"]
        assert extra in man["files"]  # winner's append preserved
        assert "date=2024-03-01/bucket=10-00/c_r9.parquet" in man["files"]

    def test_replace_files_rolls_back_when_inputs_retired(
            self, spark, tmp_path):
        import glob as _glob

        from hepop_spark.storage.manifest import (
            ManifestConflict,
            latest,
            replace_files,
        )

        base = tmp_path / "t"
        _write_ts(spark, base, 0, 10, manifest=True)
        v1, man1 = latest(str(base))
        old = man1["files"][0]
        # a concurrent compactor already replaced `old`
        replace_files(str(base), [], [old])
        before = latest(str(base))
        staged = base / ".staged_c.parquet"
        staged.write_bytes(b"PAR1 dummy")
        dst = base / "date=2024-03-01/bucket=10-00/loser.parquet"
        with pytest.raises(ManifestConflict, match="re-plan"):
            replace_files(str(base), [(str(staged), str(dst))], [old])
        assert not dst.exists()  # moved file rolled back out
        assert latest(str(base)) == before  # manifest untouched
        assert not _glob.glob(str(base / "_manifest" / "intent_*"))


class TestKmvSketchColumnClass:
    """r09: KMV (bottom-k distinct) sketch columns in projection stores —
    the continuous approx-distinct monoid."""

    def _partial(self, spark, lo, hi, k):
        from pyspark.sql import Window

        base = spark.range(lo, hi).select(
            (F.col("id") % 2).cast("string").alias("g"),
            # collide some values on purpose: distinct matters
            ((F.col("id") * 2654435761) % 1000003).alias("h"),
        )
        w = Window.partitionBy("g").orderBy("h")
        return (
            base.distinct()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .groupBy("g")
            .agg(F.array_sort(F.collect_list("h")).alias("kmv"),
                 F.count("*").alias("n"))
            .select("g", "n", "kmv")
        )

    def test_merge_equals_global_bottom_k(self, spark, tmp_path):
        """Merged per-batch sketches == bottom-k over ALL distinct values
        (the KMV merge theorem), and the fold keeps it invariant."""
        from hepop_spark.storage.rollup import (
            projection_append,
            projection_compact,
            projection_scan,
        )

        K = 16
        store = str(tmp_path / "kmv")
        for b, (lo, hi) in enumerate([(0, 40), (40, 80), (20, 60)]):
            assert projection_append(
                spark, store, self._partial(spark, lo, hi, K), f"b{b}",
                keys=["g"], sums=["n"], kmvs=["kmv"], kmv_k=K) is True
        # duplicate id no-ops
        assert projection_append(
            spark, store, self._partial(spark, 0, 40, K), "b0") is False

        def scan():
            return {
                (r.g, tuple(r.kmv))
                for r in projection_scan(
                    spark, store, ["g"], ["n"], kmvs=["kmv"], kmv_k=K)
                .collect()
            }

        got = scan()
        want = {}
        for g in ("0", "1"):
            hs = sorted({
                (i * 2654435761) % 1000003
                for i in range(0, 80) if str(i % 2) == g
            })[:K]
            want[g] = tuple(hs)
        assert got == {("0", want["0"]), ("1", want["1"])}
        assert all(len(t) == K for _g, t in got)  # capped at k
        assert projection_compact(
            spark, store, ["g"], ["n"], kmvs=["kmv"], kmv_k=K) is True
        assert scan() == got  # fold-invariant

    def test_meta_roundtrip_and_discovery(self, spark, tmp_path):
        """kmvs/kmv_k persist in _meta.json; scan_with_meta and catalog
        discovery both honor the sketch merge (no silent SUM of arrays,
        no dropped column)."""
        from hepop_spark.catalog import discover_table
        from hepop_spark.storage.rollup import (
            projection_append,
            projection_meta,
            scan_with_meta,
        )

        K = 8
        data = tmp_path / "data"
        store = str(data / "w1" / "rollups" / "kmv_grid")
        for b, (lo, hi) in enumerate([(0, 30), (30, 60)]):
            projection_append(
                spark, store, self._partial(spark, lo, hi, K), f"b{b}",
                keys=["g"], sums=["n"], kmvs=["kmv"], kmv_k=K)
        meta = projection_meta(store)
        assert meta["kmvs"] == ["kmv"] and meta["kmv_k"] == K
        direct = {
            (r.g, r.n, tuple(r.kmv))
            for r in scan_with_meta(spark, store).collect()
        }
        assert discover_table(spark, str(data), "kmv_grid", cache={})
        via_catalog = {
            (r.g, r.n, tuple(r.kmv))
            for r in spark.table("kmv_grid").collect()
        }
        assert via_catalog == direct
        assert all(len(t) == K for _g, _n, t in direct)


class TestAvgRouting:
    """r09: avg() finalized from grid sum+strict-count partials."""

    def _tree(self, spark, tmp_path, with_count):
        from hepop_spark.storage.rollup import projection_append

        data = str(tmp_path / "data")
        raw = spark.createDataFrame(
            [(i, ["a", "b", "c"][i % 3], 10 + (i * 13) % 97)
             for i in range(60)],
            "doc_id long, k string, v long",
        )
        raw.write.mode("overwrite").parquet(
            os.path.join(data, "w1", "dbs", "avg_docs"))
        aggs = [F.count("*").alias("n"), F.sum("v").alias("sv")]
        sums = ["n", "sv"]
        src_sums = {"n": "count(*)", "sv": "sum(v)"}
        if with_count:
            aggs.append(F.count("v").alias("cv"))
            sums.append("cv")
            src_sums["cv"] = "count(v)"
        projection_append(
            spark, os.path.join(data, "w1", "rollups", "avg_grid"),
            raw.groupBy("k").agg(*aggs), "b0", keys=["k"], sums=sums,
            source={"table": "avg_docs", "keys": {"k": "k"},
                    "sums": src_sums},
        )
        return data, raw

    def test_avg_routes_with_strict_count(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data, raw = self._tree(spark, tmp_path, with_count=True)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT k, avg(v) AS av, count(*) AS n FROM avg_docs "
            "GROUP BY k ORDER BY k")
        assert api.last_routed_rollup == "avg_grid"
        want = {(r[0], r[1], r[2]) for r in raw.groupBy("k").agg(
            F.avg("v"), F.count("*")).collect()}
        got = {(r["k"], r["av"], r["n"]) for r in rows}
        # integer-exact sums -> the finalized division equals raw avg
        assert got == want

    def test_avg_without_count_falls_back(self, spark, tmp_path):
        """count(*) must NOT stand in for count(v): without a strict
        count(v) grid column the query is answered from raw."""
        from hepop_spark.plans.api import HepopQueryAPI

        data, raw = self._tree(spark, tmp_path, with_count=False)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT k, avg(v) AS av FROM avg_docs GROUP BY k ORDER BY k")
        assert api.last_routed_rollup is None
        want = {(r[0], r[1]) for r in raw.groupBy("k").agg(F.avg("v")).collect()}
        assert {(r["k"], r["av"]) for r in rows} == want


_CAS_WRITER_SCRIPT = """
import os, sys
sys.path.insert(0, sys.argv[4])
from hepop_spark.storage.manifest import publish_append
base, tag, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
part = os.path.join(base, "date=2024-03-01", "bucket=10-00")
os.makedirs(part, exist_ok=True)
for i in range(n):
    with open(os.path.join(part, f"{tag}_{i}.parquet"), "wb") as fh:
        fh.write(b"PAR1 dummy " + tag.encode())
    publish_append(base)
print("DONE")
"""


class TestSharedTreeCasSoak:
    def test_two_processes_append_one_tree_without_loss(
            self, spark, tmp_path):
        """r09 multi-writer CAS, proven cross-process: a SECOND OS
        process (no shared locks — the in-process table_lock cannot help)
        runs 30 append-publish rounds against the SAME manifest-mode
        table this process is publishing to. Every version commit is a
        put-if-absent CAS; losers re-derive from (walk, latest) and
        retry. The final manifest must contain EVERY file both writers
        planted — a single lost update would drop one — and the version
        chain must be strictly increasing with no gaps."""
        import subprocess
        import sys as _sys
        import time

        from hepop_spark.storage.manifest import (
            enable_manifest,
            latest,
            publish_append,
        )

        base = tmp_path / "t"
        part = base / "date=2024-03-01" / "bucket=10-00"
        part.mkdir(parents=True)
        (part / "seed.parquet").write_bytes(b"PAR1 seed")
        enable_manifest(str(base))
        script = tmp_path / "writer_b.py"
        script.write_text(_CAS_WRITER_SCRIPT)
        n = 30
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.Popen(
            [_sys.executable, str(script), str(base), "w2", str(n), repo],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        try:
            for i in range(n):
                (part / f"w1_{i}.parquet").write_bytes(b"PAR1 w1")
                publish_append(str(base))
        finally:
            out, err = proc.communicate(timeout=180)
        assert proc.returncode == 0, err.decode()[-800:]
        assert b"DONE" in out
        # settle: adopt anything the other process planted but had not
        # published when we read last
        publish_append(str(base))
        v, man = latest(str(base))
        names = {os.path.basename(f) for f in man["files"]}
        want = ({"seed.parquet"}
                | {f"w1_{i}.parquet" for i in range(n)}
                | {f"w2_{i}.parquet" for i in range(n)})
        assert names == want  # no lost update, either direction
        assert man["retired"] == {}
        # version ids were consumed densely by the two writers: at least
        # one commit per publish call that actually changed state, and
        # the manifest dir holds a contiguous recent chain
        assert v >= n  # both writers' publishes cannot fit below this


class TestGifCodec:
    """r09: pure-Python GIF (LZW) decode — operators/gif.py."""

    def _palette(self):
        import numpy as np

        i = np.arange(256, dtype=np.int64)
        return np.stack(
            [(i * 31) % 256, (i * 57) % 256, (i * 83) % 256], axis=-1
        ).astype(np.uint8)

    def test_animated_roundtrip_and_interlace(self):
        import numpy as np

        from hepop_spark.operators.gif import decode_gif, encode_gif

        pal = self._palette()
        k = np.arange(256, dtype=np.int64)
        frames = [
            ((7 * 7 + f * 13 + k * 11) % 256).astype(np.uint8).reshape(16, 16)
            for f in range(3)
        ]
        for inter in (False, True):
            got = list(decode_gif(encode_gif(frames, pal,
                                             interlace_frame0=inter)))
            assert [g[0] for g in got] == [0, 1, 2]
            for (_, rgb), fr in zip(got, frames):
                assert np.array_equal(rgb, pal[fr])

    def test_twelve_bit_table_reset(self):
        """A frame large and varied enough to fill the 4096-entry LZW
        table forces the mid-stream CLEAR/reset path on both sides."""
        import numpy as np

        from hepop_spark.operators.gif import decode_gif, encode_gif

        pal = self._palette()
        rng = np.random.default_rng(42)
        big = rng.integers(0, 256, size=(120, 120), dtype=np.uint8)
        (_, rgb), = list(decode_gif(encode_gif([big], pal)))
        assert np.array_equal(rgb, pal[big])

    def test_small_palette_and_malformed(self):
        import numpy as np
        import pytest as _pytest

        from hepop_spark.operators.gif import decode_gif, encode_gif

        pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                        dtype=np.uint8)
        f4 = (np.arange(64) % 4).astype(np.uint8).reshape(8, 8)
        blob = encode_gif([f4], pal4)
        (_, rgb), = list(decode_gif(blob))
        assert np.array_equal(rgb, pal4[f4])
        for bad in (blob[:15], b"NOTGIF" + blob[6:], blob[:-6]):
            with _pytest.raises(ValueError):
                list(decode_gif(bad))

    def test_spark_wrapper_sums(self, spark):
        from hepop_spark.operators.multimodal import (
            decode_gif_frames,
            synthesize_palette_gifs,
        )

        ids = spark.range(8).select(F.col("id").alias("media_id"))
        rows = decode_gif_frames(
            synthesize_palette_gifs(ids, n_frames=2, side=8)).collect()
        assert len(rows) == 16
        r = next(x for x in rows if x.media_id == 4 and x.frame_idx == 1)
        want_r = sum(
            (((4 * 7 + 13 + k * 11) % 256) * 31) % 256 for k in range(64))
        assert (r.width, r.height, r.sum_r) == (8, 8, want_r)
        # id 4 interlaces frame 0: sums identical either way (order-free)
        r0 = next(x for x in rows if x.media_id == 4 and x.frame_idx == 0)
        want_r0 = sum(
            (((4 * 7 + k * 11) % 256) * 31) % 256 for k in range(64))
        assert r0.sum_r == want_r0


class TestCompressedIngest:
    def test_sniff_roundtrip_all_codecs(self, spark):
        from hepop_spark.operators.multimodal import (
            decompress_text_stats,
            synthesize_compressed_texts,
        )

        docs = spark.createDataFrame(
            [(i, f"doc {i} body " * (i + 1)) for i in range(8)],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in decompress_text_stats(
            synthesize_compressed_texts(docs)).collect()}
        import hashlib
        for i in range(8):
            text = f"doc {i} body " * (i + 1)
            want_codec = ["gzip", "bz2", "xz", "zlib"][i % 4]
            r = rows[i]
            assert r.codec == want_codec
            assert r.n_chars == len(text)
            assert r.n_tokens_ws == len(text.split(" "))
            assert r.text_md5 == hashlib.md5(text.encode()).hexdigest()

    def test_garbage_payload_is_valueerror(self, spark):
        from hepop_spark.operators.multimodal import decompress_text_stats

        bad = spark.createDataFrame(
            [(5, bytearray(b"plain text, no container"))],
            "doc_id long, payload binary",
        )
        with pytest.raises(Exception) as ei:
            decompress_text_stats(bad).collect()
        assert "ValueError" in str(ei.value) and "media_id=5" in str(ei.value)

    def test_truncated_gzip_is_valueerror(self, spark):
        import gzip

        from hepop_spark.operators.multimodal import decompress_text_stats

        blob = gzip.compress(b"hello world " * 50, mtime=0)
        bad = spark.createDataFrame(
            [(9, bytearray(blob[:20]))], "doc_id long, payload binary")
        with pytest.raises(Exception) as ei:
            decompress_text_stats(bad).collect()
        assert "ValueError" in str(ei.value)


class TestRangeRouting:
    """r09: range/BETWEEN conjuncts on grid keys route; on measures they
    fall back; NOT BETWEEN stays unparsed (forbidden NOT)."""

    def test_parser_between_and_ranges(self):
        from hepop_spark.plans.api import parse_simple_aggregate

        p = parse_simple_aggregate(
            "SELECT k, count(*) AS n FROM t "
            "WHERE hr BETWEEN '1' AND '2' AND v >= 5 AND w != 'x' "
            "GROUP BY k")
        assert p[4] == [("hr", "BETWEEN '1' AND '2'"), ("v", ">= 5"),
                        ("w", "!= 'x'")]
        assert parse_simple_aggregate(
            "SELECT k, count(*) AS n FROM t "
            "WHERE a NOT BETWEEN 1 AND 2 GROUP BY k") is None

    def test_range_on_key_routes_on_measure_falls_back(
            self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.rollup import projection_append

        data = str(tmp_path / "data")
        raw = spark.createDataFrame(
            [(i, f"h{(i % 5):02d}", ["a", "b"][i % 2], 10 + i)
             for i in range(40)],
            "doc_id long, hr string, k string, v long",
        )
        raw.write.mode("overwrite").parquet(
            os.path.join(data, "w1", "dbs", "rng_docs"))
        projection_append(
            spark, os.path.join(data, "w1", "rollups", "rng_grid"),
            raw.groupBy("hr", "k").agg(F.count("*").alias("n"),
                                       F.sum("v").alias("sv")),
            "b0", keys=["hr", "k"], sums=["n", "sv"],
            source={"table": "rng_docs",
                    "keys": {"hr": "hr", "k": "k"},
                    "sums": {"n": "count(*)", "sv": "sum(v)"}},
        )
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT k, count(*) AS n, sum(v) AS sv FROM rng_docs "
            "WHERE hr BETWEEN 'h01' AND 'h03' GROUP BY k ORDER BY k")
        assert api.last_routed_rollup == "rng_grid"
        want = {
            (r[0], r[1], r[2])
            for r in raw.filter(F.col("hr").between("h01", "h03"))
            .groupBy("k").agg(F.count("*"), F.sum("v")).collect()
        }
        assert {(r["k"], r["n"], r["sv"]) for r in rows} == want
        # >= on a key also routes
        rows2, _ = api.query_json(
            "SELECT k, count(*) AS n FROM rng_docs "
            "WHERE hr >= 'h03' GROUP BY k ORDER BY k")
        assert api.last_routed_rollup == "rng_grid"
        want2 = {(r[0], r[1]) for r in raw.filter(F.col("hr") >= "h03")
                 .groupBy("k").agg(F.count("*")).collect()}
        assert {(r["k"], r["n"]) for r in rows2} == want2
        # range on a MEASURE cannot be answered by the grid -> raw scan
        rows3, _ = api.query_json(
            "SELECT k, count(*) AS n FROM rng_docs "
            "WHERE v >= 30 GROUP BY k ORDER BY k")
        assert api.last_routed_rollup is None
        want3 = {(r[0], r[1]) for r in raw.filter(F.col("v") >= 30)
                 .groupBy("k").agg(F.count("*")).collect()}
        assert {(r["k"], r["n"]) for r in rows3} == want3


class TestCountDistinctRouting:
    """r09: exact count(distinct key) as a grid row count."""

    def _tree(self, spark, tmp_path, extra_dim=False):
        from hepop_spark.storage.rollup import projection_append

        data = str(tmp_path / "data")
        raw = spark.createDataFrame(
            [(i, ["a", "b"][i % 2], f"L{i % 5}",
              None if i % 7 == 0 else f"M{i % 3}", 10 + i)
             for i in range(40)],
            "doc_id long, src string, lang string, m string, v long",
        )
        raw.write.mode("overwrite").parquet(
            os.path.join(data, "w1", "dbs", "cd_docs"))
        keys = ["src", "m"] + (["lang"] if extra_dim else [])
        grid = raw.groupBy(*keys).agg(
            F.count("*").alias("n"), F.sum("v").alias("sv"))
        projection_append(
            spark, os.path.join(data, "w1", "rollups", "cd_grid"),
            grid, "b0", keys=keys, sums=["n", "sv"],
            source={"table": "cd_docs",
                    "keys": {k: k for k in keys},
                    "sums": {"n": "count(*)", "sv": "sum(v)"}},
        )
        return data, raw

    def test_distinct_key_count_routes_and_skips_nulls(
            self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data, raw = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT src, count(distinct m) AS nm, sum(v) AS sv "
            "FROM cd_docs GROUP BY src ORDER BY src")
        assert api.last_routed_rollup == "cd_grid"
        want = {
            (r[0], r[1], r[2])
            for r in raw.groupBy("src").agg(
                F.countDistinct("m"), F.sum("v")).collect()
        }
        assert {(r["src"], r["nm"], r["sv"]) for r in rows} == want

    def test_extra_grid_dimension_refuses(self, spark, tmp_path):
        """A third grid dimension repeats (src, m) pairs — COUNT would
        over-count, so routing must fall back to raw."""
        from hepop_spark.plans.api import HepopQueryAPI

        data, raw = self._tree(spark, tmp_path, extra_dim=True)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT src, count(distinct m) AS nm FROM cd_docs "
            "GROUP BY src ORDER BY src")
        assert api.last_routed_rollup is None
        want = {(r[0], r[1]) for r in raw.groupBy("src")
                .agg(F.countDistinct("m")).collect()}
        assert {(r["src"], r["nm"]) for r in rows} == want

    def test_select_distinct_never_parses(self, spark, tmp_path):
        from hepop_spark.plans.api import parse_simple_aggregate

        assert parse_simple_aggregate(
            "SELECT DISTINCT src, count(*) AS n FROM t GROUP BY src") is None
        assert parse_simple_aggregate(
            "SELECT src, sum(distinct v) AS s FROM t GROUP BY src") is None
        assert parse_simple_aggregate(
            "SELECT src, count(distinct upper(m)) AS s FROM t "
            "GROUP BY src") is None

    def test_stale_breadcrumb_cleared(self, spark, tmp_path):
        """A routed query followed by an unroutable one must not leave
        last_routed_rollup dangling (r09 fix)."""
        from hepop_spark.plans.api import HepopQueryAPI

        data, _raw = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        api.query_json("SELECT src, count(*) AS n FROM cd_docs "
                       "GROUP BY src ORDER BY src")
        assert api.last_routed_rollup == "cd_grid"
        api.query_json("SELECT DISTINCT src FROM cd_docs")
        assert api.last_routed_rollup is None


class TestAdam7Png:
    """r09: Adam7 interlaced PNG decode — the PNG module's last refusal
    becomes real (seven independently-filtered passes, 8x8 lattice)."""

    def test_roundtrip_geometries_filters_colortypes(self):
        import numpy as np

        from hepop_spark.operators.png import decode_png, encode_png

        rng = np.random.default_rng(7)
        for (h, w) in [(13, 11), (8, 8), (1, 1), (3, 17), (9, 2)]:
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for ft in (0, 2, 4, lambda y: y % 5):
                got = decode_png(encode_png(img, ft, interlace=True))
                assert np.array_equal(got, img), (h, w, ft)
        g = rng.integers(0, 256, size=(10, 7), dtype=np.uint8)
        assert np.array_equal(
            decode_png(encode_png(g, 4, interlace=True)), g)
        rgba = rng.integers(0, 256, size=(6, 9, 4), dtype=np.uint8)
        assert np.array_equal(
            decode_png(encode_png(rgba, 3, interlace=True)), rgba)
        pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
        idx = rng.integers(0, 256, size=(12, 5), dtype=np.uint8)
        assert np.array_equal(
            decode_png(encode_png(idx, 2, palette=pal, interlace=True)),
            pal[idx])

    def test_truncation_is_valueerror(self):
        import numpy as np
        import pytest as _pytest

        from hepop_spark.operators.png import decode_png, encode_png

        img = np.full((16, 16, 3), 55, dtype=np.uint8)
        blob = encode_png(img, 0, interlace=True)
        with _pytest.raises(ValueError):
            decode_png(blob[:-20])  # truncated chunk
        with _pytest.raises(ValueError):
            decode_png(blob[:40])  # truncated header walk

    def test_interlaced_spark_decode(self, spark):
        """decode_png_stats handles interlaced payloads transparently —
        channel sums are pixel-order-free."""
        import numpy as np
        import pandas as pd

        from hepop_spark.operators.multimodal import decode_png_stats
        from hepop_spark.operators.png import encode_png

        idx = np.arange(64, dtype=np.int64)
        rows = []
        for mid in range(4):
            img = np.stack([
                (mid * 31 + idx * 7) % 256,
                (mid * 57 + idx * 11) % 256,
                (mid * 83 + idx * 13) % 256,
            ], axis=-1).reshape(8, 8, 3).astype(np.uint8)
            rows.append((mid, encode_png(img, lambda y: y % 5,
                                         interlace=True)))
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_id", "payload"]))
        got = {r.media_id: r for r in decode_png_stats(df).collect()}
        for mid in range(4):
            want_r = int(sum((mid * 31 + k * 7) % 256 for k in range(64)))
            assert (got[mid].width, got[mid].height) == (8, 8)
            assert got[mid].sum_r == want_r
