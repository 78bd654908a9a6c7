"""Round 10: sharded sidecar store (per-partition segments + CAS head),
layered bloom cap, lazy probe loading, cross-process publish safety.

VERDICT r09 items 1 (shard the monolithic sidecar JSON, cap per-file
bitmap size) and 4 (extend the manifest's CAS discipline to sidecar
publishes, proven by a two-process soak).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from hepop_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-round10")
    yield s


def _write_sharded(spark, base, lo, hi, n_shards=4):
    (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("event_id"),
            F.concat(F.lit("k-"), F.col("id")).alias("key"),
            F.pmod(F.col("id"), F.lit(n_shards)).alias("shard"),
        )
        .repartition("shard")
        .write.mode("append").partitionBy("shard").parquet(base)
    )


class TestShardedLayout:
    def test_update_writes_head_and_segments(self, spark, tmp_path):
        from hepop_spark.storage import sidecar
        from hepop_spark.storage.bloom_index import (
            bloom_candidates,
            bloom_index_update,
            load_sidecar,
        )

        base = str(tmp_path / "t")
        _write_sharded(spark, base, 0, 400)
        assert bloom_index_update(spark, base, "key") > 0
        d = sidecar.sidecar_dir(base, "bloom", "key")
        assert os.path.isdir(d)
        heads = [f for f in os.listdir(d) if f.startswith("head_v")]
        # r11: segments live under objs/ so the head listing stays O(1)
        segs = [f for f in os.listdir(os.path.join(d, sidecar.OBJS_SUBDIR))
                if f.startswith("seg-")]
        assert len(heads) == 1 and len(segs) == 4  # one per partition
        # no monolithic json was written
        assert not os.path.isfile(
            sidecar.legacy_path(base, "bloom", "key"))
        # head maps each partition dir to its segment
        _v, head = sidecar.load_head(base, "bloom", "key")
        assert set(head["segments"]) == {f"shard={i}" for i in range(4)}
        # merged read face covers every live file; the probe agrees
        from hepop_spark.storage.bloom_index import _live_files

        doc = load_sidecar(base, "key")
        assert set(doc["files"]) == set(_live_files(base))
        kept, live, pruned = bloom_candidates(base, "key", ["k-7"])
        assert live == len(doc["files"]) and pruned >= live - 2
        assert any(f in doc["files"] for f in kept)

    def test_incremental_update_touches_one_partition(self, spark, tmp_path):
        from hepop_spark.storage import sidecar
        from hepop_spark.storage.bloom_index import bloom_index_update

        base = str(tmp_path / "t")
        _write_sharded(spark, base, 0, 400)
        bloom_index_update(spark, base, "key")
        d = sidecar.sidecar_dir(base, "bloom", "key")
        _v1, head1 = sidecar.load_head(base, "bloom", "key")
        # land one new file in shard=1 only
        (
            spark.range(400, 500)
            .select(F.col("id").alias("event_id"),
                    F.concat(F.lit("k-"), F.col("id")).alias("key"),
                    F.lit(1).alias("shard"))
            .coalesce(1)
            .write.mode("append").partitionBy("shard").parquet(base)
        )
        assert bloom_index_update(spark, base, "key") == 1
        _v2, head2 = sidecar.load_head(base, "bloom", "key")
        changed = [p for p in head2["segments"]
                   if head2["segments"][p] != head1["segments"].get(p)]
        assert changed == ["shard=1"]  # only the touched partition moved

    def test_lazy_probe_loads_only_needed_segments(self, spark, tmp_path,
                                                   monkeypatch):
        from hepop_spark.storage import sidecar
        from hepop_spark.storage.bloom_index import (
            bloom_candidates,
            bloom_index_update,
            _live_files,
        )

        base = str(tmp_path / "t")
        _write_sharded(spark, base, 0, 400)
        bloom_index_update(spark, base, "key")
        sidecar._SEG_CACHE.clear()
        opened: list[str] = []
        real = sidecar._load_segment

        def spy(d, name):
            opened.append(name)
            return real(d, name)

        monkeypatch.setattr(sidecar, "_load_segment", spy)
        within = [f for f in _live_files(base) if f.startswith("shard=2/")]
        kept, live, _ = bloom_candidates(base, "key", ["k-2"],
                                         within=within)
        assert live == len(within)
        assert len(opened) == 1  # only shard=2's segment was parsed

    def test_gc_bounds_heads_and_segments(self, spark, tmp_path):
        import time

        from hepop_spark.storage import sidecar

        base = str(tmp_path / "t")
        os.makedirs(base)
        d = sidecar.sidecar_dir(base, "bloom", "key")
        for i in range(15):
            sidecar.update_entries(
                base, "bloom", "key",
                {f"shard=0/f{i}.parquet": {"m": 1024, "bits": "0"}})
            # age the published files so the GC's 60 s concurrent-writer
            # guard does not keep fresh orphans alive in this test
            for f in os.listdir(d):
                os.utime(os.path.join(d, f),
                         (time.time() - 120, time.time() - 120))
        sidecar._gc(d)
        heads = [f for f in os.listdir(d) if f.startswith("head_v")]
        segs = [f for f in os.listdir(d) if f.startswith("seg-")]
        assert len(heads) == sidecar.KEEP_HEADS
        # every kept head references a live segment; aged orphans gone
        assert len(segs) <= sidecar.KEEP_HEADS
        got = sidecar.load_entries(base, "bloom", "key")
        assert len(got) == 15  # all entries visible through the latest

    def test_gc_spares_fresh_unreferenced_segments(self, tmp_path):
        """The concurrent-publish window: a just-written segment whose
        head has not landed yet must survive GC."""
        from hepop_spark.storage import sidecar

        base = str(tmp_path / "t")
        os.makedirs(base)
        sidecar.update_entries(
            base, "bloom", "key",
            {"shard=0/a.parquet": {"m": 1024, "bits": "0"}})
        d = sidecar.sidecar_dir(base, "bloom", "key")
        fresh = sidecar._write_segment(
            d, "shard=1", {"shard=1/b.parquet": {"m": 1024, "bits": "0"}})
        sidecar._gc(d)
        assert os.path.isfile(
            os.path.join(d, sidecar.OBJS_SUBDIR, fresh))


class TestLegacyMigration:
    def _plant_monolith(self, base, kind, col, files):
        d = os.path.join(base, f"_{kind}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{col}.json"), "w") as fh:
            json.dump({"col": col, "k": 4, "files": files}, fh)

    def test_monolith_reads_and_migrates(self, spark, tmp_path):
        from hepop_spark.storage import sidecar
        from hepop_spark.storage.bloom_index import load_sidecar

        base = str(tmp_path / "t")
        os.makedirs(base)
        legacy = {"shard=0/a.parquet": {"m": 1024, "bits": "f"},
                  "shard=1/b.parquet": {"m": 1024, "bits": "f"}}
        self._plant_monolith(base, "bloom", "key", legacy)
        # read face sees the monolith as-is
        assert load_sidecar(base, "key")["files"] == legacy
        assert sidecar.list_cols(base, "bloom") == ["key"]
        # first update migrates it into sharded form and removes it
        sidecar.update_entries(
            base, "bloom", "key",
            {"shard=0/c.parquet": {"m": 1024, "bits": "1"}})
        assert not os.path.isfile(sidecar.legacy_path(base, "bloom", "key"))
        got = sidecar.load_entries(base, "bloom", "key")
        assert set(got) == set(legacy) | {"shard=0/c.parquet"}
        assert got["shard=1/b.parquet"] == {"m": 1024, "bits": "f"}

    def test_legacy_probe_still_prunes(self, spark, tmp_path):
        """A tree indexed by the r09 layout keeps pruning before any
        writer touches it (mixed-version fleet)."""
        from hepop_spark.storage import sidecar
        from hepop_spark.storage.bloom_index import (
            bloom_candidates,
            bloom_index_update,
        )

        base = str(tmp_path / "t")
        _write_sharded(spark, base, 0, 400)
        bloom_index_update(spark, base, "key")
        # demote the sharded store to a monolith (simulate r09 on disk)
        doc = {"col": "key", "k": 4,
               "files": sidecar.load_entries(base, "bloom", "key")}
        import shutil
        shutil.rmtree(sidecar.sidecar_dir(base, "bloom", "key"))
        with open(sidecar.legacy_path(base, "bloom", "key"), "w") as fh:
            json.dump(doc, fh)
        kept, live, pruned = bloom_candidates(base, "key", ["k-9"])
        assert pruned >= live - 2 and len(kept) >= 1


class TestLayeredBloomCap:
    def test_size_for_caps_and_layers(self):
        from hepop_spark.storage.bloom_index import (
            BITS_PER_ROW,
            M_MAX,
            _size_for,
        )

        m, L = _size_for(1000, BITS_PER_ROW)
        assert L == 1 and m >= 1000 * BITS_PER_ROW
        # 100M rows: capped bitmaps, hash-split layers
        m, L = _size_for(100_000_000, BITS_PER_ROW)
        assert m <= M_MAX and L > 1
        assert m * L >= 100_000_000 * BITS_PER_ROW / 2  # FPR preserved

    def test_layered_entry_no_false_negatives(self, spark, tmp_path,
                                              monkeypatch):
        import hepop_spark.storage.bloom_index as bi

        monkeypatch.setattr(bi, "M_MAX", 1 << 14)  # force layering small
        base = str(tmp_path / "t")
        _write_sharded(spark, base, 0, 4000, n_shards=2)
        bi.bloom_index_update(spark, base, "key")
        from hepop_spark.storage import sidecar

        entries = sidecar.load_entries(base, "bloom", "key")
        assert any(e.get("L", 1) > 1 and isinstance(e["bits"], list)
                   for e in entries.values())
        # every planted key maps to exactly one layer and is admitted
        for probe in ("k-0", "k-777", "k-1999", "k-3998"):
            kept, _live, _ = bi.bloom_candidates(base, "key", [probe])
            assert any(f in entries for f in kept)
        # absent keys still prune sharply
        kept, live, pruned = bi.bloom_candidates(base, "key", ["k-999999"])
        assert pruned >= live - 1

    def test_trigram_layered_cap(self, spark, tmp_path, monkeypatch):
        import hepop_spark.storage.bloom_index as bi
        from hepop_spark.storage.trigram_index import (
            trigram_candidates,
            trigram_index_update,
        )

        monkeypatch.setattr(bi, "M_MAX", 1 << 12)
        base = str(tmp_path / "t")
        (
            spark.range(200)
            .select(
                F.lit(0).alias("shard"),
                F.concat(F.lit("xy string number "),
                         F.col("id").cast("string"),
                         F.lit(" trailer-"),
                         F.md5(F.col("id").cast("string"))).alias("body"),
            )
            .coalesce(2)
            .write.partitionBy("shard").parquet(base)
        )
        trigram_index_update(spark, base, "body")
        kept, live, _ = trigram_candidates(base, "body", ["string number"])
        assert len(kept) >= 1
        kept, live, pruned = trigram_candidates(base, "body", ["zzqxv##"])
        assert pruned == live


class TestSidecarCas:
    def test_publish_retries_on_conflict(self, tmp_path, monkeypatch):
        """A concurrent indexer committing first costs one retry, not a
        lost update — same discipline as the manifest CAS."""
        from hepop_spark.storage import sidecar

        base = str(tmp_path / "t")
        os.makedirs(base)
        sidecar.update_entries(
            base, "bloom", "key",
            {"shard=0/a.parquet": {"m": 1024, "bits": "1"}})
        real = sidecar.load_head
        state = {"fired": False}

        def stale_once(bp, kind, col):
            got = real(bp, kind, col)
            if not state["fired"]:
                state["fired"] = True
                # simulate a writer that lands between our read and our
                # publish: bump the head out from under us
                d = sidecar.sidecar_dir(bp, kind, col)
                seg = sidecar._write_segment(
                    d, "shard=1",
                    {"shard=1/w2.parquet": {"m": 1024, "bits": "2"}})
                v, head = got
                sidecar._publish_head(
                    d, {**head, "segments": {**head["segments"],
                                             "shard=1": seg}}, v)
            return got

        monkeypatch.setattr(sidecar, "load_head", stale_once)
        sidecar.update_entries(
            base, "bloom", "key",
            {"shard=0/b.parquet": {"m": 1024, "bits": "3"}})
        monkeypatch.setattr(sidecar, "load_head", real)
        got = sidecar.load_entries(base, "bloom", "key")
        # ours AND the interloper's both survive
        assert set(got) == {"shard=0/a.parquet", "shard=0/b.parquet",
                            "shard=1/w2.parquet"}

    def test_two_processes_index_one_tree_without_loss(self, tmp_path):
        """r09 verdict item 4, done-criterion: two OS processes (no
        shared in-process lock) each publish 30 sidecar updates into ONE
        tree; the final store must index every file both planted — a
        single read-modify-write race would drop one."""
        base = tmp_path / "t"
        base.mkdir()
        script = tmp_path / "writer_b.py"
        script.write_text(_SIDECAR_WRITER_SCRIPT)
        n = 30
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.Popen(
            [sys.executable, str(script), str(base), "w2", str(n), repo],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        from hepop_spark.storage import sidecar

        try:
            for i in range(n):
                sidecar.update_entries(
                    base_path=str(base), kind="bloom", col="key",
                    new_entries={
                        f"shard={i % 4}/w1_{i}.parquet":
                        {"m": 1024, "bits": "1"}})
        finally:
            out, err = proc.communicate(timeout=120)
        assert proc.returncode == 0, err.decode()[-800:]
        assert b"DONE" in out
        got = sidecar.load_entries(str(base), "bloom", "key")
        want = ({f"shard={i % 4}/w1_{i}.parquet" for i in range(n)}
                | {f"shard={i % 4}/w2_{i}.parquet" for i in range(n)})
        assert set(got) == want  # no lost update, either direction
        v, _head = sidecar.load_head(str(base), "bloom", "key")
        assert v >= 2 * n  # every update committed its own version


_SIDECAR_WRITER_SCRIPT = """\
import sys

base, name, n, repo = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
sys.path.insert(0, repo)
from hepop_spark.storage import sidecar

for i in range(n):
    sidecar.update_entries(
        base_path=base, kind="bloom", col="key",
        new_entries={
            f"shard={i % 4}/{name}_{i}.parquet": {"m": 1024, "bits": "2"}})
print("DONE")
"""


class TestRefreshAndCompactionStillWork:
    def test_refresh_vacuums_sharded(self, spark, tmp_path):
        from hepop_spark.storage import sidecar
        from hepop_spark.storage.bloom_index import (
            bloom_index_refresh,
            bloom_index_update,
            load_sidecar,
        )

        base = str(tmp_path / "t")
        _write_sharded(spark, base, 0, 200)
        bloom_index_update(spark, base, "key")
        sidecar.update_entries(
            base, "bloom", "key",
            {"shard=0/retired.parquet": {"m": 1024, "bits": "0"}})
        _write_sharded(spark, base, 200, 300)  # new unindexed files
        out = bloom_index_refresh(spark, base)
        rec = out.get("key")
        assert rec and rec["indexed"] > 0 and rec["vacuumed"] == 1
        assert "shard=0/retired.parquet" not in load_sidecar(
            base, "key")["files"]
