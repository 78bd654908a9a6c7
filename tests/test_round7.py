"""Round-7 regression tests: the serve-path truncation-flag race (r06
verdict item 1), load-robust bench record shape, and persisted-store
publish hygiene fixes from r06 ADVICE.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.parse
import urllib.request

import pyspark.sql.functions as F


class TestTruncationRace:
    def test_concurrent_big_and_small_queries_never_mislabel(self, spark):
        """One oversized (must always be 413+truncated) and one small
        (must always be 200, full rows) query race on the
        ThreadingHTTPServer. Before r07 the flag lived on the shared
        HepopQueryAPI instance, so interleaving let a truncated result
        ship as 200 with silently missing rows. Now truncation rides in
        query_json's return value, so every response must be labeled by
        its OWN query's outcome, every time."""
        from hepop_spark.plans.http_server import HepopHttpServer

        spark.range(100).select(F.col("id").alias("v")).createOrReplaceTempView(
            "race_big_t"
        )
        spark.range(3).select(F.col("id").alias("v")).createOrReplaceTempView(
            "race_small_t"
        )
        srv = HepopHttpServer(spark, default_window=False, max_rows=10).start()
        failures: list[str] = []
        barrier = threading.Barrier(2)
        ROUNDS = 12

        def fetch(sql: str):
            url = (
                f"http://127.0.0.1:{srv.port}/query?q="
                + urllib.parse.quote(sql)
            )
            try:
                with urllib.request.urlopen(url, timeout=120) as r:
                    return r.status, json.load(r)
            except urllib.error.HTTPError as e:
                return e.code, json.load(e)

        def big_loop():
            for i in range(ROUNDS):
                barrier.wait(timeout=120)
                code, body = fetch("SELECT v FROM race_big_t ORDER BY v")
                if code != 413 or body.get("truncated") is not True \
                        or len(body.get("rows", [])) != 10:
                    failures.append(f"big round {i}: code={code} body_keys="
                                    f"{sorted(body) if isinstance(body, dict) else 'list'}")

        def small_loop():
            for i in range(ROUNDS):
                barrier.wait(timeout=120)
                code, body = fetch("SELECT v FROM race_small_t ORDER BY v")
                if code != 200 or not isinstance(body, list) or len(body) != 3:
                    failures.append(f"small round {i}: code={code}")

        try:
            threads = [threading.Thread(target=big_loop),
                       threading.Thread(target=small_loop)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
            assert not failures, failures
        finally:
            srv.stop()
            spark.catalog.dropTempView("race_big_t")
            spark.catalog.dropTempView("race_small_t")


def _vecs(spark, n=40, dim=64, id_col="c_id", vec_col="cv"):
    return spark.range(n).select(
        F.col("id").alias(id_col),
        F.expr(
            f"transform(sequence(0, {dim - 1}), "
            "j -> cast(sin(id * 7 + j) as double))"
        ).alias(vec_col),
    )


class TestIndexStoreHygiene:
    def test_prune_keeps_other_corpus_index(self, spark, tmp_path, monkeypatch):
        """r06 ADVICE: two corpora sharing params must be separate prune
        lineages — rebuilding one (new fingerprint) must not delete the
        other's still-valid index."""
        import os

        from hepop_spark.operators.pq_index import (
            ivfpq_index_path,
            prune_stale_siblings,
        )

        monkeypatch.setenv("HEPOP_SPARK_INDEX_DIR", str(tmp_path / "idx"))
        corp_a, corp_b = tmp_path / "sfA", tmp_path / "sfB"
        for c in (corp_a, corp_b):
            c.mkdir()
            (c / "embeddings.parquet").write_bytes(b"v1")
        pa1 = ivfpq_index_path(str(corp_a), "m8k64c16")
        pb = ivfpq_index_path(str(corp_b), "m8k64c16")
        os.makedirs(pa1)
        os.makedirs(pb)
        # corpus A evolves: new fingerprint, new path; prune after publish
        (corp_a / "embeddings.parquet").write_bytes(b"v2-longer")
        pa2 = ivfpq_index_path(str(corp_a), "m8k64c16")
        assert pa2 != pa1
        os.makedirs(pa2)
        prune_stale_siblings(pa2)
        assert not os.path.isdir(pa1)  # stale sibling of the SAME corpus
        assert os.path.isdir(pb)       # other corpus untouched
        assert os.path.isdir(pa2)

    def test_compact_failure_restores_store(self, spark, tmp_path, monkeypatch):
        """r06 ADVICE: a failure at the final swap must leave the store
        readable — retired segments restored from trash, the temp copy
        never deleted while it is the only complete one."""
        import os

        from hepop_spark.operators import pq_index
        from hepop_spark.operators.pq_index import (
            _read_code_store,
            build_ivfpq_index,
            ivfpq_compact_store,
            ivfpq_delete_ids,
        )

        path = str(tmp_path / "ivfpq")
        corpus = _vecs(spark, n=40)
        assert build_ivfpq_index(
            spark, corpus, path, n_cells=4, m_sub=8, sub=8, k_codes=16
        ) is True
        ids = spark.range(5).select(F.col("id").alias("c_id"))
        assert ivfpq_delete_ids(spark, ids, path, batch_id="d1") is True
        before = {
            r.c_id for r in _read_code_store(spark, path).collect()
        }

        real_rename = os.rename

        def failing_rename(src, dst):
            # fail exactly the final publish swap (tmp copy -> codes/)
            if os.path.basename(dst) == "codes" and ".tmp." in src:
                raise OSError("injected swap failure")
            return real_rename(src, dst)

        monkeypatch.setattr(pq_index.os, "rename", failing_rename)
        assert ivfpq_compact_store(spark, path) is False
        monkeypatch.setattr(pq_index.os, "rename", real_rename)

        # store is fully readable: same code rows, tombstones restored
        assert {
            r.c_id for r in _read_code_store(spark, path).collect()
        } == before
        assert any(e.startswith("tombstones_") for e in os.listdir(path))
        # and a later, healthy compaction still completes
        assert ivfpq_compact_store(spark, path) is True
        assert not any(e.startswith("tombstones_") for e in os.listdir(path))
        assert {
            r.c_id for r in _read_code_store(spark, path).collect()
        } == before - set(range(5))

    def test_minhash_append_stages_outside_bands(self, spark, tmp_path,
                                                 monkeypatch):
        """r06 ADVICE: the temp write must never live under bands/ where
        partition discovery sees it as a phantom batch; and a failed
        publish leaves the store clean."""
        import os

        from hepop_spark.operators import minhash_index
        from hepop_spark.operators.minhash_index import (
            minhash_store_append,
            minhash_store_bands,
        )

        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma doc {i} tail words") for i in range(4)],
            "doc_id long, text string",
        )
        store = str(tmp_path / "store")
        renames: list[tuple[str, str]] = []
        real_rename = os.rename

        def recording_rename(src, dst):
            renames.append((src, dst))
            return real_rename(src, dst)

        monkeypatch.setattr(minhash_index.os, "rename", recording_rename)
        assert minhash_store_append(
            spark, docs.filter(F.col("doc_id") < 2), store, "b0"
        ) is True
        publish = [(s, d) for s, d in renames if d.endswith("batch=b0")]
        assert publish and all(
            os.sep + ".tmp" + os.sep in s for s, _ in publish
        ), publish

        # inject a publish failure: bands/ must hold no phantom batch dir
        def failing_rename(src, dst):
            if "batch=b1" in dst:
                raise OSError("injected publish failure")
            return real_rename(src, dst)

        monkeypatch.setattr(minhash_index.os, "rename", failing_rename)
        assert minhash_store_append(
            spark, docs.filter(F.col("doc_id") >= 2), store, "b1"
        ) is False
        monkeypatch.setattr(minhash_index.os, "rename", real_rename)
        listed = os.listdir(os.path.join(store, "bands"))
        assert listed == ["batch=b0"], listed
        # the reader sees only published batches, and a retried publish lands
        assert {r.doc_id for r in minhash_store_bands(spark, store).collect()} \
            == {0, 1}
        assert minhash_store_append(
            spark, docs.filter(F.col("doc_id") >= 2), store, "b1"
        ) is True
        assert {r.doc_id for r in minhash_store_bands(spark, store).collect()} \
            == {0, 1, 2, 3}


_READER_SCRIPT = r"""
import sys, os, time
sys.path.insert(0, "/root/repo")
data_dir, out_path, stop_path = sys.argv[1], sys.argv[2], sys.argv[3]
from hepop_spark.session import get_spark
from hepop_spark.plans.api import HepopQueryAPI

spark = get_spark("race-reader", shuffle_partitions=4)
api = HepopQueryAPI(spark, default_window=False, data_dir=data_dir)
with open(out_path, "w") as out:
    out.write("ready\n"); out.flush()
    while not os.path.exists(stop_path):
        t0 = time.monotonic()
        try:
            rows, _ = api.query_json("SELECT count() AS n FROM soak")
            out.write(f"{rows[0]['n']}\n")
        except Exception as e:
            out.write("ERR " + str(e).replace(chr(10), " | ")[:600] + "\n")
        # per-read latency on its own line: the parent time-scales its
        # minimum-reads liveness bound by the speed the reader actually
        # achieved under the box load it actually saw
        out.write(f"RT {time.monotonic() - t0:.3f}\n")
        out.flush()
    # one final read after the writer finished
    rows, _ = api.query_json("SELECT count() AS n FROM soak")
    out.write(f"FINAL {rows[0]['n']}\n"); out.flush()
spark.stop()
"""


class TestCrossProcessCompactionRace:
    def test_reader_process_never_sees_loss_or_duplication(
            self, spark, tmp_path):
        """r06 verdict item 4, hardened to the r07 verdict's zero-gap
        storm: a reader in ANOTHER process (own SparkSession, serve-path
        discovery + query) hammers a MANIFEST-MODE table while this
        process appends and compacts it back-to-back with NO cadence
        sleep. Reads are pinned to published manifest versions and
        retired bytes survive until vacuum, so the reader must never
        error — not even retry — and its observed counts must be
        NONDECREASING and end at the exact final total."""
        import subprocess
        import sys
        import time

        from hepop_spark.storage.compaction import compact, partition_files
        from hepop_spark.storage.manifest import live_files, vacuum
        from hepop_spark.storage.writer import write_partitioned

        data = tmp_path / "data"
        base = data / "w1" / "dbs" / "soak"
        # seed the table so discovery finds it before the reader boots
        ts = F.lit("2024-03-01 10:00:00").cast("timestamp")
        write_partitioned(
            spark.range(10).select(F.col("id").alias("v"),
                                   ts.alias("timestamp")),
            str(base), manifest=True,
        )
        script = tmp_path / "reader.py"
        out_path = tmp_path / "counts.txt"
        stop_path = tmp_path / "stop"
        script.write_text(_READER_SCRIPT)
        proc = subprocess.Popen(
            [sys.executable, str(script), str(data), str(out_path),
             str(stop_path)],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                if out_path.exists() and "ready" in out_path.read_text():
                    break
                time.sleep(0.5)
            else:
                raise AssertionError("reader process never became ready")
            t_ready = time.monotonic()

            rounds = 12
            for i in range(rounds):
                write_partitioned(
                    spark.range(i * 10 + 10, i * 10 + 20).select(
                        F.col("id").alias("v"), ts.alias("timestamp")),
                    str(base),
                )
                # ZERO-GAP storm: the next append+compact starts the
                # moment the previous swap lands. Under listing+retry
                # this outran the bounded envelope; under manifest
                # pinning there is nothing to race.
                compact(spark, str(base))
            total = (rounds + 1) * 10
            # logically compacted to one live file; retired bytes are
            # still on disk (grace), then vacuum reclaims them
            live = [f for f in (live_files(str(base)) or [])
                    if f.startswith("date=2024-03-01/bucket=10-00/")]
            assert len(live) == 1, live
            assert len(partition_files(str(base),
                                       "date=2024-03-01/bucket=10-00")) > 1
            vacuum(str(base), grace_s=0)
            assert len(partition_files(str(base),
                                       "date=2024-03-01/bucket=10-00")) == 1
        finally:
            stop_path.touch()
            window_s = time.monotonic() - t_ready
            try:
                proc.wait(timeout=120)
            finally:
                if proc.poll() is None:
                    proc.kill()

        lines = [ln for ln in out_path.read_text().splitlines() if ln]
        errs = [ln for ln in lines if ln.startswith("ERR")]
        assert not errs, errs[:3]
        counts = [int(ln) for ln in lines if ln.isdigit()]
        final = [int(ln.split()[1]) for ln in lines if ln.startswith("FINAL")]
        # Liveness, time-scaled (r12 verdict item 1): the old fixed
        # `>= 5` tripped three documented times when the driver's loaded
        # box starved the reader subprocess to 1-4 samples while every
        # correctness assertion below passed. Scale the bound by what the
        # reader's OWN demonstrated read latency made possible inside the
        # observed storm window — box load slows both, so the bound
        # self-adjusts; a dead reader still fails (no reads, or no FINAL).
        assert counts, "reader made no successful reads during the storm"
        rts = sorted(
            float(ln.split()[1]) for ln in lines if ln.startswith("RT ")
        )
        median_rt = rts[len(rts) // 2] if rts else window_s
        feasible = int(window_s / max(median_rt, 1e-3) / 4)
        min_reads = max(1, min(5, feasible))
        assert len(counts) >= min_reads, (
            f"reader too slow: {len(counts)} reads, expected >= {min_reads} "
            f"(window {window_s:.1f}s, median read {median_rt:.2f}s)")
        assert counts == sorted(counts), "non-monotonic counts: " + str(
            [c for a, c in zip(counts, counts[1:]) if c < a][:3])
        assert max(counts) <= total
        assert final == [total]


class TestProjectionStore:
    def test_segments_merge_to_direct_aggregate(self, spark, tmp_path):
        """Monoid law: appending per-batch partials and scanning equals
        aggregating everything at once; redelivered ids no-op; compaction
        leaves the scan invariant."""
        from hepop_spark.storage.rollup import (
            projection_append,
            projection_compact,
            projection_scan,
        )

        store = str(tmp_path / "store")
        data = spark.range(100).select(
            (F.col("id") % 3).alias("k"), (F.col("id") % 7).alias("v")
        )
        expected = {
            (r.k, r.v_sum)
            for r in data.groupBy("k").agg(F.sum("v").alias("v_sum")).collect()
        }
        for b in range(4):
            part = (
                data.filter(F.col("id") % 4 == b)
                .groupBy("k").agg(F.sum("v").alias("v_sum"))
            )
            assert projection_append(spark, store, part, f"b{b}") is True
        # redelivery no-ops (the exactly-once contract)
        dup = data.groupBy("k").agg(F.sum("v").alias("v_sum"))
        assert projection_append(spark, store, dup, "b0") is False

        scan = lambda: {  # noqa: E731
            (r.k, r.v_sum)
            for r in projection_scan(spark, store, ["k"], ["v_sum"]).collect()
        }
        assert scan() == expected
        assert projection_compact(spark, store, ["k"], ["v_sum"]) is True
        assert scan() == expected
        # compacted to one base segment; a further fold is a no-op
        assert projection_compact(spark, store, ["k"], ["v_sum"]) is False
        # post-compaction appends keep merging
        extra = spark.createDataFrame([(0, 1000)], "k long, v_sum long")
        assert projection_append(spark, store, extra, "b9") is True
        merged = dict(
            (r.k, r.v_sum)
            for r in projection_scan(spark, store, ["k"], ["v_sum"]).collect()
        )
        assert merged[0] == dict(expected)[0] + 1000

    def test_compact_failure_keeps_store_readable(self, spark, tmp_path,
                                                  monkeypatch):
        import os

        from hepop_spark.storage import rollup
        from hepop_spark.storage.rollup import (
            projection_append,
            projection_compact,
            projection_scan,
        )

        store = str(tmp_path / "store")
        for b in range(2):
            part = spark.createDataFrame([(b, 10)], "k long, v long")
            projection_append(spark, store, part, f"b{b}")
        before = {(r.k, r.v)
                  for r in projection_scan(spark, store, ["k"], ["v"]).collect()}

        real_rename = os.rename

        def failing_rename(src, dst):
            if os.path.basename(dst).startswith("base_v"):
                raise OSError("injected swap failure")
            return real_rename(src, dst)

        monkeypatch.setattr(rollup.os, "rename", failing_rename)
        assert projection_compact(spark, store, ["k"], ["v"]) is False
        monkeypatch.setattr(rollup.os, "rename", real_rename)
        assert {(r.k, r.v)
                for r in projection_scan(spark, store, ["k"], ["v"]).collect()} \
            == before
        assert projection_compact(spark, store, ["k"], ["v"]) is True
        assert {(r.k, r.v)
                for r in projection_scan(spark, store, ["k"], ["v"]).collect()} \
            == before


class TestRollupServeFace:
    def test_maintained_rollup_queryable_through_serve_api(
            self, spark, tmp_path):
        """A self-describing projection store under
        {data}/{writer}/rollups/{name} registers as table {name}; writers
        federate by monoid re-merge; the default 10-min window is NOT
        injected (no time column)."""
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.rollup import projection_append

        data = tmp_path / "data"
        for w, vals in (("w1", [(0, 5), (1, 7)]), ("w2", [(0, 3), (2, 9)])):
            store = str(data / w / "rollups" / "metric_rollup")
            part = spark.createDataFrame(vals, "k long, v_sum long")
            assert projection_append(
                spark, store, part, "b0", keys=["k"], sums=["v_sum"]
            ) is True
        api = HepopQueryAPI(spark, default_window=True, data_dir=str(data))
        rows, _ = api.query_json(
            "SELECT k, v_sum FROM metric_rollup ORDER BY k")
        assert rows == [
            {"k": 0, "v_sum": 8},   # federated across writers
            {"k": 1, "v_sum": 7},
            {"k": 2, "v_sum": 9},
        ]
        # freshness: a new segment is visible on the next query
        projection_append(
            spark, str(data / "w1" / "rollups" / "metric_rollup"),
            spark.createDataFrame([(1, 100)], "k long, v_sum long"), "b1",
        )
        rows, _ = api.query_json(
            "SELECT v_sum FROM metric_rollup WHERE k = 1")
        assert rows == [{"v_sum": 107}]


class TestCompactionOrphanRecovery:
    def _mk(self, d, files=("a.parquet",)):
        import os

        os.makedirs(d, exist_ok=True)
        for f in files:
            open(os.path.join(d, f), "w").write("x")

    def test_each_crash_state_recovers(self, tmp_path):
        """Every hidden dir a dead compaction can leave behind is either
        restored (only copy) or deleted (content live elsewhere)."""
        import os

        from hepop_spark.storage.compaction import recover_orphans

        base = str(tmp_path / "t")
        date = os.path.join(base, "date=2024-03-01")
        # 1. staging dirs: always deleted (source data still live)
        self._mk(os.path.join(date, "bucket=10-00"))
        self._mk(os.path.join(date, ".bucket=10-00.compact_tmp_ab"))
        self._mk(os.path.join(date, ".bucket=11-00.ladder_tmp_cd"))
        # 2. fallback trash, live partition MISSING -> restore
        self._mk(os.path.join(date, ".bucket=12-00.old_ef"))
        # 3. fallback trash, live partition present -> stale, delete
        self._mk(os.path.join(date, "bucket=13-00"))
        self._mk(os.path.join(date, ".bucket=13-00.old_gh"))
        # 4. ladder-retired source, target NOT published -> restore
        self._mk(os.path.join(date, ".bucket=14-10.ladderold@bucket=14-00@_ij"))
        # 5. ladder-retired source, target published -> delete
        self._mk(os.path.join(date, "bucket=15-00"))
        self._mk(os.path.join(date, ".bucket=15-10.ladderold@bucket=15-00@_kl"))

        actions = recover_orphans(base)
        by_leaf = {os.path.basename(k): v for k, v in actions.items()}
        assert by_leaf[".bucket=10-00.compact_tmp_ab"] == "deleted-staging"
        assert by_leaf[".bucket=11-00.ladder_tmp_cd"] == "deleted-staging"
        assert by_leaf[".bucket=12-00.old_ef"] == "restored"
        assert by_leaf[".bucket=13-00.old_gh"] == "deleted-stale-trash"
        assert by_leaf[
            ".bucket=14-10.ladderold@bucket=14-00@_ij"] == "restored"
        assert by_leaf[
            ".bucket=15-10.ladderold@bucket=15-00@_kl"] == "deleted-merged"
        live = sorted(os.listdir(date))
        assert live == [
            "bucket=10-00", "bucket=12-00", "bucket=13-00",
            "bucket=14-10", "bucket=15-00",
        ]
        # idempotent: a second sweep finds nothing
        assert recover_orphans(base) == {}

    def test_ladder_crash_midswap_rows_survive(self, spark, tmp_path):
        """End to end: kill the ladder between source retirement and
        target publish (injected rename failure); the next sweep restores
        the sources and a re-run merges them — zero rows lost."""
        import os

        from hepop_spark.storage import compaction
        from hepop_spark.storage.compaction import compact_ladder
        from hepop_spark.storage.writer import write_partitioned

        base = str(tmp_path / "t")
        for mm in ("10", "20"):
            ts = F.lit(f"2024-03-01 10:{mm}:00").cast("timestamp")
            write_partitioned(
                spark.range(5).select(F.col("id").alias("v"),
                                      ts.alias("timestamp")),
                base,
            )
        total = spark.read.parquet(base).count()

        real_rename = os.rename

        def failing_rename(src, dst):
            if os.path.basename(dst) == "bucket=10-00" and ".ladder_tmp_" in src:
                raise OSError("injected ladder publish failure")
            return real_rename(src, dst)

        import pytest

        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(compaction.os, "rename", failing_rename)
            with pytest.raises(OSError, match="injected"):
                compact_ladder(spark, base, level="hour")
        # sources are stranded in hidden trash; the next sweep restores
        # and completes the merge
        out = compact_ladder(spark, base, level="hour")
        assert out, "re-run ladder merged nothing"
        assert spark.read.parquet(base).count() == total


class TestServeRollupSweep:
    def test_serve_compaction_folds_rollup_segments(self, spark, tmp_path):
        """The serve background sweep folds maintained projection stores
        on the table-compaction cadence; queries through HTTP are
        invariant across the fold."""
        import json
        import urllib.parse
        import urllib.request

        from hepop_spark.__main__ import serve
        from hepop_spark.config import ServerConfig
        from hepop_spark.storage.rollup import (
            _projection_segments,
            projection_append,
        )

        cfg = ServerConfig.from_env(
            env={"COMPACT_INTERVAL": "3600"},
            host="127.0.0.1", port=0, http_port=0,
            data_dir=str(tmp_path / "data"), writer_id="w1",
        )
        store = str(tmp_path / "data" / "w1" / "rollups" / "m_hourly")
        for b in range(3):
            part = spark.createDataFrame([(b % 2, 10 + b)], "k long, n long")
            projection_append(spark, store, part, f"b{b}",
                              keys=["k"], sums=["n"])
        assert len(_projection_segments(store)) == 3
        h = serve(cfg, spark=spark, block=False)
        try:
            def query():
                url = (
                    f"http://127.0.0.1:{h['http_port']}/query?q="
                    + urllib.parse.quote(
                        "SELECT k, n FROM m_hourly ORDER BY k")
                )
                with urllib.request.urlopen(url, timeout=60) as r:
                    return json.load(r)

            before = query()
            assert before == [{"k": 0, "n": 22}, {"k": 1, "n": 11}]
            swept = h["compact_once"]()
            assert swept.get("rollups/m_hourly") == {"folded": True}
            assert len(_projection_segments(store)) == 1
            assert query() == before
        finally:
            h["stop"]()


class TestServeRestartContinuity:
    def test_restart_neither_drops_nor_duplicates(self, spark, tmp_path):
        """Stop serve, start it again on the same data_dir/writer_id:
        the streaming checkpoints make the landing-dir replay exactly
        once (no re-ingest of batch 1), and post-restart writes land —
        the operational restart a real deployment performs."""
        import json
        import time
        import urllib.parse
        import urllib.request

        from hepop_spark.__main__ import serve
        from hepop_spark.config import ServerConfig

        def boot():
            cfg = ServerConfig.from_env(
                env={"COMPACT_INTERVAL": "3600"},
                host="127.0.0.1", port=0, http_port=0,
                data_dir=str(tmp_path / "data"), writer_id="w1",
            )
            return serve(cfg, spark=spark, block=False)

        def write(h, lines: bytes):
            req = urllib.request.Request(
                f"http://127.0.0.1:{h['http_port']}/write",
                data=lines, method="POST",
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                assert r.status == 201

        def count(h) -> int:
            url = (
                f"http://127.0.0.1:{h['http_port']}/query?q="
                + urllib.parse.quote(
                    "SELECT count() AS n FROM restart_m "
                    "WHERE time >= '2024-01-01'")
            )
            try:
                with urllib.request.urlopen(url, timeout=60) as r:
                    return json.load(r)[0]["n"]
            except urllib.error.HTTPError:
                return -1

        def wait_count(h, want: int):
            deadline = time.time() + 180
            while time.time() < deadline:
                if count(h) == want:
                    return
                time.sleep(1.5)
            raise AssertionError(
                f"never reached {want} rows (last={count(h)})")

        h1 = boot()
        try:
            write(h1, b"".join(
                b"restart_m,host=a v=%d.0 %d\n"
                % (i, 1_709_290_800_000_000_000 + i * 1_000_000_000)
                for i in range(5)
            ))
            wait_count(h1, 5)
        finally:
            h1["stop"]()

        h2 = boot()
        try:
            # batch 1 must not re-ingest (checkpointed file source)
            wait_count(h2, 5)
            write(h2, b"".join(
                b"restart_m,host=b v=%d.0 %d\n"
                % (i, 1_709_290_900_000_000_000 + i * 1_000_000_000)
                for i in range(4)
            ))
            wait_count(h2, 9)
        finally:
            h2["stop"]()


class TestDrainIdempotence:
    def test_redrained_segment_does_not_duplicate_frames(self, spark, tmp_path):
        """Simulate a crash between a segment's frame publish and its
        .done rename: re-draining the same segment must skip the write
        (its seg=<name>/ output already exists) — no duplicate HEP rows."""
        import socket
        import time

        from hepop_spark.__main__ import serve
        from hepop_spark.config import ServerConfig
        from hepop_spark.sources.hep import encapsulate

        cfg = ServerConfig.from_env(
            env={"COMPACT_INTERVAL": "3600"},
            host="127.0.0.1", port=0, http_port=0,
            data_dir=str(tmp_path / "data"), writer_id="w1",
        )
        h = serve(cfg, spark=spark, block=False)
        try:
            frame = encapsulate(
                {"timeSeconds": 1709290800, "timeUseconds": 0,
                 "payloadType": 1},
                "INVITE drain-test",
            )
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            for _ in range(4):
                s.sendto(frame, ("127.0.0.1", h["udp_port"]))
            s.close()
            deadline = time.time() + 60
            landing = tmp_path / "data" / "_landing" / "hep"
            while time.time() < deadline and h["drain_once"]() == 0:
                time.sleep(0.5)
            # undo the .done rename, as if the process died mid-drain
            done = [p for p in landing.glob("*.seg.done")]
            assert done, "no drained segment found"
            for p in done:
                p.rename(p.with_suffix(""))  # back to .seg
            assert h["drain_once"]() == 0  # republish skipped, no frames
            # the table converges to exactly 4 rows, never 8
            from hepop_spark.storage.writer import read_table

            root = cfg.table_root()
            deadline = time.time() + 120
            n = 0
            while time.time() < deadline:
                try:
                    n = read_table(spark, f"{root}/hep_1").count()
                except Exception:
                    n = 0
                if n >= 4:
                    break
                time.sleep(2)
            assert n == 4
        finally:
            h["stop"]()


class TestQueryTimeout:
    def test_runaway_query_cancelled_server_stays_healthy(self, spark):
        """A pathological query is cancelled at the per-request timeout
        (408 + timeout flag) while a subsequent normal query on the same
        server answers fine — one bad client can't wedge serve mode."""
        import json
        import urllib.error
        import urllib.parse
        import urllib.request

        from hepop_spark.plans.http_server import HepopHttpServer

        spark.range(200_000).createOrReplaceTempView("big_range_t")
        srv = HepopHttpServer(
            spark, default_window=False, query_timeout_s=2.0
        ).start()
        try:
            slow = ("SELECT sum(a.id * b.id) AS s FROM big_range_t a "
                    "CROSS JOIN big_range_t b")
            url = (f"http://127.0.0.1:{srv.port}/query?q="
                   + urllib.parse.quote(slow))
            try:
                urllib.request.urlopen(url, timeout=120)
                raise AssertionError("expected HTTP 408")
            except urllib.error.HTTPError as e:
                assert e.code == 408
                body = json.load(e)
                assert body["timeout"] is True
            # server is still healthy for normal queries
            ok = (f"http://127.0.0.1:{srv.port}/query?q="
                  + urllib.parse.quote(
                      "SELECT count(*) AS n FROM big_range_t"))
            with urllib.request.urlopen(ok, timeout=120) as r:
                assert r.status == 200 and json.load(r) == [{"n": 200_000}]
        finally:
            srv.stop()
            spark.catalog.dropTempView("big_range_t")


class TestHookCrashReplay:
    def test_hook_crash_then_restart_is_exactly_once(self, spark, tmp_path):
        """A hook crash AFTER its store publish fails the micro-batch;
        Spark redelivers the same batch id on restart. The table write
        no-ops on its commit marker and the hook no-ops on its published
        batch dir — end to end, nothing duplicates and nothing is lost."""
        import pytest

        from hepop_spark.operators.minhash_index import minhash_store_bands
        from hepop_spark.streaming.exactly_once import read_committed
        from hepop_spark.streaming.index_maint import (
            minhash_maintenance,
            table_sink,
        )

        landing = tmp_path / "landing"
        landing.mkdir()
        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma doc {i} tail words here") for i in range(8)],
            "doc_id long, text string",
        )
        for b in range(2):
            staged = tmp_path / f"stage{b}"
            docs.filter(F.col("doc_id") % 2 == b).coalesce(1) \
                .write.mode("overwrite").parquet(str(staged))
            part = next(p for p in staged.iterdir()
                        if p.name.endswith(".parquet")
                        and not p.name.startswith(("_", ".")))
            part.rename(landing / f"batch{b}.parquet")

        store = str(tmp_path / "bands")
        crash_flag = tmp_path / "crash_once"
        crash_flag.touch()
        inner = minhash_maintenance(store, table="documents")

        def flaky_hook(table, rows, batch_id):
            inner(table, rows, batch_id)  # store segment already published
            if batch_id >= 1 and crash_flag.exists():
                crash_flag.unlink()
                raise RuntimeError("injected hook crash after publish")

        def run():
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(str(landing))
            )
            q = table_sink(
                stream, str(tmp_path / "tables"), str(tmp_path / "ckpt"),
                "documents", index_hooks=[flaky_hook],
            ).start()
            q.awaitTermination()

        with pytest.raises(Exception, match="injected hook crash"):
            run()
        run()  # restart from the checkpoint: redelivery of the failed batch

        corpus = read_committed(spark, str(tmp_path / "tables" / "documents"))
        assert corpus.count() == 8
        assert corpus.select("doc_id").distinct().count() == 8
        bands = minhash_store_bands(spark, store).collect()
        # every doc signed exactly once: no duplicate (doc_id, band) rows
        keys = [(r.doc_id, r.band) for r in bands]
        assert len(keys) == len(set(keys))
        assert {r.doc_id for r in bands} == set(range(8))


class TestSketchEntries:
    def test_ddsketch_relative_error_contract(self, spark, sf_dir):
        """Every estimated percentile sits within 1/DD_SUB relative error
        BELOW its exact counterpart (bucket lower bound semantics: the
        estimate never exceeds the exact value)."""
        from hepop_spark.queries.llm14 import DD_SUB, ddsketch_quantiles

        for r in ddsketch_quantiles(spark, sf_dir).collect():
            for q in ("p50", "p95", "p99"):
                est, exact = r[f"{q}_est"], r[f"{q}_exact"]
                assert est <= exact, (q, est, exact)
                assert exact - est <= exact / DD_SUB + 1, (q, est, exact)

    def test_theta_estimates_track_exact(self, spark, sf_dir):
        """KMV estimates stay within a loose band of the exact counts
        (k=256 on small sets is near-exact; the bound is the guard
        against a broken estimator, not a statistical claim)."""
        from hepop_spark.queries.llm14 import theta_sketch_setops

        r = theta_sketch_setops(spark, sf_dir).collect()[0]
        assert 0.5 * r.union_exact <= r.union_est <= 2.0 * r.union_exact
        assert r.inter_exact == 0 or (
            0.3 * r.inter_exact <= r.inter_est <= 3.0 * r.inter_exact
        )


class TestPpmDecode:
    def test_real_ppm_header_and_channel_sums(self, spark):
        from hepop_spark.operators.multimodal import decode_ppm_stats

        pixels = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
        rows = spark.createDataFrame(
            [
                (1, bytearray(b"P6\n2 2\n255\n" + pixels)),
                # arbitrary header whitespace is legal netpbm
                (2, bytearray(b"P6  2\n2\t255 " + pixels)),
            ],
            "media_id long, payload binary",
        )
        out = {r.media_id: r for r in
               decode_ppm_stats(rows).collect()}
        for mid in (1, 2):
            r = out[mid]
            assert (r.width, r.height) == (2, 2)
            assert (r.sum_r, r.sum_g, r.sum_b) == (265, 275, 285)

    def test_non_p6_payload_rejected(self, spark):
        import pytest

        from hepop_spark.operators.multimodal import decode_ppm_stats

        bad = spark.createDataFrame(
            [(1, bytearray(b"P5\n2 2\n255\n\x00\x01\x02\x03"))],
            "media_id long, payload binary",
        )
        with pytest.raises(Exception, match="not a P6 PPM|PythonException"):
            decode_ppm_stats(bad).collect()


class TestLpHourlyRollupEndToEnd:
    def test_lp_ingest_maintains_hourly_rollup_queryable_via_api(
            self, spark, tmp_path):
        """The full serve-mode story: LP lines stream through lp_sink; a
        projection hook maintains an hourly rollup under
        {data}/{writer}/rollups/; the query API answers from the rollup
        table by name — O(hours x keys) rows read, not O(events)."""
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.streaming.index_maint import projection_maintenance
        from hepop_spark.streaming.ingest import lp_sink, read_lp_stream

        data = tmp_path / "data"
        landing = tmp_path / "landing"
        landing.mkdir()
        # two hours of cpu samples (ns timestamps an hour apart)
        h0, h1 = 1_709_280_000_000_000_000, 1_709_283_600_000_000_000
        (landing / "b.lp").write_text("\n".join(
            [f"cpu,host=h{i % 2} usage={i}.0 {h0 + i * 1_000_000_000}"
             for i in range(4)]
            + [f"cpu,host=h{i % 2} usage={i}.0 {h1 + i * 1_000_000_000}"
               for i in range(2)]
        ))

        def derive(rows):
            return (
                rows.withColumn(
                    "hour_bucket", F.date_format("timestamp", "yyyy-MM-dd-HH")
                )
                .groupBy("hour_bucket")
                .agg(F.count("*").alias("n"), F.sum("usage").alias("sum_usage"))
            )

        hook = projection_maintenance(
            str(data / "w1" / "rollups" / "cpu_hourly"),
            table="cpu", derive=derive,
            keys=["hour_bucket"], sums=["n", "sum_usage"],
        )
        q = lp_sink(
            read_lp_stream(spark, str(landing)),
            str(data / "w1" / "dbs"), str(tmp_path / "ckpt"),
            processing_time=None, index_hooks=[hook],
        ).start()
        q.awaitTermination(120)

        api = HepopQueryAPI(spark, default_window=True, data_dir=str(data))
        rows, _ = api.query_json(
            "SELECT hour_bucket, n, sum_usage FROM cpu_hourly "
            "ORDER BY hour_bucket")
        assert rows == [
            {"hour_bucket": "2024-03-01-08", "n": 4, "sum_usage": 6.0},
            {"hour_bucket": "2024-03-01-09", "n": 2, "sum_usage": 1.0},
        ]


class TestStreamingIndexMaintenance:
    def test_lp_sink_runs_hooks_per_measurement(self, spark, tmp_path):
        """Hooks fire once per (measurement, batch) with the TYPED rows,
        after the parquet append — the generic wiring serve mode uses."""
        from hepop_spark.streaming.ingest import lp_sink, read_lp_stream

        landing = tmp_path / "landing"
        landing.mkdir()
        (landing / "b.lp").write_text(
            "cpu,host=a usage=1.5 1709290800000000000\n"
            "cpu,host=b usage=2.5 1709290860000000000\n"
            "mem,host=a free=7.0 1709290800000000000\n"
        )
        seen: list[tuple[str, int, int]] = []

        def hook(table, rows, batch_id):
            seen.append((table, int(batch_id), rows.count()))

        q = lp_sink(
            read_lp_stream(spark, str(landing)),
            str(tmp_path / "tables"), str(tmp_path / "ckpt"),
            processing_time=None, index_hooks=[hook],
        ).start()
        q.awaitTermination(120)
        assert sorted(seen) == [("cpu", 0, 2), ("mem", 0, 1)]
        # the hook ran after the append: the table is on disk
        assert (tmp_path / "tables" / "cpu").is_dir()

    def test_ivfpq_maintenance_builds_then_appends(self, spark, tmp_path):
        """First batch trains + publishes the index; later batches land as
        frozen-codebook append segments; redelivery no-ops."""
        import os

        from hepop_spark.operators.pq_index import _read_code_store
        from hepop_spark.streaming.index_maint import ivfpq_maintenance

        path = str(tmp_path / "idx")
        hook = ivfpq_maintenance(
            path, table="vecs", id_col="vec_id", vec_col="embedding",
            n_cells=4, m_sub=8, sub=8, k_codes=16,
        )
        b0 = _vecs(spark, n=20, id_col="vec_id", vec_col="embedding")
        b1 = spark.range(20, 30).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 63), "
                "j -> cast(sin(id * 7 + j) as double))"
            ).alias("embedding"),
        )
        hook("other_table", b0, 0)
        assert not os.path.isdir(path)  # keyed to its table only
        hook("vecs", b0, 0)
        assert os.path.isdir(os.path.join(path, "codes"))
        hook("vecs", b1, 1)
        assert os.path.isdir(os.path.join(path, "codes_b1"))
        ids = {r.c_id for r in _read_code_store(spark, path).collect()}
        assert ids == set(range(30))
        # redelivered batch id: no duplicate rows
        hook("vecs", b1, 1)
        assert _read_code_store(spark, path).count() == 30
