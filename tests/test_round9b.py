"""Round-9 continuation: DDSketch-style histogram column class (`hists`)
in maintained projection stores — continuous bounded-state quantiles."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _hist_partial(spark, rows):
    """Per-group bucket-counter partial from (g, bucket) tuples."""
    df = spark.createDataFrame(rows, "g string, bucket long")
    per = df.groupBy("g", "bucket").agg(F.count("*").alias("n"))
    return per.groupBy("g").agg(
        F.sum("n").alias("n_rows"),
        F.map_from_entries(F.collect_list(F.struct("bucket", "n"))).alias("h"),
    )


class TestHistColumnClass:
    """Key-wise counter addition is the map-valued sum monoid: the
    maintained histogram equals the one-shot histogram, through merges,
    folds, redelivery, meta-driven scans and catalog federation."""

    BATCHES = [
        [("a", 1), ("a", 1), ("a", 2), ("b", 5)],
        [("a", 2), ("a", 7), ("b", 5), ("b", 5)],
        [("a", 1), ("b", 9)],
    ]

    def _direct(self):
        want: dict[str, dict[int, int]] = {}
        for batch in self.BATCHES:
            for g, b in batch:
                want.setdefault(g, {})[b] = want.setdefault(g, {}).get(b, 0) + 1
        return want

    def test_merge_equals_direct_counts(self, spark, tmp_path):
        from hepop_spark.storage.rollup import (
            projection_append,
            projection_compact,
            projection_scan,
        )

        store = str(tmp_path / "hist")
        for i, batch in enumerate(self.BATCHES):
            assert projection_append(
                spark, store, _hist_partial(spark, batch), f"b{i}",
                keys=["g"], sums=["n_rows"], hists=["h"]) is True
        # redelivered id no-ops
        assert projection_append(
            spark, store, _hist_partial(spark, self.BATCHES[0]), "b0") is False

        def scan():
            return {
                (r.g, r.n_rows, tuple(sorted(r.h.items())))
                for r in projection_scan(
                    spark, store, ["g"], ["n_rows"], hists=["h"]).collect()
            }

        got = scan()
        want = self._direct()
        assert got == {
            (g, sum(cnt.values()), tuple(sorted(cnt.items())))
            for g, cnt in want.items()
        }
        # fold must leave the scan invariant, and a redelivery AFTER the
        # fold must still no-op (the _folded.json path)
        assert projection_compact(
            spark, store, ["g"], ["n_rows"], hists=["h"]) is True
        assert scan() == got
        assert projection_append(
            spark, store, _hist_partial(spark, self.BATCHES[1]), "b1") is False
        assert scan() == got

    def test_meta_roundtrip_discovery_and_federation(self, spark, tmp_path):
        """hists persists in _meta.json; scan_with_meta honors it; TWO
        writers' stores federate through the same map-sum monoid."""
        from hepop_spark.catalog import discover_table
        from hepop_spark.storage.rollup import (
            projection_append,
            projection_meta,
            scan_with_meta,
        )

        data = tmp_path / "data"
        for w, batches in (("w1", self.BATCHES[:2]), ("w2", self.BATCHES[2:])):
            store = str(data / w / "rollups" / "hist_grid")
            for i, batch in enumerate(batches):
                projection_append(
                    spark, store, _hist_partial(spark, batch), f"b{i}",
                    keys=["g"], sums=["n_rows"], hists=["h"])
        meta = projection_meta(str(data / "w1" / "rollups" / "hist_grid"))
        assert meta["hists"] == ["h"]
        solo = {
            (r.g, r.n_rows, tuple(sorted(r.h.items())))
            for r in scan_with_meta(
                spark, str(data / "w1" / "rollups" / "hist_grid")).collect()
        }
        w1_direct: dict[str, dict[int, int]] = {}
        for batch in self.BATCHES[:2]:
            for g, b in batch:
                w1_direct.setdefault(g, {})[b] = (
                    w1_direct.setdefault(g, {}).get(b, 0) + 1)
        assert solo == {
            (g, sum(c.values()), tuple(sorted(c.items())))
            for g, c in w1_direct.items()
        }
        # federation across writers == global direct counts
        assert discover_table(spark, str(data), "hist_grid", cache={})
        fed = {
            (r.g, r.n_rows, tuple(sorted(r.h.items())))
            for r in spark.table("hist_grid").collect()
        }
        want = self._direct()
        assert fed == {
            (g, sum(c.values()), tuple(sorted(c.items())))
            for g, c in want.items()
        }

    def test_streaming_hook_carries_hists(self, spark, tmp_path):
        """projection_maintenance threads the hist class through to
        projection_append (meta + merge), and redelivered batch ids
        no-op through the hook too."""
        from hepop_spark.storage.rollup import projection_meta, scan_with_meta
        from hepop_spark.streaming.index_maint import projection_maintenance

        store = str(tmp_path / "hook_hist")

        def derive(rows):
            per = rows.groupBy("g", "bucket").agg(F.count("*").alias("n"))
            return per.groupBy("g").agg(
                F.sum("n").alias("n_rows"),
                F.map_from_entries(
                    F.collect_list(F.struct("bucket", "n"))).alias("h"),
            )

        hook = projection_maintenance(
            store, table="evts", derive=derive,
            keys=["g"], sums=["n_rows"], hists=["h"])
        for i, batch in enumerate(self.BATCHES):
            rows = spark.createDataFrame(batch, "g string, bucket long")
            hook("evts", rows, i)
            hook("other_table", rows, i)   # must be ignored
        hook("evts", spark.createDataFrame(
            self.BATCHES[0], "g string, bucket long"), 0)  # redelivery
        assert projection_meta(store)["hists"] == ["h"]
        got = {
            (r.g, r.n_rows, tuple(sorted(r.h.items())))
            for r in scan_with_meta(spark, store).collect()
        }
        want = self._direct()
        assert got == {
            (g, sum(c.values()), tuple(sorted(c.items())))
            for g, c in want.items()
        }


class TestDdsketchMaintainedEntry:
    def test_quantile_estimates_within_relative_error(self, spark):
        """The judged entry's p50/p95/p99 estimates obey the 1/DD_SUB
        relative-error contract against exact percentiles of the same
        cents population (disc selection rule)."""
        import math

        from hepop_spark.queries.llm14 import DD_SUB
        from hepop_spark.queries.llm15 import ddsketch_maintained

        sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                            "/root/testdata/sf0.001")
        out = {r.l_returnflag: r for r in ddsketch_maintained(spark, sf).collect()}
        li = (
            spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
            .select(F.round(F.col("l_extendedprice") * 100)
                    .cast("long").alias("cents"), "l_returnflag")
            .filter(F.col("cents") >= 1)
        )
        for flag, row in out.items():
            pop = (li if flag == "*"
                   else li.filter(F.col("l_returnflag") == flag))
            cents = sorted(r.cents for r in pop.collect())
            assert row.n_rows == len(cents) == row.tw
            for q_name, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
                exact = cents[math.ceil(len(cents) * q) - 1]
                est = getattr(row, f"{q_name}_est")
                # bucket lower bound: exact is in [est, est * (1 + 2/DD_SUB))
                assert est <= exact, (flag, q_name, est, exact)
                assert exact <= est * (1 + 2.0 / DD_SUB), (
                    flag, q_name, est, exact)


class TestBloomSidecarIndex:
    """r09: file-level Bloom sidecar — point-lookup file skipping with
    no false negatives (pruned reads are result-invisible)."""

    def _write_sharded(self, spark, base, lo, hi, shards=8):
        df = spark.range(lo, hi).select(
            (F.col("id") % shards).alias("shard"),
            F.concat(F.lit("k-"), F.col("id")).alias("key"),
            F.col("id").alias("v"),
        )
        df.repartition("shard").write.mode("append").partitionBy(
            "shard").parquet(base)

    def test_prune_never_loses_rows(self, spark, tmp_path):
        from hepop_spark.storage.bloom_index import (
            bloom_candidates,
            bloom_index_update,
            bloom_point_read,
        )

        base = str(tmp_path / "tbl")
        self._write_sharded(spark, base, 0, 400)
        assert bloom_index_update(spark, base, "key") > 0
        # every planted key must be found through the pruned read
        for probe in ("k-0", "k-123", "k-399"):
            out, stats = bloom_point_read(spark, base, "key", [probe])
            assert [r.v for r in out.collect()] == [int(probe[2:])]
            assert stats["files_read"] < stats["files_live"]
        # absent keys prune everything (no file admits them) or FP-scan a
        # few files but return zero rows either way
        out, _ = bloom_point_read(spark, base, "key", ["absent-key"])
        assert out.count() == 0
        kept, live, pruned = bloom_candidates(base, "key", ["k-7", "k-8"])
        assert len(kept) <= live and pruned == live - len(kept)

    def test_incremental_update_and_unindexed_files_kept(self, spark, tmp_path):
        from hepop_spark.storage.bloom_index import (
            bloom_candidates,
            bloom_index_update,
            bloom_point_read,
            load_sidecar,
        )

        base = str(tmp_path / "tbl")
        self._write_sharded(spark, base, 0, 200)
        bloom_index_update(spark, base, "key")
        n_first = len(load_sidecar(base, "key")["files"])
        # new files land WITHOUT being indexed: they must always be scanned
        self._write_sharded(spark, base, 200, 280)
        kept, live, _ = bloom_candidates(base, "key", ["k-999999"])
        assert live > n_first
        assert len(kept) == live - n_first  # unindexed files all kept
        out, _ = bloom_point_read(spark, base, "key", ["k-250"])
        assert [r.v for r in out.collect()] == [250]  # found pre-indexing
        # default (files=None) indexes only the NEW files
        assert bloom_index_update(spark, base, "key") == live - n_first
        assert len(load_sidecar(base, "key")["files"]) == live
        assert bloom_index_update(spark, base, "key") == 0  # nothing new
        out, stats = bloom_point_read(spark, base, "key", ["k-250"])
        assert [r.v for r in out.collect()] == [250]
        assert stats["files_pruned"] > 0

    def test_null_values_and_empty_probe_semantics(self, spark, tmp_path):
        from hepop_spark.storage.bloom_index import (
            bloom_index_update,
            bloom_point_read,
        )

        base = str(tmp_path / "tbl")
        df = spark.createDataFrame(
            [(0, None, 1), (0, "k-a", 2), (1, None, 3)],
            "shard int, key string, v int",
        )
        df.repartition("shard").write.partitionBy("shard").parquet(base)
        bloom_index_update(spark, base, "key")
        out, _ = bloom_point_read(spark, base, "key", ["k-a"])
        assert [r.v for r in out.collect()] == [2]
        # the all-NULL file is recorded with an empty bitmap => pruned
        out, stats = bloom_point_read(spark, base, "key", ["k-zzz"])
        assert out.count() == 0

    def test_streaming_hook_maintains_sidecar(self, spark, tmp_path):
        """table_sink + bloom_maintenance: the sidecar grows in lock-step
        with committed batches, redelivery included."""
        from hepop_spark.storage.bloom_index import (
            bloom_point_read,
            load_sidecar,
        )
        from hepop_spark.streaming.index_maint import (
            bloom_maintenance,
            stage_batch_files,
            table_sink,
        )

        base = str(tmp_path / "data")
        landing = str(tmp_path / "landing")
        rows = spark.range(0, 90).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("call-"), F.col("id")).alias("call_id"),
            (F.col("id") % 3).alias("b"),
        )
        stage_batch_files(rows, landing, F.col("doc_id") % 3, 3)
        stream = (
            spark.readStream.schema("doc_id long, call_id string, b long")
            .option("maxFilesPerTrigger", "1").parquet(landing)
        )
        hook = bloom_maintenance(base, table="calls", col="call_id")
        q = table_sink(stream, base, str(tmp_path / "ckpt"), "calls",
                       index_hooks=[hook]).start()
        q.awaitTermination(120)
        tbl = os.path.join(base, "calls")
        sc = load_sidecar(tbl, "call_id")
        assert sc is not None and len(sc["files"]) >= 3
        out, stats = bloom_point_read(spark, tbl, "call_id", ["call-41"])
        assert [r.doc_id for r in out.collect()] == [41]
        assert stats["files_pruned"] > 0
        # redelivery: re-running the hook on batch 0's rows is a no-op
        # on content (identical bitmaps rewritten)
        before = load_sidecar(tbl, "call_id")
        hook("calls", rows.filter(F.col("doc_id") % 3 == 0), 0)
        assert load_sidecar(tbl, "call_id") == before


class TestBloomApiRouting:
    """r09: the SAME /query SQL answers from a Bloom-pruned file set when
    a sidecar covers an equality/IN conjunct — result-invisible, with the
    pruning accounting on the API breadcrumb."""

    def _serve_tree(self, spark, tmp_path):
        from hepop_spark.storage.bloom_index import bloom_index_update

        data = tmp_path / "data"
        tbl = str(data / "w1" / "dbs" / "calls")
        rows = spark.range(0, 240).select(
            F.col("id").alias("event_id"),
            F.concat(F.lit("call-"), F.col("id")).alias("call_id"),
            (F.col("id") % 12).alias("shard"),
            (F.col("id") * 3).alias("v"),
        )
        rows.repartition("shard").write.partitionBy("shard").parquet(tbl)
        bloom_index_update(spark, tbl, "call_id")
        return str(data), tbl

    def test_point_query_routes_and_matches_raw(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data, _tbl = self._serve_tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT event_id, v FROM calls WHERE call_id = 'call-77'")
        assert rows == [{"event_id": 77, "v": 231}]
        bp = api.last_bloom_pruned
        assert bp is not None and bp["col"] == "call_id"
        assert 1 <= bp["files_read"] < bp["files_live"]
        # IN list + extra conjunct + aggregate shape
        rows, _ = api.query_json(
            "SELECT count(*) AS n, sum(v) AS sv FROM calls "
            "WHERE call_id IN ('call-3', 'call-141') AND v > 0")
        assert rows == [{"n": 2, "sv": 3 * 3 + 141 * 3}]
        assert api.last_bloom_pruned["files_read"] < \
            api.last_bloom_pruned["files_live"]

    def test_unindexed_and_unroutable_shapes_fall_back(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data, _tbl = self._serve_tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        # no sidecar on v: plain path, no breadcrumb
        rows, _ = api.query_json("SELECT count(*) AS n FROM calls WHERE v = 9")
        assert rows == [{"n": 1}] and api.last_bloom_pruned is None
        # r10: OR-of-equalities on ONE column canonicalizes to IN and
        # bloom-prunes (same-key disjuncts probe exactly like IN)
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM calls "
            "WHERE call_id = 'call-1' OR call_id = 'call-2'")
        assert rows == [{"n": 2}]
        assert api.last_bloom_pruned is not None
        assert api.last_bloom_pruned["files_read"] <= 2
        # a MIXED-column OR still disables conjunct probing: falls back
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM calls "
            "WHERE call_id = 'call-1' OR v = 9")
        assert rows == [{"n": 2}] and api.last_bloom_pruned is None
        # absent key: zero rows, full prune is fine
        rows, _ = api.query_json(
            "SELECT event_id FROM calls WHERE call_id = 'call-99999'")
        assert rows == []

    def test_integral_literal_probe(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.bloom_index import bloom_index_update

        data, tbl = self._serve_tree(spark, tmp_path)
        bloom_index_update(spark, tbl, "event_id")
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        rows, _ = api.query_json(
            "SELECT call_id FROM calls WHERE event_id = 131")
        assert rows == [{"call_id": "call-131"}]
        assert api.last_bloom_pruned["col"] == "event_id"
        assert api.last_bloom_pruned["files_read"] < \
            api.last_bloom_pruned["files_live"]


class TestBloomCompactionLifecycle:
    """r09: compaction re-indexes replacement files in the same step that
    retires their inputs — point lookups stay pruned as the table churns."""

    def _hep_shaped(self, spark, n, lo=0):
        # timestamp-carrying rows so the partition compactor's
        # sortWithinPartitions("timestamp") applies
        return spark.range(lo, lo + n).select(
            F.timestamp_micros(
                (F.lit(1_709_280_000_000_000)
                 + F.col("id") * 18_000_000).cast("long")).alias("timestamp"),
            F.concat(F.lit("call-"), F.col("id")).alias("call_id"),
            F.col("id").alias("v"),
        )

    def test_partition_compaction_reindexes(self, spark, tmp_path):
        from hepop_spark.storage.bloom_index import (
            bloom_index_update,
            bloom_point_read,
            load_sidecar,
        )
        from hepop_spark.storage.compaction import compact
        from hepop_spark.storage.writer import write_partitioned

        base = str(tmp_path / "tbl")
        # several appends -> multiple files per partition
        for i in range(3):
            write_partitioned(self._hep_shaped(spark, 200), base)
        bloom_index_update(spark, base, "call_id")
        out, stats0 = bloom_point_read(spark, base, "call_id", ["call-7"])
        assert out.count() == 3  # three appends planted call-7 thrice
        assert stats0["files_pruned"] > 0
        assert compact(spark, base, min_files=2)  # rewrites partitions
        # replacement files must already be in the sidecar
        sc = load_sidecar(base, "call_id")
        out, stats1 = bloom_point_read(spark, base, "call_id", ["call-7"])
        assert out.count() == 3
        assert stats1["files_pruned"] > 0, (stats1, sorted(sc["files"]))
        # every live file is indexed (no must-scan stragglers)
        from hepop_spark.storage.bloom_index import _live_files

        assert set(_live_files(base)) <= set(sc["files"])

    def test_refresh_indexes_new_and_vacuums_dead(self, spark, tmp_path):
        from hepop_spark.storage.bloom_index import (
            bloom_index_refresh,
            bloom_index_update,
            load_sidecar,
            _live_files,
        )
        from hepop_spark.storage.compaction import compact
        from hepop_spark.storage.writer import write_partitioned

        base = str(tmp_path / "tbl")
        write_partitioned(self._hep_shaped(spark, 100), base)
        bloom_index_update(spark, base, "call_id")
        write_partitioned(self._hep_shaped(spark, 100, lo=100), base)
        compact(spark, base, min_files=2)
        res = bloom_index_refresh(spark, base)
        sc = load_sidecar(base, "call_id")
        live = set(_live_files(base))
        assert set(sc["files"]) == live  # fully indexed AND vacuumed
        assert bloom_index_refresh(spark, base) == {}  # steady state


class TestHavingRouting:
    """r09: structural HAVING parses as AND-ed comparisons and routes
    through the agg/avg rewrite; anything richer falls back to raw."""

    def test_parser_having_shapes(self):
        from hepop_spark.plans.api import parse_simple_aggregate

        p = parse_simple_aggregate(
            "SELECT k, count(*) AS n FROM t GROUP BY k "
            "HAVING count(*) >= 5 AND avg(v) > 1.5 ORDER BY k LIMIT 3")
        assert p[5] == [("count(*)", ">= 5"), ("avg(v)", "> 1.5")]
        assert p[3] == "ORDER BY k LIMIT 3"
        # OR inside HAVING: since r10 it parses as a PROVEN boolean
        # tree (WhereTree) rather than rejecting — the router then
        # requires every leaf to map through the key/agg/avg rewrite
        # (end-to-end pin in test_round10b.py)
        from hepop_spark.plans.api import WhereTree
        p_or = parse_simple_aggregate(
            "SELECT k, count(*) AS n FROM t GROUP BY k "
            "HAVING count(*) > 5 OR count(*) < 2")
        assert isinstance(p_or[5], WhereTree)
        assert p_or[5].tree == ("or", [("leaf", "count(*)", "> 5"),
                                       ("leaf", "count(*)", "< 2")])
        # forbidden tokens OUTSIDE the having clause still reject
        assert parse_simple_aggregate(
            "SELECT DISTINCT k, count(*) AS n FROM t GROUP BY k "
            "HAVING count(*) > 5") is None
        # no having: empty list rides along
        assert parse_simple_aggregate(
            "SELECT k, count(*) AS n FROM t GROUP BY k")[5] == []

    def _tree(self, spark, tmp_path):
        from hepop_spark.storage.rollup import projection_append

        data = str(tmp_path / "data")
        raw = spark.createDataFrame(
            [(i, ["a", "b", "c"][i % 3], 10 + (i * 13) % 97)
             for i in range(60)],
            "doc_id long, k string, v long",
        )
        raw.write.mode("overwrite").parquet(
            os.path.join(data, "w1", "dbs", "hdocs"))
        projection_append(
            spark, os.path.join(data, "w1", "rollups", "h_grid"),
            raw.groupBy("k").agg(F.count("*").alias("n"),
                                 F.sum("v").alias("sv"),
                                 F.count("v").alias("cv")),
            "b0", keys=["k"], sums=["n", "sv", "cv"],
            source={"table": "hdocs", "keys": {"k": "k"},
                    "sums": {"n": "count(*)", "sv": "sum(v)",
                             "cv": "count(v)"}},
        )
        return data, raw

    def test_having_routes_and_matches_raw(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data, raw = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        sql = ("SELECT k, count(*) AS n, sum(v) AS sv FROM hdocs "
               "GROUP BY k HAVING sum(v) > 1170 ORDER BY k")
        df = api.sql(sql)
        assert api.last_routed_rollup == "h_grid"
        got = [(r.k, r.n, r.sv) for r in df.collect()]
        want = [
            (k, n, sv) for k, n, sv in (
                (r.k, r.n, r.sv)
                for r in raw.groupBy("k")
                .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
                .orderBy("k").collect())
            if sv > 1170
        ]
        assert got == want and 0 < len(got) < 3
        # exact grid match (GROUP BY k == grid keys): HAVING becomes a
        # row filter on the grid
        df = api.sql("SELECT k, count(*) AS n FROM hdocs GROUP BY k "
                     "HAVING count(*) >= 20 ORDER BY k")
        assert api.last_routed_rollup == "h_grid"
        assert [(r.k, r.n) for r in df.collect()] == [("a", 20), ("b", 20),
                                                      ("c", 20)]
        # avg in HAVING finalizes from sum+count partials
        df = api.sql("SELECT k, avg(v) AS av FROM hdocs GROUP BY k "
                     "HAVING avg(v) > 58 ORDER BY k")
        assert api.last_routed_rollup == "h_grid"
        avs = {r.k: r.av for r in df.collect()}
        raw_avs = {
            r.k: r.av for r in raw.groupBy("k")
            .agg(F.avg("v").alias("av")).collect() if r.av > 58
        }
        assert avs == raw_avs and avs

    def test_unmappable_having_falls_back(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI

        data, _raw = self._tree(spark, tmp_path)
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        # max(v) is not in the grid: must fall back to raw (and still run)
        df = api.sql("SELECT k, count(*) AS n FROM hdocs GROUP BY k "
                     "HAVING max(v) > 0 ORDER BY k")
        assert api.last_routed_rollup is None
        assert df.count() == 3


class TestPngBitDepths:
    """r09: every legal (depth, color type) decodes byte/bit-exactly;
    illegal combinations still reject loudly."""

    def test_roundtrip_grid(self):
        import numpy as np

        from hepop_spark.operators.png import decode_png, encode_png

        rng = np.random.default_rng(7)
        cases = [
            (1, (13, 9), None), (2, (8, 8), None), (4, (11, 5), None),
            (16, (6, 10), None), (16, (5, 4, 3), None),
            (16, (5, 4, 4), None), (16, (5, 4, 2), None),
            (2, (7, 7), (np.arange(12).reshape(4, 3) * 20).astype("uint8")),
            (4, (10, 6), (np.arange(48).reshape(16, 3) * 5).astype("uint8")),
        ]
        for depth, shape, pal in cases:
            maxv = (len(pal) - 1) if pal is not None else ((1 << depth) - 1)
            img = rng.integers(0, maxv + 1, size=shape).astype(
                np.uint16 if depth == 16 else np.uint8)
            for il in (False, True):
                dec = decode_png(encode_png(
                    img, lambda y: y % 5, palette=pal, interlace=il,
                    depth=depth))
                want = pal[img] if pal is not None else img
                assert dec.shape == want.shape and (dec == want).all(), (
                    depth, shape, il)

    def test_illegal_combos_reject(self):
        import numpy as np
        import pytest

        from hepop_spark.operators.png import decode_png, encode_png

        with pytest.raises(ValueError, match="illegal"):
            encode_png(np.zeros((4, 4, 3), np.uint8), depth=4)
        with pytest.raises(ValueError, match="illegal"):
            encode_png(np.zeros((4, 4), np.uint8),
                       palette=np.zeros((2, 3), np.uint8), depth=16)
        # a stream CLAIMING an illegal header combo rejects on decode
        good = bytearray(encode_png(np.zeros((4, 4), np.uint8), depth=8))
        # IHDR body starts at offset 16: width(4) height(4) depth(1) ...
        good[16 + 8] = 3  # depth=3 is illegal everywhere
        import struct
        import zlib as _z
        body = bytes(good[16:16 + 13])
        good[16 + 13:16 + 17] = struct.pack(
            ">I", _z.crc32(b"IHDR" + body) & 0xFFFFFFFF)
        with pytest.raises(ValueError, match="illegal"):
            decode_png(bytes(good))

    def test_stats_face_handles_uint16(self, spark):
        """decode_png_stats sums 16-bit samples exactly (int64 face)."""
        import numpy as np

        from hepop_spark.operators.multimodal import decode_png_stats
        from hepop_spark.operators.png import encode_png

        img = (np.arange(64, dtype=np.uint16) * 1021).reshape(8, 8)
        blob = encode_png(img, 2, depth=16)
        df = spark.createDataFrame([(1, bytearray(blob))],
                                   "media_id long, payload binary")
        row = decode_png_stats(df).collect()[0]
        want = int(img.astype(np.int64).sum())
        assert (row.sum_r, row.sum_g, row.sum_b) == (want, want, want)
        assert (row.width, row.height) == (8, 8)


class TestZoneSidecarIndex:
    """r09: per-file min/max zone sidecar — range-predicate file skipping
    (the bloom index's ordered sibling), including combined probes."""

    def _write(self, spark, base, shards=8, n=400):
        # values correlate with shard so ranges are file-localized
        df = spark.range(0, n).select(
            (F.col("id") % shards).alias("shard"),
            (F.col("id") % shards * 1000 + F.col("id")).alias("v"),
            F.concat(F.lit("k-"), F.col("id")).alias("key"),
        )
        df.repartition("shard").write.mode("append").partitionBy(
            "shard").parquet(base)

    def test_range_prune_never_loses_rows(self, spark, tmp_path):
        from hepop_spark.storage.bloom_index import (
            zone_candidates,
            zone_index_update,
        )

        base = str(tmp_path / "tbl")
        self._write(spark, base)
        assert zone_index_update(spark, base, "v") > 0
        kept, live, pruned = zone_candidates(base, "v", 3000, 4500)
        assert pruned > 0 and kept
        got = sorted(
            r.v for r in spark.read.option("basePath", base)
            .parquet(*[os.path.join(base, f) for f in kept])
            .filter("v BETWEEN 3000 AND 4500").collect())
        want = sorted(
            r.v for r in spark.read.parquet(base)
            .filter("v BETWEEN 3000 AND 4500").collect())
        assert got == want and got
        # open-ended ranges
        kept, live, pruned = zone_candidates(base, "v", 7000, None)
        assert pruned > 0
        kept_all, _, p0 = zone_candidates(base, "v", None, None)
        assert p0 == 0 and len(kept_all) == live

    def test_api_routes_ranges_and_combined_probes(self, spark, tmp_path):
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.bloom_index import (
            bloom_index_update,
            zone_index_update,
        )

        data = tmp_path / "data"
        base = str(data / "w1" / "dbs" / "mx")
        self._write(spark, base)
        zone_index_update(spark, base, "v")
        bloom_index_update(spark, base, "key")
        api = HepopQueryAPI(spark, default_window=False, data_dir=str(data))
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM mx WHERE v >= 7000")
        raw = spark.read.parquet(base).filter("v >= 7000").count()
        assert rows == [{"n": raw}] and raw > 0
        bp = api.last_bloom_pruned
        assert bp and ("zone", "v") in bp["probes"]
        assert bp["files_read"] < bp["files_live"]
        # equality on a zone column uses the zone too
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM mx WHERE v = 3003")
        assert rows == [{"n": 1}]
        assert ("zone", "v") in api.last_bloom_pruned["probes"]
        # combined: bloom(key) AND zone(v) intersect; key k-3003 has
        # v = 3*1000 + 3003... compute a real row: id=99 -> shard 3,
        # v = 3*1000+99 = 3099, key k-99
        rows, _ = api.query_json(
            "SELECT v FROM mx WHERE key = 'k-99' AND v BETWEEN 3000 AND 3200")
        assert rows == [{"v": 3099}]
        bp = api.last_bloom_pruned
        assert {p[0] for p in bp["probes"]} == {"bloom", "zone"}
        assert bp["files_read"] <= 1
        # BETWEEN fully outside any file's range: zero files read
        rows, _ = api.query_json(
            "SELECT count(*) AS n FROM mx WHERE v BETWEEN 90000 AND 99000")
        assert rows == [{"n": 0}]
        assert api.last_bloom_pruned["files_read"] == 0

    def test_zone_rides_compaction_and_refresh(self, spark, tmp_path):
        from hepop_spark.storage.bloom_index import (
            bloom_index_refresh,
            load_zone,
            zone_candidates,
            zone_index_update,
            _live_files,
        )
        from hepop_spark.storage.compaction import compact
        from hepop_spark.storage.writer import write_partitioned

        base = str(tmp_path / "tbl")
        rows = spark.range(0, 240).select(
            F.timestamp_micros(
                (F.lit(1_709_280_000_000_000)
                 + F.col("id") * 18_000_000).cast("long")).alias("timestamp"),
            F.col("id").alias("v"),
        )
        write_partitioned(rows, base)
        write_partitioned(rows, base)
        zone_index_update(spark, base, "v")
        assert compact(spark, base, min_files=2)
        live = set(_live_files(base))
        zc = load_zone(base, "v")
        assert live <= set(zc["files"])  # replacements indexed by compact
        kept, lv, pruned = zone_candidates(base, "v", 0, 30)
        assert pruned > 0 and kept
        bloom_index_refresh(spark, base)
        assert set(load_zone(base, "v")["files"]) == live  # vacuumed


class TestServeSidecarBootstrap:
    """r09: BLOOM_COLS/ZONE_COLS declarations — the serve sweep bootstraps
    missing sidecars and the query API prunes the declared columns with
    no manual indexing step."""

    def test_declared_sidecars_bootstrap_and_prune(self, spark, tmp_path):
        import json as _json
        import urllib.parse
        import urllib.request

        from hepop_spark.__main__ import serve
        from hepop_spark.config import ServerConfig
        from hepop_spark.storage.bloom_index import load_sidecar, load_zone

        cfg = ServerConfig.from_env(
            env={"BLOOM_COLS": "cpu:tags.host", "ZONE_COLS": "cpu:usage",
                 "TRIGRAM_COLS": "cpu:tags.host"},
            host="127.0.0.1", port=0, http_port=0,
            data_dir=str(tmp_path / "data"), writer_id="w1",
            compact_interval=0,  # sweep driven manually via the handle
        )
        assert cfg.bloom_cols == (("cpu", "tags.host"),)
        assert cfg.zone_cols == (("cpu", "usage"),)
        assert cfg.trigram_cols == (("cpu", "tags.host"),)
        h = serve(cfg, spark=spark, block=False)
        try:
            body = "\n".join(
                f"cpu,host=node{i % 6} usage={i}.0 "
                f"{1709290800000000000 + i * 60_000_000_000}"
                for i in range(24)
            ).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{h['http_port']}/write", data=body,
                method="POST")
            with urllib.request.urlopen(req, timeout=10) as r:
                assert r.status == 201
            import time as _time

            from hepop_spark.storage.writer import read_table

            tdir = os.path.join(cfg.table_root(), "cpu")
            deadline = _time.time() + 240
            while _time.time() < deadline:
                try:
                    if read_table(spark, tdir).count() >= 24:
                        break
                except Exception:
                    pass
                _time.sleep(1)
            h["compact_once"]()  # bootstraps + indexes the declared cols
            from hepop_spark.storage.trigram_index import load_trigram

            assert load_sidecar(tdir, "tags.host") is not None
            assert load_zone(tdir, "usage") is not None
            assert load_trigram(tdir, "tags.host") is not None

            def _q(sql):
                url = (f"http://127.0.0.1:{h['http_port']}/query?q="
                       + urllib.parse.quote(sql))
                with urllib.request.urlopen(url, timeout=60) as r:
                    return _json.load(r)

            rows = _q("SELECT count() AS n FROM cpu WHERE "
                      "get_json_object(tags, '$.host') = 'node3' "
                      "AND time >= '2024-01-01'")
            assert rows == [{"n": 4}]
            rows = _q("SELECT count() AS n FROM cpu "
                      "WHERE usage >= 20 AND time >= '2024-01-01'")
            assert rows == [{"n": 4}]
            # in-process: the probes actually engage on the declared cols
            from hepop_spark.plans.api import HepopQueryAPI

            api = HepopQueryAPI(spark, default_window=False,
                                data_dir=cfg.data_dir)
            api.sql("SELECT count(*) AS n FROM cpu "
                    "WHERE get_json_object(tags, '$.host') = 'node3'"
                    ).collect()
            bp = api.last_bloom_pruned
            assert bp and ("bloom", "tags.host") in bp["probes"]
            api.sql("SELECT count(*) AS n FROM cpu "
                    "WHERE usage >= 20").collect()
            bp = api.last_bloom_pruned
            assert bp and ("zone", "usage") in bp["probes"]
            api.sql("SELECT count(*) AS n FROM cpu WHERE "
                    "get_json_object(tags, '$.host') LIKE '%ode3%'"
                    ).collect()
            bp = api.last_bloom_pruned
            assert bp and ("trigram", "tags.host") in bp["probes"]
            # GET /stats: storage inventory reflects the declared indexes
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{h['http_port']}/stats",
                    timeout=30) as r:
                st = _json.load(r)
            cpu = st["writers"]["w1"]["tables"]["cpu"]
            assert cpu["files"] >= 1 and cpu["bytes"] > 0
            assert cpu["bloom_cols"] == ["tags.host"]
            assert cpu["zone_cols"] == ["usage"]
            assert cpu["trigram_cols"] == ["tags.host"]
            assert "manifest_version" in cpu
        finally:
            h["stop"]()
