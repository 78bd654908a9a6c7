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
