"""Snapshot-log contracts (storage/snapshots.py): append/overwrite
versioning, time travel, rollback-as-new-version, and vacuum retention."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hepop_spark.storage.snapshots import (
    commit_snapshot,
    read_snapshot,
    rollback,
    vacuum,
    versions,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("event_id"))


class TestSnapshots:
    def test_append_overwrite_time_travel(self, spark, tmp_path):
        base = str(tmp_path / "t")
        assert commit_snapshot(_df(spark, 0, 50), base) == 1
        assert commit_snapshot(_df(spark, 50, 120), base) == 2
        assert commit_snapshot(_df(spark, 0, 10), base, mode="overwrite") == 3
        assert versions(base) == [1, 2, 3]
        assert read_snapshot(spark, base).count() == 10          # latest
        assert read_snapshot(spark, base, 1).count() == 50       # time travel
        assert read_snapshot(spark, base, 2).count() == 120
        got = read_snapshot(spark, base, 2).agg(F.countDistinct("event_id")).first()[0]
        assert got == 120

    def test_rollback_preserves_history(self, spark, tmp_path):
        base = str(tmp_path / "t")
        commit_snapshot(_df(spark, 0, 50), base)
        commit_snapshot(_df(spark, 0, 5), base, mode="overwrite")
        v = rollback(base, 1)
        assert v == 3
        assert read_snapshot(spark, base).count() == 50
        assert read_snapshot(spark, base, 2).count() == 5  # history intact

    def test_vacuum_drops_only_unreferenced(self, spark, tmp_path):
        base = str(tmp_path / "t")
        commit_snapshot(_df(spark, 0, 50), base)                     # v1
        commit_snapshot(_df(spark, 0, 5), base, mode="overwrite")    # v2 (drops c1)
        commit_snapshot(_df(spark, 5, 9), base)                      # v3 = c2+c3
        removed = vacuum(base, keep_last=2)
        assert versions(base) == [2, 3]
        # c1 only referenced by v1 -> gone; c2/c3 still referenced -> kept
        assert any(p.endswith("c1") for p in removed)
        assert not os.path.isdir(os.path.join(base, "data", "c1"))
        assert read_snapshot(spark, base).count() == 9
        assert read_snapshot(spark, base, 2).count() == 5
