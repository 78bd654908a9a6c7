"""Exactly-once foreachBatch parquet sink via batch-id transaction markers.

Structured Streaming's foreachBatch is at-least-once: after a failure the
same (batch_id, data) pair is re-invoked, so a naive append sink duplicates
rows (the reference has the same hazard — its bulk buffer re-flushes on
restart with no dedup, hepop.js:407-457). The standard recipe makes the
batch write idempotent:

  1. each batch writes to its own `batch_id=N/` directory with
     mode("overwrite") — a replay of a torn write REPAIRS it instead of
     appending beside it;
  2. a zero-byte commit marker `_commits/N` is created strictly AFTER the
     data write returns — the marker is the commit point;
  3. a replayed batch whose marker exists is skipped entirely.

Readers take only committed batches (`read_committed`), so a crash between
(1) and (2) is invisible: the half-written directory is ignored, then
overwritten on replay. Downstream sees each input row exactly once.

At scale the marker directory generalizes to any put-if-absent metadata
store (object-store conditional put, a Delta/Iceberg commit log); the
per-batch directory keeps the write parallel — every executor still writes
its partitions directly, only the tiny marker is driver-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _marker(base_dir: str, batch_id: int) -> str:
    return os.path.join(base_dir, "_commits", str(batch_id))


def write_batch_exactly_once(batch: DataFrame, batch_id: int, base_dir: str) -> bool:
    """Idempotent write of one micro-batch; returns True if it wrote,
    False if the batch was already committed (replay no-op)."""
    marker = _marker(base_dir, batch_id)
    if os.path.exists(marker):
        return False
    out = os.path.join(base_dir, f"batch_id={batch_id}")
    batch.write.mode("overwrite").parquet(out)
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w"):
        pass
    return True


def exactly_once_sink(df: DataFrame, base_dir: str, checkpoint_dir: str,
                      available_now: bool = True):
    """Streaming writer wrapping write_batch_exactly_once; availableNow for
    bounded replays (NoTimeout discipline — see streaming/stateful.py)."""

    def _write(batch: DataFrame, batch_id: int) -> None:
        write_batch_exactly_once(batch, batch_id, base_dir)

    writer = (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def read_committed(spark: SparkSession, base_dir: str) -> DataFrame:
    """Union of committed batch directories only — uncommitted (torn)
    directories are invisible to readers."""
    commits_dir = os.path.join(base_dir, "_commits")
    ids = sorted(int(f) for f in os.listdir(commits_dir)) if os.path.isdir(commits_dir) else []
    if not ids:
        raise FileNotFoundError(f"no committed batches under {base_dir}")
    paths = [os.path.join(base_dir, f"batch_id={i}") for i in ids]
    return spark.read.parquet(*paths)
