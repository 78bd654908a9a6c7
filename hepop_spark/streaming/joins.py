"""Streaming join + dedup shapes (north-star extensions; the reference has
no joins at all — SURVEY §2 negative space — and its dedup story is "none":
compaction concatenates without dedup, hepop.js:703-785).

Three canonical shapes every 100 TB streaming deployment needs:

- stream-static enrichment: the dim side is read fresh per micro-batch and
  broadcast — no state, no shuffle of the stream side.
- stream-stream interval join: both sides buffered in watermark-bounded
  state, joined on key + event-time proximity; state is evicted as the
  watermark advances, so memory is bounded by (rate × interval), not
  history.
- watermarked dedup: Spark's built-in dropDuplicatesWithinWatermark —
  exactly-once-per-key within the watermark horizon, state auto-evicted.
  (streaming/stateful.py is the custom-TTL twin with richer emission.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(events: DataFrame, dim: DataFrame,
                         key: str = "h") -> DataFrame:
    """Enrich a stream with a static dimension. Spark re-plans the static
    side each micro-batch; a bounded dim broadcasts, so the streaming side
    never shuffles."""
    return events.join(F.broadcast(dim), on=key, how="left")


def stream_stream_join(left: DataFrame, right: DataFrame,
                       key: str = "h",
                       max_skew: str = "10 minutes",
                       watermark: str = "20 minutes",
                       how: str = "inner") -> DataFrame:
    """Join two streams on ``key`` where the right event lands within
    [left.ts, left.ts + max_skew]. Both sides are watermarked so the state
    store can evict rows older than the horizon — the interval condition is
    what makes eviction possible (an unbounded-time stream-stream join
    would keep all history).

    how="left_outer" additionally emits unmatched left rows (right columns
    null) — but only once the watermark has passed their join window, since
    before that a match could still arrive; the engine holds them in state
    until then. The request/response-timeout shape: unmatched requests
    surface as timeouts one watermark horizon later. Two operational traps
    (pinned by tests): null results emit in a batch AFTER the watermark
    advances, and the global watermark is min() across sources under the
    default multipleWatermarkPolicy — a drained/idle side freezes eviction
    for the whole join until it sees data again (consider policy "max", or
    heartbeat the idle source, in production)."""
    lt = left.select(
        F.col(key), F.col("ts").alias("l_ts"), F.col("payload").alias("l_payload")
    ).withWatermark("l_ts", watermark)
    rt = right.select(
        F.col(key).alias(f"r_{key}"), F.col("ts").alias("r_ts"),
        F.col("payload").alias("r_payload"),
    ).withWatermark("r_ts", watermark)
    cond = (
        (lt[key] == rt[f"r_{key}"])
        & (rt["r_ts"] >= lt["l_ts"])
        & (rt["r_ts"] <= lt["l_ts"] + F.expr(f"INTERVAL {max_skew}"))
    )
    return lt.join(rt, cond, how).select(
        key, "l_ts", "l_payload", "r_ts", "r_payload"
    )


def watermark_dedup(events: DataFrame, key: str = "h",
                    watermark: str = "1 hour") -> DataFrame:
    """Built-in streaming dedup: first event per key wins; duplicates
    arriving within the watermark horizon are dropped and state for a key
    is evicted once the watermark passes its event time."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark([key])
