"""Custom stateful streaming operators via applyInPandasWithState — the
escape hatch for semantics Spark's built-in windowed aggregations can't
express (SURVEY §7: "custom stateful operators").

`streaming_dedup`: exactly-once-per-key emission with TTL state — the
streaming twin of exact dedup. First arrival of a key within the TTL is
emitted; repeats are suppressed; state times out so memory is bounded by
active keys, not history. At 100 TB/day this is the shape of streaming
near-line dedup: state partitioned by key hash across executors, watermarked
timeout reclaiming memory.

Operational note: with ProcessingTimeTimeout the engine keeps scheduling
timeout-evaluation micro-batches, so even a Trigger.AvailableNow query does
not self-terminate once state exists (verified live: state version reached
~300 on a 2-file source). For bounded replays/backfills pass ``ttl_ms=None``
(NoTimeout: query terminates when the source drains, state never expires);
keep the TTL for long-lived streams, where the query runs forever anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(events: DataFrame, key_col: str = "h",
                    ttl_ms: int | None = 3_600_000) -> DataFrame:
    """Deduplicate a stream by ``key_col`` (first arrival wins).

    events: streaming DataFrame with at least (h string, payload string).
    Emits each key's first-seen row; suppresses repeats while state lives.
    State: (seen long) per key, with a processing-time TTL when ``ttl_ms``
    is set (unbounded retention when None — bounded sources only)."""
    import pandas as pd  # executors

    output_schema = "h string, payload string, n_dups bigint"
    state_schema = "seen long"

    def dedupe(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = []
        seen = state.get[0] if state.exists else 0
        first_payload = None
        n = 0
        for pdf in pdfs:
            for payload in pdf["payload"]:
                n += 1
                if first_payload is None:
                    first_payload = payload
        if seen == 0 and first_payload is not None:
            rows.append((key[0], first_payload, n - 1))
        state.update((seen + n,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if rows:
            yield pd.DataFrame(rows, columns=["h", "payload", "n_dups"])

    return events.groupBy(key_col).applyInPandasWithState(
        dedupe,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_counter_rate(events: DataFrame) -> DataFrame:
    """Per-key monotonic-counter rate with reset detection, carried across
    micro-batches — the streaming twin of queries/analytics2.counter_rate
    (PromQL `increase` semantics). State per user: (last value, running
    increase, resets, samples). Each batch's rows are processed in
    (seq) order; the delta against the LAST SAMPLE OF THE PREVIOUS BATCH
    comes from state, which is exactly what a per-batch window cannot see
    — the cross-batch handoff is the operator. Emits the running totals
    on every batch a key appears in (update semantics); the latest
    emission per key is the final answer.

    events: streaming DataFrame (user_id long, seq long, value double);
    `seq` must be a total order consistent with event time. State is
    NoTimeout: bounded sources / backfills; long-lived streams would add a
    TTL exactly as streaming_dedup does."""
    import pandas as pd  # executors

    output_schema = (
        "user_id long, total_increase double, n_resets long, n_samples long"
    )
    state_schema = "last double, total double, resets long, n long"

    def step(key, pdfs, state: GroupState):
        if state.exists:
            last, total, resets, n = state.get
        else:
            last, total, resets, n = None, 0.0, 0, 0
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("seq")
        for v in batch["value"]:
            v = float(v)
            if n == 0:
                pass  # first-ever sample: no delta
            elif v >= last:
                total += v - last
            else:
                total += v
                resets += 1
            last = v
            n += 1
        state.update((last, total, resets, n))
        yield pd.DataFrame(
            [(key[0], total, resets, n)],
            columns=["user_id", "total_increase", "n_resets", "n_samples"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
