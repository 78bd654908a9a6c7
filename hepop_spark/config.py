"""Deployment configuration — the reference's exact environment surface
(README.md:69-75): PORT, HTTP_PORT (default PORT+1), HOST, PARQUET_DIR,
WRITER_ID (default hostname). `ServerConfig.from_env` reads the same
variables so a reference deployment's env block drives this engine
unchanged; explicit overrides win over the environment (for tests and
embedding)."""

from __future__ import annotations

import os
import socket
from dataclasses import dataclass


def _parse_cols(spec) -> tuple[tuple[str, str], ...]:
    """"table:col,table:col" -> ((table, col), ...); tuples pass through
    (embedding API)."""
    if not spec:
        return ()
    if not isinstance(spec, str):
        return tuple(tuple(x) for x in spec)
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        t, _, c = part.partition(":")
        if t and c:
            out.append((t, c))
    return tuple(out)


def _parse_pos_float(v) -> float | None:
    """Positive float or None — tolerant of malformed env values
    (r09 ADVICE: a non-numeric RETENTION_DAYS crashed from_env with an
    uncaught ValueError, unlike the neighboring fields' parsing)."""
    try:
        f = float(str(v).strip())
    except (TypeError, ValueError):
        return None
    return f if f > 0 else None


@dataclass(frozen=True)
class ServerConfig:
    port: int = 9069
    http_port: int = 9070
    host: str = "0.0.0.0"
    data_dir: str = "./data"
    writer_id: str = ""
    # background small-file compaction sweep period, seconds; 0 disables.
    # The reference runs its checkAndCompact loop every 60 s
    # (hepop.js:440-450); COMPACT_INTERVAL overrides.
    compact_interval: float = 60.0
    # per-request HTTP query ceiling, seconds; None/0 disables. A runaway
    # query is cancelled (its Spark job group only) and answered 408, so
    # one pathological client cannot wedge the serve process.
    query_timeout_s: float | None = None
    # manifest-pinned reads (storage/manifest.py): serve tables publish a
    # versioned file manifest per mutation and queries resolve file lists
    # from it, so readers never race compaction swaps. MANIFEST_MODE=0
    # reverts to listing + bounded retry (the pre-r08 envelope).
    manifest_mode: bool = True
    # JSON-path row ceiling for /query (MAX_ROWS env); None = the
    # plans/api.py default (100k). Oversized results answer 413 with the
    # truncated prefix.
    max_rows: int | None = None
    # sidecar index declarations, "table:col,table:col" — BLOOM_COLS
    # builds/maintains per-file bloom bitmaps (point lookups), ZONE_COLS
    # per-file min/max zones (range pruning). The compaction sweep
    # bootstraps missing sidecars and keeps them fresh; the query API
    # prunes automatically on matching WHERE conjuncts. The counterpart
    # of the reference's writer bloom option (hepop.js:26-34), lifted to
    # FILE-level skipping.
    bloom_cols: tuple[tuple[str, str], ...] = ()
    zone_cols: tuple[tuple[str, str], ...] = ()
    # TRIGRAM_COLS: per-file trigram-bloom bitmaps (storage/
    # trigram_index.py) — LIKE '%substring%' file skipping over text
    # columns (SIP payload search, the capture store's headline lookup).
    trigram_cols: tuple[tuple[str, str], ...] = ()
    # RETENTION_DAYS: age-out — the sweep drops date partitions older
    # than now - N days (storage/retention.py; manifest retire + vacuum
    # grace, so pinned readers never race an expiry). None = keep forever
    # (the reference's behavior: rotation is left to the operator).
    retention_days: float | None = None

    @classmethod
    def from_env(cls, env: dict | None = None, **overrides) -> "ServerConfig":
        e = os.environ if env is None else env
        port = int(overrides.get("port", e.get("PORT", 9069)))
        http_port = int(
            overrides.get("http_port", e.get("HTTP_PORT", port + 1))
        )
        return cls(
            port=port,
            http_port=http_port,
            host=str(overrides.get("host", e.get("HOST", "0.0.0.0"))),
            data_dir=str(overrides.get("data_dir", e.get("PARQUET_DIR", "./data"))),
            writer_id=str(
                overrides.get("writer_id", e.get("WRITER_ID", socket.gethostname()))
            ),
            compact_interval=float(
                overrides.get("compact_interval", e.get("COMPACT_INTERVAL", 60.0))
            ),
            query_timeout_s=(
                float(t) if (t := overrides.get(
                    "query_timeout_s", e.get("QUERY_TIMEOUT", 0))) and float(t) > 0
                else None
            ),
            manifest_mode=str(
                overrides.get("manifest_mode", e.get("MANIFEST_MODE", "1"))
            ).lower() not in ("0", "false", "no", ""),
            max_rows=(
                int(m) if (m := overrides.get(
                    "max_rows", e.get("MAX_ROWS", 0))) and int(m) > 0
                else None
            ),
            bloom_cols=_parse_cols(
                overrides.get("bloom_cols", e.get("BLOOM_COLS", ""))),
            zone_cols=_parse_cols(
                overrides.get("zone_cols", e.get("ZONE_COLS", ""))),
            trigram_cols=_parse_cols(
                overrides.get("trigram_cols", e.get("TRIGRAM_COLS", ""))),
            retention_days=_parse_pos_float(
                overrides.get("retention_days",
                              e.get("RETENTION_DAYS", 0))),
        )

    def table_root(self) -> str:
        """Reference directory convention: {data}/{writer}/dbs
        (README.md:78-90)."""
        return os.path.join(self.data_dir, self.writer_id, "dbs")
