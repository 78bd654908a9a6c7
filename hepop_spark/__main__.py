"""`python -m hepop_spark` — run the engine as the reference runs
(`bun start`, hepop.js:954-1016): HEP UDP+TCP receivers on PORT, the
HTTP query/write API on HTTP_PORT, and the streaming ingest pipelines
landing into PARQUET_DIR, all from the same five environment variables.

Composition (every part individually tested elsewhere):
  receivers (sources/receiver.py) -> landing spools
  LP landing  -> read_lp_stream -> lp_sink  (streaming/ingest.py)
  HEP landing -> binaryFile stream -> decode_hep_df -> hep_sink
  HTTP (plans/http_server.py) -> spark.sql over registered tables

Ctrl-C / SIGTERM stops receivers, flushes spools, and stops streaming
queries — the reference's shutdown() contract (hepop.js:1132-1174), except
checkpointing makes the "final flush" structural rather than load-bearing.
"""

from __future__ import annotations

import os
import signal
import sys

from .config import ServerConfig


def serve(cfg: ServerConfig, spark=None, block: bool = True,
          index_hooks: list | None = None):
    """Start everything; returns a stop() callable when block=False.

    ``index_hooks`` (streaming/index_maint.py hooks, embedding-API only —
    hooks are callables, so they cannot ride the env config) are run per
    micro-batch by BOTH ingest sinks, keyed by table name: how a serve
    deployment keeps MinHash/IVF-PQ/LSH stores and rollup projections
    fresh in lock-step with ingest."""
    from .plans.http_server import HepopHttpServer
    from .session import get_spark
    from .sources.receiver import (
        HepTcpReceiver,
        HepUdpReceiver,
        LpLineSpool,
        SegmentSpool,
    )
    from .streaming.ingest import hep_sink, lp_sink, read_lp_stream

    spark = spark or get_spark("hepop-serve")
    lp_landing = os.path.join(cfg.data_dir, "_landing", "lp")
    hep_landing = os.path.join(cfg.data_dir, "_landing", "hep")
    ckpt = os.path.join(cfg.data_dir, "_checkpoints")
    os.makedirs(lp_landing, exist_ok=True)
    os.makedirs(hep_landing, exist_ok=True)

    lp_spool = LpLineSpool(lp_landing)
    hep_spool = SegmentSpool(hep_landing)
    udp = HepUdpReceiver(hep_spool, host=cfg.host, port=cfg.port).start()
    tcp = HepTcpReceiver(hep_spool, host=cfg.host, port=cfg.port).start()
    # data_dir enables per-query table discovery: a measurement POSTed to
    # /write is queryable the moment its first parquet lands — no manual
    # view registration (reference fresh-metadata semantics, query.js:36-38)
    from .plans.api import DEFAULT_MAX_ROWS

    http = HepopHttpServer(
        spark, lp_spool=lp_spool, host=cfg.host, port=cfg.http_port,
        data_dir=cfg.data_dir, query_timeout_s=cfg.query_timeout_s,
        max_rows=cfg.max_rows if cfg.max_rows else DEFAULT_MAX_ROWS,
    ).start()

    root = cfg.table_root()
    frames_dir = os.path.join(cfg.data_dir, "_landing", "hep_frames")
    os.makedirs(frames_dir, exist_ok=True)

    from .sources.hep import decode_hep_df

    # recursive lookup: each drained segment publishes its frames as one
    # `seg=<name>/` directory (atomic rename — the drain's exactly-once
    # unit); legacy loose part files at the root are still found
    hep_stream = (
        spark.readStream.schema("frame binary")
        .option("recursiveFileLookup", "true")
        .parquet(frames_dir)
    )
    queries = [
        lp_sink(
            read_lp_stream(spark, lp_landing), root, os.path.join(ckpt, "lp"),
            manifest=cfg.manifest_mode, index_hooks=index_hooks,
        ).start(),
        hep_sink(
            decode_hep_df(hep_stream), root, os.path.join(ckpt, "hep"),
            manifest=cfg.manifest_mode, index_hooks=index_hooks,
        ).start(),
    ]

    # segment drain timer — the reference's 10 s flush loop (hepop.js:151-157)
    # as a consume-once mover: finished .seg -> parquet frames -> .done
    import threading
    import time as _time

    from .sources.receiver import read_segment_file

    stop_evt = threading.Event()
    drain_lock = threading.Lock()

    def _drain_once() -> int:
        """Consume finished segments EXACTLY ONCE, crash-safe: a segment's
        frames publish as a deterministic `seg=<name>/` parquet directory
        (unique hidden staging + atomic rename), and only then does the
        segment move to `.done`. A crash at any point re-drains
        idempotently on the next sweep: published output -> skip the
        write, unpublished -> restage. (The old shape moved the segment
        into a shared temp dir FIRST, so a crash mid-drain stranded it
        outside the listing — silent loss on restart.) The lock
        serializes the background timer against manual handle calls and
        the shutdown drain — two concurrent drains of one segment would
        interleave their staging writes."""
        import uuid as _uuid

        with drain_lock:
            return _drain_locked(_uuid.uuid4().hex[:8])

    def _drain_locked(run_id: str) -> int:
        lp_spool.flush()  # reference flushes ALL buffers on the timer
        hep_spool.flush()
        # legacy recovery: segments stranded by the pre-r07 drain shape
        stranded = os.path.join(hep_landing, "_one")
        if os.path.isdir(stranded):
            for f in os.listdir(stranded):
                if f.endswith(".seg"):
                    os.rename(os.path.join(stranded, f),
                              os.path.join(hep_landing, f))
        segs = sorted(
            f for f in os.listdir(hep_landing) if f.endswith(".seg")
        )
        n = 0
        for name in segs:
            path = os.path.join(hep_landing, name)
            outdir = os.path.join(frames_dir, f"seg={name}")
            if not os.path.isdir(outdir):
                frames = read_segment_file(path)
                if frames:
                    tmp = os.path.join(
                        frames_dir, f".seg={name}.tmp.{run_id}")
                    spark.createDataFrame(
                        [(f,) for f in frames], "frame binary"
                    ).write.mode("overwrite").parquet(tmp)
                    os.rename(tmp, outdir)
                else:
                    os.makedirs(outdir)  # empty segment: commit as empty
                n += len(frames)
            os.rename(path, path + ".done")
        return n

    def _drain_loop():
        while not stop_evt.wait(2.0):
            try:
                _drain_once()
            except Exception:
                pass

    drain_thread = threading.Thread(target=_drain_loop, daemon=True)
    drain_thread.start()

    # background compactor — the reference's 60 s checkAndCompact loop
    # (hepop.js:440-450) over every table this writer owns. Safe against
    # the live ingest sinks by the per-table append/compact mutex
    # (storage/writer.table_lock, round-6 soak); readers are lock-free.
    from .storage.compaction import compact

    def _compact_once() -> dict:
        out: dict = {}
        if os.path.isdir(root):
            for t in sorted(os.listdir(root)):
                tdir = os.path.join(root, t)
                if not os.path.isdir(tdir):
                    continue
                if cfg.retention_days is not None:
                    # age-out BEFORE compaction: expired partitions must
                    # not be compacted into survivors first
                    from datetime import datetime, timedelta, timezone

                    from .storage.retention import apply_retention

                    cutoff = (
                        datetime.now(timezone.utc)
                        - timedelta(days=cfg.retention_days)
                    ).strftime("%Y-%m-%d")
                    try:
                        r = apply_retention(tdir, cutoff)
                        if r["dates_dropped"]:
                            out[f"retention/{t}"] = r
                    except Exception:
                        pass  # a concurrent writer won; next sweep retries
                try:
                    res = compact(spark, tdir, min_files=2)
                except Exception:
                    continue  # a mid-append listing race; next sweep retries
                if res:
                    out[t] = res
                # sidecar indexes: bootstrap any DECLARED (BLOOM_COLS /
                # ZONE_COLS) sidecar this table is missing, then index
                # files landed since the last sweep and drop entries
                # compaction retired (correctness never depends on this —
                # unindexed files always scan — it only keeps point/range
                # lookups FAST as the table churns)
                from .storage.bloom_index import (
                    bloom_index_refresh,
                    bloom_index_update,
                    load_sidecar,
                    load_zone,
                    sidecar_cols,
                    zone_cols,
                    zone_index_update,
                )
                from .storage.trigram_index import (
                    load_trigram,
                    trigram_cols,
                    trigram_index_update,
                )

                try:
                    for bt, bc in cfg.bloom_cols:
                        if bt == t and load_sidecar(tdir, bc) is None:
                            bloom_index_update(spark, tdir, bc)
                    for zt, zc in cfg.zone_cols:
                        if zt == t and load_zone(tdir, zc) is None:
                            zone_index_update(spark, tdir, zc)
                    for gt, gc in cfg.trigram_cols:
                        if gt == t and load_trigram(tdir, gc) is None:
                            trigram_index_update(spark, tdir, gc)
                    if (sidecar_cols(tdir) or zone_cols(tdir)
                            or trigram_cols(tdir)):
                        r = bloom_index_refresh(spark, tdir)
                        if r:
                            out[f"sidecars/{t}"] = r
                except Exception:
                    continue
        # maintained aggregate projections this writer owns: fold their
        # per-batch segments into base/ on the same cadence (results are
        # invariant across the fold; this only bounds the live segment
        # count under a long ingest stream — storage/rollup.py)
        from .storage.rollup import projection_compact, projection_meta

        rroot = os.path.join(cfg.data_dir, cfg.writer_id, "rollups")
        if os.path.isdir(rroot):
            for r in sorted(os.listdir(rroot)):
                store = os.path.join(rroot, r)
                meta = projection_meta(store)
                if meta is None:
                    continue
                try:
                    if projection_compact(spark, store, meta["keys"],
                                          meta["sums"],
                                          meta.get("mins", []),
                                          meta.get("maxs", []),
                                          meta.get("kmvs", []),
                                          meta.get("kmv_k"),
                                          meta.get("hists", [])):
                        out[f"rollups/{r}"] = {"folded": True}
                except Exception:
                    continue
        return out

    def _compact_loop():
        while not stop_evt.wait(cfg.compact_interval):
            _compact_once()

    compact_thread = None
    if cfg.compact_interval > 0:
        compact_thread = threading.Thread(target=_compact_loop, daemon=True)
        compact_thread.start()

    def stop(*_a):
        udp.stop()
        tcp.stop()
        lp_spool.flush()
        stop_evt.set()
        drain_thread.join(timeout=5)
        if compact_thread is not None:
            compact_thread.join(timeout=5)
        _drain_once()
        _time.sleep(0)
        for q in queries:
            q.stop()
        http.stop()

    if not block:
        return {
            "stop": stop,
            "udp_port": udp.port,
            "tcp_port": tcp.port,
            "http_port": http.port,
            "drain_once": _drain_once,
            "compact_once": _compact_once,
        }
    signal.signal(signal.SIGTERM, stop)
    try:
        for q in queries:
            q.awaitTermination()
    except KeyboardInterrupt:
        stop()
    return None


def main(argv: list[str]) -> int:
    cmd = argv[0] if argv else "serve"
    if cmd != "serve":
        print("usage: python -m hepop_spark serve", file=sys.stderr)
        return 2
    cfg = ServerConfig.from_env()
    print(
        f"hepop_spark serving: hep={cfg.host}:{cfg.port} "
        f"http={cfg.host}:{cfg.http_port} data={cfg.table_root()}"
    )
    serve(cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
