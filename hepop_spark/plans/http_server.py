"""HTTP front-end: the reference's Bun.serve API surface (hepop.js:1018-1100)
as a stdlib ThreadingHTTPServer over the Spark session.

Endpoints (status-code mapping mirrors the reference):
  GET  /query?q=<sql>      -> 200 JSON rows | 400 missing q | 500 exec error
                              | 413 result exceeded max_rows (body carries
                              {"error", "truncated": true, "max_rows",
                              "rows": first max_rows rows} — the driver
                              materialization guard the reference doesn't
                              need because it streams DuckDB vectors)
  POST /query {"query":..} -> same
  POST /write  <LP body>   -> 201 | 400 parse error
  GET  /health             -> 200 {"status":"ok"}   (hepop.js:1102-1105)
  GET  /stats              -> 200 storage inventory (beyond the reference,
                              which keeps this in metadata.json but never
                              serves it): per writer/table partition+file+
                              byte counts, manifest version, sidecar
                              indexes, maintained rollups
  GET  /explain?q=<sql>    -> 200 query introspection WITHOUT execution:
                              which rollup grid (if any) the aggregate
                              routed to, the rewritten SQL, the sidecar
                              pruning accounting (files_live/files_read
                              per probe), and the physical plan — "why
                              was my query fast/slow" as an API

Writes spool LP lines to the landing dir consumed by the streaming job
(streaming/ingest.lp_sink) — the HTTP layer never touches parquet itself,
exactly like the reference's buffer indirection.
"""

from __future__ import annotations

import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .api import DEFAULT_MAX_ROWS, HepopQueryAPI, statement_is_select_only


def _json_default(o):
    return str(o)


def collect_stats(data_dir: str) -> dict:
    """Storage inventory for GET /stats — pure filesystem/metadata reads
    (no Spark job): the observability face of the layout the reference
    kept in metadata.json (hepop.js:96-106)."""
    import glob as _glob
    import os

    from ..storage.bloom_index import sidecar_cols, zone_cols
    from ..storage.trigram_index import trigram_cols
    from ..storage.compaction import table_stats
    from ..storage.manifest import latest as _manifest_latest
    from ..storage.manifest import manifest_enabled
    from ..storage.rollup import projection_meta

    out: dict = {"writers": {}}
    for wdir in sorted(_glob.glob(os.path.join(data_dir, "*"))):
        w = os.path.basename(wdir)
        if w.startswith(("_", ".")) or not os.path.isdir(wdir):
            continue
        tables: dict = {}
        dbs = os.path.join(wdir, "dbs")
        if os.path.isdir(dbs):
            for t in sorted(os.listdir(dbs)):
                tdir = os.path.join(dbs, t)
                if not os.path.isdir(tdir) or t.startswith(("_", ".")):
                    continue
                st = table_stats(tdir)
                rec = {
                    "partitions": len(st["partitions"]),
                    "files": st["total_files"],
                    "bytes": st["total_bytes"],
                }
                if manifest_enabled(tdir):
                    got = _manifest_latest(tdir)
                    if got is not None:
                        rec["manifest_version"] = got[0]
                        rec["live_files"] = len(got[1]["files"])
                bl, zn = sidecar_cols(tdir), zone_cols(tdir)
                tg = trigram_cols(tdir)
                if bl:
                    rec["bloom_cols"] = bl
                if zn:
                    rec["zone_cols"] = zn
                if tg:
                    rec["trigram_cols"] = tg
                tables[t] = rec
        rollups: dict = {}
        rroot = os.path.join(wdir, "rollups")
        if os.path.isdir(rroot):
            for r in sorted(os.listdir(rroot)):
                meta = projection_meta(os.path.join(rroot, r))
                if meta is not None:
                    rollups[r] = {
                        "keys": meta.get("keys", []),
                        "sums": meta.get("sums", []),
                        **{k: meta[k] for k in
                           ("mins", "maxs", "kmvs", "hists")
                           if meta.get(k)},
                        "routable": "source" in meta,
                    }
        out["writers"][w] = {"tables": tables, "rollups": rollups}
    return out


class HepopHttpServer:
    def __init__(self, spark, lp_spool=None, host: str = "127.0.0.1", port: int = 0,
                 default_window: bool = True, data_dir: str | None = None,
                 max_rows: int | None = DEFAULT_MAX_ROWS,
                 query_timeout_s: float | None = None):
        api = HepopQueryAPI(spark, default_window=default_window,
                            data_dir=data_dir, max_rows=max_rows)
        spool = lp_spool

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, body: bytes = b"", ctype: str = "application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _run_query(self, sql: str):
                # per-request Spark job group on THIS handler thread
                # (pinned-thread mode makes it thread-local), so a
                # watchdog can cancel a runaway query without touching
                # other in-flight requests — the serve process stays
                # responsive behind one pathological client
                gid = None
                req_done = None
                watchdog_fired = threading.Event()
                if query_timeout_s is not None:
                    import uuid as _uuid

                    gid = f"hepop-http-{_uuid.uuid4().hex[:12]}"
                    sc = spark.sparkContext
                    sc.setJobGroup(gid, f"http query (timeout {query_timeout_s}s)",
                                   interruptOnCancel=True)
                    req_done = threading.Event()

                    def _watchdog(done=req_done):
                        if done.wait(query_timeout_s):
                            return  # finished in time
                        # flag BEFORE cancelling: 408 is answered only when
                        # the watchdog demonstrably fired, never because an
                        # unrelated failure message happens to contain
                        # 'cancelled' (r07 ADVICE item 4)
                        watchdog_fired.set()
                        # cancel REPEATEDLY until the request ends (r10):
                        # cancelJobGroup kills only jobs ACTIVE at that
                        # instant — a query still in driver-side planning
                        # when the deadline hits (heavily loaded box, or a
                        # pathological plan) would otherwise launch its
                        # jobs AFTER the one-shot cancel and run a
                        # 10^16-row cross join to completion, wedging the
                        # serve process's executors for every other
                        # client. Diagnosed live: two uncancelled runaway
                        # stages burning all 32 executor threads for 26
                        # minutes under a 32-thread co-tenant load.
                        while not done.wait(2.0):
                            try:
                                sc.cancelJobGroup(gid)
                            except Exception:
                                return  # context shutting down
                    t = threading.Thread(target=_watchdog, daemon=True)
                    t.start()
                try:
                    # truncation arrives WITH the rows — never read
                    # api.last_truncated here: handlers run concurrently
                    # (ThreadingHTTPServer) and shared instance state races
                    rows, truncated = api.query_json(sql)
                except Exception as e:  # reference: 500 + message (hepop.js:1050-1058)
                    msg = str(e)
                    if gid is not None and watchdog_fired.is_set():
                        self._send(408, json.dumps({
                            "error": f"query exceeded {query_timeout_s}s "
                                     "and was cancelled",
                            "timeout": True,
                        }).encode())
                        return
                    self._send(500, json.dumps({"error": msg.split("\n")[0]}).encode())
                    return
                finally:
                    if req_done is not None:
                        req_done.set()  # stops the watchdog loop
                    if gid is not None:
                        spark.sparkContext.setJobGroup(None, None)
                if truncated:
                    # 413 Payload Too Large + the truncated prefix and the
                    # limit, so a client can page down or raise max_rows
                    self._send(413, json.dumps({
                        "error": f"result exceeds max_rows={api.max_rows}; "
                                 "returning the first max_rows rows",
                        "truncated": True,
                        "max_rows": api.max_rows,
                        "rows": rows,
                    }, default=_json_default).encode())
                    return
                self._send(200, json.dumps(rows, default=_json_default).encode())

            def _explain(self, sql: str):
                # SELECT-only guard (r09 ADVICE): api2.sql() passes the
                # text to spark.sql(), which executes DDL/DML (DROP
                # VIEW, INSERT ...) EAGERLY — an "explain" endpoint must
                # never have side effects, so anything but a
                # SELECT/WITH/VALUES statement is a 400. (/query keeps
                # the reference's permissive surface, where statements
                # execute — documented, not hidden behind "explain".)
                # Anchored classification (r11 ADVICE): the head token
                # plus — for WITH — the first token after the CTE
                # definition list closes (Spark's grammar allows "WITH t
                # AS (...) INSERT INTO ..." there, r10 ADVICE), walked
                # with Spark's own literal rules (backslash escapes AND
                # '' doubling) and comment skipping. Statement-position
                # checks mean identifiers merely NAMED update/delete no
                # longer false-400, and no literal-strip regex can
                # desync on mixed escape dialects.
                ok, tok = statement_is_select_only(sql)
                if not ok:
                    self._send(400, json.dumps({
                        "error": "/explain accepts SELECT statements only "
                                 f"(got {tok} at a statement position); "
                                 "DDL/DML would execute, not explain"}
                                 ).encode())
                    return
                # a FRESH api per request: the breadcrumbs this endpoint
                # exists to expose (last_routed_rollup/last_bloom_pruned)
                # are per-instance debug state that concurrent handler
                # threads would race on the shared api
                api2 = HepopQueryAPI(
                    spark, default_window=default_window,
                    data_dir=data_dir, max_rows=max_rows)
                try:
                    df = api2.sql(sql)  # plans + analyzes; never collects
                    try:
                        mode = spark._jvm.org.apache.spark.sql.execution \
                            .ExplainMode.fromString("formatted")
                        plan = df._jdf.queryExecution().explainString(mode)
                    except Exception:
                        plan = df._jdf.queryExecution() \
                            .executedPlan().toString()
                    body = json.dumps({
                        "query": sql,
                        "executed_sql": api2.last_sql,
                        "routed_rollup": api2.last_routed_rollup,
                        "pruning": api2.last_bloom_pruned,
                        "plan": plan,
                    }, default=_json_default).encode()
                    self._send(200, body)
                except Exception as e:
                    self._send(500, json.dumps(
                        {"error": str(e).split("\n")[0]}).encode())

            def do_GET(self):
                url = urllib.parse.urlparse(self.path)
                if url.path == "/health":
                    self._send(200, b'{"status":"ok"}')
                elif url.path == "/stats":
                    if data_dir is None:
                        self._send(200, b'{"writers":{}}')
                    else:
                        try:
                            body = json.dumps(
                                collect_stats(data_dir),
                                default=_json_default).encode()
                            self._send(200, body)
                        except Exception as e:
                            self._send(500, json.dumps(
                                {"error": str(e).split("\n")[0]}).encode())
                elif url.path == "/query":
                    q = urllib.parse.parse_qs(url.query).get("q", [None])[0]
                    if not q:
                        self._send(400, b'{"error":"missing query parameter q"}')
                    else:
                        self._run_query(q)
                elif url.path == "/explain":
                    q = urllib.parse.parse_qs(url.query).get("q", [None])[0]
                    if not q:
                        self._send(400, b'{"error":"missing query parameter q"}')
                    else:
                        self._explain(q)
                else:
                    self._send(404, b'{"error":"not found"}')

            def do_POST(self):
                url = urllib.parse.urlparse(self.path)
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length).decode("utf-8", "replace")
                if url.path == "/query":
                    try:
                        q = json.loads(body).get("query")
                    except Exception:
                        q = None
                    if not q:
                        self._send(400, b'{"error":"missing query in body"}')
                    else:
                        self._run_query(q)
                elif url.path == "/write":
                    if spool is None:
                        self._send(503, b'{"error":"no write spool configured"}')
                        return
                    lines = [ln for ln in body.splitlines() if ln.strip()]
                    if not lines:
                        self._send(400, b'{"error":"empty body"}')
                        return
                    for ln in lines:
                        spool.append(ln)
                    spool.flush()
                    self._send(201)
                else:
                    self._send(404, b'{"error":"not found"}')

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.port = self.server.server_address[1]
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self.server.shutdown()
        self.server.server_close()
        self._thread.join(timeout=2)
