"""Per-query job/stage profiler for the bench entries (r12 optimization).

Runs named registry entries under the bench measurement rule (collect, or
count for `_stats` entries) with the Spark event log enabled
(SPARK_GRAFT_EVENTLOG_DIR, session.py), then parses the event log into
per-query job and stage timings so optimization targets the stage that
actually costs, not the one that looks expensive.

Usage: python tools/profile_bench.py [--explain DIR] [sf_dir] name [name ...]

Output per query: total wall, number of Spark jobs, and the top stages by
duration with task counts — enough to attribute time to scheduling
overhead (many small stages) vs real compute (one big stage).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENT_DIR = f"/tmp/spark-events-{os.getpid()}"
os.environ["SPARK_GRAFT_EVENTLOG_DIR"] = EVENT_DIR

from hepop_spark.queries import registry  # noqa: E402
from hepop_spark.session import get_spark  # noqa: E402


def _measure(reg, spark, sf_dir: str, name: str) -> float:
    t0 = time.perf_counter()
    df = reg[name].fn(spark, sf_dir)
    n = df.count() if name.endswith("_stats") else len(df.collect())
    assert n >= 0
    return round(time.perf_counter() - t0, 3)


def parse_event_log(path: str):
    """(jobs, stages): job -> {desc, t0, t1}; stage -> {name, dur, tasks,
    desc} keyed by stage id, desc inherited from the owning job."""
    jobs = {}
    stages = {}
    stage_to_desc = {}
    run_ms: dict[int, int] = {}
    if os.path.isdir(path):
        # Spark 4 rolling event log: a directory of events_N_* files
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.startswith("events_")
        )
    else:
        parts = [path]

    def _lines():
        for p in parts:
            with open(p) as fh:
                yield from fh

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[jid] = {"desc": desc, "t0": ev.get("Submission Time", 0)}
                for sid in ev.get("Stage IDs", []):
                    stage_to_desc[sid] = desc
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev.get("Completion Time", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                t0 = si.get("Submission Time")
                t1 = si.get("Completion Time")
                if t0 and t1:
                    scopes = []
                    for ri in si.get("RDD Info", []):
                        sc = ri.get("Scope")
                        if sc:
                            try:
                                nm = json.loads(sc).get("name", "")
                            except ValueError:
                                nm = ""
                            if nm and nm not in scopes:
                                scopes.append(nm)
                    stages[si["Stage ID"]] = {
                        "name": si.get("Stage Name", ""),
                        "dur": t1 - t0,
                        "tasks": si.get("Number of Tasks", 0),
                        "desc": stage_to_desc.get(si["Stage ID"], ""),
                        "scopes": scopes,
                        "run_ms": 0,
                        "py_ms": 0,
                    }
            elif e == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID")
                tm = ev.get("Task Metrics") or {}
                run_ms[sid] = run_ms.get(sid, 0) + tm.get(
                    "Executor Run Time", 0)
    for sid, s in stages.items():
        s["run_ms"] = run_ms.get(sid, 0)
    return jobs, stages


def main() -> None:
    args = list(sys.argv[1:])
    explain_dir = None
    if args and args[0] == "--explain":
        explain_dir = args[1]
        os.makedirs(explain_dir, exist_ok=True)
        args = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    names = args

    spark = get_spark("hepop-profile")
    assert spark.conf.get("spark.eventLog.enabled") == "true"
    reg = registry()
    sc = spark.sparkContext

    # warm pass (untimed) exactly like bench.py
    for name in names:
        sc.setJobDescription(f"warm:{name}")
        _measure(reg, spark, sf_dir, name)

    walls = {}
    for name in names:
        sc.setJobDescription(f"timed:{name}")
        walls[name] = _measure(reg, spark, sf_dir, name)
    sc.setJobDescription(None)

    if explain_dir:
        for name in names:
            df = reg[name].fn(spark, sf_dir)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(txt)

    app_id = sc.applicationId
    spark.stop()

    log_path = os.path.join(EVENT_DIR, app_id)
    if not os.path.exists(log_path):
        cands = [os.path.join(EVENT_DIR, f) for f in os.listdir(EVENT_DIR)]
        log_path = max(cands, key=os.path.getmtime)
    jobs, stages = parse_event_log(log_path)

    for name in names:
        tag = f"timed:{name}"
        njobs = [j for j in jobs.values() if j["desc"] == tag and "t1" in j]
        jsum = sum(j["t1"] - j["t0"] for j in njobs)
        nstages = sorted(
            (s for s in stages.values() if s["desc"] == tag),
            key=lambda s: -s["dur"],
        )
        ssum = sum(s["dur"] for s in nstages)
        print(f"\n=== {name}: wall {walls[name]:.3f}s, {len(njobs)} jobs "
              f"(sum {jsum/1000:.3f}s), {len(nstages)} stages "
              f"(sum {ssum/1000:.3f}s)")
        for s in nstages[:14]:
            sc = [x for x in s.get("scopes", [])
                  if not x.startswith(("mapPartitions", "Scan parquet"))]
            print(f"    {s['dur']/1000:7.3f}s  {s['tasks']:4d} tasks  "
                  f"run {s['run_ms']/1000:6.2f}s  {' | '.join(sc[:8])[:110]}")


if __name__ == "__main__":
    main()
