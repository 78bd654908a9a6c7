"""Sidecar A/B at replication k: the SAME point/range query through the
query API with sidecars present vs absent — the direct measurement of what
file skipping buys (the 100 TB claim, reduced to wall-clock).

Builds ONE 20x (default) events-derived serve table laid out as 48 call
shards + 16 value-range files, indexes call_id (bloom) and value (zone),
plus a documents-derived text corpus (128 shards) with a trigram sidecar
on body (r09c), then times each query both ways, N passes each, reporting
medians and the file accounting. Usage: python tools/sidecar_ab.py [k] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hepop_spark.session import get_spark

N_PASSES = 5


def sweep() -> int:
    """File-count sweep over the SHARDED store (r10): seed a sidecar with
    N entries spread over N/16 partitions, then measure (a) the pure
    store-publish cost of indexing ONE new file and (b) probe latency —
    full-table and within one partition — at each N. The r09 monolith
    rewrote the WHOLE document per update and parsed it whole per cold
    probe, so both terms grew with N; the sharded store's update touches
    one segment + a head and the within-probe opens one segment, so both
    must stay flat. Pure metadata benchmark (no Spark): this isolates
    exactly the term the monolith design coupled to table size.
    Usage: python tools/sidecar_ab.py --sweep [counts...]"""
    import statistics as _st
    import tempfile as _tf
    import time as _t

    from hepop_spark.storage import sidecar
    from hepop_spark.storage.bloom_index import bloom_candidates

    counts = [int(a) for a in sys.argv[2:]] or [128, 384, 1280, 5120]
    out: dict = {"sweep": {}}
    for n in counts:
        d = _tf.mkdtemp(prefix="sidecar_sweep_")
        try:
            base = os.path.join(d, "t")
            os.makedirs(base)
            # small N: realistic 16 files/partition. Large N (r11
            # two-level-head proof): 1 file/partition so the sweep
            # reaches 50k PARTITIONS — the dimension the head scales in
            per_part = 16 if n <= 8192 else 1
            n_parts = max(1, n // per_part)
            # a realistic flush-file bitmap: m=16384 -> 4096 hex chars
            bits = format((1 << 16384) - 1, "x")
            entries = {
                f"date=2024-01-{1 + (i % n_parts):04d}/f{i}.parquet":
                {"m": 16384, "bits": bits}
                for i in range(n)
            }
            # plant data-file stubs so _live_files sees them
            for rel in entries:
                p = os.path.join(base, rel)
                os.makedirs(os.path.dirname(p), exist_ok=True)
                with open(p, "wb") as fh:
                    fh.write(b"PAR1")
            t0 = _t.perf_counter()
            sidecar.update_entries(base, "bloom", "key", entries)
            seed_s = _t.perf_counter() - t0
            # (a) one-file incremental update: the monolith's O(N) term
            upd = []
            for i in range(7):
                rel = f"date=2024-01-0001/new{i}.parquet"
                with open(os.path.join(base, rel), "wb") as fh:
                    fh.write(b"PAR1")
                t0 = _t.perf_counter()
                sidecar.update_entries(base, "bloom", "key",
                                       {rel: {"m": 16384, "bits": bits}})
                upd.append(_t.perf_counter() - t0)
            # (b) probes: cold full (parses every segment once), warm
            # full (segment cache), and within one partition (lazy)
            sidecar._SEG_CACHE.clear()
            t0 = _t.perf_counter()
            bloom_candidates(base, "key", ["probe-x"])
            cold_s = _t.perf_counter() - t0
            warm = []
            for _ in range(7):
                t0 = _t.perf_counter()
                bloom_candidates(base, "key", ["probe-x"])
                warm.append(_t.perf_counter() - t0)
            sidecar._SEG_CACHE.clear()
            part_files = sorted(entries)[:per_part]
            within = []
            for _ in range(7):
                t0 = _t.perf_counter()
                bloom_candidates(base, "key", ["probe-x"],
                                 within=part_files)
                within.append(_t.perf_counter() - t0)
            dd = sidecar.sidecar_dir(base, "bloom", "key")
            objs = os.path.join(dd, sidecar.OBJS_SUBDIR)
            seg_bytes = max(
                os.path.getsize(os.path.join(objs, f))
                for f in os.listdir(objs) if f.startswith("seg-"))
            head_bytes = max(
                os.path.getsize(os.path.join(dd, f))
                for f in os.listdir(dd) if f.startswith("head_v"))
            from hepop_spark.storage.sidecar import load_head as _lh
            _v, _head = _lh(base, "bloom", "key")
            out["sweep"][str(n)] = {
                "partitions": n_parts,
                "head_mode": "grouped" if _head.get("groups") else "flat",
                "seed_s": round(seed_s, 3),
                "update_one_file_median_s": round(_st.median(upd), 4),
                "probe_cold_full_s": round(cold_s, 4),
                "probe_warm_full_median_s": round(_st.median(warm), 4),
                "probe_within_partition_median_s":
                    round(_st.median(within), 4),
                "max_segment_bytes": seg_bytes,
                "head_bytes": head_bytes,
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--sweep":
        return sweep()
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("sidecar-ab")
    d = tempfile.mkdtemp(prefix="sidecar_ab_")
    try:
        from hepop_spark.plans.api import HepopQueryAPI
        from hepop_spark.storage.bloom_index import (
            bloom_index_update,
            zone_index_update,
        )
        from hepop_spark.storage.trigram_index import trigram_index_update

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        reps = spark.range(k).select(F.col("id").alias("rep"))
        big = (
            ev.crossJoin(reps)
            .select(
                (F.col("event_id") + F.col("rep") * 10_000_000)
                .alias("event_id"),
                "value",
            )
            .withColumn("call_id", F.concat(F.lit("call-"), F.col("event_id")))
        )
        data = os.path.join(d, "data")
        tbl = os.path.join(data, "w1", "dbs", "calls")
        # years-of-capture file count: 384 shard files, so the raw path
        # pays real file-open/task overhead and the pruned path opens ~1
        (
            big.withColumn("shard", F.pmod(F.col("event_id"), F.lit(384)))
            .repartition("shard")
            .write.partitionBy("shard").parquet(tbl)
        )
        n_rows = spark.read.parquet(tbl).count()
        bloom_index_update(spark, tbl, "call_id")
        # the range table is RANGE-LAID-OUT on value (zone maps prune
        # nothing on an uncorrelated layout — that is the point of them)
        rtbl = os.path.join(data, "w1", "dbs", "ranges")
        big.repartitionByRange(96, "value").write.parquet(rtbl)
        zone_index_update(spark, rtbl, "value")
        # r09c: text corpus with a trigram sidecar — the LIKE '%x%' probe
        # no point bloom or zone can serve (substring, unordered)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        corpus = (
            docs.crossJoin(reps)
            .select(
                (F.col("doc_id") + F.col("rep") * 10_000_000)
                .alias("doc_id"),
                F.concat(
                    F.col("text"),
                    F.when(
                        (F.col("doc_id") + F.col("rep") * 10_000_000)
                        % 99991 == 0,
                        F.concat(F.lit(" marker-"),
                                 (F.col("doc_id")
                                  + F.col("rep") * 10_000_000)
                                 .cast("string"), F.lit("#")),
                    ).otherwise(F.lit("")),
                ).alias("body"),
            )
        )
        ttbl = os.path.join(data, "w1", "dbs", "corpus")
        (
            corpus.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(128)))
            .repartition("shard").write.partitionBy("shard").parquet(ttbl)
        )
        n_docs = spark.read.parquet(ttbl).count()
        trigram_index_update(spark, ttbl, "body")

        queries = {
            "point": ("SELECT event_id, value FROM calls "
                      "WHERE call_id = 'call-170000123'"),
            "in3": ("SELECT count(*) AS n FROM calls WHERE call_id IN "
                    "('call-7', 'call-50000011', 'call-190000222')"),
            "range": ("SELECT count(*) AS n, sum(value) AS sv FROM ranges "
                      "WHERE value BETWEEN 50 AND 51"),
            "like": ("SELECT doc_id FROM corpus "
                     "WHERE body LIKE '%marker-0#%'"),
        }
        out: dict = {"replication": k, "rows": n_rows, "docs": n_docs}
        bloom_dir = os.path.join(tbl, "_bloom")
        zone_dir = os.path.join(rtbl, "_zone")
        tri_dir = os.path.join(ttbl, "_trigram")
        hidden = os.path.join(d, "hidden")
        for name, sql in queries.items():
            rec: dict = {}
            for mode in ("pruned", "raw"):
                if mode == "raw":
                    # hide the sidecars: the API falls back to full scans
                    os.makedirs(hidden, exist_ok=True)
                    for sd in (bloom_dir, zone_dir, tri_dir):
                        if os.path.isdir(sd):
                            shutil.move(sd, os.path.join(
                                hidden, os.path.basename(sd) + name))
                api = HepopQueryAPI(spark, default_window=False,
                                    data_dir=data)
                times = []
                rows = None
                for _ in range(N_PASSES):
                    t0 = time.perf_counter()
                    rows = api.sql(sql).collect()
                    times.append(time.perf_counter() - t0)
                rec[mode] = {
                    "median_s": round(statistics.median(times), 3),
                    "best_s": round(min(times), 3),
                    "rows": len(rows),
                }
                if mode == "pruned":
                    rec["files"] = api.last_bloom_pruned
                else:
                    assert api.last_bloom_pruned is None
                    for sd in (bloom_dir, zone_dir, tri_dir):
                        h = os.path.join(hidden, os.path.basename(sd) + name)
                        if os.path.isdir(h):
                            shutil.move(h, sd)
            rec["speedup_median"] = round(
                rec["raw"]["median_s"] / max(rec["pruned"]["median_s"], 1e-9),
                2)
            out[name] = rec
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
