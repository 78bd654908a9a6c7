"""Round-7 regression tests: the serve-path truncation-flag race (r06
verdict item 1), load-robust bench record shape, and persisted-store
publish hygiene fixes from r06 ADVICE.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.parse
import urllib.request

import pyspark.sql.functions as F


class TestTruncationRace:
    def test_concurrent_big_and_small_queries_never_mislabel(self, spark):
        """One oversized (must always be 413+truncated) and one small
        (must always be 200, full rows) query race on the
        ThreadingHTTPServer. Before r07 the flag lived on the shared
        HepopQueryAPI instance, so interleaving let a truncated result
        ship as 200 with silently missing rows. Now truncation rides in
        query_json's return value, so every response must be labeled by
        its OWN query's outcome, every time."""
        from hepop_spark.plans.http_server import HepopHttpServer

        spark.range(100).select(F.col("id").alias("v")).createOrReplaceTempView(
            "race_big_t"
        )
        spark.range(3).select(F.col("id").alias("v")).createOrReplaceTempView(
            "race_small_t"
        )
        srv = HepopHttpServer(spark, default_window=False, max_rows=10).start()
        failures: list[str] = []
        barrier = threading.Barrier(2)
        ROUNDS = 12

        def fetch(sql: str):
            url = (
                f"http://127.0.0.1:{srv.port}/query?q="
                + urllib.parse.quote(sql)
            )
            try:
                with urllib.request.urlopen(url, timeout=120) as r:
                    return r.status, json.load(r)
            except urllib.error.HTTPError as e:
                return e.code, json.load(e)

        def big_loop():
            for i in range(ROUNDS):
                barrier.wait(timeout=120)
                code, body = fetch("SELECT v FROM race_big_t ORDER BY v")
                if code != 413 or body.get("truncated") is not True \
                        or len(body.get("rows", [])) != 10:
                    failures.append(f"big round {i}: code={code} body_keys="
                                    f"{sorted(body) if isinstance(body, dict) else 'list'}")

        def small_loop():
            for i in range(ROUNDS):
                barrier.wait(timeout=120)
                code, body = fetch("SELECT v FROM race_small_t ORDER BY v")
                if code != 200 or not isinstance(body, list) or len(body) != 3:
                    failures.append(f"small round {i}: code={code}")

        try:
            threads = [threading.Thread(target=big_loop),
                       threading.Thread(target=small_loop)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
            assert not failures, failures
        finally:
            srv.stop()
            spark.catalog.dropTempView("race_big_t")
            spark.catalog.dropTempView("race_small_t")
