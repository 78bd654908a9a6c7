"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables, then
compare row count, column names, and order-insensitive values.

Usage: python tools/check_parity.py [--vanilla] [--log FILE] [sf_dir] [query_name ...]

--vanilla builds a DEFAULT SparkSession (no tuned confs) like the driver
does, so parity is measured against driver reality, not the builder's
session. (r01 lesson: 4 queries passed under get_spark() but crashed under
the driver's default session on TIMESTAMP_NTZ reads.)

--log FILE tees the sweep's own lines (not Spark's stage spam) to
FILE.inprogress and renames to FILE only when the sweep COMPLETES — a
killed or mid-run sweep can never leave a truncated log at the final name
masquerading as a finished one (r07 verdict "what's wrong" item 1).
"""

from __future__ import annotations

import math
import os
import sys
import time

# the checkout CONTAINING this tools/ dir — not a hard-coded path,
# so the harness drives the code it sits next to (worktree A/Bs too)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hepop_spark import ALL_TABLES
from hepop_spark.session import get_spark


def duck_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(v) -> str:
    """Canonicalize a cell to a sortable string for order-insensitive compare."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{round(v, 9)!r}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def rows_key(rows):
    return sorted(tuple(canon(c) for c in r) for r in rows)


# --- driver-canonicalizer edge shapes (r02 insurance) -----------------------
# The driver sorts both result frames in pandas and hashes stringified
# values. Two shapes are builder-green but driver-red:
#   * array/map/struct result columns — pandas lexsort dies on unhashable
#     list cells (the r02 multimodal_features ERR);
#   * DuckDB HUGEINT (int128) aggregates — sum(INTEGER) widens to HUGEINT,
#     which the driver's hasher stringifies differently from Spark's BIGINT
#     (the r02 ohlc_bars hash red). Oracles must CAST(... AS BIGINT).
# These lints make the local gate STRICTER than the driver so builder-green
# always implies driver-green.

_SPARK_UNSAFE = ("array<", "map<", "struct<", "binary")


def spark_driver_unsafe(sdf) -> list[str]:
    return [
        f"{name}:{dtype}"
        for name, dtype in sdf.dtypes
        if any(dtype.startswith(u) or dtype == u for u in _SPARK_UNSAFE)
    ]


def duck_driver_unsafe(con, oracle_sql: str) -> list[str]:
    try:
        desc = con.execute(f"DESCRIBE {oracle_sql}").fetchall()
    except Exception:
        return []  # DESCRIBE unsupported for this statement shape
    bad = []
    for row in desc:
        cname, ctype = row[0], str(row[1]).upper()
        if "HUGEINT" in ctype:
            bad.append(f"{cname}:{ctype} (CAST to BIGINT in the oracle)")
        if ctype.endswith("[]") or ctype.startswith(("STRUCT", "MAP", "LIST")):
            bad.append(f"{cname}:{ctype} (serialize to string)")
    return bad


class _Tee:
    def __init__(self, fh):
        self.fh = fh
        self.stdout = sys.stdout

    def write(self, s):
        self.stdout.write(s)
        self.fh.write(s)

    def flush(self):
        self.stdout.flush()
        self.fh.flush()


def main() -> int:
    import os

    args = sys.argv[1:]
    log_path = None
    if "--log" in args:
        i = args.index("--log")
        log_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    vanilla = "--vanilla" in args
    argv = [a for a in args if a != "--vanilla"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    if log_path is None:
        return _run(vanilla, sf_dir, only)
    tmp = log_path + ".inprogress"
    fh = open(tmp, "w")
    real_stdout = sys.stdout
    sys.stdout = _Tee(fh)
    try:
        rc = _run(vanilla, sf_dir, only)
    finally:
        sys.stdout = real_stdout
        fh.close()
    os.rename(tmp, log_path)  # completion is the ONLY path to the name
    return rc


def _run(vanilla: bool, sf_dir: str, only: set[str]) -> int:

    from hepop_spark.queries import registry

    reg = registry()
    if vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName(
            "parity-vanilla"
        ).getOrCreate()
    else:
        spark = get_spark("parity-check")
    con = duck_connection(sf_dir)

    failures = []
    attempted = 0
    for name, spec in sorted(reg.items()):
        if only and name not in only:
            continue
        attempted += 1
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            unsafe = spark_driver_unsafe(sdf)
            if unsafe:
                failures.append(name)
                print(f"FAIL {name}: driver-unsafe result columns {unsafe}")
                continue
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        dunsafe = duck_driver_unsafe(con, spec.oracle)
        if dunsafe:
            failures.append(name)
            print(f"FAIL {name}: driver-unsafe oracle columns {dunsafe}")
            continue
        try:
            res = con.execute(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        status = []
        if scols != dcols:
            status.append(f"cols spark={scols} duck={dcols}")
        if len(srows) != len(drows):
            status.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        elif rows_key(srows) != rows_key(drows):
            sk, dk = rows_key(srows), rows_key(drows)
            diff = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
            status.append(f"values differ, first diffs: {diff}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"ok   {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")

    # report what was actually RUN: a subset invocation must not print
    # registry-size arithmetic that overstates coverage (r04 verdict item 5)
    if attempted == len(reg):
        print(f"\n{attempted - len(failures)}/{attempted} passed")
    else:
        print(
            f"\n{attempted - len(failures)}/{attempted} passed "
            f"(subset of {len(reg)}-entry registry)"
        )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
