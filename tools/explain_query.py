"""Print the formatted physical plan (and optionally the oracle SQL) for
any registry entry — the inspection tool behind plan_audit's assertions.

Usage: python tools/explain_query.py NAME [sf_dir] [--oracle]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hepop_spark.queries import registry
from hepop_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_oracle = "--oracle" in sys.argv
    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    reg = registry()
    if name not in reg:
        import difflib

        close = difflib.get_close_matches(name, reg.keys(), n=5)
        print(f"unknown entry {name!r}; close: {close}")
        return 2
    spec = reg[name]
    spark = get_spark("explain")
    try:
        df = spec.fn(spark, sf_dir)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        print(df._jdf.queryExecution().explainString(mode))
        if show_oracle and spec.oracle:
            print("\n--- oracle SQL ---\n")
            print(spec.oracle.strip())
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
