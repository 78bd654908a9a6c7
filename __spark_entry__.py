"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in the hepop_spark package; this module is a thin
adapter over hepop_spark.queries.registry().
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hepop_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-shaped 6-way join
    (revenue by nation), the reference's README.md:216 GROUP-BY+ORDER-BY
    shape scaled up to a full multi-join analytics pipeline."""
    from hepop_spark.queries.analytics import q5_local_supplier

    return q5_local_supplier(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (omitted for ops that are
    not SQL-expressible; the driver then records a rows-only check)."""
    return {
        name: spec.oracle for name, spec in registry().items() if spec.oracle is not None
    }
