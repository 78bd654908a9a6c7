"""Judged query inventory: every operator from SURVEY.md §2 plus the
LLM-pipeline extensions, each as a (Spark DataFrame callable, ANSI/DuckDB
oracle SQL) pair.

Contract (driver): callable(spark, sf_dir) -> DataFrame; the oracle SQL runs
on DuckDB over the same parquet tables registered as views. Column names are
aligned on both sides; double-typed aggregates are rounded on BOTH sides so
order-insensitive value hashes match despite floating-point summation-order
differences between engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One judged operator: Spark implementation + DuckDB oracle SQL.

    ``oracle`` is None for operators that are not SQL-expressible (custom
    stateful streaming, multimodal stubs) — the driver then records a weaker
    rows-only check.
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def registry() -> dict[str, QuerySpec]:
    from . import (
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
        analytics8,
        analytics9,
        functions_ext,
        functions_ext2,
        functions_ext3,
        llm,
        llm2,
        llm3,
        mining_q,
        pipeline_ops,
        reference_surface,
        scale_paths,
        sources_q,
        streaming_q,
        timeseries,
        udf_surface,
        tpch_more,
        tpch_more2,
        tpch_more3,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (
        reference_surface,
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
        analytics8,
        analytics9,
        mining_q,
        timeseries,
        llm,
        llm2,
        llm3,
        functions_ext,
        functions_ext2,
        functions_ext3,
        tpch_more,
        tpch_more2,
        tpch_more3,
        sources_q,
        scale_paths,
        pipeline_ops,
        streaming_q,
        udf_surface,
    ):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
