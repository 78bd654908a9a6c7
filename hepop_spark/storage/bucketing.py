"""Bucketed tables: pre-shuffled storage for co-located, exchange-free
joins (the missing piece between "parquet files" and "warehouse table"
at 100 TB; the reference has nothing comparable — one more north-star
storage capability).

Writing with bucketBy(n, key) + sortBy(key) hash-partitions rows into n
buckets per partition directory AND records the layout in the catalog;
a join of two tables bucketed on the same key with the same bucket count
needs NO shuffle on either side — Catalyst proves the co-partitioning
from metadata and plans a zero-Exchange sort-merge join. At 100 TB this
converts every repeated fact-to-fact join on the bucket key from two
full-data shuffles into a local merge per bucket.

Bucket-count choice at scale: target ~100-200 MB per bucket file; buckets
are the unit of join parallelism, so n should be >= cluster cores and
ideally a multiple of it. Re-bucketing is a full rewrite — pick the join
key used by the dominant workload (orderkey for order/line fact joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int) -> None:
    """Persist df as a catalog table bucketed+sorted by ``key``."""
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-key same-count bucketed tables. The MERGE hint pins
    sort-merge (ruling broadcast out so the plan shape is deterministic);
    with matching bucket layouts Catalyst plans it with zero Exchange."""
    return spark.sql(f"""
        SELECT /*+ MERGE(l) */ *
        FROM {left_table} l JOIN {right_table} r ON l.{key} = r.{key}
    """)
