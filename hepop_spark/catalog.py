"""Table/view registration over parquet directories.

The reference resolves `FROM hep_(\\d+)` to an integer HEP type and any other
name to a Line-Protocol measurement, then reads the matching parquet file set
(reference: query.js:71-84, 144-172).  Here every logical table is simply a
Spark view over a parquet path; Catalyst's file index + footer statistics
replace the hand-rolled metadata.json zone maps (reference: hepop.js:96-106).

Also provides the *documented* virtual-field surface (reference README.md:
138-147): `time` aliases the timestamp and `src_ip`/`dst_ip`/`src_port`/
`dst_port` are extracted from the JSON protocol-header column at query time.
The shipped reference never implemented this explosion (SURVEY §1.2); we
implement the documented semantics as a view so both layers are honest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ALL_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_nanos(df: DataFrame, cols=("ts",)) -> DataFrame:
    """Parquet TIMESTAMP(NANOS) columns arrive as long (nanosAsLong config);
    convert to microsecond TimestampType with integer division (floor-trunc,
    matching DuckDB's ns->us read). Integer `div`, not `/`: double math loses
    precision above 2^53 ns."""
    for c in cols:
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return normalize_nanos(spark.read.parquet(table_path(sf_dir, name)))


def register_views(spark: SparkSession, sf_dir: str, tables=ALL_TABLES) -> None:
    """Register each parquet table as a temp view named after the table."""
    for name in tables:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def hep_virtual_view(df: DataFrame, rcinfo_col: str = "rcinfo",
                     ts_col: str = "timestamp") -> DataFrame:
    """Documented HEP query surface (reference README.md:138-147).

    `get_json_object` stays JVM-side (Jackson, codegen'd) — no Python UDF in
    the hot path; at 100 TB this runs inside whole-stage codegen right after
    the parquet scan, and unreferenced virtual columns are pruned by Catalyst.
    """
    return df.select(
        F.col(ts_col).alias("time"),
        F.get_json_object(F.col(rcinfo_col), "$.srcIp").alias("src_ip"),
        F.get_json_object(F.col(rcinfo_col), "$.dstIp").alias("dst_ip"),
        F.get_json_object(F.col(rcinfo_col), "$.srcPort").cast("int").alias("src_port"),
        F.get_json_object(F.col(rcinfo_col), "$.dstPort").cast("int").alias("dst_port"),
        "*",
    )


def register_hep_view(spark: SparkSession, parquet_glob: str, name: str) -> None:
    """Register a HEP table (fixed 3-column schema, reference hepop.js:20-24)
    with its documented virtual fields."""
    hep_virtual_view(spark.read.parquet(parquet_glob)).createOrReplaceTempView(name)
