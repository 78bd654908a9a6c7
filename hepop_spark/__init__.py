"""hepop_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of sipcapture/HEPop.

The reference (/root/reference, read-only) is an ingest + Parquet-storage +
query-router: HEP/Line-Protocol ingest -> time-partitioned Parquet with
zone-map metadata -> SQL delegated to DuckDB (reference: query.js:162-172).
Here, Spark SQL/Catalyst plays DuckDB's role, Structured Streaming plays the
ingest pipeline's role, and partitioned Parquet + footer statistics play the
hand-rolled metadata.json's role.

Layout:
  session     SparkSession factory tuned for large-scale scans
  catalog     view registration over parquet dirs (+ virtual-field views)
  sources/    HEP v3 decapsulation, Line Protocol parsing, landing-zone stream
  functions/  reusable column expression families (json fields, text, vector)
  operators/  composed operators (dedup, similarity, as-of, top-k, sessionize)
  plans/      HEPop query-API semantics (time alias, default window, count())
  storage/    time-partitioned writer + compaction ladder
  streaming/  structured-streaming ingest pipelines
"""

__version__ = "0.1.0"

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

ALL_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")
