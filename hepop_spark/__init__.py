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


def sql(spark, query: str, data_dir: str | None = None,
        default_window: bool = False, now=None):
    """Routed SQL entry point for notebooks / BI tools (r09 verdict
    item 3): the same rollup-grid routing, sidecar file skipping
    (bloom/zone/trigram) and serve-table discovery the HTTP `/query`
    endpoint applies, WITHOUT running an HTTP server. A bare
    `spark.sql(text)` over registered views gets partition/footer
    pruning only; `hepop_spark.sql(spark, text, data_dir=...)` gets the
    full routed path — at 100 TB the routed path is the only fast path,
    so this is the surface non-serve consumers should call.

    `data_dir` is the serve storage root ({data_dir}/*/dbs/{table});
    None degrades gracefully to plain spark.sql semantics (count()
    normalization, optional default window). `default_window=True`
    restores the reference's implicit last-10-minutes window
    (query.js:110-117); analytics callers usually want it off. Routing
    state (view fingerprints, discovered tables) is cached per
    (session, data_dir, default_window), so repeated dashboard calls
    pay one stat per table, not a rediscovery.
    """
    from .plans.api import HepopQueryAPI, _FROM_RE, normalize_count

    if not _FROM_RE.search(query):
        # FROM-less statements (SELECT 1, SHOW ...) have no table to
        # route or discover; the /query endpoint rejects them (reference
        # parity) but the notebook surface should just answer them
        return spark.sql(normalize_count(query))
    key = (spark, data_dir, default_window)
    api = _SQL_APIS.get(key)
    if api is None:
        if len(_SQL_APIS) > 64:  # bound growth across many temp dirs
            _SQL_APIS.clear()
        api = _SQL_APIS[key] = HepopQueryAPI(
            spark, default_window=default_window, data_dir=data_dir)
    return api.sql(query, now=now)


_SQL_APIS: dict = {}

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
