"""Round-8: aggregate->rollup query routing (r07 verdict item 3).

The maintained projection stores (storage/rollup.py) were queryable as
named tables since r07, but the "continuous aggregation" promise required
knowing the rollup's name. plans/api.py now rewrites a user's MATCHING
aggregate over the RAW table onto the grid (the Timescale
continuous-aggregate / materialized-view-routing shape); this module pins
the behavior under the oracle gate: the judged entry issues the SAME SQL
text a user would run against the raw documents table, asserts the API
routed it to the rollup grid (and that the physical plan scans the
store's parquet, never the raw table), and the DuckDB oracle computes the
aggregate from the raw table — a grid that lost a batch, double-counted a
fold, or mis-mapped an expression all fail the hash.

Reference scope: north-star extension. The reference re-scans raw rows
for every aggregate (query.js delegates the full scan to DuckDB); routing
is the piece that makes maintained rollups an OPTIMIZATION rather than a
parallel API.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import local_result, load_table
from . import QuerySpec

ROLLUP_ROUTE_BATCHES = 4

# the SAME SQL text runs as the Spark entry (routed) and, over the raw
# documents view, as the DuckDB oracle (modulo the HUGEINT->BIGINT casts
# the driver canonicalizer requires)
ROUTED_SQL_TEXT = (
    "SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars "
    "FROM documents GROUP BY lang ORDER BY lang"
)


def _build_rollup_serve_tree(spark: SparkSession, sf: str) -> tuple[str, str]:
    """A temp serve layout: the raw documents table under w1/dbs AND a
    maintained (lang, source) rollup grid under w1/rollups, appended in
    ROLLUP_ROUTE_BATCHES per-batch partials then folded once — the state
    a live ingest + serve sweep produces. Returns (root, data_dir)."""
    from ..storage.rollup import projection_append, projection_compact

    docs = load_table(spark, sf, "documents")
    root = tempfile.mkdtemp(prefix="rollup_route_")
    data = os.path.join(root, "data")
    store = os.path.join(data, "w1", "rollups", "doc_lang_rollup")
    keys = ["lang", "source"]
    sums = ["n_docs", "total_chars", "cnt_chars"]
    mins, maxs = ["min_chars"], ["max_chars"]

    # r12 (second pass): ONE corpus scan computes every batch's partial.
    # The testdata file is a single unsplittable row group, so each of the
    # four per-batch aggregations re-ran the whole scan serially on one
    # core (guide §2.4: don't compute things twice). Grouping by
    # (batch, lang, source) in one pass and slicing per batch yields
    # BIT-IDENTICAL partials — filter-then-group equals group-with-batch-
    # key-then-slice for these monoid aggregates — and the checkpoint
    # materializes ~batches x |grid| tiny rows, never raw docs.
    pre = (
        docs.withColumn("bat", F.col("doc_id") % ROLLUP_ROUTE_BATCHES)
        .groupBy("bat", "lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            # the strict avg denominator: count(n_chars), NOT
            # count(*) — null-correct, so avg(n_chars) can route
            F.count("n_chars").alias("cnt_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .localCheckpoint(eager=True)
    )

    def _append_batch(b: int) -> None:
        part = pre.filter(F.col("bat") == b).drop("bat")
        projection_append(
            spark, store, part, f"b{b}", keys=keys, sums=sums,
            mins=mins, maxs=maxs,
            source={
                "table": "documents",
                "keys": {"lang": "lang", "source": "source"},
                "sums": {"n_docs": "count(*)",
                         "total_chars": "sum(n_chars)",
                         "cnt_chars": "count(n_chars)"},
                "mins": {"min_chars": "min(n_chars)"},
                "maxs": {"max_chars": "max(n_chars)"},
            },
        )

    # r12: the batch appends are independent micro-batches (distinct ids,
    # immutable segments), so overlap them from a small thread pool — the
    # optimization guide's §2.6 back-fill pattern. projection_append now
    # materializes each segment OUTSIDE the store lock, so the Spark jobs
    # genuinely run concurrently; segment content and the folded result are
    # order-independent by the monoid-merge contract.
    from concurrent.futures import ThreadPoolExecutor

    def _write_raw() -> None:
        docs.write.mode("overwrite").parquet(
            os.path.join(data, "w1", "dbs", "documents")
        )

    with ThreadPoolExecutor(max_workers=3) as pool:
        raw_fut = pool.submit(_write_raw)
        list(pool.map(_append_batch, range(ROLLUP_ROUTE_BATCHES)))
        raw_fut.result()
    # fold half the segments into base/ so routing reads the post-compaction
    # store shape, then leave later segments live (the steady-state mix)
    projection_compact(spark, store, keys, sums, mins, maxs)
    return root, data


def _routed_df(spark: SparkSession, data: str,
               sql: str | None = None) -> DataFrame:
    from ..plans.api import HepopQueryAPI

    api = HepopQueryAPI(spark, default_window=False, data_dir=data)
    df = api.sql(sql or ROUTED_SQL_TEXT)
    if api.last_routed_rollup != "doc_lang_rollup":
        raise AssertionError(
            f"aggregate was not routed to the rollup grid "
            f"(last_routed_rollup={api.last_routed_rollup!r})"
        )
    return df


def rollup_routed_aggregate(spark: SparkSession, sf: str) -> DataFrame:
    """A user aggregate over the RAW documents table, answered from the
    maintained rollup grid by the API layer's routing rewrite. The query
    groups by a SUBSET of the grid's keys (lang, of the grid's
    lang x source), so the rewrite re-aggregates the grid — the monoid
    law that makes the grid answer coarser questions than it was built
    for. The entry hard-fails if routing did not happen or if the
    physical plan touches the raw table.

    Scale: the routed plan scans O(|grid|) pre-aggregated rows (here
    ~langs x sources) instead of O(|corpus|) documents — the entire point
    of maintaining the rollup at ingest."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "lang string, n_docs bigint, total_chars bigint"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_plan_text(spark: SparkSession, sf: str,
                     sql: str | None = None) -> str:
    """The routed query's FORMATTED plan, for tools/plan_audit.py (the
    judged entry returns collected rows, so the audit probes the live
    routed DataFrame instead)."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, sql)
        jdf = df._jdf
        mode = (
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        return jdf.queryExecution().explainString(mode)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_filtered_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, FILTERED_SQL_TEXT)


# WHERE on a grid key: the conjunct rewrites onto the grid column, so the
# routed plan both scans the grid AND pushes the key filter into that scan
FILTERED_SQL_TEXT = (
    "SELECT source, count(*) AS n_docs, sum(n_chars) AS total_chars "
    "FROM documents WHERE lang IN ('en', 'de') "
    "GROUP BY source ORDER BY source"
)


def rollup_routed_filtered(spark: SparkSession, sf: str) -> DataFrame:
    """The filtered continuous-aggregate shape (r08 routing extension): a
    WHERE over a GRID KEY routes with the predicate rewritten onto the
    grid column — filtering a key merely SELECTS pre-aggregated rows, so
    results are exact; a filter on any raw measure column falls back to
    the raw scan (pinned by tests). Here the query filters one key (lang)
    and groups by the other (source), so the rewrite both filters and
    re-aggregates the grid.

    Scale: the routed plan scans O(|grid|) rows with the key predicate
    pushed into the grid's parquet scan — the dashboard query shape that
    motivates maintaining the rollup at all."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, FILTERED_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "source string, n_docs bigint, total_chars bigint"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


ROLLUP_FILTERED_SQL = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE lang IN ('en', 'de')
GROUP BY source
ORDER BY source
"""


ROLLUP_ROUTED_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


# min/max re-aggregate over a key-subset grouping exactly like sums do
# (all four are commutative monoids) — r09 widens the routed surface to
# the full monoid family Timescale-style continuous aggregates carry
MINMAX_SQL_TEXT = (
    "SELECT lang, min(n_chars) AS min_chars, max(n_chars) AS max_chars, "
    "sum(n_chars) AS total_chars FROM documents "
    "GROUP BY lang ORDER BY lang"
)


def routed_minmax_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, MINMAX_SQL_TEXT)


def rollup_routed_minmax(spark: SparkSession, sf: str) -> DataFrame:
    """MIN/MAX continuous aggregation (r09): the maintained grid carries
    extremum columns merged with the MIN/MAX monoid (storage/rollup.py
    merge_aggs), and the API routing rewrite maps a user's min()/max()
    over the raw table onto them — re-aggregating when the GROUP BY is a
    key subset, exactly as sums do. A grid that SUM-merged an extremum
    column anywhere (append, fold, federation, routing) fails the
    oracle, which recomputes from raw.

    Scale: same O(|grid|) routed scan as the sum entries; extrema add no
    shuffle — they ride the same partial-aggregate segments."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, MINMAX_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows,
            "lang string, min_chars bigint, max_chars bigint, "
            "total_chars bigint",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# avg is not a monoid, but it is DERIVABLE: the grid carries sum(n_chars)
# and the strict count(n_chars) denominator, and the routing rewrite
# finalizes SUM(sums)/SUM(counts) — one IEEE division of exact BIGINT
# sums, reproducible in any engine
AVG_SQL_TEXT = (
    "SELECT lang, avg(n_chars) AS avg_chars, count(*) AS n_docs "
    "FROM documents GROUP BY lang ORDER BY lang"
)


def routed_avg_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, AVG_SQL_TEXT)


def rollup_routed_avg(spark: SparkSession, sf: str) -> DataFrame:
    """avg() continuous aggregation (r09): avg never rides the grid as a
    stored column (not a monoid — the module doc of storage/rollup.py);
    instead the routing rewrite FINALIZES it from the grid's sum(X) and
    strict count(X) partials, re-merged across the key-subset grouping.
    The division happens once, over exact integer sums, so the oracle's
    unrounded quotient from raw matches bit-for-bit (the established
    exact-integer-ratio parity rule). A grid lacking count(X) — count(*)
    is NOT accepted as a stand-in, nulls would skew it — falls back to
    the raw scan, pinned by tests."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, AVG_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "lang string, avg_chars double, n_docs bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


ROLLUP_AVG_SQL = """
SELECT lang,
       CAST(sum(n_chars) AS DOUBLE) / count(n_chars) AS avg_chars,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY lang
ORDER BY lang
"""


ROLLUP_MINMAX_SQL = """
SELECT lang,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""



# ---------------------------------------------------------------------------
# rollup_routed_timegrid — continuous aggregation over the TIME dimension
# ---------------------------------------------------------------------------

TIMEGRID_BATCHES = 3
# the hour bucket as an EXPRESSION grid key: the routing matcher proves
# the user's GROUP BY expression equals the grid's source expression
# (normalized), the aliased-expression-key path hardened by the r08
# ADVICE fix
HR_EXPR = "date_format(ts, 'yyyy-MM-dd-HH')"

TIMEGRID_SQL_TEXT = (
    f"SELECT {HR_EXPR} AS hr, count(*) AS n, sum(user_id) AS su, "
    f"max(event_id) AS max_eid FROM events_rt "
    f"GROUP BY {HR_EXPR} ORDER BY hr"
)


def _build_timegrid_tree(spark: SparkSession, sf: str) -> tuple[str, str]:
    """events under w1/dbs/events_rt plus an HOURLY (hr, event_type) grid
    under w1/rollups — the continuous-aggregate deployment shape for a
    time-series table."""
    from ..storage.rollup import projection_append, projection_compact

    ev = load_table(spark, sf, "events").select(
        "event_id", "ts", "user_id", "event_type")
    root = tempfile.mkdtemp(prefix="timegrid_route_")
    data = os.path.join(root, "data")
    store = os.path.join(data, "w1", "rollups", "events_hourly")
    keys, sums, maxs = ["hr", "event_type"], ["n", "su"], ["max_eid"]

    # r12: one scan for all three batch partials (bit-identical monoid
    # slices — see _build_rollup_serve_tree), raw write overlapped with
    # the appends from a small pool (guide §2.6)
    pre = (
        ev.withColumn("bat", F.col("event_id") % TIMEGRID_BATCHES)
        .groupBy(
            "bat",
            F.date_format("ts", "yyyy-MM-dd-HH").alias("hr"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.sum("user_id").alias("su"),
             F.max("event_id").alias("max_eid"))
        .localCheckpoint(eager=True)
    )

    def _append_batch(b: int) -> None:
        part = pre.filter(F.col("bat") == b).drop("bat")
        projection_append(
            spark, store, part, f"b{b}", keys=keys, sums=sums, maxs=maxs,
            source={
                "table": "events_rt",
                "keys": {"hr": HR_EXPR, "event_type": "event_type"},
                "sums": {"n": "count(*)", "su": "sum(user_id)"},
                "maxs": {"max_eid": "max(event_id)"},
            },
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        raw_fut = pool.submit(
            lambda: ev.write.mode("overwrite").parquet(
                os.path.join(data, "w1", "dbs", "events_rt")))
        list(pool.map(_append_batch, range(TIMEGRID_BATCHES)))
        raw_fut.result()
    projection_compact(spark, store, keys, sums, maxs=maxs)
    return root, data


def routed_timegrid_plan_text(spark: SparkSession, sf: str) -> str:
    from ..plans.api import HepopQueryAPI

    root, data = _build_timegrid_tree(spark, sf)
    try:
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        df = api.sql(TIMEGRID_SQL_TEXT)
        if api.last_routed_rollup != "events_hourly":
            raise AssertionError(
                f"not routed (last={api.last_routed_rollup!r})")
        mode = (
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        return df._jdf.queryExecution().explainString(mode)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def rollup_routed_timegrid(spark: SparkSession, sf: str) -> DataFrame:
    """The Timescale continuous-aggregate headline shape, routed end to
    end: an HOURLY (hr, event_type) grid is maintained from the events
    table (3 per-batch partials + a fold); a user's hourly aggregate —
    GROUP BY the same date_format expression, aliased — is rewritten
    onto the grid with the event_type dimension re-aggregated away
    (sums by SUM, the extremum by MAX). The query runs with the default
    window OFF (a deployment that routes time-bearing tables opts out of
    the implicit last-10-minutes window; with it on, routing correctly
    refuses — pinned by r08 tests).

    Scale: the dashboard query reads O(hours x event_types) grid rows
    instead of O(events) raw rows — at 100 TB that is the difference
    between milliseconds and a full scan."""
    root, data = _build_timegrid_tree(spark, sf)
    try:
        from ..plans.api import HepopQueryAPI

        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        df = api.sql(TIMEGRID_SQL_TEXT)
        if api.last_routed_rollup != "events_hourly":
            raise AssertionError(
                f"not routed (last={api.last_routed_rollup!r})")
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "hr string, n bigint, su bigint, max_eid bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


ROLLUP_TIMEGRID_SQL = """
SELECT strftime(ts, '%Y-%m-%d-%H') AS hr,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(user_id) AS BIGINT) AS su,
       CAST(max(event_id) AS BIGINT) AS max_eid
FROM events
GROUP BY strftime(ts, '%Y-%m-%d-%H')
ORDER BY hr
"""



# WHERE with a RANGE on the time-grid key (r09): BETWEEN and ordered
# comparisons against literals are pure row-filters on a grid key, so
# the routed grid selection stays exact — the "dashboard over the last
# N hours" shape that motivates time-grid rollups in the first place
TIMERANGE_SQL_TEXT = (
    f"SELECT event_type, count(*) AS n, sum(user_id) AS su "
    f"FROM events_rt "
    f"WHERE {HR_EXPR} BETWEEN '2024-01-10-00' AND '2024-01-12-23' "
    f"GROUP BY event_type ORDER BY event_type"
)


def routed_timerange_plan_text(spark: SparkSession, sf: str) -> str:
    from ..plans.api import HepopQueryAPI

    root, data = _build_timegrid_tree(spark, sf)
    try:
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        df = api.sql(TIMERANGE_SQL_TEXT)
        if api.last_routed_rollup != "events_hourly":
            raise AssertionError(
                f"not routed (last={api.last_routed_rollup!r})")
        mode = (
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        return df._jdf.queryExecution().explainString(mode)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def rollup_routed_timerange(spark: SparkSession, sf: str) -> DataFrame:
    """Time-RANGE routing (r09): the user filters a window of hours with
    BETWEEN on the same date_format expression the grid is keyed by, and
    groups by the other key (event_type) — the rewrite selects the grid
    rows inside the range (predicate pushed into the grid's parquet
    scan), re-aggregates the hour dimension away, and never touches raw
    events. Range conjuncts on grid keys are exact for the same reason
    equality is: they only SELECT pre-aggregated rows.

    Scale: a three-day dashboard window reads O(72 x event_types) grid
    rows with the range pushed to the scan — independent of how many
    raw events the window covers."""
    root, data = _build_timegrid_tree(spark, sf)
    try:
        from ..plans.api import HepopQueryAPI

        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        df = api.sql(TIMERANGE_SQL_TEXT)
        if api.last_routed_rollup != "events_hourly":
            raise AssertionError(
                f"not routed (last={api.last_routed_rollup!r})")
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "event_type string, n bigint, su bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


ROLLUP_TIMERANGE_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(user_id) AS BIGINT) AS su
FROM events
WHERE strftime(ts, '%Y-%m-%d-%H') BETWEEN '2024-01-10-00' AND '2024-01-12-23'
GROUP BY event_type
ORDER BY event_type
"""



# count(DISTINCT key) through the grid (r09): each grid row IS one
# distinct key combination, so the distinct count of a non-grouped grid
# key is a plain COUNT of non-null grid rows — the classic
# materialized-view distinct rewrite, exact (never a sketch)
CNTD_SQL_TEXT = (
    "SELECT source, count(distinct lang) AS n_langs, "
    "sum(n_chars) AS total_chars FROM documents "
    "GROUP BY source ORDER BY source"
)


def routed_cntd_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, CNTD_SQL_TEXT)


def rollup_routed_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT count(distinct X) answered from the maintained grid: X
    (lang) is a grid key outside the GROUP BY (source), and the grid has
    no dimensions beyond (source, lang) — so each (source, lang) grid
    row is one distinct pair and COUNT(lang) per source IS
    count(distinct lang). COUNT of the key column (not COUNT(*)) keeps
    null-key rows out, matching count(distinct) null semantics. The
    companion sum re-aggregates over the lang dimension in the same
    routed scan. Routing refuses whenever the grid carries an extra
    dimension (it would repeat pairs) — pinned by tests.

    Scale: distinct-count queries are why engines grow sketches; when a
    maintained grid already materializes the key combination, the EXACT
    answer costs one O(|grid|) scan — no raw-table distinct shuffle at
    all (compare kmv_distinct_maintained for the approximate path when
    the key domain itself is too big to grid)."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, CNTD_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "source string, n_langs bigint, total_chars bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


ROLLUP_CNTD_SQL = """
SELECT source,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY source
ORDER BY source
"""




# --- r09: Bloom sidecar point-lookup routing -------------------------------

BLOOM_ROUTE_IDS = (7, 311, 522)
BLOOM_ROUTED_SQL_TEXT = (
    "SELECT event_id, call_id, value FROM calls WHERE call_id IN ("
    + ", ".join(f"'call-{i}'" for i in BLOOM_ROUTE_IDS)
    + ") ORDER BY event_id"
)


def bloom_routed_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """The SAME /query SQL a user runs against a serve-mode call table,
    answered from a Bloom-pruned file set by the API layer
    (plans/api._try_bloom_sql over storage/bloom_index.py): the WHERE's
    IN conjunct on the sidecar-indexed call_id admits a handful of files,
    the per-query pruned view scans only those, and the predicate still
    runs (no false negatives => result-invisible). The entry hard-fails
    unless pruning actually happened (breadcrumb files_read <
    files_live); the oracle recomputes from the raw events table.

    Scale: the probe is driver-side bitmap math (no Spark job); the read
    opens ~|probes| files out of the table's thousands — the call-ID
    lookup a HEPop operator runs against years of capture."""
    from ..plans.api import HepopQueryAPI
    from ..storage.bloom_index import bloom_index_update

    ev = load_table(spark, sf, "events").select(
        "event_id",
        F.concat(F.lit("call-"), F.col("event_id")).alias("call_id"),
        "value",
        F.pmod(F.col("event_id"), F.lit(24)).alias("shard"),
    )
    root = tempfile.mkdtemp(prefix="bloom_route_")
    data = os.path.join(root, "data")
    try:
        tbl = os.path.join(data, "w1", "dbs", "calls")
        ev.repartition("shard").write.partitionBy("shard").parquet(tbl)
        bloom_index_update(spark, tbl, "call_id")
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        df = api.sql(BLOOM_ROUTED_SQL_TEXT)
        bp = api.last_bloom_pruned
        if not bp or bp["files_read"] >= bp["files_live"]:
            raise AssertionError(f"bloom pruning did not engage: {bp}")
        rows = df.collect()
        return local_result(spark, 
            rows, "event_id bigint, call_id string, value double")
    finally:
        shutil.rmtree(root, ignore_errors=True)


BLOOM_ROUTED_SQL = f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       'call-' || CAST(event_id AS VARCHAR) AS call_id,
       value
FROM events
WHERE event_id IN {BLOOM_ROUTE_IDS}
ORDER BY event_id
"""





# --- r09: HAVING routing ----------------------------------------------------

HAVING_SQL_TEXT = (
    "SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars, "
    "avg(n_chars) AS avg_chars FROM documents GROUP BY lang "
    "HAVING avg(n_chars) > 300 AND count(*) >= 50 ORDER BY lang"
)


def routed_having_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, HAVING_SQL_TEXT)


def rollup_routed_having(spark: SparkSession, sf: str) -> DataFrame:
    """HAVING routes too (r09): the structural HAVING clause is parsed as
    AND-ed `expr op literal` comparisons and each side maps through the
    SAME key/agg/avg rewrite as select items — `count(*) >= 50` becomes
    `SUM(n_docs) >= 50` over the re-merged grid, `avg(n_chars) > 300`
    becomes the finalized `SUM(sums)/SUM(counts) > 300` division of exact
    integer partials (bit-equal to raw avg). Group-level filtering after
    re-aggregation is exactly SQL HAVING semantics, so routed results
    stay exact; any HAVING expression the grid cannot express falls back
    to the raw scan (pinned by tests). The entry hard-fails unless the
    plan scans the grid and never the raw table.

    Scale: the HAVING runs over O(|grid|) re-merged rows — the dashboard
    "alert on groups past a threshold" shape without re-scanning raws."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, HAVING_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows,
            "lang string, n_docs bigint, total_chars bigint, "
            "avg_chars double")
    finally:
        shutil.rmtree(root, ignore_errors=True)


ROLLUP_HAVING_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_chars) AS DOUBLE) / count(n_chars) AS avg_chars
FROM documents
GROUP BY lang
HAVING CAST(sum(n_chars) AS DOUBLE) / count(n_chars) > 300
   AND count(*) >= 50
ORDER BY lang
"""


# --- r11: boolean-tree HAVING routing (the r10 post-gate increment,
# judged entry deferred to this round per SURVEY §13.9) -----------------------

# deliberately UNPARENTHESIZED: OR binds loosest, so the tree is
# count>=200 OR (count>=60 AND avg>300). The r10 AND-first parse grouped
# it as (count>=200 OR count>=60) AND avg>300, which EXCLUDES 'en'
# (avg ~295 at sf0.01) — this entry's oracle would catch that silently-
# wrong aggregate, pinning both the boolean-tree rewrite and the
# precedence fix in the hard gate.
HAVING_OR_SQL_TEXT = (
    "SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars "
    "FROM documents GROUP BY lang "
    "HAVING count(*) >= 200 OR count(*) >= 60 AND avg(n_chars) > 300 "
    "ORDER BY lang"
)


def rollup_routed_having_or(spark: SparkSession, sf: str) -> DataFrame:
    """Boolean-tree HAVING routing (r10 item 9, judged in r11): a
    disjunctive HAVING parses to a PROVEN tree (plans/api._where_tree,
    OR splits before AND — SQL precedence) and routes when EVERY leaf
    maps through the key/agg/avg rewrite: `count(*)` becomes
    SUM(n_docs) over the re-merged grid, `avg(n_chars)` the finalized
    SUM(sums)/SUM(cnts) division of exact integer partials. Group-level
    filters of mapped comparisons are exact for ANY boolean structure
    because HAVING runs on the re-aggregated grid rows. Unmapped leaves
    (sum of a non-grid column) fall back to raw (pinned in
    tests/test_round10b.py); mis-precedence is caught by this entry's
    oracle (see HAVING_OR_SQL_TEXT note). The entry hard-fails unless
    the plan scans the grid and never the raw table.

    Scale: O(|grid|) re-merged rows answer the "alert on groups past
    EITHER threshold" dashboard shape without re-scanning raws.
    Reference parity: the reference has no HAVING at all (query.js
    delegates verbatim) — north-star surface."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, HAVING_OR_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "lang string, n_docs bigint, total_chars bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_having_or_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, HAVING_OR_SQL_TEXT)


ROLLUP_HAVING_OR_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
HAVING count(*) >= 200
    OR count(*) >= 60
       AND CAST(sum(n_chars) AS DOUBLE) / count(n_chars) > 300
ORDER BY lang
"""


# --- r11: CTE-wrapped aggregate routing (r10 verdict item 6) ------------------

CTE_ROUTED_SQL_TEXT = (
    "WITH agg AS (SELECT lang, count(*) AS n_docs, "
    "sum(n_chars) AS total_chars FROM documents GROUP BY lang) "
    "SELECT lang, n_docs, total_chars FROM agg "
    "WHERE n_docs >= 60 ORDER BY lang"
)


def rollup_routed_cte(spark: SparkSession, sf: str) -> DataFrame:
    """The generated-SQL wrapper BI tools emit — `WITH agg AS (SELECT
    ... GROUP BY ...) SELECT ... FROM agg WHERE ...` — routed onto the
    maintained grid (r10 verdict item 6, plans/api._try_cte_route): the
    single-CTE body is proven routable by the SAME bare-SELECT router
    and substituted in place; the outer query post-processes the
    O(|grid|) routed rows verbatim. Proof obligations are conservative:
    one CTE, outer references only the CTE exactly once, no nested
    WITH, no joins back to undiscovered raw tables — each unmet
    obligation falls back to the raw scan (rejection pins in
    tests/test_round11.py). The entry hard-fails unless the plan scans
    the grid and never the raw table.

    Scale: the filter-over-aggregate wrapper is how Tableau/Metabase
    spell HAVING; without the unwrap the most common generated shape
    pays a full corpus scan the grid already answers."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        from ..plans.api import HepopQueryAPI

        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        df = api.sql(CTE_ROUTED_SQL_TEXT)
        if api.last_routed_rollup != "doc_lang_rollup":
            raise AssertionError(
                f"CTE aggregate was not routed "
                f"(last_routed_rollup={api.last_routed_rollup!r})")
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "lang string, n_docs bigint, total_chars bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_cte_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, CTE_ROUTED_SQL_TEXT)


ROLLUP_CTE_SQL = """
WITH agg AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY lang
)
SELECT lang, n_docs, total_chars FROM agg
WHERE n_docs >= 60 ORDER BY lang
"""


# --- r12: linear CTE chains routed (r11 verdict item 1a) ---------------------

# the second most common generated shape after the single wrapper: an
# aggregate CTE, a filtering CTE over it, a re-aggregating outer. Only
# the FIRST body touches the raw table; it routes, the rest run verbatim.
CTE_CHAIN_SQL_TEXT = (
    "WITH agg AS (SELECT lang, source, count(*) AS n_docs, "
    "sum(n_chars) AS total_chars FROM documents GROUP BY lang, source), "
    "filt AS (SELECT lang, source, n_docs, total_chars FROM agg "
    "WHERE n_docs >= 3) "
    "SELECT lang, count(*) AS n_sources, sum(total_chars) AS sum_chars "
    "FROM filt GROUP BY lang ORDER BY lang"
)


def rollup_routed_cte_chain(spark: SparkSession, sf: str) -> DataFrame:
    """A LINEAR CTE chain routed onto the maintained grid (r11 verdict
    item 1a, plans/api._try_cte_route): `WITH agg AS (<aggregate>),
    filt AS (... FROM agg) SELECT ... FROM filt` — only the first body
    reads the raw table, so substituting its routed form is the same
    semantics-preserving argument as the single-CTE proof; every later
    body and the outer must be a SELECT over exactly the PREVIOUS name
    (single FROM, referenced once, no JOIN, no depth-0 comma-join, no
    nested WITH), so no undiscovered raw table can hide downstream.
    Unmet obligations fall back to the raw scan (rejection pins in
    tests/test_round12.py). Hard-fails unless the plan scans the grid
    and never the raw table.

    Scale: dashboard SQL generators stack aggregate -> filter ->
    re-aggregate CTEs; the chain is O(|grid|) post-processing once the
    first body routes — without the unwrap it pays the full corpus
    scan."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, CTE_CHAIN_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "lang string, n_sources bigint, sum_chars bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_cte_chain_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, CTE_CHAIN_SQL_TEXT)


ROLLUP_CTE_CHAIN_SQL = """
WITH agg AS (
  SELECT lang, source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY lang, source
), filt AS (
  SELECT lang, source, n_docs, total_chars FROM agg WHERE n_docs >= 3
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_sources,
       CAST(sum(total_chars) AS BIGINT) AS sum_chars
FROM filt GROUP BY lang ORDER BY lang
"""


# --- r12: CTE + outer JOIN routed (r11 verdict item 1b) ----------------------

# routed aggregate joined to a dimension in the OUTER query: the routed
# body substitutes in place, the join text runs verbatim, and the dim is
# DISCOVERED by the route (the routed fast path skips sql()'s discovery)
CTE_JOIN_SQL_TEXT = (
    "WITH agg AS (SELECT lang, count(*) AS n_docs, "
    "sum(n_chars) AS total_chars FROM documents GROUP BY lang) "
    "SELECT d.region AS region, sum(agg.n_docs) AS n_docs, "
    "sum(agg.total_chars) AS total_chars "
    "FROM agg JOIN langdim d ON agg.lang = d.lang "
    "GROUP BY d.region ORDER BY region"
)


def rollup_routed_cte_join(spark: SparkSession, sf: str) -> DataFrame:
    """`WITH agg AS (<routable>) SELECT ... FROM agg JOIN dim ...`
    routed (r11 verdict item 1b): body substitution preserves the CTE's
    rows exactly, so ANY outer join type/multiplicity over it stays
    exact; the route's new obligation is operational — every JOIN
    target must discover/resolve as a serve table or registered view
    (an unresolvable dim falls back to the raw path rather than
    erroring after the rewrite; comma-style joins are rejected outright
    per the r11 ADVICE). Hard-fails unless the plan scans the grid,
    never the raw FACT table, and broadcasts the dim.

    Scale: aggregate-then-enrich is THE BI join shape — O(|grid|) rows
    re-merged, then a broadcast join to the small dim, instead of
    shuffling the 100 TB fact table into the join."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        from ..plans.api import HepopQueryAPI

        # plant the dim INSIDE the serve tree: region per language,
        # derived deterministically so the DuckDB oracle can rebuild it
        docs = load_table(spark, sf, "documents")
        dim = docs.select("lang").distinct().select(
            "lang",
            F.when(F.col("lang") == "zh", F.lit("asia"))
            .otherwise(F.lit("europe")).alias("region"))
        dim.write.parquet(os.path.join(data, "w1", "dbs", "langdim"))

        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        df = api.sql(CTE_JOIN_SQL_TEXT)
        if api.last_routed_rollup != "doc_lang_rollup":
            raise AssertionError(
                f"CTE+JOIN aggregate was not routed "
                f"(last_routed_rollup={api.last_routed_rollup!r})")
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}documents" in plan:
            raise AssertionError("routed plan still scans the raw fact table")
        if "Broadcast" not in plan:
            raise AssertionError("dim join is not a broadcast join")
        rows = df.collect()
        return local_result(spark, 
            rows, "region string, n_docs bigint, total_chars bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_cte_join_plan_text(spark: SparkSession, sf: str) -> str:
    """Formatted plan of the routed CTE+JOIN (tools/plan_audit.py)."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        from ..plans.api import HepopQueryAPI

        docs = load_table(spark, sf, "documents")
        dim = docs.select("lang").distinct().select(
            "lang",
            F.when(F.col("lang") == "zh", F.lit("asia"))
            .otherwise(F.lit("europe")).alias("region"))
        dim.write.parquet(os.path.join(data, "w1", "dbs", "langdim"))
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        df = api.sql(CTE_JOIN_SQL_TEXT)
        if api.last_routed_rollup != "doc_lang_rollup":
            raise AssertionError("CTE+JOIN did not route")
        mode = (
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        return df._jdf.queryExecution().explainString(mode)
    finally:
        shutil.rmtree(root, ignore_errors=True)


ROLLUP_CTE_JOIN_SQL = """
WITH agg AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY lang
), langdim AS (
  SELECT DISTINCT lang,
         CASE WHEN lang = 'zh' THEN 'asia' ELSE 'europe' END AS region
  FROM documents
)
SELECT d.region AS region,
       CAST(sum(agg.n_docs) AS BIGINT) AS n_docs,
       CAST(sum(agg.total_chars) AS BIGINT) AS total_chars
FROM agg JOIN langdim d ON agg.lang = d.lang
GROUP BY d.region ORDER BY region
"""


# --- r12b: GROUPING SETS / derived tables / UNION ALL routed -----------------

# GROUP BY ROLLUP over the grid keys: every produced group — full keys
# and each collapsed subset incl. the grand total — re-aggregates the
# grid's monoid partials; the NULL fill comes from the SAME construct
# on both engines (plans/api.GroupingSpec)
GROUPING_SETS_SQL_TEXT = (
    "SELECT lang, source, count(*) AS n_docs, sum(n_chars) AS total_chars "
    "FROM documents GROUP BY ROLLUP(lang, source) ORDER BY lang, source"
)


def rollup_routed_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP BY ROLLUP/CUBE/GROUPING SETS routed onto the maintained
    grid (r12b): the OLAP-cube query shape. parse_simple_aggregate
    recognizes a grouping construct covering the whole GROUP BY, the
    coverage proof runs over its UNIQUE underlying keys, and the
    rewrite re-emits the construct verbatim over grid columns with
    every aggregate re-merged (SUM of sums, MIN of mins, finalized
    avg). Exactness: each produced group re-aggregates monoid partials,
    and collapsed-key NULL fills come from the same construct on both
    engines. The exact-grid shortcut is NEVER taken (subsets must
    re-aggregate) and exact count(distinct key) REFUSES under any
    construct — grid rows repeat the counted key across collapsed
    subsets (rejection pins in tests/test_round12b.py). Hard-fails
    unless routed to the grid and the raw table is never scanned.

    Scale: a ROLLUP over the raw corpus is several full aggregations in
    one pass; routed, it is the same few-thousand-row grid scanned once
    and Expand-ed — the continuous-aggregation win compounds with every
    grouping set."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, GROUPING_SETS_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows,
            "lang string, source string, n_docs bigint, total_chars bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_grouping_sets_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, GROUPING_SETS_SQL_TEXT)


ROLLUP_GROUPING_SETS_SQL = """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY ROLLUP(lang, source) ORDER BY lang, source
"""


# the derived-table spelling of the CTE wrapper — lifted into WITH form
# and delegated to the SAME _try_cte_route proof (plans/api.py)
DERIVED_SQL_TEXT = (
    "SELECT lang, total_chars FROM "
    "(SELECT lang, sum(n_chars) AS total_chars, count(*) AS n_docs "
    "FROM documents WHERE source IN ('src1', 'src2') GROUP BY lang) agg "
    "WHERE total_chars > 1000 ORDER BY lang"
)


def rollup_routed_derived(spark: SparkSession, sf: str) -> DataFrame:
    """`SELECT ... FROM (<aggregate>) t WHERE ...` routed (r12b): the
    inline-subquery spelling BI tools emit interchangeably with WITH.
    _try_derived_route lifts the single aliased derived table into the
    equivalent CTE under its alias and delegates to _try_cte_route, so
    both spellings share one proof and can never drift. Obligations:
    exactly one derived table, alias present (both engines require it),
    no WITH elsewhere; the delegated consumer checks (single FROM
    target, no comma-join, JOIN dims discovered) then apply verbatim.
    Unmet obligations fall back to the raw scan (rejection pins in
    tests/test_round12b.py). Hard-fails unless the plan scans the grid
    and never the raw table.

    Scale: same O(|grid|) routed scan + verbatim outer post-processing
    as the CTE wrapper — the point is that the OTHER spelling of the
    most common generated shape no longer pays a corpus scan."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, DERIVED_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "lang string, total_chars bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_derived_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, DERIVED_SQL_TEXT)


ROLLUP_DERIVED_SQL = """
SELECT lang, CAST(total_chars AS BIGINT) AS total_chars FROM
(SELECT lang, sum(n_chars) AS total_chars, count(*) AS n_docs
 FROM documents WHERE source IN ('src1', 'src2') GROUP BY lang) agg
WHERE total_chars > 1000 ORDER BY lang
"""


# every branch of a depth-0 UNION ALL routes; the rejoined text (with
# the trailing ORDER BY attached to the last branch exactly where the
# original parse put it) runs verbatim — bag union of identical rows
UNION_ALL_SQL_TEXT = (
    "SELECT lang, count(*) AS n_docs FROM documents "
    "WHERE source = 'src3' GROUP BY lang "
    "UNION ALL "
    "SELECT lang, count(*) AS n_docs FROM documents "
    "WHERE source = 'src4' GROUP BY lang "
    "ORDER BY lang, n_docs"
)


def rollup_routed_union_all(spark: SparkSession, sf: str) -> DataFrame:
    """A depth-0 UNION ALL chain with every branch routed onto the
    maintained grid (r12b): branch substitution is the same
    semantics-preserving argument as CTE substitution — each routed
    branch computes the SAME rows, and UNION ALL is a bag union — so
    the rejoined statement runs verbatim. ALL branches must route (a
    raw branch would need the discovery loop the fast path skips); any
    depth-0 bare UNION, INTERSECT or EXCEPT makes the statement
    unroutable (dedup / tighter binding would need a precedence proof)
    — rejection pins in tests/test_round12b.py. Hard-fails unless the
    plan scans the grid (both branches) and never the raw table.

    Scale: the per-segment/per-filter UNION ALL report is a classic BI
    export shape; routed, each branch is an O(|grid|) scan with its key
    predicate pushed down instead of two corpus scans."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, UNION_ALL_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "lang string, n_docs bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_union_all_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, UNION_ALL_SQL_TEXT)


ROLLUP_UNION_ALL_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents
WHERE source = 'src3' GROUP BY lang
UNION ALL
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents
WHERE source = 'src4' GROUP BY lang
ORDER BY lang, n_docs
"""


# --- r12c: parallel CTEs / derived tables JOINed in the outer ----------------

# the segment-comparison report: two filtered aggregates joined on their
# group key — BOTH CTE bodies route, the join text runs verbatim
CTE_PARALLEL_SQL_TEXT = (
    "WITH a AS (SELECT lang, count(*) AS n_a FROM documents "
    "WHERE source = 'src3' GROUP BY lang), "
    "b AS (SELECT lang, count(*) AS n_b FROM documents "
    "WHERE source = 'src4' GROUP BY lang) "
    "SELECT a.lang AS lang, a.n_a AS n_a, b.n_b AS n_b "
    "FROM a JOIN b ON a.lang = b.lang ORDER BY lang"
)


def rollup_routed_cte_parallel(spark: SparkSession, sf: str) -> DataFrame:
    """PARALLEL CTEs joined in the outer, every body routed (r12c,
    plans/api._try_parallel_cte): `WITH a AS (<routable>), b AS
    (<routable>) SELECT ... FROM a JOIN b ON ...` — the
    segment-comparison report BI tools generate. Each body routes
    independently through the bare-SELECT router (per-body
    semantics-preserving substitution); the outer join runs verbatim,
    so any join type/multiplicity is exact. Obligations: no body
    references another CTE (that is the chain shape), the outer FROMs
    one CTE and consumes every other exactly once as a JOIN target,
    non-CTE join targets must discover, ALL bodies must route (one raw
    branch falls the whole statement back — rejection pins in
    tests/test_round12c.py). Hard-fails unless the plan scans the grid
    and never the raw table.

    Scale: both join sides are O(|grid|) routed scans with their key
    predicates pushed down (broadcast-eligible), instead of two full
    corpus aggregations shuffled into a join."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, CTE_PARALLEL_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "lang string, n_a bigint, n_b bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_cte_parallel_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, CTE_PARALLEL_SQL_TEXT)


ROLLUP_CTE_PARALLEL_SQL = """
WITH a AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_a FROM documents
  WHERE source = 'src3' GROUP BY lang
), b AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_b FROM documents
  WHERE source = 'src4' GROUP BY lang
)
SELECT a.lang AS lang, a.n_a AS n_a, b.n_b AS n_b
FROM a JOIN b ON a.lang = b.lang ORDER BY lang
"""


# the same report in its derived-table spelling: every FROM/JOIN
# subquery lifts into a CTE and the parallel proof applies unchanged
DERIVED_JOIN_SQL_TEXT = (
    "SELECT a.lang AS lang, a.n_a AS n_a, b.n_b AS n_b FROM "
    "(SELECT lang, count(*) AS n_a FROM documents WHERE source = 'src3' "
    "GROUP BY lang) a "
    "JOIN (SELECT lang, count(*) AS n_b FROM documents "
    "WHERE source = 'src4' GROUP BY lang) b "
    "ON a.lang = b.lang ORDER BY lang"
)


def rollup_routed_derived_join(spark: SparkSession, sf: str) -> DataFrame:
    """Two derived-table aggregates JOINed inline, both routed (r12c):
    _try_derived_route lifts EVERY `FROM (...) t` / `JOIN (...) u`
    subquery into a CTE under its alias and delegates to the parallel-
    CTE proof, so the WITH spelling and the inline spelling of the same
    report can never drift. Aliases must exist and be distinct; one
    unroutable subquery falls the whole statement back. Hard-fails
    unless the plan scans the grid and never the raw table.

    Scale: identical routed plan to rollup_routed_cte_parallel — the
    win is that BOTH spellings of the two-segment comparison stop
    paying two corpus scans."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, DERIVED_JOIN_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "lang string, n_a bigint, n_b bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_derived_join_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, DERIVED_JOIN_SQL_TEXT)


ROLLUP_DERIVED_JOIN_SQL = """
SELECT a.lang AS lang, a.n_a AS n_a, b.n_b AS n_b FROM
(SELECT lang, CAST(count(*) AS BIGINT) AS n_a FROM documents
 WHERE source = 'src3' GROUP BY lang) a
JOIN (SELECT lang, CAST(count(*) AS BIGINT) AS n_b FROM documents
 WHERE source = 'src4' GROUP BY lang) b
ON a.lang = b.lang ORDER BY lang
"""


# --- r11: WHERE precedence routing (the r10 ADVICE high fix, gated) ----------

# unparenthesized mixed precedence: lang='en' OR (lang='de' AND
# source='src1'). The r10 parse returned (en OR de) AND src1 — a
# silently-wrong aggregate this oracle distinguishes at every scale
# ('en' keeps ALL sources under correct precedence).
WHERE_PRECEDENCE_SQL_TEXT = (
    "SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars "
    "FROM documents "
    "WHERE lang = 'en' OR lang = 'de' AND source = 'src1' "
    "GROUP BY lang ORDER BY lang"
)


def rollup_routed_where_precedence(spark: SparkSession, sf: str) -> DataFrame:
    """SQL operator precedence through the routed WHERE (r11, closing
    the r10 ADVICE high): `a OR b AND c` must parse as a OR (b AND c) —
    OR binds loosest — before the proven tree rewrites onto grid
    columns. The conjunct parser now refuses any depth-0 OR it cannot
    canonicalize to a single-key IN, and _where_tree splits disjuncts
    BEFORE conjuncts, so the routed grid filter is exactly the user's
    predicate. The oracle (DuckDB applies standard precedence) makes a
    mis-grouped parse a hard hash mismatch rather than a silent wrong
    answer. Hard-fails unless routed to the grid, never the raw table.

    Scale: same O(|grid|) routed scan — the win is that the dashboard's
    most natural un-parenthesized filter text routes CORRECTLY, not
    just routes."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, WHERE_PRECEDENCE_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "lang string, n_docs bigint, total_chars bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_where_precedence_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, WHERE_PRECEDENCE_SQL_TEXT)


ROLLUP_WHERE_PRECEDENCE_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE lang = 'en' OR lang = 'de' AND source = 'src1'
GROUP BY lang
ORDER BY lang
"""


# --- r11: NOT routing ---------------------------------------------------------

NOT_ROUTED_SQL_TEXT = (
    "SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars "
    "FROM documents "
    "WHERE NOT (lang = 'en' OR source = 'src1') "
    "GROUP BY lang ORDER BY lang"
)


def rollup_routed_not(spark: SparkSession, sf: str) -> DataFrame:
    """Negated key predicates routed onto the grid (r11): NOT binds
    tighter than AND/OR, so `_where_tree` attaches it to the single
    following term; negation of a key-only predicate is still key-only
    — constant within each grid cell — so the routed filter is exact
    for any NOT placement (De Morgan falls out of the tree shape, not
    special-casing). The sidecar probe planner serves only the PROVABLE
    zone-complement shapes (NOT BETWEEN / NOT = / !=, r12,
    zone_routed_not_range); bloom/trigram never serve a NOT branch (a
    may-contain probe proves nothing about the complement): no
    restriction under AND, poison under OR — pinned in
    tests/test_round11.py and test_round12.py. Hard-fails unless the
    plan scans the grid and never the raw table.

    Scale: exclusion filters ("everything except the big language")
    are the third most common dashboard shape after equality and OR —
    O(|grid|) routed instead of a raw scan."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = _routed_df(spark, data, NOT_ROUTED_SQL_TEXT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "lang string, n_docs bigint, total_chars bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_not_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, NOT_ROUTED_SQL_TEXT)


ROLLUP_NOT_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE NOT (lang = 'en' OR source = 'src1')
GROUP BY lang
ORDER BY lang
"""


# --- r11: precedence through sidecar file pruning ----------------------------

# call-7 OR (call-900 AND value BETWEEN 50 AND 51): the r10 probe tree
# intersected the zone probe across BOTH branches, false-negatively
# pruning call-7's file whenever its value fell outside [50, 51] —
# dropped rows, not just a slow plan. The oracle recomputes from raw.
PRECEDENCE_PRUNE_SQL_TEXT = (
    "SELECT count(*) AS n, round(sum(value), 2) AS sv FROM evmix11 "
    "WHERE call_id = 'call-7' OR call_id = 'call-900' "
    "AND value BETWEEN 50.0 AND 51.0"
)


def sidecar_routed_precedence(spark: SparkSession, sf: str) -> DataFrame:
    """Disjunctive file skipping under SQL precedence (r11, closing the
    r10 ADVICE high #2): the probe planner's boolean tree now splits
    ORs before ANDs, so `a OR b AND c` unions probe(a) with
    (probe(b) ∩ probe(c)) instead of intersecting probe(c) into both
    branches. A file holding only a-branch rows therefore always
    survives pruning — the false-negative class the old order created.
    The entry hard-fails unless both probe kinds engaged AND pruning
    removed files; exactness comes from the oracle recompute over raw
    events.

    Scale: the same union/intersection algebra is what makes indexed
    OR-filters safe to enable by default at 10^6 files — a pruning
    layer that can drop rows is worse than none."""
    from ..plans.api import HepopQueryAPI
    from ..storage.bloom_index import bloom_index_update, zone_index_update

    ev = load_table(spark, sf, "events").select(
        "event_id",
        F.concat(F.lit("call-"), F.col("event_id")).alias("call_id"),
        "value")
    root = tempfile.mkdtemp(prefix="prec_prune_")
    data = os.path.join(root, "data")
    try:
        tbl = os.path.join(data, "w1", "dbs", "evmix11")
        ev.repartitionByRange(16, "value").write.parquet(tbl)
        bloom_index_update(spark, tbl, "call_id")
        zone_index_update(spark, tbl, "value")
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        df = api.sql(PRECEDENCE_PRUNE_SQL_TEXT)
        rows = df.collect()
        bp = api.last_bloom_pruned
        if not bp or ("bloom", "call_id") not in bp["probes"] \
                or ("zone", "value") not in bp["probes"]:
            raise AssertionError(f"precedence probes did not engage: {bp}")
        if bp["files_read"] >= bp["files_live"]:
            raise AssertionError(f"precedence pruning removed nothing: {bp}")
        out = [(rows[0]["n"], round(rows[0]["sv"], 2) if rows[0]["sv"]
                is not None else None)]
        return local_result(spark, out, "n bigint, sv double")
    finally:
        shutil.rmtree(root, ignore_errors=True)


PRECEDENCE_PRUNE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sv
FROM events
WHERE event_id = 7 OR event_id = 900 AND value BETWEEN 50.0 AND 51.0
"""





ZONE_ROUTED_SQL_TEXT = (
    "SELECT count(*) AS n, sum(value) AS sv FROM evranges "
    "WHERE value BETWEEN 50 AND 60"
)


def zone_routed_range(spark: SparkSession, sf: str) -> DataFrame:
    """Range-predicate file skipping through the query API (r09): the
    serve table is laid out range-partitioned on `value`
    (repartitionByRange — the zone map's natural companion, same story
    as z-order), a per-file min/max ZONE sidecar is built
    (storage/bloom_index.zone_index_update), and the user's BETWEEN
    routes onto a pruned view whose file list keeps only zones
    intersecting [50, 60]. Absence-means-scan keeps it result-invisible;
    the entry hard-fails unless pruning engaged. The oracle recomputes
    from the raw events table.

    Scale: min/max zones + range layout are THE first-line pruning axis
    for non-time dimensions at 100 TB (the reference's metadata.json
    time index generalized to any column)."""
    from ..plans.api import HepopQueryAPI
    from ..storage.bloom_index import zone_index_update

    ev = load_table(spark, sf, "events").select("event_id", "value")
    root = tempfile.mkdtemp(prefix="zone_route_")
    data = os.path.join(root, "data")
    try:
        tbl = os.path.join(data, "w1", "dbs", "evranges")
        ev.repartitionByRange(8, "value").write.parquet(tbl)
        zone_index_update(spark, tbl, "value")
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        df = api.sql(ZONE_ROUTED_SQL_TEXT)
        rows = df.collect()
        bp = api.last_bloom_pruned
        if not bp or ("zone", "value") not in bp["probes"]:
            raise AssertionError(f"zone probe did not engage: {bp}")
        if bp["files_read"] >= bp["files_live"]:
            raise AssertionError(f"zone pruning removed nothing: {bp}")
        out = [(rows[0]["n"], round(rows[0]["sv"], 2))]
        return local_result(spark, out, "n bigint, sv double")
    finally:
        shutil.rmtree(root, ignore_errors=True)


ZONE_ROUTED_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sv
FROM events WHERE value BETWEEN 50 AND 60
"""


# --- r12: zone-COMPLEMENT pruning for negated ranges (r11 verdict item 2) ----

NOT_RANGE_SQL_TEXT = (
    "SELECT count(*) AS n, round(sum(value), 2) AS sv FROM evnot "
    "WHERE NOT (value BETWEEN 10.0 AND 100.0)"
)


def zone_routed_not_range(spark: SparkSession, sf: str) -> DataFrame:
    """Negated-range file skipping (r12): `NOT (value BETWEEN a AND b)`
    served from the min/max ZONE sidecar by its COMPLEMENT — a file is
    skipped only when its zone is provably CONTAINED in [a, b] (every
    non-null row fails the negation; all-null files fail it too, since
    NOT(NULL) is NULL). On the range-partitioned layout the interval
    covers several interior files outright, so exclusion predicates
    ("everything but the normal band" — the outlier hunt) skip the bulk
    of the table. Bloom/trigram stay excluded under negation
    (may-contain proves nothing about a complement) and a file with
    MIXED rows must survive — both pinned in tests/test_round12.py.
    Hard-fails unless the complement probe engaged AND pruned; the
    oracle recomputes from raw events.

    Scale: at 100 TB the exclusion shape is what monitoring runs all
    day (tail latencies, out-of-band sensors); serving it from the same
    zone sidecar the positive range uses means no extra index, just the
    complement test."""
    from ..plans.api import HepopQueryAPI
    from ..storage.bloom_index import zone_index_update

    ev = load_table(spark, sf, "events").select("event_id", "value")
    root = tempfile.mkdtemp(prefix="zone_not_")
    data = os.path.join(root, "data")
    try:
        tbl = os.path.join(data, "w1", "dbs", "evnot")
        ev.repartitionByRange(16, "value").write.parquet(tbl)
        zone_index_update(spark, tbl, "value")
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        df = api.sql(NOT_RANGE_SQL_TEXT)
        rows = df.collect()
        bp = api.last_bloom_pruned
        if not bp or ("zone_not", "value") not in bp["probes"]:
            raise AssertionError(f"zone-complement probe did not engage: {bp}")
        if bp["files_read"] >= bp["files_live"]:
            raise AssertionError(f"complement pruning removed nothing: {bp}")
        out = [(rows[0]["n"], round(rows[0]["sv"], 2) if rows[0]["sv"]
                is not None else None)]
        return local_result(spark, out, "n bigint, sv double")
    finally:
        shutil.rmtree(root, ignore_errors=True)


ZONE_NOT_RANGE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sv
FROM events WHERE NOT (value BETWEEN 10.0 AND 100.0)
"""


# --- r10: tree-structured sidecar pruning (OR = union of candidates) --------

OR_UNION_SQL_TEXT = (
    "SELECT count(*) AS n, round(sum(value), 2) AS sv FROM evmix "
    "WHERE call_id = 'call-7' OR value BETWEEN 50.0 AND 51.0"
)


def sidecar_routed_or_union(spark: SparkSession, sf: str) -> DataFrame:
    """Disjunctive file skipping (r10): the probe planner walks the
    WHERE as a boolean tree — AND chains candidate restrictions, OR
    takes the UNION of its branches' candidates and engages only when
    EVERY branch restricts (a file matching an un-analyzable branch
    must be scanned; absence of an index keeps a file in every branch,
    so no false negatives). Here one branch bloom-probes call_id and
    the other zone-probes value over a range layout; the pruned view
    reads the union — a handful of files instead of all 16 — and the
    residual predicate still runs on the survivors. The entry
    hard-fails unless BOTH probes engaged and pruning removed files;
    the oracle recomputes from raw events.

    Scale: dashboards OR filters constantly; without union math every
    disjunction pays a full scan even when both branches are indexed."""
    from ..plans.api import HepopQueryAPI
    from ..storage.bloom_index import bloom_index_update, zone_index_update

    ev = load_table(spark, sf, "events").select(
        "event_id",
        F.concat(F.lit("call-"), F.col("event_id")).alias("call_id"),
        "value")
    root = tempfile.mkdtemp(prefix="or_union_")
    data = os.path.join(root, "data")
    try:
        tbl = os.path.join(data, "w1", "dbs", "evmix")
        # range layout on value: zone prunes the BETWEEN branch; blooms
        # are layout-independent, so call_id still prunes to ~1 file
        ev.repartitionByRange(16, "value").write.parquet(tbl)
        bloom_index_update(spark, tbl, "call_id")
        zone_index_update(spark, tbl, "value")
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        df = api.sql(OR_UNION_SQL_TEXT)
        rows = df.collect()
        bp = api.last_bloom_pruned
        if not bp or ("bloom", "call_id") not in bp["probes"] \
                or ("zone", "value") not in bp["probes"]:
            raise AssertionError(f"union probes did not engage: {bp}")
        if bp["files_read"] >= bp["files_live"]:
            raise AssertionError(f"union pruning removed nothing: {bp}")
        out = [(rows[0]["n"], round(rows[0]["sv"], 2))]
        return local_result(spark, out, "n bigint, sv double")
    finally:
        shutil.rmtree(root, ignore_errors=True)


OR_UNION_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sv
FROM events WHERE event_id = 7 OR value BETWEEN 50.0 AND 51.0
"""


# --- r09c: star-join aggregate routing ---------------------------------------

JOIN_ROUTED_SQL_TEXT = (
    "SELECT n.n_name AS name, count(*) AS n_rows, sum(e.cents) AS sv, "
    "avg(e.cents) AS av, min(e.cents) AS mnv, max(e.cents) AS mxv "
    "FROM evstar e JOIN natdim n ON e.nk = n.n_nationkey "
    "WHERE n.n_regionkey = 2 GROUP BY n.n_name ORDER BY name"
)


def rollup_routed_join(spark: SparkSession, sf: str) -> DataFrame:
    """Star-join aggregate routing (plans/api._try_join_route): the
    classic aggregate-BEFORE-join materialized-view rewrite. The user's
    `fact JOIN dim ON fact.k = dim.dk ... GROUP BY dim.attr` rewrites to
    re-merging the maintained grid's monoid partials THROUGH the join —
    exact because every fact row maps to the same dim matches as its
    grid cell (duplicate dim keys multiply both sides identically; the
    inner join drops unmatched keys alike). count(*)/sum re-merge as
    SUM, min/max as themselves, avg finalizes from sum+strict-count. The
    entry hard-fails unless the plan scans the grid (never the raw
    fact) and broadcasts the dim. The oracle recomputes from raw events
    joined to nation. Measures ride an exact integer cent grid
    (round(value*100) — values sit near integers, never near .5), so
    sums are BIGINT-exact across engines and the avg is ONE IEEE
    division of exact integers (the verify-skill float rule; round(avg)
    flipped a 6th decimal at sf0.1).

    Scale: THE reason the grid exists — the aggregate runs over
    O(|grid|) rows then broadcast-joins the small dim, instead of
    shuffling the 100 TB fact table into the join."""
    from ..plans.api import HepopQueryAPI
    from ..storage.rollup import projection_append, projection_compact

    ev = load_table(spark, sf, "events").select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        (F.col("event_id") % 25).alias("nk"))
    nat = load_table(spark, sf, "nation")
    root = tempfile.mkdtemp(prefix="join_route_")
    data = os.path.join(root, "data")
    try:
        store = os.path.join(data, "w1", "rollups", "ev_nk_rollup")
        keys, sums = ["nk"], ["n_rows", "sv", "cv"]
        mins, maxs = ["mnv"], ["mxv"]

        # one scan for all four batch partials (see
        # _build_rollup_serve_tree): bit-identical monoid slices of the
        # (bat, nk) grid, checkpointed at ~batches x 25 rows
        pre = (
            ev.withColumn("bat", F.col("event_id") % ROLLUP_ROUTE_BATCHES)
            .groupBy("bat", "nk")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("sv"),
                 F.count("cents").alias("cv"),
                 F.min("cents").alias("mnv"),
                 F.max("cents").alias("mxv"))
            .localCheckpoint(eager=True)
        )

        def _append_batch(b: int) -> None:
            part = pre.filter(F.col("bat") == b).drop("bat")
            projection_append(
                spark, store, part, f"b{b}", keys=keys, sums=sums,
                mins=mins, maxs=maxs,
                source={
                    "table": "evstar",
                    "keys": {"nk": "nk"},
                    "sums": {"n_rows": "count(*)", "sv": "sum(cents)",
                             "cv": "count(cents)"},
                    "mins": {"mnv": "min(cents)"},
                    "maxs": {"mxv": "max(cents)"},
                },
            )

        # r12: overlap the independent fixture jobs (raw writes + batch
        # appends) — guide §2.6; see _build_rollup_serve_tree
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = [
                pool.submit(ev.write.parquet,
                            os.path.join(data, "w1", "dbs", "evstar")),
                pool.submit(nat.write.parquet,
                            os.path.join(data, "w1", "dbs", "natdim")),
            ]
            list(pool.map(_append_batch, range(ROLLUP_ROUTE_BATCHES)))
            for f in futs:
                f.result()
        projection_compact(spark, store, keys, sums, mins, maxs)
        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        df = api.sql(JOIN_ROUTED_SQL_TEXT)
        if api.last_routed_rollup != "ev_nk_rollup":
            raise AssertionError(
                f"join aggregate was not routed "
                f"(last_routed_rollup={api.last_routed_rollup!r})")
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the grid")
        if f"{os.sep}dbs{os.sep}evstar" in plan:
            raise AssertionError("routed plan still scans the raw fact")
        if "BroadcastHashJoin" not in plan:
            raise AssertionError("dim join is not broadcast")
        # integer-exact measures: no rounding anywhere — sums are BIGINT
        # and the avg is one IEEE division of exact integers
        rows = [(r["name"], r["n_rows"], r["sv"], r["av"],
                 r["mnv"], r["mxv"]) for r in df.collect()]
        return local_result(spark, 
            rows, "name string, n_rows bigint, sv bigint, av double, "
                  "mnv bigint, mxv bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


JOIN_ROUTED_SQL = """
SELECT n.n_name AS name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(e.cents) AS BIGINT) AS sv,
       CAST(sum(e.cents) AS DOUBLE) / count(e.cents) AS av,
       CAST(min(e.cents) AS BIGINT) AS mnv,
       CAST(max(e.cents) AS BIGINT) AS mxv
FROM (SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents,
             event_id % 25 AS nk FROM events) e
JOIN nation n ON e.nk = n.n_nationkey
WHERE n.n_regionkey = 2
GROUP BY n.n_name
ORDER BY name
"""


# --- r09c: trigram-Bloom substring-search routing ----------------------------

TRIGRAM_SQL_TEXT = (
    "SELECT doc_id, lang FROM corpus "
    "WHERE body LIKE '%marker-%' ORDER BY doc_id"
)


def trigram_routed_like(spark: SparkSession, sf: str) -> DataFrame:
    """Substring-search file skipping (storage/trigram_index.py): the SAME
    /query SQL a user runs to find a needle in a text corpus — the
    reference's headline troubleshooting lookup, `payload LIKE '%frag%'`
    over raw SIP messages — answered from a trigram-Bloom-pruned file
    set. A matching row must CONTAIN every trigram of the pattern's
    literal runs (the pg_trgm / Code-Search posting trick), so any file
    whose per-file trigram bitmap misses one required trigram cannot hold
    a match and is skipped driver-side; the LIKE still runs on survivors
    (no false negatives => result-invisible). Markers are planted on
    doc_id % 997 == 0, so matches land in a handful of the 24 hash
    shards; the entry hard-fails unless pruning engaged. The oracle
    recomputes the LIKE from the raw documents table.

    Scale: point blooms cannot serve a substring probe and zones have no
    ordering to offer — without this sidecar a LIKE '%x%' scans every
    file the time predicate leaves. The probe is driver-side bitmap math;
    the pruned read opens only trigram-admitted files out of the table's
    thousands."""
    from ..plans.api import HepopQueryAPI
    from ..storage.trigram_index import trigram_index_update

    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 997 == 0,
                F.concat(F.lit(" marker-"),
                         F.col("doc_id").cast("string"), F.lit("#")),
            ).otherwise(F.lit("")),
        ).alias("body"),
        F.pmod(F.col("doc_id"), F.lit(24)).alias("shard"),
    )
    root = tempfile.mkdtemp(prefix="trigram_route_")
    data = os.path.join(root, "data")
    try:
        tbl = os.path.join(data, "w1", "dbs", "corpus")
        docs.repartition("shard").write.partitionBy("shard").parquet(tbl)
        trigram_index_update(spark, tbl, "body")
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        df = api.sql(TRIGRAM_SQL_TEXT)
        rows = df.collect()
        bp = api.last_bloom_pruned
        if not bp or ("trigram", "body") not in bp["probes"]:
            raise AssertionError(f"trigram probe did not engage: {bp}")
        if bp["files_read"] >= bp["files_live"]:
            raise AssertionError(f"trigram pruning removed nothing: {bp}")
        return local_result(spark, rows, "doc_id bigint, lang string")
    finally:
        shutil.rmtree(root, ignore_errors=True)


TRIGRAM_ROUTED_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
FROM (
  SELECT doc_id, lang,
         text || CASE WHEN doc_id % 997 = 0
                      THEN ' marker-' || CAST(doc_id AS VARCHAR) || '#'
                      ELSE '' END AS body
  FROM documents
)
WHERE body LIKE '%marker-%'
ORDER BY doc_id
"""


# --- r11: LIKE branch inside a disjunctive probe tree ------------------------

OR_LIKE_SQL_TEXT = (
    "SELECT doc_id, lang FROM corpuslike "
    "WHERE ckey = 'd-7' OR body LIKE '%marker-%' ORDER BY doc_id"
)


def sidecar_routed_or_like(spark: SparkSession, sf: str) -> DataFrame:
    """A LIKE leaf restricting ITS OWN branch of an OR (r10 verdict item
    5 — the reference's flagship predicate shape, README.md:158
    `payload LIKE '%INVITE%'`, OR-combined with a point lookup): the
    probe planner's boolean tree serves the equality branch from the
    call-key BLOOM sidecar and the LIKE branch from the TRIGRAM sidecar
    (a matching row contains every trigram of the pattern's literal
    runs), then unions the two candidate sets. Both branches restrict,
    so the union engages; a LIKE on an UN-indexed column poisons the OR
    and disables pruning entirely — no false negatives (pinned in
    tests/test_round11.py). The entry hard-fails unless BOTH probe
    kinds engaged and files were skipped; the oracle recomputes from
    raw documents.

    Scale: troubleshooting dashboards pair "this call id OR any message
    containing X" constantly; serving each branch from its own index
    keeps the disjunction at a handful of files instead of a corpus
    scan."""
    from ..plans.api import HepopQueryAPI
    from ..storage.bloom_index import bloom_index_update
    from ..storage.trigram_index import trigram_index_update

    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.concat(F.lit("d-"), F.col("doc_id").cast("string")).alias("ckey"),
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 997 == 0,
                F.concat(F.lit(" marker-"),
                         F.col("doc_id").cast("string"), F.lit("#")),
            ).otherwise(F.lit("")),
        ).alias("body"),
        F.pmod(F.col("doc_id"), F.lit(24)).alias("shard"),
    )
    root = tempfile.mkdtemp(prefix="or_like_")
    data = os.path.join(root, "data")
    try:
        tbl = os.path.join(data, "w1", "dbs", "corpuslike")
        docs.repartition("shard").write.partitionBy("shard").parquet(tbl)
        bloom_index_update(spark, tbl, "ckey")
        trigram_index_update(spark, tbl, "body")
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        df = api.sql(OR_LIKE_SQL_TEXT)
        rows = df.collect()
        bp = api.last_bloom_pruned
        if not bp or ("bloom", "ckey") not in bp["probes"] \
                or ("trigram", "body") not in bp["probes"]:
            raise AssertionError(f"or-like probes did not engage: {bp}")
        if bp["files_read"] >= bp["files_live"]:
            raise AssertionError(f"or-like pruning removed nothing: {bp}")
        return local_result(spark, rows, "doc_id bigint, lang string")
    finally:
        shutil.rmtree(root, ignore_errors=True)


OR_LIKE_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
FROM (
  SELECT doc_id, lang,
         'd-' || CAST(doc_id AS VARCHAR) AS ckey,
         text || CASE WHEN doc_id % 997 = 0
                      THEN ' marker-' || CAST(doc_id AS VARCHAR) || '#'
                      ELSE '' END AS body
  FROM documents
)
WHERE ckey = 'd-7' OR body LIKE '%marker-%'
ORDER BY doc_id
"""



# --- r09c: z-order layout x zone sidecars — 2-D file skipping ----------------

ZORDER_ZONE_SQL_TEXT = (
    "SELECT count(*) AS n, sum(cents) AS sv FROM evz "
    "WHERE user_id BETWEEN 10 AND 19 AND cents BETWEEN 2000 AND 2999"
)


def zone_zorder_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-dimensional file skipping: the serve table is laid out on
    the Morton curve over (user_id, cents) (storage/zorder.py), zone
    sidecars are built for BOTH dimensions, and the user's 2-D box
    predicate routes onto a pruned view whose file list is the
    INTERSECTION of both zone probes — tight per-file min/max on both
    axes is exactly what z-ordering buys, and the sidecar composition
    turns it into plan-time pruning with zero file opens. The entry
    hard-fails unless BOTH probes engaged and the intersection pruned;
    the oracle recomputes the box aggregate from the raw events table
    (integer cent grid, so sums replay exactly).

    Scale: a 1-D range layout can serve one dimension; the z-order +
    per-dimension-zone composition is the first-line answer for 2-D
    dashboards at 100 TB (Delta/Iceberg Z-ORDER, done with the repo's
    own layout writer and driver-side probes)."""
    from ..plans.api import HepopQueryAPI
    from ..storage.bloom_index import zone_index_update_multi
    from ..storage.zorder import zorder_write

    # r12: checkpoint the narrow projection once — the z-write otherwise
    # re-reads the unsplittable raw file three times (bounds aggregation,
    # range sampling, shuffle map), each a serial one-task scan. Fixture-
    # sized by construction; production z-writes feed zorder_write per
    # time partition and must NOT blanket-checkpoint (zorder.py scale
    # note), which is why this lives at the call site.
    ev = load_table(spark, sf, "events").select(
        "event_id", "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    ).localCheckpoint(eager=True)
    root = tempfile.mkdtemp(prefix="zorder_zone_")
    data = os.path.join(root, "data")
    try:
        tbl = os.path.join(data, "w1", "dbs", "evz")
        zorder_write(ev, tbl, ["user_id", "cents"], n_files=32)
        # both dimensions' zones from ONE scan of the written files
        zone_index_update_multi(spark, tbl, ["user_id", "cents"])
        api = HepopQueryAPI(spark, default_window=True, data_dir=data)
        df = api.sql(ZORDER_ZONE_SQL_TEXT)
        rows = df.collect()
        bp = api.last_bloom_pruned
        if not bp or ("zone", "user_id") not in bp["probes"] \
                or ("zone", "cents") not in bp["probes"]:
            raise AssertionError(f"both zone probes must engage: {bp}")
        if bp["files_read"] >= bp["files_live"]:
            raise AssertionError(f"2-D pruning removed nothing: {bp}")
        out = [(rows[0]["n"], rows[0]["sv"])]
        return local_result(spark, out, "n bigint, sv bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


ZORDER_ZONE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sv
FROM (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events)
WHERE user_id BETWEEN 10 AND 19 AND cents BETWEEN 2000 AND 2999
"""


# --- r09c: sidecars maintained BY the streaming ingest path ------------------

SIDECAR_MAINT_BATCHES = 4


def streaming_sidecar_maintain_replay(spark: SparkSession,
                                      sf: str) -> DataFrame:
    """Bloom + trigram sidecars maintained in LOCK-STEP with ingest: the
    documents corpus arrives as SIDECAR_MAINT_BATCHES micro-batches
    through a real Structured Streaming sink
    (streaming/index_maint.table_sink) carrying BOTH maintenance hooks —
    every committed batch's files enter the point-bloom (skey) and
    trigram (body) sidecars before the next trigger. Both lookup paths
    then answer WARM from the maintained sidecars: a point lookup
    (skey = 'doc-137') and a substring search (LIKE '%marker-422#%'),
    each asserted to have pruned files. The oracle re-derives both
    answers from the raw documents table — a sink that lost rows, an
    unfired hook, or a stale bitmap all fail the gate.

    Scale: hook work is one narrow pass over each arriving batch's files
    (never a rescan); the warm probes are driver-side bitmap math. This
    is the serve-mode shape where ingest OWNS the sidecars — the same
    contract the minhash/IVF-PQ/LSH/rollup maintenance hooks pinned in
    r07, extended to the file-skipping indexes."""
    from ..storage.bloom_index import bloom_point_read, load_sidecar
    from ..storage.trigram_index import load_trigram, trigram_candidates
    from ..streaming.index_maint import (
        bloom_maintenance,
        stage_batch_files,
        table_sink,
        trigram_maintenance,
    )

    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))
        .alias("skey"),
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 211 == 0,
                F.concat(F.lit(" marker-"),
                         F.col("doc_id").cast("string"), F.lit("#")),
            ).otherwise(F.lit("")),
        ).alias("body"),
    )
    root = tempfile.mkdtemp(prefix="sidecar_maint_")
    base = os.path.join(root, "tables")
    try:
        landing = os.path.join(root, "landing")
        stage_batch_files(
            docs, landing, F.col("doc_id") % SIDECAR_MAINT_BATCHES,
            SIDECAR_MAINT_BATCHES,
        )
        stream = (
            spark.readStream
            .schema("doc_id long, skey string, body string")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = table_sink(
            stream, base, os.path.join(root, "ckpt"), "docs",
            index_hooks=[
                bloom_maintenance(base, table="docs", col="skey"),
                trigram_maintenance(base, table="docs", col="body"),
            ],
        ).start()
        q.awaitTermination()

        tbl = os.path.join(base, "docs")
        # lock-step proof: every committed batch's files are indexed in
        # BOTH sidecars
        n_bloom = len(load_sidecar(tbl, "skey")["files"])
        n_tri = len(load_trigram(tbl, "body")["files"])
        if n_bloom < SIDECAR_MAINT_BATCHES or n_tri != n_bloom:
            raise AssertionError(
                f"sidecars not in lock-step with ingest: "
                f"bloom={n_bloom} trigram={n_tri}")
        out_rows: list[tuple[int, str]] = []
        bdf, stats = bloom_point_read(spark, tbl, "skey", ["doc-137"])
        if stats["files_pruned"] <= 0:
            raise AssertionError(f"bloom pruning removed nothing: {stats}")
        out_rows += [(r["doc_id"], "bloom") for r in
                     bdf.select("doc_id").collect()]
        kept, live, pruned = trigram_candidates(tbl, "body",
                                                ["marker-422#"])
        if pruned <= 0:
            raise AssertionError(
                f"trigram pruning removed nothing: {live} live")
        tdf = spark.read.option("basePath", tbl).parquet(
            *[os.path.join(tbl, f) for f in kept])
        out_rows += [(r["doc_id"], "trigram") for r in
                     tdf.filter(F.col("body").like("%marker-422#%"))
                     .select("doc_id").collect()]
        out_rows.sort(key=lambda t: (t[1], t[0]))
        return local_result(spark, out_rows, "doc_id bigint, path string")
    finally:
        shutil.rmtree(root, ignore_errors=True)


SIDECAR_MAINT_SQL = """
SELECT doc_id, path FROM (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, 'bloom' AS path
  FROM documents WHERE doc_id = 137
  UNION ALL
  SELECT CAST(doc_id AS BIGINT) AS doc_id, 'trigram' AS path
  FROM documents
  WHERE (text || CASE WHEN doc_id % 211 = 0
                      THEN ' marker-' || CAST(doc_id AS VARCHAR) || '#'
                      ELSE '' END) LIKE '%marker-422#%'
)
ORDER BY path, doc_id
"""


# r10 (verdict item 6): OR-of-equalities on a single grid key is the IN
# it denotes — the most common dashboard WHERE shape that used to fall
# back to a raw scan — and parenthesized AND groups unwrap. The routed
# text exercises BOTH: an OR group over lang plus a paren-wrapped
# equality on source.
OR_IN_SQL_TEXT = (
    "SELECT source, count(*) AS n_docs, sum(n_chars) AS total_chars "
    "FROM documents "
    "WHERE (lang = 'en' OR lang = 'de' OR lang IN ('fr')) "
    "AND (source IN ('src1', 'src2') OR source = 'src3') "
    "GROUP BY source ORDER BY source"
)

ROLLUP_OR_IN_SQL = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE (lang = 'en' OR lang = 'de' OR lang IN ('fr'))
  AND (source IN ('src1', 'src2') OR source = 'src3')
GROUP BY source
ORDER BY source
"""


def rollup_routed_or_in(spark: SparkSession, sf: str) -> DataFrame:
    """An OR-of-equalities WHERE routed onto the rollup grid: the parser
    proves every disjunct targets the SAME grid key and canonicalizes
    the group to `lang IN ('en','de','fr')` — selecting grid rows stays
    exact — while `(source = 'web')` unwraps its parentheses into an
    ordinary conjunct. Prove-or-fall-back is preserved: mixed-column ORs
    and OR-of-ranges still reject (pinned by tests/test_round10b).

    Scale: same O(|grid|) routed scan as rollup_routed_filtered — this
    entry is about GRAMMAR reach, not a new physical plan."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        from ..plans.api import HepopQueryAPI

        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        df = api.sql(OR_IN_SQL_TEXT)
        if api.last_routed_rollup != "doc_lang_rollup":
            raise AssertionError(
                f"OR/IN aggregate was not routed "
                f"(last_routed_rollup={api.last_routed_rollup!r})")
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "source string, n_docs bigint, total_chars bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_or_in_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, OR_IN_SQL_TEXT)


# r10 second notch: a MIXED-KEY disjunction — `k = ... OR k2 IN (...)` —
# the dashboard shape the r09 verdict named as the common fallback. A
# predicate reading ONLY grid key columns is constant within each grid
# cell, so any boolean combination selects cells exactly; the router
# rewrites the whole proven tree onto grid columns.
MIXED_OR_SQL_TEXT = (
    "SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars "
    "FROM documents "
    "WHERE lang = 'de' OR source IN ('src1', 'src2') "
    "GROUP BY lang ORDER BY lang"
)

ROLLUP_MIXED_OR_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE lang = 'de' OR source IN ('src1', 'src2')
GROUP BY lang
ORDER BY lang
"""


def rollup_routed_mixed_or(spark: SparkSession, sf: str) -> DataFrame:
    """A disjunction ACROSS two grid keys routed onto the rollup grid:
    the WHERE parses to a proven boolean tree of literal comparisons
    (plans/api._where_tree) and every leaf lands on a key column, so the
    tree rewrites verbatim onto grid columns — exact because key-only
    predicates are constant within each cell. A leaf on a measure
    column, or any NOT/LIKE/function leaf, still falls back to raw
    (pinned by tests/test_round10b).

    Scale: identical O(|grid|) routed scan; the win is GRAMMAR reach —
    the `k IN (...) OR k2 = ...` dashboard shape no longer pays a raw
    scan."""
    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        from ..plans.api import HepopQueryAPI

        api = HepopQueryAPI(spark, default_window=False, data_dir=data)
        df = api.sql(MIXED_OR_SQL_TEXT)
        if api.last_routed_rollup != "doc_lang_rollup":
            raise AssertionError(
                f"mixed-key OR aggregate was not routed "
                f"(last_routed_rollup={api.last_routed_rollup!r})")
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError("routed plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("routed plan still scans the raw table")
        rows = df.collect()
        return local_result(spark, 
            rows, "lang string, n_docs bigint, total_chars bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def routed_mixed_or_plan_text(spark: SparkSession, sf: str) -> str:
    return routed_plan_text(spark, sf, MIXED_OR_SQL_TEXT)


def sql_routed_entrypoint(spark: SparkSession, sf: str) -> DataFrame:
    """The NON-HTTP routed surface (r09 verdict item 3): notebooks and BI
    tools call `hepop_spark.sql(spark, text, data_dir=...)` and get the
    same rollup routing / sidecar pruning the HTTP endpoint applies —
    previously only `HepopQueryAPI` (behind the server) routed, so any
    `spark.sql()` consumer silently paid raw scans. The entry runs the
    flagship routed aggregate through the PUBLIC function and asserts
    the plan reads the grid, never the raw table; the second call proves
    the per-(session, data_dir) API cache is reused (fingerprint-cached
    discovery, one stat per table per call)."""
    import hepop_spark as hs

    root, data = _build_rollup_serve_tree(spark, sf)
    try:
        df = hs.sql(spark, ROUTED_SQL_TEXT, data_dir=data)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if f"{os.sep}rollups{os.sep}" not in plan:
            raise AssertionError(
                "public sql() plan does not scan the rollup store")
        if f"{os.sep}dbs{os.sep}" in plan:
            raise AssertionError("public sql() plan still scans raw")
        api = hs._SQL_APIS[(spark, data, False)]
        df2 = hs.sql(spark, ROUTED_SQL_TEXT, data_dir=data)
        if hs._SQL_APIS[(spark, data, False)] is not api:
            raise AssertionError("sql() rebuilt its API between calls")
        rows = df2.collect()
        return local_result(spark, 
            rows, "lang string, n_docs bigint, total_chars bigint")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        import hepop_spark as hs2

        hs2._SQL_APIS.pop((spark, data, False), None)


# same result contract as the flagship routed aggregate — the surface
# under test is the public entry point, not a new aggregate
SQL_ENTRYPOINT_SQL = ROLLUP_ROUTED_SQL


QUERIES: dict[str, QuerySpec] = {
    "rollup_routed_aggregate": QuerySpec(
        rollup_routed_aggregate, ROLLUP_ROUTED_SQL,
        doc="the SAME user SQL over the raw table, rewritten by the API "
            "layer onto the maintained rollup grid (subset-key "
            "re-aggregation); oracle recomputes from raw",
    ),
    "rollup_routed_filtered": QuerySpec(
        rollup_routed_filtered, ROLLUP_FILTERED_SQL,
        doc="WHERE on a grid key routes too: the conjunct rewrites onto "
            "the grid column (IN over lang, grouped by source); oracle "
            "recomputes from raw",
    ),
    "rollup_routed_or_in": QuerySpec(
        rollup_routed_or_in, ROLLUP_OR_IN_SQL,
        doc="r10 grammar notch: OR-of-equalities on one grid key "
            "canonicalizes to IN and routes; parenthesized AND groups "
            "unwrap; everything richer still falls back (pinned)",
    ),
    "rollup_routed_mixed_or": QuerySpec(
        rollup_routed_mixed_or, ROLLUP_MIXED_OR_SQL,
        doc="r10 tree routing: a disjunction ACROSS grid keys rewrites "
            "as a proven boolean tree onto grid columns (key-only "
            "predicates are constant per cell, hence exact); measure/"
            "NOT/LIKE leaves still fall back (pinned)",
    ),
    "sql_routed_entrypoint": QuerySpec(
        sql_routed_entrypoint, SQL_ENTRYPOINT_SQL,
        doc="the public hepop_spark.sql() surface routes like the HTTP "
            "endpoint (grid scan asserted in-entry, API cache reused); "
            "oracle recomputes the aggregate from raw documents",
    ),
    "rollup_routed_timegrid": QuerySpec(
        rollup_routed_timegrid, ROLLUP_TIMEGRID_SQL,
        doc="hourly continuous aggregation on a time-series table: the "
            "user's GROUP BY date_format(ts, hour) routes onto the "
            "maintained hourly grid with the event_type dimension "
            "re-aggregated away; oracle recomputes from raw events",
    ),
    "rollup_routed_count_distinct": QuerySpec(
        rollup_routed_count_distinct, ROLLUP_CNTD_SQL,
        doc="EXACT count(distinct key) from the grid: one grid row per "
            "distinct key combination, so COUNT(key_col) per group is "
            "the distinct count; refuses when extra grid dims exist",
    ),
    "rollup_routed_timerange": QuerySpec(
        rollup_routed_timerange, ROLLUP_TIMERANGE_SQL,
        doc="BETWEEN on the time-grid key routes: a three-day hour window "
            "selected from the maintained hourly grid (predicate pushed "
            "into the grid scan), hour dimension re-aggregated away",
    ),
    "rollup_routed_avg": QuerySpec(
        rollup_routed_avg, ROLLUP_AVG_SQL,
        doc="avg() finalized from the grid's sum+strict-count partials "
            "(not a stored column — avg is not a monoid); one IEEE "
            "division of exact integer sums; oracle recomputes from raw",
    ),
    "rollup_routed_having_or": QuerySpec(
        rollup_routed_having_or, ROLLUP_HAVING_OR_SQL,
        doc="boolean-tree HAVING routes with SQL precedence: "
            "count>=200 OR (count>=60 AND avg>300) re-filters the "
            "re-merged grid; OR splits before AND (r11)",
    ),
    "rollup_routed_where_precedence": QuerySpec(
        rollup_routed_where_precedence, ROLLUP_WHERE_PRECEDENCE_SQL,
        doc="unparenthesized a OR b AND c WHERE routes as a OR (b AND "
            "c) — the r10 ADVICE precedence fix, oracle-gated (r11)",
    ),
    "sidecar_routed_precedence": QuerySpec(
        sidecar_routed_precedence, PRECEDENCE_PRUNE_SQL,
        doc="probe tree honors SQL precedence: OR unions probe(a) with "
            "probe(b)∩probe(c) — no false-negative file skipping (r11)",
    ),
    "sidecar_routed_or_like": QuerySpec(
        sidecar_routed_or_like, OR_LIKE_SQL,
        doc="LIKE branch of an OR served by the trigram sidecar, "
            "equality branch by bloom; union of candidates (r11)",
    ),
    "rollup_routed_cte": QuerySpec(
        rollup_routed_cte, ROLLUP_CTE_SQL,
        doc="single-CTE wrapper unwrapped and its aggregate body routed "
            "onto the grid — the BI generated-SQL shape (r11)",
    ),
    "rollup_routed_cte_chain": QuerySpec(
        rollup_routed_cte_chain, ROLLUP_CTE_CHAIN_SQL,
        doc="linear CTE chain: first body routes onto the grid, later "
            "bodies/outer proven to read only the previous CTE (r12)",
    ),
    "rollup_routed_cte_join": QuerySpec(
        rollup_routed_cte_join, ROLLUP_CTE_JOIN_SQL,
        doc="routed CTE joined to a dim in the outer query: dim "
            "discovered by the route, broadcast join asserted (r12)",
    ),
    "rollup_routed_cte_parallel": QuerySpec(
        rollup_routed_cte_parallel, ROLLUP_CTE_PARALLEL_SQL,
        doc="parallel CTEs joined in the outer: every body routed "
            "independently onto the grid, join text verbatim (r12c)",
    ),
    "rollup_routed_derived_join": QuerySpec(
        rollup_routed_derived_join, ROLLUP_DERIVED_JOIN_SQL,
        doc="two derived-table aggregates joined inline, each lifted "
            "into a CTE and routed through the parallel proof (r12c)",
    ),
    "rollup_routed_grouping_sets": QuerySpec(
        rollup_routed_grouping_sets, ROLLUP_GROUPING_SETS_SQL,
        doc="GROUP BY ROLLUP/CUBE/GROUPING SETS re-emitted over the "
            "grid with re-merged partials; collapsed-set NULL fills "
            "from the same construct on both engines (r12b)",
    ),
    "rollup_routed_derived": QuerySpec(
        rollup_routed_derived, ROLLUP_DERIVED_SQL,
        doc="derived table FROM (<aggregate>) t lifted into the "
            "equivalent CTE and routed through the same proof (r12b)",
    ),
    "rollup_routed_union_all": QuerySpec(
        rollup_routed_union_all, ROLLUP_UNION_ALL_SQL,
        doc="depth-0 UNION ALL with every branch routed onto the grid; "
            "bare UNION/INTERSECT/EXCEPT reject (r12b)",
    ),
    "rollup_routed_not": QuerySpec(
        rollup_routed_not, ROLLUP_NOT_SQL,
        doc="NOT over key-only predicates routes exactly (negation is "
            "constant within grid cells); probes never serve NOT (r11)",
    ),
    "rollup_routed_having": QuerySpec(
        rollup_routed_having, ROLLUP_HAVING_SQL,
        doc="HAVING routes: group-threshold conjuncts map through the "
            "same agg/avg rewrite (SUM re-merge, finalized division) and "
            "filter the re-aggregated grid; oracle recomputes from raw",
    ),
    "sidecar_routed_or_union": QuerySpec(
        sidecar_routed_or_union, OR_UNION_SQL,
        doc="r10 disjunctive file skipping: OR unions each branch's "
            "sidecar candidates (bloom on call_id | zone on value); "
            "both probes + pruning asserted in-entry; oracle from raw",
    ),
    "zone_routed_not_range": QuerySpec(
        zone_routed_not_range, ZONE_NOT_RANGE_SQL,
        doc="NOT (x BETWEEN a AND b) served from the zone sidecar's "
            "COMPLEMENT: files provably contained in [a,b] skip; mixed "
            "files survive; bloom/trigram never serve negation (r12)",
    ),
    "zone_routed_range": QuerySpec(
        zone_routed_range, ZONE_ROUTED_SQL,
        doc="per-file min/max zone sidecar + range layout: a BETWEEN "
            "routes onto a pruned view reading only intersecting files "
            "(pruning asserted in-entry); oracle recomputes from raw",
    ),
    "bloom_routed_lookup": QuerySpec(
        bloom_routed_lookup, BLOOM_ROUTED_SQL,
        doc="the SAME /query SQL answered from a Bloom-pruned file set "
            "(sidecar-admitted files only, pruning asserted in-entry); "
            "oracle recomputes from the raw table",
    ),
    "trigram_routed_like": QuerySpec(
        trigram_routed_like, TRIGRAM_ROUTED_SQL,
        doc="LIKE '%needle%' answered from a trigram-Bloom-pruned file "
            "set (pg_trgm posting trick per file; pruning asserted "
            "in-entry); oracle recomputes the LIKE from raw documents",
    ),
    "rollup_routed_join": QuerySpec(
        rollup_routed_join, JOIN_ROUTED_SQL,
        doc="star-join aggregate rewritten to re-merge the maintained "
            "grid THROUGH the dim join (aggregate-before-join MV "
            "rewrite; grid scan + broadcast dim asserted in-entry); "
            "oracle recomputes from raw events joined to nation",
    ),
    "zone_zorder_prune": QuerySpec(
        zone_zorder_prune, ZORDER_ZONE_SQL,
        doc="Morton layout + per-dimension zone sidecars: a 2-D box "
            "predicate prunes by the INTERSECTION of both zone probes "
            "(both engagements asserted in-entry); oracle recomputes "
            "from raw events on the integer cent grid",
    ),
    "streaming_sidecar_maintain_replay": QuerySpec(
        streaming_sidecar_maintain_replay, SIDECAR_MAINT_SQL,
        doc="bloom + trigram sidecars maintained by the streaming sink's "
            "hooks in lock-step with committed batches; point + substring "
            "lookups answered warm (pruning asserted in-entry); oracle "
            "re-derives both from raw documents",
    ),
    "rollup_routed_minmax": QuerySpec(
        rollup_routed_minmax, ROLLUP_MINMAX_SQL,
        doc="min()/max() continuous aggregation: extremum columns ride "
            "the maintained grid with the MIN/MAX monoid and route like "
            "sums, incl. key-subset re-aggregation; oracle recomputes "
            "from raw",
    ),
}
