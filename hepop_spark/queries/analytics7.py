"""Round-2 batch 6 — engine-capability ops: windowed COUNT(DISTINCT)
via the first-seen decomposition (Spark windows don't allow DISTINCT
aggregates — the decomposition is how it's done at scale), and
incremental materialized-view maintenance whose refreshed state must
equal a full recompute exactly (integer-cents arithmetic makes the
equality bit-exact, not approximate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

# ---------------------------------------------------------------------------
# cumulative_distinct_users — windowed COUNT(DISTINCT) decomposition
# ---------------------------------------------------------------------------


def cumulative_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct users seen up to each day (the 'audience to date' curve).
    A windowed COUNT(DISTINCT) is unsupported in Spark (and quadratic
    where it is supported); the scalable decomposition: first-seen day per
    user (one agg), daily first-seen counts, running sum over the tiny day
    domain. The oracle is the naive correlated COUNT(DISTINCT) per day —
    proving the decomposition exact."""
    ev = load_table(spark, sf, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    daily_new = first_seen.groupBy("d0").agg(F.count("*").alias("new_users"))
    days = ev.select(F.to_date("ts").alias("d")).distinct()
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    joined = days.join(daily_new, days.d == daily_new.d0, "left").select(
        "d", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    return joined.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_distinct_users"),
    )


CUM_DISTINCT_SQL = """
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
SELECT strftime(d, '%Y-%m-%d') AS day,
       (SELECT count(*) FROM (
          SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
        ) WHERE d0 = days.d) AS new_users,
       (SELECT count(DISTINCT e2.user_id) FROM events e2
        WHERE CAST(e2.ts AS DATE) <= days.d) AS cum_distinct_users
FROM days
"""


# ---------------------------------------------------------------------------
# mv_join_refresh — incremental materialized-view maintenance
# ---------------------------------------------------------------------------


def mv_join_refresh(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental maintenance of a join-aggregate materialized view
    (revenue + order count per nation over orders⋈customer⋈nation):
    the MV is built from the base partition (orders with key % 3 != 2),
    then refreshed by aggregating ONLY the delta partition and merging
    (union + re-aggregate on the 25-nation key — the delta pass never
    rescans the base fact). Revenue is summed in integer cents, so the
    refreshed state equals a full recompute EXACTLY — which is what the
    oracle does. At 100 TB this is the continuous-aggregation pattern:
    per-batch delta aggregation + tiny merge, identical to rollup_hourly
    but across a join."""
    ord_ = load_table(spark, sf, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    cust = load_table(spark, sf, "customer")
    nat = load_table(spark, sf, "nation")

    def agg(orders: DataFrame) -> DataFrame:
        return (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
            .groupBy("n_name")
            .agg(F.sum("cents").alias("cents"), F.count("*").alias("n_orders"))
        )

    base_mv = agg(ord_.filter(F.col("o_orderkey") % 3 != 2))
    delta_mv = agg(ord_.filter(F.col("o_orderkey") % 3 == 2))
    refreshed = (
        base_mv.unionAll(delta_mv)
        .groupBy("n_name")
        .agg(F.sum("cents").alias("cents"), F.sum("n_orders").alias("n_orders"))
    )
    return refreshed.select(
        "n_name",
        (F.col("cents") / 100.0).alias("revenue"),
        F.col("n_orders").cast("long").alias("n_orders"),
    )


MV_REFRESH_SQL = """
SELECT n_name,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


QUERIES: dict[str, QuerySpec] = {
    "cumulative_distinct_users": QuerySpec(
        cumulative_distinct_users,
        CUM_DISTINCT_SQL,
        "windowed COUNT(DISTINCT) via first-seen decomposition",
    ),
    "mv_join_refresh": QuerySpec(
        mv_join_refresh,
        MV_REFRESH_SQL,
        "incremental join-aggregate MV refresh == full recompute",
    ),
}
