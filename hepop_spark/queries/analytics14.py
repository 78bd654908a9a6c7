"""Round-3 final batch: multi-source BFS distances on the co-supply
graph and a snapshot diff (the storage-lifecycle audit between two
committed table versions).

Engine-parity rules as established: loop-unrolled oracle CTEs for the
iterative op; the snapshot machinery is exercised on the Spark side with
the oracle recomputing the expected diff from raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import local_result, load_table
from . import QuerySpec
from .mining_q import _EDGES_SQL, _cosupply_edges

# ---------------------------------------------------------------------------
# graph_bfs_distance — multi-source BFS on the co-supply graph
# ---------------------------------------------------------------------------

BFS_HUBS = 10
BFS_MAX_DEPTH = 3


def graph_bfs_distance(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-source BFS: distance from every node to its nearest hub
    (hubs = the top-10 nodes by degree, ties by id) up to 3 hops, -1 if
    unreachable in that radius — the "distance to backbone" feature used
    in fraud/anomaly scoring and network triage. Frontier expansion is
    one equi-join per level with a min() fold; the oracle unrolls the
    same three relaxations as CTEs.

    Scale: per level, one join edges x current-distances + one min-agg —
    the Pregel shape; the distance vector (not the graph) is all that
    shuffles per round."""
    und = _cosupply_edges(spark, sf)
    edges = und.select("u", "v").unionAll(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    edges.cache()
    edges.count()
    deg = edges.groupBy("u").agg(F.count("*").alias("deg"))
    wh = Window.orderBy(F.col("deg").desc(), F.col("u"))
    hubs = deg.withColumn("rk", F.row_number().over(wh)).filter(
        F.col("rk") <= BFS_HUBS
    ).select(F.col("u").alias("node"), F.lit(0).alias("dist"))
    nodes = deg.select(F.col("u").alias("node"))
    dist = hubs
    for _ in range(BFS_MAX_DEPTH):
        relaxed = (
            edges.join(dist, edges.u == dist.node)
            .select(F.col("v").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    out = (
        nodes.join(dist, "node", "left")
        .select(
            F.col("node").cast("long").alias("node"),
            F.coalesce(F.col("dist"), F.lit(-1)).cast("long").alias("dist_to_hub"),
        )
        .orderBy("node")
    )
    rows = out.collect()
    edges.unpersist()
    return local_result(spark, rows, "node bigint, dist_to_hub bigint")


def _bfs_round_sql(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT e.v AS node, p.dist + 1 AS dist
    FROM edges_sym e JOIN {prev} p ON e.u = p.node
  ) GROUP BY node
)"""


BFS_SQL = f"""
WITH edges AS ({_EDGES_SQL}),
edges_sym AS (
  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
),
deg AS (SELECT u, count(*) AS deg FROM edges_sym GROUP BY u),
hubs AS (
  SELECT u AS node, 0 AS dist FROM (
    SELECT u, row_number() OVER (ORDER BY deg DESC, u) AS rk FROM deg)
  WHERE rk <= {BFS_HUBS}
),
d0 AS (SELECT node, dist FROM hubs),
{_bfs_round_sql('d0', 'd1')[1:]},
{_bfs_round_sql('d1', 'd2')[1:]},
{_bfs_round_sql('d2', 'd3')[1:]}
SELECT CAST(n.u AS BIGINT) AS node,
       CAST(coalesce(d3.dist, -1) AS BIGINT) AS dist_to_hub
FROM deg n LEFT JOIN d3 ON d3.node = n.u
ORDER BY node
"""


# ---------------------------------------------------------------------------
# snapshot_diff — row-level diff between two committed versions
# ---------------------------------------------------------------------------


def snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Version-to-version diff over the snapshot log (storage/snapshots.py):
    commit v1 = events below 5000, v2 = v1 plus an UPDATED slice (values
    doubled for event_id < 1000, via overwrite) — then diff AS OF v1 vs
    AS OF v2 by anti/changed-key joins: added, removed, and changed
    counts per event_type. The audit a data steward runs after every
    backfill; the oracle recomputes the expected diff from raw events.

    Scale: the diff is two hash joins on the snapshot key — no full-table
    sort; snapshot reads prune to each version's file list."""
    import os
    import shutil
    import tempfile

    from ..storage.snapshots import commit_snapshot, read_snapshot

    ev = load_table(spark, sf, "events").select("event_id", "event_type", "value")
    d = tempfile.mkdtemp(prefix="snapdiff_q_")
    try:
        base = os.path.join(d, "events_snap")
        v1 = commit_snapshot(ev.filter(F.col("event_id") < 5000), base)
        updated = ev.filter(F.col("event_id") < 6000).withColumn(
            "value",
            F.when(F.col("event_id") < 1000, F.col("value") * 2).otherwise(
                F.col("value")
            ),
        )
        v2 = commit_snapshot(updated, base, mode="overwrite")
        a = read_snapshot(spark, base, v1).select(
            "event_id", "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
        )
        b = read_snapshot(spark, base, v2).select(
            "event_id", "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
        )
        added = b.join(a.select("event_id"), "event_id", "left_anti")
        removed = a.join(b.select("event_id"), "event_id", "left_anti")
        changed = (
            a.select("event_id", "event_type", F.col("cents").alias("c1"))
            .join(b.select("event_id", F.col("cents").alias("c2")), "event_id")
            .filter(F.col("c1") != F.col("c2"))
        )
        # anchor on the UNION of the v1 and v2 type domains so types with NO
        # changes still emit an all-zero row, and a type whose rows were ALL
        # removed in v2 keeps its n_removed count (v1-only types would vanish
        # if we anchored on v2 alone; here v2 ⊇ v1 so the union equals the
        # oracle's types CTE, but the helper stays correct for any pair)
        types = (
            a.select("event_type").unionByName(b.select("event_type")).distinct()
        )
        rows = (
            types
            .join(
                added.groupBy("event_type").agg(F.count("*").alias("n_added")),
                "event_type", "left",
            )
            .join(
                removed.groupBy("event_type").agg(F.count("*").alias("n_removed")),
                "event_type", "left",
            )
            .join(
                changed.groupBy("event_type").agg(F.count("*").alias("n_changed")),
                "event_type", "left",
            )
            .select(
                "event_type",
                F.coalesce("n_added", F.lit(0)).cast("long").alias("n_added"),
                F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
                F.coalesce("n_changed", F.lit(0)).cast("long").alias("n_changed"),
            )
            .orderBy("event_type")
            .collect()
        )
        return local_result(spark, 
            rows, "event_type string, n_added bigint, n_removed bigint, n_changed bigint"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


SNAPDIFF_SQL = """
WITH a AS (
  SELECT event_id, event_type FROM events WHERE event_id < 5000
), b AS (
  SELECT event_id, event_type,
         CASE WHEN event_id < 1000 THEN 1 ELSE 0 END AS doubled
  FROM events WHERE event_id < 6000
), added AS (
  SELECT event_type, count(*) AS n_added
  FROM b WHERE event_id NOT IN (SELECT event_id FROM a)
  GROUP BY event_type
), changed AS (
  -- doubling a non-zero cents value always changes it (values >= 0.01)
  SELECT event_type, count(*) AS n_changed
  FROM b WHERE doubled = 1 AND event_id IN (SELECT event_id FROM a)
  GROUP BY event_type
), types AS (
  SELECT DISTINCT event_type FROM events WHERE event_id < 6000
)
SELECT t.event_type,
       CAST(coalesce(ad.n_added, 0) AS BIGINT) AS n_added,
       CAST(0 AS BIGINT) AS n_removed,
       CAST(coalesce(ch.n_changed, 0) AS BIGINT) AS n_changed
FROM types t
LEFT JOIN added ad USING (event_type)
LEFT JOIN changed ch USING (event_type)
ORDER BY t.event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "graph_bfs_distance": QuerySpec(
        graph_bfs_distance, BFS_SQL,
        "multi-source BFS distance-to-hub, 3 relaxations",
    ),
    "snapshot_diff": QuerySpec(
        snapshot_diff, SNAPDIFF_SQL,
        "row-level version diff over the snapshot log",
    ),
}
