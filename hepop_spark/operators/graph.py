"""Distributed connected components over an edge DataFrame — the final
stage of every near-dup pipeline: candidate pairs → duplicate CLUSTERS →
one canonical document per cluster. (The reference has nothing like this;
its compaction concatenates rows without dedup, hepop.js:703-785. North-star
training-data-pipeline operator.)

Algorithm: iterative min-label propagation. Each round every node adopts
the minimum label among itself and its neighbors; convergence takes
O(graph diameter) rounds. Each round is one shuffle (join on node) + one
aggregation — all DataFrame ops, nothing collected to the driver, so the
same code runs on a 1000-executor cluster. For adversarial long-chain
graphs (diameter ~ n), switch the inner step to alternating large-star /
small-star contraction (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14) — same join primitives, O(log n) rounds; near-dup
graphs in practice are dense blobs with tiny diameters, so neighbor-min is
the cheaper default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 20) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` is an undirected edge list (each pair listed once is enough).
    Only nodes appearing in ``edges`` are labeled — callers union in
    singletons if they need total coverage.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("comp"))
        .select(F.col("a").alias("node"), "comp")
        .persist()
    )
    for _ in range(max_iter):
        # every node pulls its neighbors' current labels, keeps the min of
        # (own label, neighbor labels)
        neighbor_labels = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("comp"))
        )
        new_labels = (
            labels.select("node", "comp")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels
