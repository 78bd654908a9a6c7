"""Distributed connected components over an edge DataFrame — the final
stage of every near-dup pipeline: candidate pairs → duplicate CLUSTERS →
one canonical document per cluster. (The reference has nothing like this;
its compaction concatenates rows without dedup, hepop.js:703-785. North-star
training-data-pipeline operator.)

Algorithm: alternating LARGE-STAR / SMALL-STAR contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14). Each round applies
both stars — every node links its larger neighbors (large-star), then its
smaller-or-self neighbors (small-star), to the minimum of the relevant
neighborhood — which provably converges to one star per component, rooted at
the component minimum, in O(log^2 n) rounds regardless of graph diameter
(in practice 2-4 rounds on near-dup blob graphs). This replaces the r01
min-label propagation whose round count was O(diameter): an adversarial
chain of length d cost d shuffles there, log d here.

Driver involvement per round is ONE action (a count+hash-sum fingerprint of
the edge set used as the convergence test; a fingerprint collision would
only cause a premature stop, probability ~2^-64, and every caller is
oracle-checked). All data stays distributed: each star is a groupBy +
broadcast-free equi-join on node id, partial-aggregated map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """For every node a: connect each strictly-larger neighbor b to
    min(Gamma(a) ∪ {a}). Output edges all point (larger -> smaller).

    Input/output orientation invariant: u > v on every edge. Duplicate
    output edges are tolerated (mins are idempotent under duplication);
    the one distinct() per round lives at the end of _small_star."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    ctr = sym.select(F.col("u").alias("a"), F.col("v").alias("b"))
    mins = ctr.groupBy("a").agg(F.min("b").alias("mb"))
    return (
        ctr.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(
            F.col("b").alias("u"),
            F.least(F.col("mb"), F.col("a")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For every node a: connect each neighbor b <= a, and a itself, to
    min of that smaller-neighborhood. Preserves the (larger -> smaller)
    edge orientation.

    Because the input (large-star output) is already oriented u > v, the
    'smaller neighbors of a' relation is exactly the edge list itself —
    no symmetrization union needed here."""
    smaller = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    mins = smaller.groupBy("a").agg(F.min("b").alias("mb"))
    via_neighbor = smaller.join(mins, "a").select(
        F.col("b").alias("u"), F.col("mb").alias("v")
    )
    via_self = mins.select(F.col("a").alias("u"), F.col("mb").alias("v"))
    return (
        via_neighbor.union(via_self)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 50, compress: bool = False) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` is an undirected edge list (each pair listed once is enough).
    Only nodes appearing in ``edges`` are labeled — callers union in
    singletons if they need total coverage.

    ``compress`` is kept for API compatibility with the r01 min-label
    implementation; star contraction already squares path lengths every
    round, so the flag is a no-op.
    """
    del compress  # subsumed by star contraction
    # Checkpoint every round, NOT persist: each star references its
    # input ~4x, so the LOGICAL plan grows ~8x per round — persist caches
    # blocks but keeps the full plan tree, and Catalyst analysis of the
    # round-k tree is O(8^k) (observed: driver heap OOM on a 13-node chain
    # by round 5). Checkpointing truncates the plan to a leaf each round;
    # blocks are freed by the ContextCleaner when the frame is dropped, so
    # nothing accumulates in the session CacheManager across a query run.
    #
    # WHICH checkpoint matters on a real cluster: localCheckpoint stores
    # unreplicated executor-local blocks — one lost executor kills the job
    # mid-iteration (Spark docs warn against it for exactly this loop
    # shape). When the application has configured a reliable checkpoint
    # dir (sc.setCheckpointDir on HDFS/S3), use real checkpoint(); fall
    # back to localCheckpoint only when no dir is set (local/test mode,
    # where executor loss means JVM death anyway).
    def _truncate(df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        try:
            reliable = sc.getCheckpointDir() is not None
        except Exception:
            reliable = False
        if reliable:
            return df.checkpoint(eager=False)
        return df.localCheckpoint(eager=False)

    e = _truncate(
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev_sig = None
    for _ in range(max_iter):
        e2 = _truncate(_small_star(_large_star(e)))
        # bit_xor, not sum: xor of 64-bit hashes cannot overflow under ANSI
        # mode and is a valid order-insensitive fingerprint of a DISTINCT
        # set. One driver action per round; materializes the checkpoint.
        row = e2.agg(
            F.count("*").alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("h")
        ).collect()[0]
        sig = (row["n"], row["h"])
        e = e2
        if sig == prev_sig:
            break
        prev_sig = sig
    # Fixpoint: each component is a star (child, root) with root = min id.
    # groupBy-min instead of plain rename tolerates an unconverged edge set
    # when max_iter is exhausted (still a valid upper-label, just coarser).
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("comp"))
        .union(e.select(F.col("v").alias("node"), F.col("v").alias("comp")))
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
    )
