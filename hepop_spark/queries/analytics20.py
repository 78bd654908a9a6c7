"""Round-6 preference-evaluation batch: the pairwise-comparison analytics
an RLHF/eval data platform runs over human (or judge-model) preference
logs — win-rate matrices, one batch Elo rating step, one Bradley-Terry
maximum-likelihood (MM) iteration.

Pairwise preference records are the third leg of an LLM data pipeline
(pretraining corpus + eval results + preference comparisons); ranking
models from comparisons at scale is a pure groupBy/join workload, and
these three entries pin its canonical computations:

- ``pairwise_winrate_matrix`` — per ordered (model_a, model_b): games,
  wins, win rate. The raw matrix every preference dashboard starts from.
- ``elo_batch_update`` — one batch Elo step: expected score from the
  Bradley-Terry probability ra/(ra+rb) (the rational form — chosen over
  the 10^(d/400) logistic so BOTH engines compute it exactly; same
  model, different rating scale), accumulated on an exact integer 1e6
  grid so the per-player sum is shuffle-order-free, K=32.
- ``bradley_terry_mm_iter`` — one MM-algorithm iteration (Hunter 2004):
  s_i' = wins_i / sum_j n_ij/(s_i+s_j). The opponent sum is a
  fixed-order fold over the <= 24-opponent bounded domain (the repo's
  vocabulary-bounded double-sum discipline).

Reference scope: north-star extension (the reference stores opaque
payloads and ships no analytics); same deterministic plant device as the
rest of the suite — comparisons are exact integer functions of event_id,
both engines replant identically.

Engine-parity rules: plants and counters are exact integers; Elo deltas
live on a floor-divided 1e6 grid (integer division truncates toward zero
identically on both engines for the non-negative operands used); the
only doubles are terminal divisions and the documented fixed-order MM
fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

N_PLAYERS = 25     # model roster size: bounded key domain for all rollups
ELO_K = 32         # classic Elo K-factor
ELO_GRID = 1_000_000  # exact micro-point grid for order-free delta sums


def _games(spark: SparkSession, sf: str) -> DataFrame:
    """Planted preference log: every event is one A-vs-B comparison.
    a/b drawn from a 25-model roster (a != b), outcome biased toward the
    HIGHER index so ratings have real signal: A wins iff
    hash(event_id) % 100 < 50 + (a - b) — win prob 26%..98%. The hash is
    ((event_id % 1000003) * 2654435761) % 1000003 — a bijective mix mod a
    prime, so the outcome decorrelates from a = event_id % 25 (a small
    multiplier like 7919 = 19 mod 100 leaves outcome and player id
    entangled and washes out the planted skill — caught by the
    signal-property test); the pre-reduction keeps the product < 2^63 for
    ANY event_id."""
    ev = load_table(spark, sf, "events")
    g = ev.select(
        F.col("event_id"),
        (F.col("event_id") % N_PLAYERS).alias("a"),
        F.expr(f"(event_id div {N_PLAYERS}) % {N_PLAYERS}").alias("b"),
    ).filter(F.col("a") != F.col("b"))
    return g.select(
        "event_id", "a", "b",
        (
            (((F.col("event_id") % 1000003) * 2654435761) % 1000003) % 100
            < (50 + F.col("a") - F.col("b"))
        )
        .cast("int")
        .alias("win_a"),
    )


_GAMES_SQL = f"""
  SELECT event_id, a, b,
         CASE WHEN ((event_id % 1000003) * 2654435761) % 1000003 % 100
                   < 50 + a - b THEN 1 ELSE 0 END AS win_a
  FROM (
    SELECT event_id,
           event_id % {N_PLAYERS} AS a,
           (event_id // {N_PLAYERS}) % {N_PLAYERS} AS b
    FROM events
  ) WHERE a != b
"""


# ---------------------------------------------------------------------------
# pairwise_winrate_matrix — ordered-pair win rates
# ---------------------------------------------------------------------------


def pairwise_winrate_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Win-rate matrix over ordered (model_a, model_b) pairs: games
    played, A's wins, A's win rate. The raw artifact behind every
    preference leaderboard; downstream ratings (Elo, Bradley-Terry) are
    derived from exactly these counts.

    Scale: one partial-combining groupBy on the bounded 25x24 pair
    domain — constant output regardless of corpus size."""
    g = _games(spark, sf)
    return (
        g.groupBy("a", "b")
        .agg(
            F.count("*").cast("long").alias("games"),
            F.sum("win_a").cast("long").alias("wins_a"),
        )
        .select(
            F.col("a").cast("long").alias("model_a"),
            F.col("b").cast("long").alias("model_b"),
            "games", "wins_a",
            (F.col("wins_a") / F.col("games")).alias("winrate_a"),
        )
        .orderBy("model_a", "model_b")
    )


WINRATE_SQL = f"""
WITH g AS ({_GAMES_SQL})
SELECT CAST(a AS BIGINT) AS model_a, CAST(b AS BIGINT) AS model_b,
       CAST(count(*) AS BIGINT) AS games,
       CAST(sum(win_a) AS BIGINT) AS wins_a,
       CAST(sum(win_a) AS DOUBLE) / count(*) AS winrate_a
FROM g GROUP BY a, b ORDER BY model_a, model_b
"""


# ---------------------------------------------------------------------------
# elo_batch_update — one batch Elo rating step on an exact integer grid
# ---------------------------------------------------------------------------


def elo_batch_update(spark: SparkSession, sf: str) -> DataFrame:
    """One batch Elo step over the full comparison log. Initial ratings
    are planted per model (800 + 16*id); the expected score uses the
    Bradley-Terry probability ra/(ra+rb) — the same model Elo's logistic
    approximates, but rational in the integer ratings, so the per-game
    term floor(ra*1e6/(ra+rb)) is an EXACT integer on both engines and
    the per-player delta sum is shuffle-order-free (the float-sum
    last-ulp lesson applied to rating updates). Update:
    r' = r + K * (wins - sum expected), carried on the 1e6 grid.

    Games contribute symmetrically: each game updates the A side and the
    B side (expected_b = rb/(ra+rb), outcome 1-win_a) — materialized by
    a 2-row explode per game, so one groupBy covers both roles.

    Scale: narrow scan -> bounded 2x explode -> partial-combining
    groupBy on the 25-model domain; constant output."""
    g = _games(spark, sf)
    # expected scores as TRUE integer division on both engines (Spark
    # `div` / DuckDB `//`) — no float in the accumulated quantity at all
    ge = g.withColumn(
        "exp_a_e6",
        F.expr(f"(800 + a*16) * {ELO_GRID} div (1600 + (a+b)*16)"),
    ).withColumn(
        "exp_b_e6",
        F.expr(f"(800 + b*16) * {ELO_GRID} div (1600 + (a+b)*16)"),
    )
    sides = ge.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a").alias("model"),
                    F.col("win_a").alias("score"),
                    F.col("exp_a_e6").alias("exp_e6"),
                ),
                F.struct(
                    F.col("b").alias("model"),
                    (1 - F.col("win_a")).alias("score"),
                    F.col("exp_b_e6").alias("exp_e6"),
                ),
            )
        ).alias("s")
    ).select("s.model", "s.score", "s.exp_e6")
    agg = sides.groupBy("model").agg(
        F.count("*").cast("long").alias("games"),
        F.sum("score").cast("long").alias("wins"),
        F.sum(F.col("score").cast("long") * ELO_GRID - F.col("exp_e6"))
        .cast("long")
        .alias("delta_e6"),
    )
    return agg.select(
        F.col("model").cast("long").alias("model"),
        "games", "wins",
        (800 + F.col("model") * 16).cast("long").alias("rating_before"),
        (
            (800 + F.col("model") * 16) * ELO_GRID + ELO_K * F.col("delta_e6")
        ).cast("long").alias("rating_after_e6"),
        (
            ((800 + F.col("model") * 16) * ELO_GRID + ELO_K * F.col("delta_e6"))
            / float(ELO_GRID)
        ).alias("rating_after"),
    ).orderBy("model")


ELO_SQL = f"""
WITH g AS ({_GAMES_SQL}),
sides AS (
  SELECT a AS model, win_a AS score,
         (800 + a * 16) * {ELO_GRID} // (1600 + (a + b) * 16) AS exp_e6
  FROM g
  UNION ALL
  SELECT b AS model, 1 - win_a AS score,
         (800 + b * 16) * {ELO_GRID} // (1600 + (a + b) * 16) AS exp_e6
  FROM g
), agg AS (
  SELECT model,
         CAST(count(*) AS BIGINT) AS games,
         CAST(sum(score) AS BIGINT) AS wins,
         CAST(sum(CAST(score AS BIGINT) * {ELO_GRID} - exp_e6) AS BIGINT) AS delta_e6
  FROM sides GROUP BY model
)
SELECT CAST(model AS BIGINT) AS model, games, wins,
       CAST(800 + model * 16 AS BIGINT) AS rating_before,
       CAST((800 + model * 16) * {ELO_GRID} + {ELO_K} * delta_e6 AS BIGINT) AS rating_after_e6,
       CAST((800 + model * 16) * {ELO_GRID} + {ELO_K} * delta_e6 AS DOUBLE) / {ELO_GRID} AS rating_after
FROM agg ORDER BY model
"""


# ---------------------------------------------------------------------------
# bradley_terry_mm_iter — one Bradley-Terry MM iteration
# ---------------------------------------------------------------------------


def bradley_terry_mm_iter(spark: SparkSession, sf: str) -> DataFrame:
    """One MM-algorithm iteration for Bradley-Terry strengths (Hunter
    2004): from current strengths s_i (planted 4 + i%7) and pair game
    counts n_ij, the update is s_i' = wins_i / sum_j n_ij/(s_i+s_j).
    Each denominator term is carried as the exact integer
    n_ij*1e6 div (s_i+s_j) — the quantized-MM semantics this entry
    DEFINES — so the per-player sum is a BIGINT sum (shuffle-order-free
    on both engines, no float fold needed); the one double is the
    terminal wins*1e6/denom_e6 division.

    Scale: pair counts partial-combine on the bounded 25x24 domain; the
    per-player rollup is over <= 24 rows. Constant work after the scan."""
    g = _games(spark, sf)
    # undirected pair counts + per-player wins from one pass each
    pair_n = g.groupBy("a", "b").agg(F.count("*").cast("long").alias("n"))
    wins = (
        g.select(F.col("a").alias("model"), F.col("win_a").alias("w"))
        .unionAll(g.select(F.col("b").alias("model"), (1 - F.col("win_a")).alias("w")))
        .groupBy("model")
        .agg(F.sum("w").cast("long").alias("wins"), F.count("*").cast("long").alias("games"))
    )
    # each directed (a,b) count contributes n/(s_a+s_b) to BOTH players'
    # denominators
    terms = pair_n.select(
        F.col("a").alias("model"), F.col("b").alias("opp"), "n"
    ).unionAll(
        pair_n.select(F.col("b").alias("model"), F.col("a").alias("opp"), "n")
    )
    denom = (
        terms.withColumn(
            "term_e6",
            F.expr(f"n * {ELO_GRID} div (8 + model % 7 + opp % 7)"),
        )
        .groupBy("model")
        .agg(F.sum("term_e6").cast("long").alias("denom_e6"))
    )
    return (
        wins.join(denom, "model")
        .select(
            F.col("model").cast("long").alias("model"),
            "games", "wins",
            (4 + F.col("model") % 7).cast("long").alias("strength_before"),
            "denom_e6",
            (F.col("wins") * ELO_GRID / F.col("denom_e6")).alias("strength_after"),
        )
        .orderBy("model")
    )


BT_MM_SQL = f"""
WITH g AS ({_GAMES_SQL}),
pair_n AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY a, b
), wins AS (
  SELECT model, CAST(sum(w) AS BIGINT) AS wins, CAST(count(*) AS BIGINT) AS games
  FROM (
    SELECT a AS model, win_a AS w FROM g
    UNION ALL
    SELECT b AS model, 1 - win_a AS w FROM g
  ) GROUP BY model
), denom AS (
  SELECT model, CAST(sum(term_e6) AS BIGINT) AS denom_e6
  FROM (
    SELECT model, opp, n * {ELO_GRID} // (8 + model % 7 + opp % 7) AS term_e6
    FROM (
      SELECT a AS model, b AS opp, n FROM pair_n
      UNION ALL
      SELECT b AS model, a AS opp, n FROM pair_n
    )
  ) GROUP BY model
)
SELECT CAST(w.model AS BIGINT) AS model, w.games, w.wins,
       CAST(4 + w.model % 7 AS BIGINT) AS strength_before,
       d.denom_e6,
       CAST(w.wins AS DOUBLE) * {ELO_GRID} / d.denom_e6 AS strength_after
FROM wins w JOIN denom d ON w.model = d.model
ORDER BY model
"""


QUERIES = {
    "pairwise_winrate_matrix": QuerySpec(
        pairwise_winrate_matrix, WINRATE_SQL,
        "ordered-pair preference win-rate matrix over the bounded model roster",
    ),
    "elo_batch_update": QuerySpec(
        elo_batch_update, ELO_SQL,
        "one batch Elo step; expected scores exact on a 1e6 integer grid",
    ),
    "bradley_terry_mm_iter": QuerySpec(
        bradley_terry_mm_iter, BT_MM_SQL,
        "one Bradley-Terry MM iteration with a fixed-order opponent fold",
    ),
}
