"""Third-engine replay tests for the round-6 preference-evaluation batch
(analytics20.py): the Spark results are re-derived in pure Python from
the same parquet rows, so a formula mis-translated identically into both
the Spark plan and its DuckDB oracle cannot hide.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from hepop_spark.queries.analytics20 import ELO_GRID, ELO_K, N_PLAYERS

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def games():
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id"])
    out = []
    for e in t["event_id"].to_pylist():
        e = int(e)
        a, b = e % N_PLAYERS, (e // N_PLAYERS) % N_PLAYERS
        if a == b:
            continue
        h = ((e % 1000003) * 2654435761) % 1000003 % 100
        out.append((a, b, 1 if h < 50 + a - b else 0))
    return out


class TestWinrateMatrix:
    def test_replay(self, spark, games):
        from hepop_spark.queries.analytics20 import pairwise_winrate_matrix

        exp: dict[tuple[int, int], list[int]] = {}
        for a, b, w in games:
            cell = exp.setdefault((a, b), [0, 0])
            cell[0] += 1
            cell[1] += w
        got = {
            (r.model_a, r.model_b): (r.games, r.wins_a, r.winrate_a)
            for r in pairwise_winrate_matrix(spark, SF).collect()
        }
        assert set(got) == set(exp)
        for k, (n, w) in exp.items():
            assert got[k] == (n, w, w / n)

    def test_bias_plant_has_signal(self, games):
        # higher-index models must actually win more (win prob is
        # (50 + a - b)/100) — else the rating entries are fitting noise
        wins = [0] * N_PLAYERS
        n = [0] * N_PLAYERS
        for a, b, w in games:
            wins[a] += w
            wins[b] += 1 - w
            n[a] += 1
            n[b] += 1
        lo = sum(wins[:5]) / sum(n[:5])
        hi = sum(wins[-5:]) / sum(n[-5:])
        assert hi > lo + 0.2


class TestEloBatch:
    def test_replay(self, spark, games):
        from hepop_spark.queries.analytics20 import elo_batch_update

        delta = [0] * N_PLAYERS
        wins = [0] * N_PLAYERS
        cnt = [0] * N_PLAYERS
        for a, b, w in games:
            ra, rb = 800 + a * 16, 800 + b * 16
            ea = ra * ELO_GRID // (ra + rb)
            eb = rb * ELO_GRID // (ra + rb)
            delta[a] += w * ELO_GRID - ea
            delta[b] += (1 - w) * ELO_GRID - eb
            wins[a] += w
            wins[b] += 1 - w
            cnt[a] += 1
            cnt[b] += 1
        got = {r.model: r for r in elo_batch_update(spark, SF).collect()}
        for m in range(N_PLAYERS):
            if cnt[m] == 0:
                assert m not in got
                continue
            r = got[m]
            after_e6 = (800 + m * 16) * ELO_GRID + ELO_K * delta[m]
            assert (r.games, r.wins, r.rating_before) == (cnt[m], wins[m], 800 + m * 16)
            assert r.rating_after_e6 == after_e6
            assert r.rating_after == after_e6 / ELO_GRID

    def test_zero_sum_on_grid(self, spark):
        # Elo is zero-sum up to the integer-grid truncation: floor leaks
        # ea + eb in {1e6 - 1, 1e6} per game, so the total delta is a
        # small POSITIVE drift bounded by K * games, not the rating scale
        from hepop_spark.queries.analytics20 import elo_batch_update

        rows = elo_batch_update(spark, SF).collect()
        total_delta = sum(r.rating_after_e6 - r.rating_before * ELO_GRID for r in rows)
        n_games = sum(r.games for r in rows) // 2
        assert 0 <= total_delta <= ELO_K * n_games


class TestBradleyTerryMM:
    def test_replay(self, spark, games):
        from hepop_spark.queries.analytics20 import bradley_terry_mm_iter

        pair_n: dict[tuple[int, int], int] = {}
        wins = [0] * N_PLAYERS
        cnt = [0] * N_PLAYERS
        for a, b, w in games:
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
            wins[a] += w
            wins[b] += 1 - w
            cnt[a] += 1
            cnt[b] += 1
        denom = [0] * N_PLAYERS
        for (a, b), n in pair_n.items():
            denom[a] += n * ELO_GRID // (8 + a % 7 + b % 7)
            denom[b] += n * ELO_GRID // (8 + b % 7 + a % 7)
        got = {r.model: r for r in bradley_terry_mm_iter(spark, SF).collect()}
        for m in range(N_PLAYERS):
            if cnt[m] == 0:
                continue
            r = got[m]
            assert (r.games, r.wins, r.denom_e6) == (cnt[m], wins[m], denom[m])
            assert r.strength_after == wins[m] * ELO_GRID / denom[m]

    def test_update_moves_toward_winners(self, spark):
        # models that win more than the current strengths predict must
        # move up, and vice versa — the MM fixed-point direction
        from hepop_spark.queries.analytics20 import bradley_terry_mm_iter

        rows = bradley_terry_mm_iter(spark, SF).collect()
        ups = [r for r in rows if r.strength_after > r.strength_before]
        downs = [r for r in rows if r.strength_after < r.strength_before]
        assert ups and downs
        # the planted bias favors HIGH ids: average id of movers-up > down
        assert sum(r.model for r in ups) / len(ups) > sum(
            r.model for r in downs
        ) / len(downs)
