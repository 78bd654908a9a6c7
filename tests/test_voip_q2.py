"""Third-engine replay tests for the round-6 VoIP trunk-health batch
(voip_q2.py): the Spark results are re-derived in pure Python from the
same parquet rows, so a bug shared by the Spark plan and its DuckDB
oracle (same mis-translated formula in both) cannot hide.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from hepop_spark.queries.voip_q2 import (
    GMIN,
    LOSS_MOD,
    LOSS_MULT,
    LOSS_THRESH,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def packets():
    """(trunk -> ordered [lost flags]) replanted in pure Python."""
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    rows = sorted(
        (int(e), int(u))
        for e, u in zip(t["event_id"].to_pylist(), t["user_id"].to_pylist())
        if int(e) < 6000
    )
    by_trunk: dict[int, list[int]] = {}
    for e, u in rows:  # sorted by event_id = the per-trunk order
        by_trunk.setdefault(u % 20, []).append(
            1 if (e * LOSS_MULT) % LOSS_MOD < LOSS_THRESH else 0
        )
    return by_trunk


@pytest.fixture(scope="module")
def dialogs():
    """(trunk, start_us, end_us) replanted in pure Python."""
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    out = []
    for e, u, ts in zip(
        t["event_id"].to_pylist(), t["user_id"].to_pylist(), t["ts"].to_pylist()
    ):
        e = int(e)
        if e >= 3000:
            continue
        s_us = int(ts.timestamp() * 1_000_000) if hasattr(ts, "timestamp") else int(ts)
        dur = e % 3600 + 1
        out.append((int(u) % 20, e, s_us, s_us + dur * 1_000_000))
    return out


class TestGilbert:
    def test_replay_one_trunk(self, spark, packets):
        from hepop_spark.queries.voip_q2 import rtp_loss_gilbert

        got = {r.trunk: r for r in rtp_loss_gilbert(spark, SF).collect()}
        assert set(got) == set(packets)
        for trunk, seq in packets.items():
            n = {"00": 0, "01": 0, "10": 0, "11": 0}
            for prev, cur in zip(seq, seq[1:]):
                n[f"{prev}{cur}"] += 1
            r = got[trunk]
            assert (r.n00, r.n01, r.n10, r.n11) == (
                n["00"], n["01"], n["10"], n["11"],
            )
            assert r.pkts == len(seq) and r.lost_pkts == sum(seq)
            if n["01"] + n["00"]:
                assert r.p_burst_start == n["01"] / (n["00"] + n["01"])
            if n["10"] + n["11"]:
                assert r.q_burst_end == n["10"] / (n["10"] + n["11"])
                assert r.mean_burst_len == (n["10"] + n["11"]) / n["10"]

    def test_transitions_account_for_every_pair(self, spark):
        from hepop_spark.queries.voip_q2 import rtp_loss_gilbert

        for r in rtp_loss_gilbert(spark, SF).collect():
            assert r.n00 + r.n01 + r.n10 + r.n11 == r.pkts - 1


class TestBurstGap:
    @staticmethod
    def _replay(seq):
        """Reference implementation: loss periods merge while < GMIN
        received separate consecutive losses; single-loss periods are
        isolated (gap) losses."""
        loss_pos = [i for i, x in enumerate(seq) if x]
        periods = []
        for p in loss_pos:
            if periods and p - periods[-1][-1] - 1 < GMIN:
                periods[-1].append(p)
            else:
                periods.append([p])
        bursts = [p for p in periods if len(p) > 1]
        return {
            "n_bursts": len(bursts),
            "burst_pkts": sum(p[-1] - p[0] + 1 for p in bursts),
            "burst_lost": sum(len(p) for p in bursts),
            "max_burst_span": max((p[-1] - p[0] + 1 for p in bursts), default=0),
            "gap_lost": sum(1 for p in periods if len(p) == 1),
        }

    def test_replay_all_trunks(self, spark, packets):
        from hepop_spark.queries.voip_q2 import rtcp_xr_burst_gap

        got = {r.trunk: r for r in rtcp_xr_burst_gap(spark, SF).collect()}
        assert set(got) == set(packets)
        for trunk, seq in packets.items():
            exp = self._replay(seq)
            r = got[trunk]
            for k, v in exp.items():
                assert getattr(r, k) == v, (trunk, k)
            assert r.burst_lost + r.gap_lost == sum(seq)

    def test_loss_plant_produces_both_regimes(self, packets):
        # the pseudo-random plant must exercise bursts AND isolated losses
        # somewhere, else the entry is degenerate (the reason the every-97th
        # plant was not reused)
        tot = [self._replay(s) for s in packets.values()]
        assert sum(t["n_bursts"] for t in tot) > 0
        assert sum(t["gap_lost"] for t in tot) > 0


class TestBusyHourAndConcurrency:
    def test_busy_hour_replay(self, spark, dialogs):
        from hepop_spark.queries.voip_q2 import trunk_busy_hour

        H = 3_600_000_000
        per: dict[tuple[int, int], list[int]] = {}
        for trunk, _cid, s, e in dialogs:
            h = (s // H) * H
            while h < e:
                ov = min(e, h + H) - max(s, h)
                cell = per.setdefault((trunk, h), [0, 0])
                cell[0] += ov
                cell[1] += 1
                h += H
        best: dict[int, tuple] = {}
        for (trunk, h), (us, n) in per.items():
            # argmax by (call_us desc, hour asc)
            cur = best.get(trunk)
            if cur is None or (-us, h) < (-cur[1], cur[0]):
                best[trunk] = (h, us, n)
        got = {r.trunk: r for r in trunk_busy_hour(spark, SF).collect()}
        assert set(got) == set(best)
        for trunk, (h, us, n) in best.items():
            r = got[trunk]
            assert int(r.busy_hour.timestamp() * 1_000_000) == h
            assert (r.call_us, r.n_calls) == (us, n)
            assert r.erlangs == us / 3_600_000_000.0

    def test_hour_overlaps_partition_each_call(self, dialogs):
        # the hour grid must tile every call exactly: sum of overlaps
        # equals the call duration (no double counting, no holes)
        H = 3_600_000_000
        for _trunk, _cid, s, e in dialogs[:500]:
            total, h = 0, (s // H) * H
            while h < e:
                total += min(e, h + H) - max(s, h)
                h += H
            assert total == e - s

    def test_peak_concurrency_replay(self, spark, dialogs):
        from hepop_spark.queries.voip_q2 import trunk_peak_concurrency

        pts: dict[int, list[tuple]] = {}
        for trunk, cid, s, e in dialogs:
            pts.setdefault(trunk, []).append((s, 1, cid))
            pts[trunk].append((e, -1, cid))
        exp = {}
        for trunk, ps in pts.items():
            ps.sort()
            run = peak = 0
            for _t, d, _c in ps:
                run += d
                peak = max(peak, run)
            exp[trunk] = (peak, len(ps) // 2)
        got = {
            r.trunk: (r.peak_concurrent, r.n_calls)
            for r in trunk_peak_concurrency(spark, SF).collect()
        }
        assert got == exp
