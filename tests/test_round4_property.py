"""Property tests for the round-4 closed-form derivations: the
aggregated-grid NTILE boundary math (quantile_bins_equidepth) and the
round-robin modular position counts (curriculum_shard_roundrobin) must
reproduce their row-level definitions on arbitrary small inputs —
including N < K, N % K != 0, heavy ties, and empty groups."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

N_BINS = 10
K_SHARDS = 8


def _ntile_rowlevel(values: list[int], k: int) -> dict[int, list[int]]:
    """Reference NTILE: first N%k buckets get ceil(N/k) rows."""
    n = len(values)
    out: dict[int, list[int]] = {}
    base, rem = divmod(n, k)
    pos = 0
    for b in range(1, k + 1):
        size = base + (1 if b <= rem else 0)
        if size:
            out[b] = values[pos:pos + size]
        pos += size
    return out


def _ntile_grid(values: list[int], k: int) -> dict[int, list[int]]:
    """The aggregated-grid derivation used by quantile_bins_equidepth:
    per-value counts -> cumulative position ranges -> closed-form bin
    boundaries -> overlap counts."""
    n = len(values)
    counts = Counter(values)
    base, rem = divmod(n, k)
    bins = {}
    for b in range(1, k + 1):
        bin_start = (b - 1) * base + min(b - 1, rem) + 1
        bin_end = b * base + min(b, rem)
        bins[b] = (bin_start, bin_end)
    out: dict[int, list[int]] = {}
    end = 0
    for v in sorted(counts):
        start = end
        end = start + counts[v]
        for b, (lo, hi) in bins.items():
            ov = min(end, hi) - max(start + 1, lo) + 1
            if ov > 0:
                out.setdefault(b, []).extend([v] * ov)
    return out


def _roundrobin_counts(n: int, k: int, start: int, size: int) -> list[int]:
    """Closed-form count of positions p in (start, start+size] with
    (p-1) % k == s, as used by curriculum_shard_roundrobin."""
    def g(x: int, s: int) -> int:
        return (x - 1 - s) // k + 1 if x >= s + 1 else 0

    return [g(start + size, s) - g(start, s) for s in range(k)]


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=120))
def test_grid_ntile_equals_rowlevel(values):
    values = sorted(values)
    ref = _ntile_rowlevel(values, N_BINS)
    got = _ntile_grid(values, N_BINS)
    # per-bin aggregates (count, min, max, sum) must agree — contents may
    # permute within equal values, which no aggregate can observe
    assert set(ref) == set(got)
    for b in ref:
        assert len(ref[b]) == len(got[b])
        assert sorted(ref[b]) == sorted(got[b])


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=0, max_value=500),
)
def test_roundrobin_closed_form(start, size):
    ref = Counter((p - 1) % K_SHARDS for p in range(start + 1, start + size + 1))
    got = _roundrobin_counts(start + size, K_SHARDS, start, size)
    assert sum(got) == size
    for s in range(K_SHARDS):
        assert got[s] == ref.get(s, 0)
