"""Plan-shape regression inside the suite: a fast cross-section of the
audits tools/plan_audit.py runs in full (166 plans). A refactor that
drops a pushdown, breaks a broadcast, or sneaks row-at-a-time Python
into one of these plans fails HERE, not in a later manual audit run.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from plan_audit import AUDITS, audit, explain_str  # noqa: E402

from hepop_spark.queries import registry  # noqa: E402

# one representative per audit dimension: pushdown-heavy TPC-H, broadcast
# join, minhash dedup, Arrow-stage ANN, round-3 statistics + VoIP + text
SAMPLE = [
    "q3_shipping_priority",
    "join_broadcast_dim",
    "dedup_minhash_lsh",
    "b2_filter_like",
    "benford_first_digit",
    "auc_roc_exact",
    "sip_response_class_rates",
    "keyword_rake_topk",
    "downsample_m4",
    "decimal_exact_money",
]


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    reg = registry()
    return {name: explain_str(reg[name].fn(spark, sf_dir)) for name in SAMPLE}


class TestPlanShapes:
    @pytest.mark.parametrize("name", SAMPLE)
    def test_audit_clean(self, plans, name):
        problems = audit(name, plans[name], AUDITS[name])
        assert not problems, f"{name}: {problems}"

    def test_no_row_python_anywhere_in_sample(self, plans):
        for name, plan in plans.items():
            assert "BatchEvalPython" not in plan, name


class TestPartialRuleSpelling:
    """The `partial` rule accepts BOTH spellings of map-side aggregation:
    partial_* function names, and the distinct-style two-phase shape
    whose function lists are empty (HashAggregate as the DIRECT child of
    an Exchange — children execute first, so it fires pre-shuffle).
    knn_graph_refine's plan is all-distinct and carries no partial_*
    marker; the r12 rule extension keeps it auditable."""

    FUNC_SPELLING = "HashAggregate [partial_sum]\n+- Scan parquet"
    DISTINCT_SPELLING = (
        "HashAggregate (3)\n"
        "+- Exchange (2)\n"
        "   +- HashAggregate (1)\n"
        "      +- Scan parquet"
    )
    # final-only aggregate ABOVE the exchange: the shuffle moves raw rows
    NO_PARTIAL = (
        "HashAggregate (3)\n"
        "+- Exchange (2)\n"
        "   +- Project (1)\n"
        "      +- Scan parquet"
    )

    def test_function_spelling_passes(self):
        assert not [p for p in audit("x", self.FUNC_SPELLING, {"partial"})
                    if "partial" in p]

    def test_distinct_spelling_passes(self):
        assert not [p for p in audit("x", self.DISTINCT_SPELLING, {"partial"})
                    if "partial" in p]

    def test_final_only_aggregate_still_fails(self):
        assert any("partial" in p
                   for p in audit("x", self.NO_PARTIAL, {"partial"}))
