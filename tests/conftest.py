from __future__ import annotations

import os
import sys

import pytest

# the checkout CONTAINING this tests/ dir — not a hard-coded /root/repo,
# so the suite tests the code it sits next to (worktree A/Bs included)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hepop_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hepop-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
