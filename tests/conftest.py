from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from hepop_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hepop-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
