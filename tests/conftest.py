from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from interpro7_dw_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck_small():
    from interpro7_dw_spark.testing import make_duck_con

    return make_duck_con(SF_SMALL)
