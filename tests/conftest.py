from __future__ import annotations

import os

import pytest

from idn_area_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="idn_area_etl_spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01_dir() -> str:
    """The sf0.1 dataset — only for tests whose asserted behavior needs
    data volume sf0.001 can't provide (e.g. AQE-coalescing drift needs
    multiple shuffle partitions to have room to diverge).  Skips, not
    fails, on machines without the generated testdata."""
    path = "/root/testdata/sf0.1"
    if not os.path.isdir(path):
        pytest.skip("sf0.1 testdata not available on this machine")
    return path
