from __future__ import annotations

import pytest

from climateiq_pipelines_spark import get_spark
from climateiq_pipelines_spark.parity import duck_connect
from climateiq_pipelines_spark.plans import load_all

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"

load_all()


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="climateiq-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck_small():
    con = duck_connect(SF_SMALL)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_med():
    con = duck_connect(SF_MED)
    yield con
    con.close()
