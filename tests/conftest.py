from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from osm2shp_spark.session import get_spark

    s = get_spark(app_name="osm2shp_spark_tests", master="local[8]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    from parity import duck_con

    return duck_con(SF_SMALL)


@pytest.fixture(scope="session")
def duck_med():
    from parity import duck_con

    return duck_con(SF_MED)
