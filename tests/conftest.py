import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from prclz_spark.session import get_spark

    s = get_spark("prclz-tests", master="local[4]", shuffle_partitions="8")
    yield s
    s.stop()


SF_DIR = os.environ.get("PRCLZ_TEST_SF_DIR", "/root/testdata/sf0.001")
SF01_DIR = "/root/testdata/sf0.01"
