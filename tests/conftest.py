import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geofeaturegeneration_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small parallelism for test latency; shuffle partitions tiny so window
    # boundary bugs (per-partition off-by-ones) would surface
    s = get_spark("gfg-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
