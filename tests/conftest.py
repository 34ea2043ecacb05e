import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


@pytest.fixture(scope="session")
def spark():
    from remotior_sensus_spark.session import get_spark

    s = get_spark("local[8]", shuffle_partitions=16)
    yield s


@pytest.fixture(scope="session")
def sf001_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def geo001_dir():
    from remotior_sensus_spark.synth.generate import ensure_geo

    return ensure_geo(0.001)
