import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_async_parquet_index_spark.session import get_spark
from datafusion_async_parquet_index_spark.sources.demo_corpus import write_demo_corpus

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def demo_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("demo_corpus")
    write_demo_corpus(str(d))
    return str(d)


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA
