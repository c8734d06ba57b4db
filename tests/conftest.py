import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_SMOKE = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from auto_ts_spark.session import get_spark

    s = get_spark("pytest", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    from auto_ts_spark.io.sources import load_table

    return load_table(spark, sf_dir, "events").cache()


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    from auto_ts_spark.io.sources import load_table

    return load_table(spark, sf_dir, "documents").cache()
