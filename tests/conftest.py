from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Make google.protobuf importable (vendored pure-Python shim) BEFORE any
# SparkSession exists: transformWithStateInPandas workers import it, and the
# worker daemon inherits PYTHONPATH from the JVM's environment at launch.
from aetherium_trader_datapipeline_spark._vendor import protoshim  # noqa: E402

protoshim.activate()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from aetherium_trader_datapipeline_spark.session import get_spark

    import tempfile

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")),
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-")},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from aetherium_trader_datapipeline_spark.tables import load_tables

    return load_tables(spark, sf_dir)
