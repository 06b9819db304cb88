from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from datalake_local_spark.session import get_spark, load_tables  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    import os

    os.environ["SPARK_GRAFT_DRIVER_MEM"] = "4g"
    session = get_spark(
        app_name="datalake-local-spark-tests", cpus="4", warehouse_dir=str(warehouse)
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)
