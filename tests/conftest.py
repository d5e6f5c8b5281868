from __future__ import annotations

import pytest

from gcs_parquet_dataflow_spark.session import get_spark


def pytest_collection_modifyitems(config, items):
    # every overflow pin is part of the fast driver gate (`-m fast`)
    # without double-decorating the slow modules that host them
    for item in items:
        if "overflow" in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="gcs_parquet_dataflow_spark-tests",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.driver.memory": "8g",
        },
    )
    yield spark
    spark.stop()
