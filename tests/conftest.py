from __future__ import annotations

import pytest

from gcs_parquet_dataflow_spark.session import get_spark


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
