"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``gcs_parquet_dataflow_spark.queries.catalog``;
this module is a thin adapter over that registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    config-compiled transform (SURVEY §2.6) over the events table."""
    from gcs_parquet_dataflow_spark.queries import CATALOG

    return CATALOG["events_transform"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from gcs_parquet_dataflow_spark.queries import CATALOG

    return {name: q.build for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    from gcs_parquet_dataflow_spark.queries import CATALOG

    return {
        name: q.oracle for name, q in CATALOG.items() if q.oracle is not None
    }
