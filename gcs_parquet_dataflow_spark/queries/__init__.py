"""Declared query surface. Importing this package registers every query
(core relational catalog + BASELINE extensions) into ``CATALOG``."""

from gcs_parquet_dataflow_spark.queries.catalog import CATALOG, Query, query
from gcs_parquet_dataflow_spark.queries import extensions as _extensions  # noqa: F401

__all__ = ["CATALOG", "Query", "query"]
