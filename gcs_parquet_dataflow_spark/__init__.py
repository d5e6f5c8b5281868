"""gcs_parquet_dataflow_spark — a PySpark-native analytics/ETL engine.

A ground-up rebuild of the capabilities of danakock/GCS-Parquet-Dataflow
(a config-driven Beam/Dataflow pipeline: Parquet-on-object-storage ingestion,
prefix routing, a config-compiled projection/cast/enrichment transform with
dead-letter semantics, batched HTTP sink with retry, streaming dedup), plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) — all expressed Spark-first: DataFrame/SQL plans that
Catalyst optimizes, Pandas UDFs only where built-ins can't express the
semantics, and partitioning strategies designed for 100 TB scale.
"""

from gcs_parquet_dataflow_spark.session import get_spark
from gcs_parquet_dataflow_spark.catalog import load_tables, TABLES

__all__ = ["get_spark", "load_tables", "TABLES"]
__version__ = "0.1.0"
