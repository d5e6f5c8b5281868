"""Table loader for the driver-provided parquet fixtures.

``spark.read.parquet`` on these paths goes through Spark's vectorized
parquet reader: columnar batches end-to-end, row-group-granular splits,
predicate/column pushdown — a strict upgrade over the reference's
Arrow ``iter_batches(20000)`` + ``.to_pylist()`` row-ification
(reference main_batch.py:87-94, which exists only for OOM safety that
Spark's ``spark.sql.files.maxPartitionBytes`` provides natively).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _nano_timestamp_columns(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) in ``path``'s footer.

    Spark has no nanosecond timestamp type; with
    ``spark.sql.legacy.parquet.nanosAsLong`` these arrive as LongType and we
    convert to microsecond timestamps (truncation — the same precision DuckDB
    uses, so oracle comparisons agree).
    """
    import glob

    import pyarrow as pa

    if os.path.isdir(path):
        # Spark-written tables are DIRECTORIES of part files (one footer
        # is representative — all parts share the writer's schema);
        # an empty directory (no committed parts) has no nanos columns.
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return []
        path = parts[0]
    cols = []
    schema = pq.read_schema(path)
    for field in schema:
        t = field.type
        if pa.types.is_timestamp(t) and t.unit == "ns":
            cols.append(field.name)
    return cols


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = table_path(sf_dir, name)
    # Defensive: callers (e.g. the driver harness) may pass a session not
    # built by get_spark(); these are session-level SQL confs, safe to set
    # at runtime, and required to read the fixtures' TIMESTAMP(NANOS)
    # columns and to keep the reference's permissive cast semantics.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for col in _nano_timestamp_columns(path):
        df = df.withColumn(
            col, F.timestamp_micros((F.col(col) / F.lit(1000)).cast("long"))
        )
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    names: tuple[str, ...] = TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the fixture tables; optionally register same-named temp views
    so the SQL API sees the identical catalog the DuckDB oracle does."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def register_views(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register every fixture table as a temp view (``prefix<name>``)
    so the full engine surface is reachable from plain ``spark.sql`` —
    the SQL-first entry point alongside the DataFrame builders; both
    compile to the same Catalyst plans, so pushdown/pruning behavior is
    identical (verified in tests/test_batch_pipeline.py). Returns the
    view names registered."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
