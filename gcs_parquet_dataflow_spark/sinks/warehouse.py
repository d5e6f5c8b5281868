"""Bucketed warehouse tables: the shuffle-elimination story for
repeated big⋈big joins.

A 100 TB fact⋈fact join shuffles both sides on the key EVERY run. If
both tables are written ``bucketBy(n, key)`` (hash-partitioned into a
fixed bucket count at write time, recorded in the catalog), Spark's
planner proves co-partitioning and joins bucket-to-bucket with NO
exchange — the shuffle is paid once at write, amortized over every
subsequent join/aggregation on that key. ``sortBy`` additionally makes
the merge phase sort-free. This is the Spark-native equivalent of the
co-located table layouts distributed warehouses use.

Verified by tests/test_warehouse.py: the joined plan contains no
Exchange operator.

Sizing: pick n_buckets so one bucket of the LARGER table ≈ one task's
worth (128-512 MB); bucket counts must match (or divide) across tables
meant to join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) parquet
    table registered in the session catalog. ``path`` makes it external
    (data at ``path``, metadata in the catalog)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (``spark.table``,
    not ``read.parquet`` — a raw path read loses bucketing metadata and
    with it the exchange elimination)."""
    return spark.table(table)
