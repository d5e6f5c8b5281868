"""Partitioned-parquet lake sink: the engine's durable sink for DLQ
records (reference K2 publishes DLQ bytes to Pub/Sub, main.py:497-502 —
a lake table is the Spark-native equivalent: queryable, joinable,
re-drivable) and for materialized operator outputs (sketch tables,
feature tables).

Scale contract:

- **Partition columns are the read-side pruning interface**: a reader
  filtering on them scans only matching directories (PartitionFilters
  in the plan, verified by tests/test_parquet_lake.py). Partition by
  low-cardinality routing keys (config_id, error_type, date) — never
  high-cardinality ones (file-count explosion).
- **Idempotent re-runs** for streaming `foreachBatch` side-writes: pass
  ``batch_id`` and the write lands under a batch-keyed subdirectory with
  dynamic partition overwrite — replaying a micro-batch overwrites its
  own output instead of duplicating it (SURVEY §7 hard part 6).
- Writer parallelism = input partitions; ``coalesce_files`` caps small-
  file count for low-volume DLQ streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "append",
    batch_id: int | None = None,
    coalesce_files: int | None = None,
) -> None:
    """Write ``df`` as a partitioned parquet table.

    With ``batch_id``, the batch id becomes the leading partition column
    and the write uses dynamic partition overwrite — the idempotency key
    for streaming replays."""
    writer_df = df
    parts = list(partition_by)
    dynamic = False
    if batch_id is not None:
        writer_df = writer_df.withColumn("_batch_id", F.lit(int(batch_id)))
        parts = ["_batch_id", *parts]
        mode = "overwrite"
        dynamic = True
    if coalesce_files is not None:
        writer_df = writer_df.coalesce(coalesce_files)
    writer = writer_df.write.mode(mode)
    if dynamic:
        # per-write option, NOT session conf — mutating the session would
        # silently change overwrite semantics for unrelated writers
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if parts:
        writer = writer.partitionBy(*parts)
    writer.parquet(path)


def write_dlq(
    dlq: DataFrame,
    path: str,
    batch_id: int | None = None,
    error_col: str = "_error",
) -> None:
    """Persist a DLQ split (compiler ``split_dlq`` output) partitioned by
    error_type — the triage query ("show me all missing_required_field
    rows from yesterday") is a pruned scan."""
    flat = dlq.withColumn("error_type", F.col(f"{error_col}.error_type")).withColumn(
        "error_reason", F.col(f"{error_col}.reason")
    ).drop(error_col)
    write_partitioned(
        flat, path, ["error_type"], batch_id=batch_id, coalesce_files=8
    )


def write_sorted(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet globally range-ordered on ``range_cols``:
    ``repartitionByRange`` gives each output file a DISJOINT key range,
    ``sortWithinPartitions`` orders rows inside, so every file's footer
    min/max stats form non-overlapping zones — a reader filtering on the
    sort key skips whole files/row-groups (verified by
    tests/test_parquet_lake.py reading the footers). The layout step
    that makes time-series / key-range scans cheap at 100 TB."""
    parted = (
        df.repartitionByRange(n_files, *range_cols)
        if n_files
        else df.repartitionByRange(*range_cols)
    )
    parted.sortWithinPartitions(*range_cols).write.mode(mode).parquet(path)


def read_lake(spark: SparkSession, path: str) -> DataFrame:
    """Read a lake table back; partition columns come from directory
    names and filters on them prune at planning time."""
    return spark.read.parquet(path)
