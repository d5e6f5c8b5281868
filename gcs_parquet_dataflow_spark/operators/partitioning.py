"""Compute-parallelism helper.

Scan parallelism follows input splits (``maxPartitionBytes``), which is
right when cost ∝ bytes read. Sketching/embedding operators are
COMPUTE-bound: a few MB of text can carry seconds of per-row hashing, so
a corpus that arrives as one or two splits serializes on two cores.
``ensure_parallelism`` repartitions only when the input has fewer
partitions than the session's parallelism — at 100 TB inputs already
have thousands of splits and this is a no-op; on small/compacted inputs
it unlocks the full machine for the compute stage that follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition up to ``spark.default.parallelism`` iff the input is
    under-partitioned. ``key`` hash-partitions (stable placement for a
    downstream groupBy on the same key); None round-robins."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key) if key else df.repartition(target)
