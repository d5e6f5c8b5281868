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


# ---------------------------------------------------------------------------
# Cached-intermediate registry.
#
# Pair/candidate operators persist() an intermediate (band table, inverted
# index) that BOTH sides of a self-join read — unpersisting before the
# caller's action would defeat the cache, so the operator can't release it
# itself. The registry tracks every such handle; callers (query runners,
# bench loops, long-lived services) call ``release_intermediates()`` after
# each consuming action so cached blocks don't accumulate for the driver
# process's lifetime.
# ---------------------------------------------------------------------------

_INTERMEDIATES: list[DataFrame] = []


def persist_intermediate(df: DataFrame) -> DataFrame:
    """persist() + register for deferred release."""
    handle = df.persist()
    _INTERMEDIATES.append(handle)
    return handle


def register_intermediate(df: DataFrame) -> DataFrame:
    """Register an already-persisted/checkpointed handle for release."""
    _INTERMEDIATES.append(df)
    return df


def release_intermediates() -> int:
    """Unpersist every registered intermediate; returns how many."""
    n = len(_INTERMEDIATES)
    while _INTERMEDIATES:
        _INTERMEDIATES.pop().unpersist()
    return n
