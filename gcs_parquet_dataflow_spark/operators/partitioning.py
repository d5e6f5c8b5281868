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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row number under a TOTAL order, without a
    single-partition window (the one shape the catalog-wide plan guard
    forbids over unbounded input — VERDICT r4 item 3).

    Classic two-pass distributed rank: range-partition on the order
    key, rank locally inside each range (every window PARTITIONED by
    ``spark_partition_id``), then add each partition's broadcast
    cumulative offset — the offset table is |partitions| rows built by
    a hash aggregate, so the only unpartitioned window in the plan sits
    above an aggregate node. The ranked input is persisted (registered
    for :func:`release_intermediates`) because the offset branch and
    the output branch must observe the SAME range partitioning —
    ``repartitionByRange`` samples its bounds, so two recomputations
    could disagree.

    ``order_cols`` must be a total order (no duplicate keys), otherwise
    ranks within a tie-group are partitioning-dependent.
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    from pyspark.sql import Window as W

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(n_parts, *cols).withColumn(
        "_gpid", F.spark_partition_id()
    )
    ranged = persist_intermediate(
        ranged.withColumn(
            "_lrn",
            F.row_number().over(W.partitionBy("_gpid").orderBy(*cols)),
        )
    )
    sizes = ranged.groupBy("_gpid").agg(F.count(F.lit(1)).alias("_psz"))
    offsets = sizes.select(
        "_gpid",
        F.coalesce(
            F.sum("_psz").over(
                W.orderBy("_gpid").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
    )
    return (
        ranged.join(F.broadcast(offsets), "_gpid")
        .withColumn(out, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_gpid", "_lrn", "_off")
    )


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
