"""Mergeable cardinality sketches (Apache DataSketches HLL via Spark's
``hll_sketch_agg`` family): the 100 TB rollup pattern where per-shard /
per-day sketch TABLES are materialized once and any later rollup —
across days, sources, or the whole corpus — is a cheap sketch union
instead of a re-scan of raw data.

Why this matters at scale: exact count-distinct over 100 TB shuffles the
distinct keys every time someone asks; a persisted sketch table reduces
every follow-up rollup to reading kilobyte-sized binaries. The sketches
are associative and commutative, so shard → daily → monthly rollups
compose without ever touching raw rows again.

Approximate ops are deliberately NOT in the DuckDB oracle surface
(engine sketch implementations differ); correctness is asserted as an
error-bound + mergeability test (tests/test_scale_patterns.py).

No reference analog (the reference computes no aggregates at all —
SURVEY §2.7); this is extension surface for the training-data stack
(e.g. distinct-document / distinct-user reach per source over time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Materialize one HLL sketch per group → (group_cols…, hll: binary).

    The output is a tiny, parquet-writable sketch table (a sketch at
    lgConfigK=12 is ≤ 4 KiB regardless of input cardinality). One hash
    aggregation with map-side partials — the same shape as an exact
    count-distinct's first phase, but the shuffle carries fixed-size
    sketch buffers instead of every distinct key.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lgk)).alias(
            "hll"
        )
    )


def merge_estimates(
    sketch_df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll",
) -> DataFrame:
    """Roll sketches up to ``group_cols`` → (group_cols…, approx_distinct).

    Pure sketch-union aggregation: runs on the sketch table alone, never
    re-reads raw data. Pass a coarser ``group_cols`` than the sketch
    table's (or ``[]`` … via a constant column) to roll up across
    shards/days; unions are associative so any rollup ladder gives the
    same estimate as a single-shot sketch over the union of inputs.
    """
    return sketch_df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col)))
        .cast("long")
        .alias("approx_distinct")
    )
