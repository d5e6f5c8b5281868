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


def value_histogram(
    df: DataFrame,
    group_cols: list[str],
    cents_col: str,
) -> DataFrame:
    """Mergeable EXACT-quantile rollup table: per-group distinct-value
    counts over an integer (cents) column → (group_cols…, v, n).

    The quantile analog of the HLL sketch tables: histograms from
    different shards/days merge by summing counts per (group, v), and
    ``quantiles_from_histogram`` recovers the exact interpolated
    percentile — bit-identical to sorting the raw rows — without ever
    re-scanning them. Size is bounded by the column's distinct-value
    count (for 2-decimal money at any realistic range: ≤ a few million
    rows per group axis, parquet-tiny), NOT by the row count, which is
    what makes it a 100 TB pattern.
    """
    return df.groupBy(*group_cols, F.col(cents_col).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def merge_histograms(parts: list[DataFrame]) -> DataFrame:
    """Union shard histograms into one (sum counts per (group, v))."""
    if not parts:
        raise ValueError("no histograms to merge")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    keys = [c for c in u.columns if c != "n"]
    return u.groupBy(*keys).agg(F.sum("n").cast("long").alias("n"))


def quantiles_from_histogram(
    hist: DataFrame,
    group_cols: list[str],
    ps: list[float],
) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` / DuckDB
    ``quantile_cont`` semantics: h = p·(n−1), linear between the values
    at ⌊h⌋/⌈h⌉) computed FROM the histogram → (group_cols…, n_rows,
    p_<p>…). One per-group cumulative window over distinct values +
    one conditional aggregate per percentile — cost is histogram-sized,
    independent of the original row count."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*group_cols).orderBy("v")
    h = (
        hist.withColumn("cum", F.sum("n").over(w))
        .withColumn("tot", F.sum("n").over(W.partitionBy(*group_cols)))
    )
    aggs = [F.max("tot").cast("long").alias("n_rows")]
    for p in ps:
        hp = F.lit(p) * (F.col("tot") - 1)
        lo_i = F.floor(hp)
        hi_i = F.ceil(hp)
        # value covering 0-based index i is the min v with cum > i
        v_lo = F.min(F.when(F.col("cum") > lo_i, F.col("v")))
        v_hi = F.min(F.when(F.col("cum") > hi_i, F.col("v")))
        frac = F.max(hp - lo_i)  # constant per group
        name = f"p{str(p).replace('0.', '').replace('.', '_')}"
        aggs.append(
            F.round((v_lo + frac * (v_hi - v_lo)) / 100, 6).alias(name)
        )
    return h.groupBy(*group_cols).agg(*aggs)
