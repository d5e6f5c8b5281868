"""Deterministic sampling and dataset splitting.

``df.sample()``/``sampleBy()`` are seeded per-partition — results change
with partitioning, which breaks reproducibility across cluster shapes
and makes train/test splits unauditable. Training-data pipelines need
CONTENT-derived sampling: a row's split is a pure function of its key,
so any engine, any partitioning, any day recomputes the same assignment
(and the split can be proven disjoint/exhaustive in SQL — see the
oracle for ``sample_hash_split``).

Buckets come from the md5-based ``hash32`` (functions/text.py), uniform
over [0, 2^32); bucket = hash % denominator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.functions.text import hash32


def hash_bucket(key: Column, denominator: int = 10000) -> Column:
    """Stable bucket in [0, denominator) from the key's string form."""
    return hash32(key.cast("string")) % denominator


def deterministic_sample(
    df: DataFrame, key: str | Column, fraction: float, denominator: int = 10000
) -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen by key hash — reproducible
    under any partitioning, and a row's membership never changes as the
    dataset around it grows (critical for incremental pipelines)."""
    k = F.col(key) if isinstance(key, str) else key
    return df.filter(hash_bucket(k, denominator) < int(fraction * denominator))


def stratified_sample(
    df: DataFrame,
    key: str | Column,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    denominator: int = 10000,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    fraction of rows, chosen by key hash — the content-derived twin of
    ``df.sampleBy()`` (which is partitioning-dependent). Strata absent
    from ``fractions`` keep ``default_fraction``. Reproducible under
    any partitioning; membership is stable as the dataset grows."""
    k = F.col(key) if isinstance(key, str) else key
    bucket = hash_bucket(k, denominator)
    thresh: Column | None = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        lim = F.lit(int(frac * denominator))
        thresh = F.when(cond, lim) if thresh is None else thresh.when(cond, lim)
    default = F.lit(int(default_fraction * denominator))
    thresh = default if thresh is None else thresh.otherwise(default)
    return df.filter(bucket < thresh)


def weighted_sample(
    df: DataFrame,
    key: str | Column,
    weight: Column,
    denominator: int = 10000,
) -> DataFrame:
    """Keep each row with probability ``weight`` (clamped to [0,1]),
    decided by the row's OWN key hash — deterministic importance
    sampling (e.g. ``weight = quality_score`` keeps good documents
    proportionally more often). Same stability guarantees as
    ``deterministic_sample``: membership is a pure function of
    (key, weight), independent of partitioning."""
    k = F.col(key) if isinstance(key, str) else key
    thresh = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0)) * denominator
    return df.filter(hash_bucket(k, denominator) < thresh)


def hash_split(
    df: DataFrame,
    key: str | Column,
    fractions: dict[str, float],
    out: str = "split",
    denominator: int = 10000,
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test …) by
    key-hash range; fractions must sum to ≤ 1 (remainder → last split).
    Disjoint and exhaustive by construction."""
    k = F.col(key) if isinstance(key, str) else key
    bucket = hash_bucket(k, denominator)
    expr = None
    edge = 0.0
    names = list(fractions.keys())
    for name in names[:-1]:
        edge += fractions[name]
        cond = bucket < int(edge * denominator)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return df.withColumn(out, last if expr is None else expr.otherwise(last))
