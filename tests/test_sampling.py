"""Deterministic sampling guarantees: stable membership, disjoint and
exhaustive splits, and partition-independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)


def test_sample_membership_is_stable_under_growth(spark):
    small = spark.range(0, 500).select(F.col("id"))
    big = spark.range(0, 5000).select(F.col("id"))
    s_small = {r["id"] for r in deterministic_sample(small, "id", 0.2).collect()}
    s_big = {r["id"] for r in deterministic_sample(big, "id", 0.2).collect()}
    # rows present in both datasets get the same verdict
    assert s_small == {i for i in s_big if i < 500}
    # fraction roughly honored
    assert 0.15 < len(s_big) / 5000 < 0.25


def test_split_disjoint_exhaustive_and_partition_independent(spark):
    df = spark.range(0, 2000).select(F.col("id"))
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(df, "id", fr)
    counts = {r["split"]: r["n"] for r in
              a.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 2000  # exhaustive, one split per row
    assert 0.7 < counts["train"] / 2000 < 0.9
    # identical assignment under a different partitioning
    b = hash_split(df.repartition(17), "id", fr)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
