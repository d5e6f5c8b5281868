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


def test_stratified_sample_is_partitioning_independent_and_per_stratum(spark):
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(2000)], "k long, g string"
    )
    frac = {"a": 0.5, "b": 0.1}
    one = stratified_sample(df.repartition(1), "k", "g", frac)
    many = stratified_sample(df.repartition(17), "k", "g", frac)
    assert sorted(r["k"] for r in one.collect()) == sorted(
        r["k"] for r in many.collect()
    )
    rates = {
        r["g"]: r["n"]
        for r in one.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(rates["a"] / 1000 - 0.5) < 0.08
    assert abs(rates["b"] / 1000 - 0.1) < 0.05
    # strata not listed use default_fraction (0.0 → dropped entirely)
    df2 = df.withColumn("g", F.lit("other"))
    assert stratified_sample(df2, "k", "g", frac).count() == 0
