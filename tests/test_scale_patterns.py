"""Scale-pattern proofs: salted distinct equivalence, and bucketed
tables joining without a shuffle (the SCALE.md co-location claim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators.skew import (
    salted_aggregate,
    salted_count_distinct,
)


def test_salted_count_distinct_is_exact(spark):
    df = spark.createDataFrame(
        [(i % 3, f"v{i % 40}") for i in range(500)], "k int, v string"
    )
    exact = {
        (r["k"],): r["n"]
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    salted = {
        (r["k"],): r["n_distinct"]
        for r in salted_count_distinct(df, ["k"], "v", buckets=8).collect()
    }
    assert exact == salted


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame(
        [(i % 2, i) for i in range(1000)], "k int, x long"
    )
    plain = {
        r["k"]: (r["s"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["n"])
        for r in salted_aggregate(
            df,
            ["k"],
            {"s": F.sum("x"), "n": F.count(F.lit(1))},
            salt_buckets=8,
        ).collect()
    }
    assert plain == salted


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Pre-bucketing both fact tables on the join key removes the
    data-sized Exchange — the 100 TB co-located-join strategy."""
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path}/warehouse'"
    )
    try:
        left = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        right = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        for name, df in (("t_left", left), ("t_right", right)):
            (
                df.write.bucketBy(8, "k").sortBy("k")
                .mode("overwrite").saveAsTable(f"bktdb.{name}")
            )
        joined = (
            spark.table("bktdb.t_left")
            .hint("merge")  # force SMJ so the shuffle question is visible
            .join(spark.table("bktdb.t_right"), "k")
        )
        assert joined.count() == 10000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")
