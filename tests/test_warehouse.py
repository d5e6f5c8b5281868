"""Bucketed-table tests: co-bucketed joins and aggregations run with NO
exchange — the write-once-shuffle-never layout for repeated big joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.sinks.warehouse import read_table, write_bucketed

pytestmark = pytest.mark.fast  # driver quick-gate module (r13)


@pytest.fixture()
def no_broadcast(spark):
    # force the join planner to consider co-partitioning (a broadcast
    # would hide the exchange question entirely for test-sized tables)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cobucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("b")
    )
    write_bucketed(left, "t_left", ["k"], 8, sort_cols=["k"],
                   path=str(tmp_path / "l"))
    write_bucketed(right, "t_right", ["k"], 8, sort_cols=["k"],
                   path=str(tmp_path / "r"))
    try:
        joined = read_table(spark, "t_left").join(
            read_table(spark, "t_right"), "k"
        )
        assert joined.count() == 5_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # sorted buckets: the merge join needs no per-task sort either
        assert "SortMergeJoin" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")


def test_bucketed_aggregation_has_no_exchange(spark, tmp_path, no_broadcast):
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("v")
    )
    write_bucketed(df, "t_agg", ["k"], 8, path=str(tmp_path / "a"))
    try:
        agg = read_table(spark, "t_agg").groupBy("k").agg(
            F.sum("v").alias("sv")
        )
        assert agg.count() == 10_000
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_agg")


def test_path_read_loses_bucketing(spark, tmp_path, no_broadcast):
    """Documented footgun: reading the bucketed files by PATH drops the
    bucket metadata and the exchange comes back — always read through
    the catalog (read_table)."""
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("v")
    )
    write_bucketed(df, "t_path", ["k"], 8, path=str(tmp_path / "p"))
    try:
        agg = spark.read.parquet(str(tmp_path / "p")).groupBy("k").agg(
            F.sum("v").alias("sv")
        )
        agg.count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_path")
