"""Bucketed co-located joins (SCALE.md's fact⋈fact mitigation): both
tables hash-bucketed by the join key at write time → the recurring
join and key-grouped aggregations run with ZERO shuffle at read time.
The plan assertions here are the point: result parity alone would not
prove the Exchange nodes are gone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
    read_bucketed,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    from gcs_parquet_dataflow_spark.catalog import load_table

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_bucketed(
        li, "li_bkt", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=str(tmp_path / "li"),
    )
    write_bucketed(
        o, "o_bkt", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(tmp_path / "o"),
    )
    yield li, o
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_bucketed_join_is_shuffle_free_and_correct(spark, bucketed_tables):
    li, o = bucketed_tables
    lb, ob = read_bucketed(spark, "li_bkt"), read_bucketed(spark, "o_bkt")
    # force a sort-merge join so the assertion targets the co-location
    # (AQE would happily broadcast at this fixture size)
    joined = lb.hint("merge").join(
        ob, lb["l_orderkey"] == ob["o_orderkey"]
    ).select("l_orderkey", "l_extendedprice", "o_totalprice")
    rows = joined.count()
    assert _exchanges(joined) == 0, "bucketed join must not shuffle"
    plain = li.hint("merge").join(
        o, li["l_orderkey"] == o["o_orderkey"]
    ).select("l_orderkey", "l_extendedprice", "o_totalprice")
    assert rows == plain.count()
    assert _exchanges(plain) > 0  # the shuffle the bucketing removed
    # value parity, not just row counts
    a = joined.groupBy().agg(
        F.sum(F.round(F.col("l_extendedprice") * 100)).cast("long")
    ).first()[0]
    b = plain.groupBy().agg(
        F.sum(F.round(F.col("l_extendedprice") * 100)).cast("long")
    ).first()[0]
    assert a == b


def test_bucketed_groupby_on_key_is_shuffle_free(spark, bucketed_tables):
    lb = read_bucketed(spark, "li_bkt")
    agg = lb.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    agg.count()
    assert _exchanges(agg) == 0, "key-grouped agg must reuse bucketing"


def test_plain_path_read_loses_bucketing(spark, bucketed_tables, tmp_path):
    """Documented footgun: reading the same files by PATH drops the
    bucket metadata and the shuffle comes back — read through the
    catalog (read_bucketed)."""
    li_path = spark.sql("DESCRIBE FORMATTED li_bkt").filter(
        F.col("col_name") == "Location"
    ).first()["data_type"]
    by_path = spark.read.parquet(li_path)
    agg = by_path.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    agg.count()
    assert _exchanges(agg) > 0
