"""Property-based tests for the round-4 operators: CDC diff/apply
round-trip, count-min invariants, and salted-min merge associativity
under random shardings. Example counts are small — every example runs
real Spark jobs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

N_EXAMPLES = 6

state = st.dictionaries(
    st.integers(0, 12), st.integers(-5, 5), min_size=0, max_size=8
)


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(old=state, new=state)
def test_snapshot_diff_apply_reconstructs_new(spark, old, new):
    """diff(old, new) applied to old — delete the deletes, upsert the
    inserts/updates — must reconstruct new exactly, for ANY pair of
    keyed states (the CDC contract consumers rely on)."""
    from gcs_parquet_dataflow_spark.operators.incremental import snapshot_diff

    mk = lambda d: spark.createDataFrame(  # noqa: E731
        [(k, v) for k, v in d.items()], "k long, v long"
    )
    changes = snapshot_diff(mk(old), mk(new), ["k"]).collect()
    applied = dict(old)
    for r in changes:
        if r["change_type"] == "delete":
            applied.pop(r["k"], None)
        else:
            applied[r["k"]] = r["new_v"]
    assert applied == new
    # and unchanged keys never appear in the feed
    for r in changes:
        if r["change_type"] == "update":
            assert old[r["k"]] != new[r["k"]]


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=60))
def test_count_min_upper_bound_property(spark, values):
    """For ANY multiset, every CM point estimate ≥ the true count."""
    from gcs_parquet_dataflow_spark.operators.sketches import (
        count_min_build,
        count_min_lookup,
    )

    df = spark.createDataFrame([(v,) for v in values], "k long")
    sk = count_min_build(df, "k", depth=3, width=16)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n"))
    est = count_min_lookup(sk, exact, "k", depth=3, width=16)
    assert est.filter(F.col("n_cm") < F.col("n")).count() == 0


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=1,
        max_size=40,
    )
)
def test_salted_min_merge_associativity_property(spark, rows):
    """Sharding the input by ANY random assignment and min-merging the
    shard sketches equals the single-shot sketch bit-for-bit."""
    from gcs_parquet_dataflow_spark.operators.sketches import (
        merge_min_sketches,
        salted_min_sketch,
    )

    df = spark.createDataFrame(
        [(shard, v) for shard, v in rows], "shard long, v long"
    ).withColumn("g", F.lit("all"))
    direct = salted_min_sketch(df, ["g"], "v", n_salts=4)
    sharded = salted_min_sketch(df, ["g", "shard"], "v", n_salts=4)
    merged = merge_min_sketches(sharded, ["g"], n_salts=4)
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(
    keys=st.lists(st.integers(-1000, 1000), min_size=1, max_size=40,
                  unique=True),
    n_input_parts=st.integers(1, 9),
    n_range_parts=st.integers(1, 7),
)
def test_global_row_number_property(spark, keys, n_input_parts, n_range_parts):
    """global_row_number must equal 1..N under the sort order for ANY
    key set, input partitioning, and range-partition count (round-5
    operator — the distributed replacement for single-partition
    row_number/ntile sorts)."""
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        global_row_number,
        release_intermediates,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(
        n_input_parts
    )
    got = {
        r["k"]: r["rn"]
        for r in global_row_number(
            df, ["k"], out="rn", num_partitions=n_range_parts
        ).collect()
    }
    release_intermediates()
    want = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == want
