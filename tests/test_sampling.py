"""Deterministic sampling guarantees: stable membership, disjoint and
exhaustive splits, and partition-independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)
import pytest

pytestmark = pytest.mark.fast  # driver quick-gate module (r13)


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


def test_resample_to_mixture_hits_target_and_is_stable(spark):
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.operators.sampling import (
        resample_to_mixture,
    )

    # skewed inputs: 3000 web, 1000 wiki, 500 books; target 40/40/20.
    # capacity = min(3000/.4, 1000/.4, 500/.2) = 2500 (wiki-bound)
    rows = (
        [(i, "web") for i in range(3000)]
        + [(10000 + i, "wiki") for i in range(1000)]
        + [(20000 + i, "books") for i in range(500)]
        + [(30000 + i, "junk") for i in range(200)]
    )
    df = spark.createDataFrame(rows, "k long, src string")
    w = {"web": 0.4, "wiki": 0.4, "books": 0.2}
    out = resample_to_mixture(df, "k", "src", w)
    counts = {
        r["src"]: r["n"]
        for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert "junk" not in counts  # unlisted sources dropped
    # the bottleneck source (wiki: rate 1.0) keeps every row exactly
    assert counts["wiki"] == 1000
    # achieved mixture ≈ target (hash sampling noise only)
    total = sum(counts.values())
    for src, frac in w.items():
        assert abs(counts[src] / total - frac) < 0.05, (src, counts)
    # membership is partitioning-independent
    again = resample_to_mixture(df.repartition(17), "k", "src", w)
    assert sorted(r["k"] for r in out.collect()) == sorted(
        r["k"] for r in again.collect()
    )


def test_fuzzy_linkage_blocks_and_orders_pairs(spark):
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.operators import linkage

    df = spark.createDataFrame(
        [
            (1, "acme corp"),
            (2, "acme corps"),   # dist 1, same block → pair
            (3, "acme inc"),     # dist 4 from corp → excluded at max_dist 2
            (4, "zenith corp"),  # different block, never compared
            (5, "acme corp"),    # exact dup → collapses to key 1
        ],
        "k long, name string",
    )
    pairs = linkage.fuzzy_pairs_blocked(
        df, "k", "name", linkage.first_token_block(F.col("name")), max_dist=2
    )
    got = [(r["key_a"], r["key_b"], r["dist"]) for r in pairs.collect()]
    assert got == [(1, 2, 1)]
    # block equi-join, not a cartesian product
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_profile_columns_single_pass_and_values(spark):
    from gcs_parquet_dataflow_spark.operators.quality import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (2, "b", None)],
        "k long, s string, v double",
    )
    prof = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert set(prof) == {"k", "s", "v"}
    assert prof["k"]["n_rows"] == 3 and prof["k"]["n_nulls"] == 0
    assert prof["k"]["n_distinct"] == 2
    assert prof["k"]["min_num"] == 1.0 and prof["k"]["max_num"] == 2.0
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["min_str"] == "a"
    assert prof["s"]["min_num"] is None  # strings never numeric-formatted
    assert prof["v"]["max_num"] == 2.5 and prof["v"]["max_str"] is None
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "CartesianProduct" not in plan


def test_quota_per_key_exact_and_partitioning_independent(spark):
    """quota_per_key keeps at most n per key, keyed by a deterministic
    content order — the SAME rows under any input partitioning."""
    from gcs_parquet_dataflow_spark.functions.text import hash32
    from gcs_parquet_dataflow_spark.operators.sampling import quota_per_key

    df = spark.createDataFrame(
        [(i, f"k{i % 3}", f"txt{i * 7 % 23}") for i in range(60)],
        "rid long, k string, txt string",
    )
    order = [hash32(F.col("txt")), F.col("rid")]
    a = sorted(
        (r["rid"], r["k"])
        for r in quota_per_key(df, ["k"], 5, order).collect()
    )
    assert len(a) == 15  # 3 keys x 5
    assert all(
        sum(1 for _, k in a if k == key) == 5 for key in ("k0", "k1", "k2")
    )
    b = sorted(
        (r["rid"], r["k"])
        for r in quota_per_key(
            df.repartition(7, "rid"), ["k"], 5, order
        ).collect()
    )
    assert a == b
    # n larger than any key's population keeps everything
    assert quota_per_key(df, ["k"], 100, order).count() == 60


def _token_corpus(spark):
    # src0: 10 docs x 100 tokens = 1000; src1: 40 x 50 = 2000;
    # src2: 20 x 10 = 200 (the scarce source); src3: unweighted
    rows = []
    did = 0
    for src, n, tok in (
        ("src0", 10, 100), ("src1", 40, 50), ("src2", 20, 10),
        ("src3", 5, 10),
    ):
        for _ in range(n):
            rows.append((did, src, tok))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, source string, tok long")


def test_mixture_plan_token_denominated_hand_checked(spark):
    from gcs_parquet_dataflow_spark.operators.sampling import mixture_plan

    df = _token_corpus(spark)
    w = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    plan = {
        r["source"]: r for r in mixture_plan(df, "source", "tok", w).collect()
    }
    assert set(plan) == set(w)  # src3 dropped
    # caps: src0 1000/.5=2000, src1 2000/.3≈6667, src2 200/.2=1000 → T=1000
    assert plan["src2"]["keep_rate"] == 1.0          # bottleneck keeps all
    assert plan["src0"]["target_tokens"] == 500.0    # 0.5 * 1000
    assert plan["src0"]["keep_rate"] == 0.5
    assert plan["src1"]["target_tokens"] == 300.0
    assert plan["src1"]["keep_rate"] == 0.15
    assert plan["src0"]["available_tokens"] == 1000
    assert all(r["epochs_at_budget"] is None for r in plan.values())


def test_mixture_plan_budget_caps_and_flags_data_constrained(spark):
    from gcs_parquet_dataflow_spark.operators.sampling import mixture_plan

    df = _token_corpus(spark)
    w = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    # budget BELOW the unconstrained T=1000: binds
    plan = {
        r["source"]: r
        for r in mixture_plan(
            df, "source", "tok", w, token_budget=500.0
        ).collect()
    }
    assert plan["src0"]["target_tokens"] == 250.0
    assert plan["src0"]["keep_rate"] == 0.25
    # epochs at this budget: src2 needs 0.2*500/200 = 0.5 passes
    assert plan["src2"]["epochs_at_budget"] == 0.5
    # a 10000-token budget at these weights demands 10 passes of src2:
    # the data-constrained signal
    plan2 = {
        r["source"]: r
        for r in mixture_plan(
            df, "source", "tok", w, token_budget=10000.0
        ).collect()
    }
    assert plan2["src2"]["epochs_at_budget"] == 10.0
    # but target_tokens stays pinned by the data (never upsamples)
    assert plan2["src2"]["target_tokens"] == 200.0


def test_resample_to_token_mixture_matches_plan_rates(spark):
    from gcs_parquet_dataflow_spark.operators.sampling import (
        mixture_plan,
        resample_to_token_mixture,
    )

    df = _token_corpus(spark)
    w = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    kept = resample_to_token_mixture(df, "doc_id", "source", "tok", w)
    got = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert got.get("src2") == 20          # rate 1.0: all kept
    assert "src3" not in got              # unweighted source dropped
    # hash membership ≈ keep_rate of rows per source (small-n slack)
    plan = {
        r["source"]: r["keep_rate"]
        for r in mixture_plan(df, "source", "tok", w).collect()
    }
    assert abs(got.get("src0", 0) / 10 - plan["src0"]) <= 0.3
    # partitioning-independent membership
    again = resample_to_token_mixture(
        df.repartition(13), "doc_id", "source", "tok", w
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
