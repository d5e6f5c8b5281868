"""Round-7 guard and consolidation tests: the VERDICT r6 / ADVICE r6
closures — oracle_check failing loudly on unknown query names, the
quota_per_key temp-column collision guard, the em_weight_step int64
field-count bound, and the epoch-allocation integer-div/zero-token
semantics."""

from __future__ import annotations

import subprocess
import sys

import pytest
from pyspark.sql import functions as F


def test_oracle_check_unknown_name_fails_loudly():
    """VERDICT r6 item 4: a typo'd query name passed to oracle_check
    must FAIL (non-zero exit), never a clean "N pass" line.  Parse the
    module's name-diff logic without paying a Spark session: run the
    tool against a name that matches nothing and assert the process
    exits non-zero with the unknown name reported."""
    proc = subprocess.run(
        [
            sys.executable,
            "/root/repo/tools/oracle_check.py",
            "/root/testdata/sf0.001",
            "this_query_does_not_exist",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode != 0
    assert "this_query_does_not_exist" in proc.stdout
    assert "unknown query name" in proc.stdout
    assert "0 pass" in proc.stdout


def test_quota_per_key_rejects_reserved_column(spark):
    """ADVICE r6: an input already carrying _quota_rn must raise, not be
    silently overwritten then dropped (the __ds_h footgun class)."""
    from gcs_parquet_dataflow_spark.operators.sampling import quota_per_key

    df = spark.range(10).select(
        F.lit("k").alias("k"), F.col("id").alias("_quota_rn")
    )
    with pytest.raises(ValueError, match="_quota_rn"):
        quota_per_key(df, ["k"], 3, [F.col("_quota_rn")])


def test_em_weight_step_field_count_bound(spark):
    """ADVICE r6: micro·10·9^K must stay under 2^63 — K=12 is the
    int64-exact bound at micro=1e6; 13 fields must raise, 12 must run."""
    from gcs_parquet_dataflow_spark.operators import linkage

    df = spark.createDataFrame([(1, 1)], "a long, b long")
    ok = [(f"f{i}", F.col("a") == F.col("b")) for i in range(12)]
    out = linkage.em_weight_step(df, ok)
    assert out.count() == 12

    too_many = [(f"f{i}", F.col("a") == F.col("b")) for i in range(13)]
    with pytest.raises(ValueError, match="int64-exact bound"):
        linkage.em_weight_step(df, too_many)

    # smaller micro admits more fields (the bound scales with micro)
    out2 = linkage.em_weight_step(df, too_many, micro=1_000)
    assert out2.count() == 13


def test_epoch_allocation_zero_token_source_gets_base_epoch(spark):
    """ADVICE r6: a source whose token sum is 0 must get exactly the
    base epoch (no NULLs from div-by-zero), and the div path must agree
    with the old float-floor path on normal data."""
    from gcs_parquet_dataflow_spark.plans.recipe import compile_recipe

    df = spark.createDataFrame(
        [
            ("a", 100, 0.9),
            ("a", 50, 0.9),
            ("b", 0, 0.5),
            ("b", 0, 0.5),
            ("c", 10, 0.99),
        ],
        "source string, n_tokens long, quality double",
    )
    out = compile_recipe(
        df,
        [{"op": "epoch_allocation", "max_extra": 3}],
        id_col="source",
    )
    got = {
        r["source"]: r["epochs"]
        for r in out.select("source", "epochs").distinct().collect()
    }
    # zero-token source: base epoch only, never NULL
    assert got["b"] == 1
    assert all(v is not None for v in got.values())
    # corpus=160; c (best quality, 10 tokens) div → min(3,16)=3 extra
    assert got["c"] == 4
