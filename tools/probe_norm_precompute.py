"""One-off interleaved probe for VERDICT r10 item 1: the capped
headline row (dedup_embedding_cosine_pairs at sf0.1) with the OLD
inline-norm cosine join vs the NEW precomputed-_norm keyed table,
min-of-3 each, measured interleaved in ONE session so host contention
hits both arms equally.  Prints load1 at start/end per CLAUDE.md's
adjudication rule."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators import dedup as DD
from gcs_parquet_dataflow_spark.operators import similarity as SIM
from gcs_parquet_dataflow_spark.operators.partitioning import (
    ensure_parallelism,
    persist_intermediate,
    release_intermediates,
)
from gcs_parquet_dataflow_spark.queries.extensions import (
    COS_DUP_THRESHOLD,
    PLANES,
    _planted_embeddings,
)
from gcs_parquet_dataflow_spark.session import get_spark


def old_style_pairs(df, threshold, planes, max_bucket_size):
    """The r10 plan shape: inline cosine() (3 HOF folds per pair)."""
    keyed = persist_intermediate(
        ensure_parallelism(
            df.select(
                F.col("vec_id").alias("_id"),
                F.col("v").alias("_v"),
                F.posexplode(
                    F.array(SIM.hyperplane_bucket(F.col("v"), planes))
                ).alias("_t", "_bucket"),
            )
        )
    )
    keyed = DD.cap_hot_buckets(
        keyed, ["_t", "_bucket"], max_bucket_size, metric_name="probe_old"
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a._t") == F.col("b._t"))
            & (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            SIM.cosine(F.col("a._v"), F.col("b._v")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    print("load1 start:", round(os.getloadavg()[0], 2))
    aug = _planted_embeddings(spark, sf_dir)

    def run(arm: str):
        t0 = time.monotonic()
        if arm == "old":
            n = old_style_pairs(
                aug, COS_DUP_THRESHOLD, PLANES, DD.AutoCap()
            ).count()
        else:
            n = SIM.cosine_dup_pairs(
                aug, COS_DUP_THRESHOLD, planes=PLANES,
                id_col="vec_id", vec_col="v",
                max_bucket_size=DD.AutoCap(),
            ).count()
        dt = time.monotonic() - t0
        release_intermediates()
        return n, dt

    results: dict[str, list[float]] = {"old": [], "new": []}
    rows: dict[str, int] = {}
    run("old"), run("new")  # warm both arms
    for _ in range(3):
        for arm in ("old", "new"):
            n, dt = run(arm)
            results[arm].append(dt)
            rows[arm] = n
    assert rows["old"] == rows["new"], rows
    for arm in ("old", "new"):
        passes = ", ".join(f"{x:.3f}" for x in results[arm])
        print(f"{arm}: min={min(results[arm]):.3f}s  passes=[{passes}]  "
              f"rows={rows[arm]}")
    print("load1 end:", round(os.getloadavg()[0], 2))


if __name__ == "__main__":
    main()
