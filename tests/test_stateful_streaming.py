"""applyInPandasWithState: running per-key aggregates must carry state
ACROSS micro-batches (the property a stateless foreachBatch can't give)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gcs_parquet_dataflow_spark.streaming.stateful import running_user_totals

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_state_carries_across_micro_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    # two appended part-files + maxFilesPerTrigger=1 → two micro-batches
    spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(str(src))
    spark.createDataFrame([(1, 2.5), (3, 7.0)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = running_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("select * from running_totals").collect()
    # per (user, n_events) snapshots; user 1 must show a row where the
    # running total includes BOTH batches (n_events=3, total=17.5)
    snapshots = {(r["user_id"], r["n_events"]): r["total_value"] for r in rows}
    assert snapshots[(1, 3)] == 17.5  # state carried: 15.0 from batch 1 + 2.5
    assert snapshots[(2, 1)] == 1.0
    assert snapshots[(3, 1)] == 7.0
    # the first batch must also have emitted user 1's intermediate
    # snapshot (file order may vary: 2 rows first or 1 row first)
    assert snapshots.get((1, 2)) == 15.0 or snapshots.get((1, 1)) == 2.5
