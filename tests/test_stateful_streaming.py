"""applyInPandasWithState: running per-key aggregates must carry state
ACROSS micro-batches (the property a stateless foreachBatch can't give)."""

from __future__ import annotations

import pytest

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


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (its state "
    "protocol); absent in this container and installs are not permitted — "
    "environment ceiling recorded in SCALE.md",
)
def test_session_timeout_emitter_timer_fires_on_watermark(spark, tmp_path):
    """transformWithStateInPandas with EVENT-TIME TIMERS: a session row
    emits exactly when the watermark passes last_event + gap; keys whose
    gap hasn't elapsed stay open (no emission)."""
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.streaming.stateful import (
        session_timeout_emitter,
    )

    src = tmp_path / "sess_src"
    src.mkdir()

    def feed(fname, rows):
        spark.createDataFrame(rows, "user_id long, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("overwrite").parquet(str(src / fname))

    # three files = three micro-batches (maxFilesPerTrigger=1): user 1's
    # timer (10:05 + 30min = 10:35) fires once the watermark (computed
    # from the PREVIOUS batch's max event time) passes it
    feed("f1", [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:05:00")])
    feed("f2", [(9, "2024-01-01 12:00:00")])
    feed("f3", [(9, "2024-01-01 12:00:01")])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        session_timeout_emitter(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("twsp_sessions")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from twsp_sessions").collect()
    by_user = {r["user_id"]: r for r in rows}
    assert 1 in by_user, rows
    assert by_user[1]["n_events"] == 2
    assert str(by_user[1]["session_end"]) == "2024-01-01 10:35:00"
    # user 9's session is still open (watermark never passed 12:30)
    assert 9 not in by_user
