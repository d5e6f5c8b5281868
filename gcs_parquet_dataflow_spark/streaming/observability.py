"""Streaming pipeline observability: per-micro-batch metrics captured
from Spark's StreamingQueryListener into a queryable DataFrame.

The reference counts rows with Beam ``Metrics.counter`` and reads them
off the Dataflow UI (SURVEY §2 G2); the batch twin here is
``operators/metrics.observe_*``. For STREAMS the engine-native source
of truth is the progress event Spark emits after every micro-batch —
rows read, per-second rates, and stage durations — so the recorder
below turns those events into the ops table every production pipeline
dashboard is built on (lag alerts, throughput regressions, watermark
stalls), with zero instrumentation inside the query itself.

Listener callbacks arrive on a background thread AFTER the batch
commits; ``wait_for_batches`` exists so tests / synchronous drivers can
join on delivery instead of sleeping.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.listener import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_id string, run_id string, query_name string, batch_id long, "
    "n_input_rows long, input_rows_per_sec double, "
    "processed_rows_per_sec double, trigger_ms long, "
    "add_batch_ms long, batch_ts string"
)


class StreamMetricsRecorder(StreamingQueryListener):
    """Collects one row per completed micro-batch across all queries of
    the session it is registered on (``spark.streams.addListener``).

    Thread-safe; ``to_dataframe`` snapshots the rows collected so far,
    so the ops table can itself be aggregated/joined/written with the
    full engine surface (e.g. rolling throughput via window_ewma's
    shape, stall detection via counter_delta's)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._rows: list[tuple] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        d = p.durationMs or {}
        with self._lock:
            self._rows.append(
                (
                    str(p.id),
                    str(p.runId),
                    p.name,
                    int(p.batchId),
                    int(p.numInputRows),
                    float(p.inputRowsPerSecond or 0.0),
                    float(p.processedRowsPerSecond or 0.0),
                    int(d.get("triggerExecution", 0)),
                    int(d.get("addBatch", 0)),
                    p.timestamp,
                )
            )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.terminated.append(str(event.id))

    # -- consumption --------------------------------------------------------
    def n_batches(self) -> int:
        with self._lock:
            return len(self._rows)

    def wait_for_batches(self, n: int, timeout_s: float = 30.0) -> bool:
        """Block until ≥ n progress events arrived (listener delivery is
        asynchronous); True iff reached within the timeout."""
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if self.n_batches() >= n:
                return True
            time.sleep(0.05)
        return self.n_batches() >= n

    def to_dataframe(self, spark: SparkSession) -> DataFrame:
        with self._lock:
            rows = list(self._rows)
        return spark.createDataFrame(rows, PROGRESS_SCHEMA)


def record_metrics(spark: SparkSession) -> StreamMetricsRecorder:
    """Register and return a fresh recorder on this session."""
    rec = StreamMetricsRecorder()
    spark.streams.addListener(rec)
    return rec


def stop_recording(spark: SparkSession, rec: StreamMetricsRecorder) -> None:
    spark.streams.removeListener(rec)


# ---------------------------------------------------------------------------
# Guard-report persistence (round 12, VERDICT r11 item 5): CCReport and
# CapReport were in-memory driver lists — on a real cluster the
# truncation/saturation evidence died with the driver.  They now land
# in the same ops lake family as the listener's progress rows:
# parquet tables under an ops root, batch-keyed for streaming callers
# (idempotent on checkpoint replay), append-only for batch callers,
# queryable across restarts with the full engine surface.
# ---------------------------------------------------------------------------

CAP_REPORT_SCHEMA = (
    "seq long, metric_name string, cap long, n_buckets long, "
    "n_hot_buckets long, n_rows long, n_dropped_rows long, "
    "saturation double"
)
CC_REPORT_SCHEMA = (
    "seq long, metric_name string, max_iter long, iterations long, "
    "converged boolean, changed_at_stop long, algorithm string"
)
IVF_QUALITY_SCHEMA = (
    "list_id long, n_members long, mean_silhouette double, "
    "mean_intra_dist double, db_component double"
)


def write_guard_reports(
    spark: SparkSession, ops_root: str, batch_id: int | None = None
) -> dict[str, int]:
    """Drain the in-memory guard registries (``dedup.drain_reports``)
    into the ops lake: ``<ops_root>/cap_reports`` and
    ``<ops_root>/cc_reports``.  With ``batch_id`` (streaming callers —
    run at the END of each foreachBatch handler) the write is
    batch-keyed with dynamic overwrite, so a replayed micro-batch
    re-emits its guards' reports and overwrites its own partition —
    the lake converges under replay exactly like every other
    batch-keyed side-write.  ``seq`` preserves emission order within
    the drain (no wall-clock column: content-idempotent replays).
    Returns {"cap_reports": n, "cc_reports": n} drained.

    The alarm query a 100 TB run pages on::

        read_guard_reports(spark, root, "cc_reports").filter(~F.col("converged"))
    """
    from gcs_parquet_dataflow_spark.operators import dedup as DD
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
        write_partitioned,
    )

    caps, ccs = DD.drain_reports()
    root = ops_root.rstrip("/")
    if caps:
        rows = [
            (
                i, r.metric_name, int(r.cap), int(r.n_buckets),
                int(r.n_hot_buckets), int(r.n_rows),
                int(r.n_dropped_rows), float(r.saturation),
            )
            for i, r in enumerate(caps)
        ]
        write_partitioned(
            spark.createDataFrame(rows, CAP_REPORT_SCHEMA),
            root + "/cap_reports", [], batch_id=batch_id,
            coalesce_files=1,
        )
    if ccs:
        rows = [
            (
                i, r.metric_name, int(r.max_iter), int(r.iterations),
                bool(r.converged), int(r.changed_at_stop), r.algorithm,
            )
            for i, r in enumerate(ccs)
        ]
        write_partitioned(
            spark.createDataFrame(rows, CC_REPORT_SCHEMA),
            root + "/cc_reports", [], batch_id=batch_id,
            coalesce_files=1,
        )
    return {"cap_reports": len(caps), "cc_reports": len(ccs)}


def snapshot_index_quality(
    spark: SparkSession,
    index_path: str,
    ops_root: str,
    batch_id: int | None = None,
    cents=None,
) -> int:
    """Append a per-list quality snapshot of the persisted IVF index
    (``similarity.ivf_index_quality``) to ``<ops_root>/ivf_quality``,
    batch-keyed like every guard report (a replayed micro-batch
    overwrites its own partition — content-idempotent, no wall-clock
    column).  Returns the number of list rows written.

    The trend query a growing index pages on: mean_silhouette decaying
    toward 0 (or db_component climbing) across batches = the corpus
    has drifted off the trained centroids — retrain, don't just keep
    raising nprobe::

        read_guard_reports(spark, root, "ivf_quality") \\
            .groupBy("_batch_id").agg(F.avg("mean_silhouette"))
    """
    from gcs_parquet_dataflow_spark.operators.similarity import (
        ivf_index_quality,
    )
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
        write_partitioned,
    )

    df = ivf_index_quality(spark, index_path, cents=cents)
    rows = df.collect()  # k lists — tiny, and we report the count
    write_partitioned(
        spark.createDataFrame(rows, IVF_QUALITY_SCHEMA),
        ops_root.rstrip("/") + "/ivf_quality", [], batch_id=batch_id,
        coalesce_files=1,
    )
    return len(rows)


def read_guard_reports(
    spark: SparkSession, ops_root: str, kind: str
) -> DataFrame:
    """Read a persisted guard-report table back (``kind`` ∈
    {"cap_reports", "cc_reports", "ivf_quality",
    "maintenance_reports", "ivf_retrain_events"}); empty-but-typed
    when no report has ever been written — a monitoring query on a
    healthy young pipeline is not an error."""
    from gcs_parquet_dataflow_spark.operators.similarity import (
        IVF_RETRAIN_EVENT_SCHEMA,
    )
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
        _MAINT_REPORT_SCHEMA,
        read_table,
        table_exists,
    )

    schemas = {
        "cap_reports": CAP_REPORT_SCHEMA,
        "cc_reports": CC_REPORT_SCHEMA,
        "ivf_quality": IVF_QUALITY_SCHEMA,
        "maintenance_reports": _MAINT_REPORT_SCHEMA,
        "ivf_retrain_events": IVF_RETRAIN_EVENT_SCHEMA,
    }
    if kind not in schemas:
        raise ValueError(f"kind must be one of {sorted(schemas)}: {kind!r}")
    path = ops_root.rstrip("/") + "/" + kind
    if not table_exists(spark, path):
        return spark.createDataFrame([], schemas[kind])
    return read_table(spark, path)
