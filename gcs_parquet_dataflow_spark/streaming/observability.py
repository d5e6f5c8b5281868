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
