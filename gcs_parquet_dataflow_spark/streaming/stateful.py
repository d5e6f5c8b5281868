"""Custom stateful streaming operators via ``applyInPandasWithState``
(the Spark mapping for Beam's stateful-DoFn extension point, SURVEY
§2.12 — the reference itself has no stateful ops, main.py grep; this is
the engine's capability for ones the built-ins can't express).

``running_user_totals`` keeps a per-key running aggregate across
micro-batches: state lives in the state store (checkpointed,
exactly-once with the file source), is keyed by the group column, and
survives restarts. Timeouts evict idle keys so state stays bounded —
the same discipline as dropDuplicatesWithinWatermark (SCALE.md).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("batch_rows", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def running_user_totals(
    events: DataFrame,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-user running (count, sum(value)) maintained across
    micro-batches. Emits one row per user per batch with the UPDATED
    running totals plus this batch's row count — the shape of a
    feature-freshness / rate-limit / per-entity-counter operator.

    Expects columns ``user_id`` (long) and ``value`` (double).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "batch_rows": [batch_rows],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API): timer-driven
# session emission. Unlike applyInPandasWithState (whose timeouts are
# polled per-batch), this registers EVENT-TIME TIMERS with the state
# store: a session closes exactly when the watermark passes
# last_event + gap, and emission happens in handleExpiredTimer — no
# per-batch timeout scanning, state is dropped with the timer.
# ---------------------------------------------------------------------------


def session_timeout_emitter(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
):
    """Per-key sessions closed by event-time timers: accumulates events
    per key; each batch re-arms one timer at (max event time + gap);
    when the watermark passes it, the session row
    (key, n_events, session_end) emits and state clears.
    → streaming DataFrame, append mode.

    ENVIRONMENT-GATED: transformWithStateInPandas speaks protobuf to the
    state store and this container lacks google.protobuf (SCALE.md);
    the operator and its test ship for protobuf-equipped clusters (the
    test self-skips here). The verified stateful surface is
    ``running_user_totals`` on applyInPandasWithState."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StatefulProcessor

    class SessionProcessor(StatefulProcessor):
        def init(self, handle):
            self.handle = handle
            self.count = handle.getValueState("count", "n long")
            self.last_ms = handle.getValueState("last_ms", "t long")

        def handleInputRows(self, key, rows, timerValues):
            n_new = 0
            max_ms = 0
            for pdf in rows:
                n_new += len(pdf)
                if len(pdf):
                    max_ms = max(
                        max_ms,
                        int(pdf[ts_col].max().timestamp() * 1000),
                    )
            n = (self.count.get()[0] if self.count.exists() else 0) + n_new
            last = max(
                self.last_ms.get()[0] if self.last_ms.exists() else 0, max_ms
            )
            self.count.update((n,))
            self.last_ms.update((last,))
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            self.handle.registerTimer(last + gap_seconds * 1000)
            return iter(())  # emission happens on timer expiry only

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            n = self.count.get()[0] if self.count.exists() else 0
            end_ms = expiredTimerInfo.getExpiryTimeInMs()
            self.count.clear()
            self.last_ms.clear()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_events": [n],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                }
            )

        def close(self):
            pass

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .transformWithStateInPandas(
            SessionProcessor(),
            outputStructType=(
                f"{key_col} long, n_events long, session_end timestamp"
            ),
            outputMode="Append",
            timeMode="EventTime",
        )
    )
