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
