"""Pipeline metrics (reference G2: Beam ``Metrics.counter`` — routing
matches/misses main.py:55-63, parse errors, send successes, missing-ids
soft validation main.py:274-277) rebuilt on ``df.observe``.

``observe`` computes the counters as accumulator-style aggregates DURING
the action that runs the pipeline — no second pass over the data, which
at 100 TB is the difference between free metrics and doubling the job.
The ``Observation`` handle yields the values after any action.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.plans.compiler import ERROR_COL


def observe_counters(
    df: DataFrame, name: str, counters: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named counter aggregates; returns (df, observation).
    Read ``observation.get`` after an action on the returned df."""
    obs = Observation(name)
    cols = [expr.alias(key) for key, expr in counters.items()]
    return df.observe(obs, *cols), obs


def count_if(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def observe_transform(df: DataFrame, name: str = "transform") -> tuple[DataFrame, Observation]:
    """Standard counter set for a compiled-transform output (the
    reference's transform-side counters): total rows, ok rows, DLQ rows
    by error type, and the missing-both-ids soft validation
    (main.py:274-277 — counted, row still emitted)."""
    err = F.col(ERROR_COL)

    def id_field(name: str) -> Column:
        if _has_field(df, name):
            # empty string = missing, matching the reference's Python
            # truthiness check (main.py:274-277)
            return F.nullif(
                F.col("properties").getField(name).cast("string"), F.lit("")
            )
        return F.lit(None).cast("string")

    missing_ids = (
        err.isNull() & id_field("$user_id").isNull() & id_field("$device_id").isNull()
    )
    return observe_counters(
        df,
        name,
        {
            "n_rows": F.count(F.lit(1)).cast("long"),
            "n_ok": count_if(err.isNull()),
            "n_dlq": count_if(err.isNotNull()),
            "n_missing_required": count_if(
                err.getField("error_type") == "missing_required_field"
            ),
            "n_missing_event_name": count_if(
                err.getField("error_type") == "missing_dynamic_event_name"
            ),
            "n_missing_ids": count_if(missing_ids),
        },
    )


def _has_field(df: DataFrame, field: str) -> bool:
    try:
        props = next(f for f in df.schema.fields if f.name == "properties")
    except StopIteration:
        return False
    return any(f.name == field for f in props.dataType.fields)


def observe_routing(
    routed: DataFrame, name: str = "routing", config_col: str = "config_id"
) -> tuple[DataFrame, Observation]:
    """Counter set for the routing stage (reference main.py:55-63:
    per-config match counters + unmatched counter). Apply to the
    pre-split routing output where unmatched rows carry NULL config."""
    return observe_counters(
        routed,
        name,
        {
            "n_uris": F.count(F.lit(1)).cast("long"),
            "n_routed": count_if(F.col(config_col).isNotNull()),
            "n_unmatched": count_if(F.col(config_col).isNull()),
        },
    )
