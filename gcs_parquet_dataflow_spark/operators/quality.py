"""Data-quality constraint checking: declare row-level predicates, get
back a per-rule violation summary (and optionally the violating rows) —
the validation gate a training-data pipeline runs before accepting a
batch into the corpus.

Scale shape: ALL rules evaluate in ONE pass — each rule becomes a
conditional-count aggregate over the same scan (no per-rule job), the
same trick as metrics.observe_*. The violating-rows form is a filter on
the disjunction, also one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """``rules`` maps rule name → predicate that GOOD rows satisfy.
    → one row per rule: (rule, n_violations, n_rows, violation_rate) —
    a NULL predicate result counts as a violation (unknown ≠ pass)."""
    ok = {name: F.coalesce(pred, F.lit(False)) for name, pred in rules.items()}
    counted = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.when(~pred, 1).otherwise(0)).cast("long").alias(f"_v_{i}")
            for i, pred in enumerate(ok.values())
        ],
    )
    names = list(ok.keys())
    per_rule = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"), F.col(f"_v_{i}").alias("n_violations")
            )
            for i, name in enumerate(names)
        ]
    )
    return (
        counted.select(F.explode(per_rule).alias("r"), F.col("_n"))
        .select(
            F.col("r.rule").alias("rule"),
            F.col("r.n_violations").alias("n_violations"),
            F.col("_n").cast("long").alias("n_rows"),
            F.round(F.col("r.n_violations") / F.col("_n"), 6).alias(
                "violation_rate"
            ),
        )
    )


def violating_rows(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Rows failing ANY rule, tagged with the array of failed rule names
    (DLQ-shaped: route to a lake partition for triage like transform
    errors)."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
                for name, pred in rules.items()
            ]
        )
    )
    return df.withColumn("failed_rules", failed).filter(
        F.size("failed_rules") > 0
    )
