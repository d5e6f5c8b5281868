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


_NUMERIC_DTYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
}


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass column profiling: → one row per column with
    (col_name, n_rows, n_nulls, n_distinct, min_str, max_str,
    min_num, max_num) — the first thing a data engineer runs on an
    unfamiliar 100 TB table.

    Scale shape: every metric for every column is an aggregate over a
    SINGLE scan (the exact-distinct set expands the shuffle by one
    duplicate per profiled column — Spark's standard multi-distinct
    Expand; swap in approx_count_distinct for a cheap one-pass variant
    when ±2%% is fine). The long form comes from ``stack`` on the one
    aggregated row — no second job.

    min/max are reported in the column's own domain: strings in
    min_str/max_str, numerics (as doubles rounded to 6) in
    min_num/max_num — never formatted across types, so results are
    engine-portable.
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    stack_args: list[str] = []
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(
            F.sum(col.isNull().cast("long")).alias(f"_nulls_{i}")
        )
        aggs.append(F.count_distinct(col).alias(f"_dist_{i}"))
        if dtypes[c] in _NUMERIC_DTYPES:
            aggs.append(
                F.round(F.min(col.cast("double")), 6).alias(f"_min_{i}")
            )
            aggs.append(
                F.round(F.max(col.cast("double")), 6).alias(f"_max_{i}")
            )
            stack_args.append(
                f"'{c}', _nulls_{i}, _dist_{i}, "
                f"CAST(NULL AS STRING), CAST(NULL AS STRING), "
                f"_min_{i}, _max_{i}"
            )
        else:
            aggs.append(F.min(col.cast("string")).alias(f"_min_{i}"))
            aggs.append(F.max(col.cast("string")).alias(f"_max_{i}"))
            stack_args.append(
                f"'{c}', _nulls_{i}, _dist_{i}, _min_{i}, _max_{i}, "
                f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
            )
    one = df.agg(*aggs)
    return one.selectExpr(
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(col_name, n_nulls, n_distinct, min_str, max_str, "
        "min_num, max_num)",
        "n_rows",
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct",
        "min_str", "max_str", "min_num", "max_num",
    )
