"""Temporal joins Spark lacks as built-ins, composed from DataFrame
primitives (the brief's canonical "custom operator" examples):

- **as-of join**: each left row picks the LATEST right row with
  ``right_ts <= left_ts`` per key (point-in-time lookup: trades→quotes,
  events→dimension history). Implemented as union + tagged sort +
  windowed last-non-null — ONE shuffle on the key, no per-key Python,
  no range self-join blowup. DuckDB twin: native ``ASOF LEFT JOIN``.
- **range join**: events ⋈ intervals with containment
  ``start <= ts < end``. The naive theta join compares every pair; the
  binned form explodes each interval into the fixed-width time bins it
  covers and equi-joins events on their bin — shuffle size
  |events| + |intervals|×(len/bin), the standard interval-index trick.

Both are deterministic and oracle-checked (queries/extensions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """As-of LEFT join: left columns + the right payload columns of the
    nearest right row per key — ``backward`` (default) takes the latest
    row with ``right_ts <= left_ts``, ``forward`` the earliest row with
    ``right_ts >= left_ts``; NULLs when none exists. Inclusive at equal
    timestamps in both directions, matching DuckDB ``ASOF JOIN``
    (``>=`` / ``<=``) and pandas ``merge_asof``.

    Shape: union both sides tagged, one window per key ordered by
    (ts, side) carrying the nearest non-null right payload
    (``last`` over preceding rows for backward, ``first`` over
    following rows for forward; the side tag orders equal-ts right rows
    into the visible frame) — the sort-merge fill pattern. One hash
    shuffle on ``by``; at 100 TB both inputs arrive, sort, and fill
    inside the same exchange.

    Right rows should be unique per (key, ts) — among exact duplicates
    the surviving one is unspecified (same as engine ASOF ties).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rcols = [c for c in right.columns if c not in by and c != right_ts]
    l_type = T.StructType(list(left.schema.fields))
    r_type = T.StructType([f for f in right.schema.fields if f.name in rcols])
    # backward: right sorts BEFORE left at equal ts so the preceding
    # frame sees it; forward: right sorts AFTER left so the following
    # frame sees it
    r_side = 0 if direction == "backward" else 2
    l = left.select(
        *by,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    r = right.select(
        *by,
        F.col(right_ts).alias("_ats"),
        F.lit(r_side).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"),
    )
    base = W.partitionBy(*by).orderBy("_ats", "_side")
    if direction == "backward":
        w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
        nearest = F.last("_r", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(W.currentRow, W.unboundedFollowing)
        nearest = F.first("_r", ignorenulls=True).over(w)
    return (
        l.unionByName(r)
        .withColumn("_m", nearest)
        .filter(F.col("_side") == 1)
        .select(
            *[F.col(f"_l.{c}").alias(c) for c in left.columns],
            *[F.col(f"_m.{c}").alias(c) for c in rcols],
        )
    )


def range_join_binned(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Containment join ``start <= ts < end`` via the interval-index
    trick: every interval explodes into the ``bin_seconds``-wide bins it
    overlaps, events equi-join on their own bin, and the exact predicate
    filters bin-boundary false positives. Pick ``bin_seconds`` near the
    typical interval length: cost is |events| + |intervals|×(length/bin)
    shuffled rows instead of an all-pairs comparison."""
    e_bin = F.floor(F.unix_timestamp(F.col(ts_col)) / bin_seconds)
    start_bin = F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds)
    end_bin = F.floor((F.unix_timestamp(F.col(end_col)) - 1) / bin_seconds)
    exploded = intervals.withColumn(
        "_bin", F.explode(F.sequence(start_bin, F.greatest(end_bin, start_bin)))
    )
    joined = events.withColumn("_bin", e_bin).join(
        exploded,
        ["_bin"],
        how,
    )
    return joined.filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    ).drop("_bin")


def scd2_history(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: collapse a change
    event stream into validity intervals → (key, state, valid_from,
    valid_to, n_events); ``valid_to`` is NULL on the current row.

    Gaps-and-islands: a lag-based change flag, a running sum to number
    the runs, one aggregate per run, then a lead for the closing
    timestamp. All four steps share the SAME (key, order) window
    partitioning, so the whole operator is ONE shuffle on the key —
    at 100 TB the cost is a single exchange of the event stream,
    identical to any per-key aggregation.

    ``tiebreak_col`` makes ordering total when timestamps collide
    (event ids are unique; wall clocks are not).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    chg = (
        F.when(
            ~F.lag(state_col).over(w).eqNullSafe(F.col(state_col)), F.lit(1)
        ).otherwise(F.lit(0))
    )
    runs = df.withColumn("_chg", chg).withColumn(
        "_grp",
        F.sum("_chg").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    spans = runs.groupBy(key_col, "_grp").agg(
        F.first(state_col).alias(state_col),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = W.partitionBy(key_col).orderBy("_grp")
    return spans.select(
        key_col,
        state_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.col("n_events").cast("long").alias("n_events"),
    )
