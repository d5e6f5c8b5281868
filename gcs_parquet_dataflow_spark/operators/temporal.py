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


def time_bucket_gapfill(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    bucket_seconds: int,
    aggs: list,
    fill: dict[str, str | list[str]] | None = None,
) -> DataFrame:
    """Hypertable-style rollup with gap fill (the TimescaleDB
    ``time_bucket_gapfill`` + ``locf`` + ``interpolate`` trio, which
    plain Spark/SQL ``GROUP BY`` cannot express because empty buckets
    produce no rows): bucket ``ts_col`` into ``bucket_seconds``-wide
    epochs, aggregate per (group, bucket), then densify every group to a
    contiguous bucket spine from its first to its last observed bucket.

    ``fill`` maps an aggregated column to a fill mode (or list of
    modes), each emitted as a NEW column ``<col>_<mode>``:

    - ``locf``        — last observation carried forward (trailing gaps
      keep the last value; leading gaps stay NULL),
    - ``interpolate`` — linear between the nearest non-NULL neighbours,
      time-weighted on the bucket epoch (NULL outside the observed
      range, matching Timescale),
    - ``zero``        — ``coalesce(col, 0)``.

    An ``is_gap`` flag marks spine rows with no source rows.

    Scale shape: the rollup is one map-side-combined hash aggregation;
    everything after runs on BUCKET-COUNT-sized data (rows = groups ×
    spine length, independent of raw volume). The spine comes from a
    per-group min/max agg + ``sequence``/``explode`` — no driver-side
    range materialization — and the fills are windows partitioned by the
    group key over that small rollup. At 100 TB the only data-sized cost
    is the first aggregation; a year of 1-minute buckets is ~525k rows
    per group, well under window-partition limits.

    No reference analog (main.py has no time-series surface) — brief
    extension surface; oracle twin: DuckDB ``generate_series`` spine +
    ``IGNORE NULLS`` windows (queries/extensions.py
    timeseries_gapfill_locf).
    """
    fill = fill or {}
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
        * bucket_seconds
    )
    rolled = df.groupBy(*group_cols, bucket.alias("bucket")).agg(*aggs)
    val_cols = [c for c in rolled.columns if c not in group_cols + ["bucket"]]
    spine = (
        rolled.groupBy(*group_cols)
        .agg(F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx"))
        .select(
            *group_cols,
            F.explode(
                F.expr(f"sequence(_mn, _mx, interval {bucket_seconds} seconds)")
            ).alias("bucket"),
        )
    )
    dense = spine.join(rolled, [*group_cols, "bucket"], "left").withColumn(
        "is_gap", F.col(val_cols[0]).isNull() if val_cols else F.lit(False)
    )
    w = W.partitionBy(*group_cols).orderBy("bucket")
    prec = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    foll = w.rowsBetween(W.currentRow, W.unboundedFollowing)
    epoch = F.unix_timestamp(F.col("bucket")).cast("double")
    for col, modes in fill.items():
        for mode in [modes] if isinstance(modes, str) else modes:
            if mode == "locf":
                dense = dense.withColumn(
                    f"{col}_locf", F.last(col, ignorenulls=True).over(prec)
                )
            elif mode == "zero":
                dense = dense.withColumn(
                    f"{col}_zero", F.coalesce(F.col(col), F.lit(0))
                )
            elif mode == "interpolate":
                obs_t = F.when(F.col(col).isNotNull(), epoch)
                pv = F.last(col, ignorenulls=True).over(prec)
                pt = F.last(obs_t, ignorenulls=True).over(prec)
                nv = F.first(col, ignorenulls=True).over(foll)
                nt = F.first(obs_t, ignorenulls=True).over(foll)
                interp = F.when(F.col(col).isNotNull(), F.col(col)).otherwise(
                    pv + (nv - pv) * (epoch - pt) / (nt - pt)
                )
                dense = dense.withColumn(f"{col}_interpolate", interp)
            else:
                raise ValueError(f"unknown fill mode {mode!r} for {col!r}")
    return dense


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


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Nearest-in-time LEFT join: left columns + the right payload of
    the temporally CLOSEST right row per key in either direction
    (pandas ``merge_asof(direction='nearest')``), + ``gap_us`` (exact
    microsecond distance, NULL when unmatched). Ties (equal distance
    before and after) take the earlier right row. With
    ``max_gap_seconds``, matches farther than the horizon become NULL.

    Shape: the as-of union-sort pattern run once with BOTH window
    fills — last-non-null right struct over the preceding frame and
    first-non-null over the following frame — then a per-row pick of
    the nearer side. Still ONE hash shuffle on ``by``; no range
    self-join. Right rows should be unique per (key, ts); among exact
    duplicates the survivor is unspecified (same caveat as asof_join).
    """
    rcols = [c for c in right.columns if c not in by and c != right_ts]
    l_type = T.StructType(list(left.schema.fields))
    r_fields = [f for f in right.schema.fields if f.name in rcols]
    r_type = T.StructType(
        r_fields + [T.StructField("__nts", right.schema[right_ts].dataType)]
    )
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
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        F.struct(
            *[F.col(c) for c in rcols], F.col(right_ts).alias("__nts")
        ).alias("_r"),
    )
    base = W.partitionBy(*by).orderBy("_ats", "_side")
    prev = F.last("_r", ignorenulls=True).over(
        base.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    nxt = F.first("_r", ignorenulls=True).over(
        base.rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    u = (
        l.unionByName(r)
        .withColumn("_p", prev)
        .withColumn("_n", nxt)
        .filter(F.col("_side") == 1)
    )
    # NTZ fixtures: unix_micros needs TIMESTAMP; session TZ is UTC so
    # the cast is the identity epoch both engines compute
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    db = us(F.col("_ats")) - us(F.col("_p.__nts"))
    df_ = us(F.col("_n.__nts")) - us(F.col("_ats"))
    chosen = (
        F.when(F.col("_p").isNull(), F.col("_n"))
        .when(F.col("_n").isNull(), F.col("_p"))
        .when(db <= df_, F.col("_p"))
        .otherwise(F.col("_n"))
    )
    u = u.withColumn("_m", chosen).withColumn(
        "gap_us",
        F.abs(us(F.col("_m.__nts")) - us(F.col("_ats"))).cast("long"),
    )
    if max_gap_seconds is not None:
        horizon = F.lit(int(max_gap_seconds) * 1_000_000)
        u = u.withColumn(
            "_m", F.when(F.col("gap_us") <= horizon, F.col("_m"))
        ).withColumn(
            "gap_us", F.when(F.col("gap_us") <= horizon, F.col("gap_us"))
        )
    return u.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(c) for c in rcols],
        "gap_us",
    )


def fit_trend_poly(
    df: "DataFrame",
    group_cols: list[str],
    x_col: str,
    y_col: str,
    degree: int = 1,
) -> "DataFrame":
    """Per-group polynomial trend fit (numpy.polyfit least squares) via
    the grouped-map ``applyInPandas`` extension point — the batch twin
    of streaming/stateful.py's per-key state: each group's rows arrive
    as ONE pandas DataFrame on one executor, the fit runs in C-backed
    numpy, and a single summary row comes back →
    (group_cols…, degree, n_points, c0..c<degree>) with c0 the
    constant term.

    This is the documented slow path (Python per GROUP, not per row) —
    appropriate because model-per-group is irreducibly imperative
    beyond degree 1 (the degree-1 case is expressible as exact
    closed-form Column algebra — queries/extensions.py
    regression_trend_by_type — which is the cross-check in
    tests/test_temporal.py). Groups shuffle once on the group key;
    state per group is the (x, y) vectors, so keep group row counts
    bounded (aggregate to a time bucket first, as the tests do).
    """
    import pandas as pd

    from pyspark.sql import functions as F  # noqa: F401  (doc parity)

    coef_cols = ", ".join(f"c{i} double" for i in range(degree + 1))
    gcols_schema = ", ".join(
        f"{c} {dict(df.dtypes)[c]}" for c in group_cols
    )
    schema = (
        f"{gcols_schema}, degree long, n_points long, {coef_cols}"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        xs = pdf[x_col].to_numpy(dtype="float64")
        ys = pdf[y_col].to_numpy(dtype="float64")
        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        out["degree"] = [degree]
        out["n_points"] = [len(pdf)]
        if len(pdf) >= degree + 1:
            # polyfit returns highest power first; store c0 lowest first
            coeffs = np.polyfit(xs, ys, degree)[::-1]
        else:
            coeffs = [float("nan")] * (degree + 1)
        for i in range(degree + 1):
            out[f"c{i}"] = [float(coeffs[i])]
        return pd.DataFrame(out)

    return df.groupBy(*group_cols).applyInPandas(fit, schema=schema)
