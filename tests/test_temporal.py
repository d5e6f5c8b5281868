"""Temporal join semantics: as-of inclusiveness/NULLs, range-join
boundary behavior and bin false-positive filtering."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)
import pytest

pytestmark = pytest.mark.fast  # driver quick-gate module (r13)


def ts(s):
    return F.lit(s).cast("timestamp")


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "e1"),
         (1, "2024-01-01 12:00:00", "e2"),
         (2, "2024-01-01 09:00:00", "e3")],
        "k long, ts string, ev string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", "s_old"),
         (1, "2024-01-01 12:00:00", "s_tie"),     # equal ts → inclusive
         (1, "2024-01-01 13:00:00", "s_future"),  # after every event
         (3, "2024-01-01 00:00:00", "s_other")],
        "k long, ts string, state string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["ev"]: r["state"] for r in asof_join(left, right, ["k"]).collect()}
    assert got == {"e1": "s_old", "e2": "s_tie", "e3": None}


def test_asof_join_keeps_all_left_rows_and_columns(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 42)], "k long, ts string, payload long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [], "k long, ts timestamp, state string"
    )
    rows = asof_join(left, right, ["k"]).collect()
    assert len(rows) == 1
    assert rows[0]["payload"] == 42 and rows[0]["state"] is None


def test_range_join_boundaries_and_bins(spark):
    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"),   # == start → included
         (2, "2024-01-01 11:59:59"),   # inside
         (3, "2024-01-01 12:00:00"),   # == end → excluded
         (4, "2024-01-01 18:00:00")],  # same bin as the interval end,
        "event_id long, ts string",    # outside it → bin false positive
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-01 12:00:00")],
        "range_id long, start_ts string, end_ts string",
    ).withColumn("start_ts", F.col("start_ts").cast("timestamp")).withColumn(
        "end_ts", F.col("end_ts").cast("timestamp")
    )
    got = sorted(
        r["event_id"]
        for r in range_join_binned(
            events, intervals, "ts", "start_ts", "end_ts", bin_seconds=86400
        ).collect()
    )
    assert got == [1, 2]


def test_range_join_matches_theta_join(spark):
    import random as _r

    rng = _r.Random(5)
    events = spark.createDataFrame(
        [(i, f"2024-01-0{rng.randint(1, 9)} {rng.randint(0, 23):02d}:30:00")
         for i in range(200)],
        "event_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(j, f"2024-01-0{j+1} 00:00:00", f"2024-01-0{j+3} 00:00:00")
         for j in range(1, 7)],
        "range_id long, start_ts string, end_ts string",
    ).withColumn("start_ts", F.col("start_ts").cast("timestamp")).withColumn(
        "end_ts", F.col("end_ts").cast("timestamp")
    )
    theta = sorted(
        (r["event_id"], r["range_id"])
        for r in events.join(
            intervals,
            (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")),
        ).collect()
    )
    binned = sorted(
        (r["event_id"], r["range_id"])
        for r in range_join_binned(
            events, intervals, "ts", "start_ts", "end_ts", bin_seconds=6 * 3600
        ).collect()
    )
    assert theta == binned and len(theta) > 0


def test_asof_join_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "e1"),
         (1, "2024-01-01 14:00:00", "e2"),
         (2, "2024-01-01 10:00:00", "e3")],
        "k long, ts string, ev string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", "s_past"),     # before events → drop
         (1, "2024-01-01 10:00:00", "s_tie"),      # equal ts → inclusive
         (1, "2024-01-01 12:00:00", "s_next"),
         (2, "2024-01-01 23:00:00", "s_late")],
        "k long, ts string, state string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["ev"]: r["state"]
        for r in asof_join(left, right, ["k"], direction="forward").collect()
    }
    # e1 matches at its own ts; e2's nearest following is none after
    # 14:00 for key 1 → NULL; e3 waits until 23:00
    assert got == {"e1": "s_tie", "e2": None, "e3": "s_late"}


def test_scd2_collapses_runs_and_handles_null_states(spark):
    from gcs_parquet_dataflow_spark.operators.temporal import scd2_history

    rows = [
        (1, 10, 1, "a"), (1, 20, 2, "a"), (1, 30, 3, None),
        (1, 40, 4, None), (1, 50, 5, "a"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, eid long, st string")
    got = (
        scd2_history(df, "k", "st", "ts", "eid")
        .orderBy("valid_from")
        .collect()
    )
    assert [(r["st"], r["valid_from"], r["valid_to"], r["n_events"]) for r in got] == [
        ("a", 10, 30, 2), (None, 30, 50, 2), ("a", 50, None, 1),
    ]


def test_time_bucket_gapfill_spine_locf_interpolate(spark):
    from gcs_parquet_dataflow_spark.operators.temporal import (
        time_bucket_gapfill,
    )

    # group "a": observations at hours 0 and 3 → spine 0,1,2,3 with a
    # 2-hour gap; group "b": single observation → 1-row spine.
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:10:00", 10.0),
            ("a", "2024-01-01 00:50:00", 20.0),
            ("a", "2024-01-01 03:30:00", 40.0),
            ("b", "2024-01-05 07:00:00", 7.0),
        ],
        "g string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = time_bucket_gapfill(
        df,
        group_cols=["g"],
        ts_col="ts",
        bucket_seconds=3600,
        aggs=[
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").alias("total"),
        ],
        fill={"total": ["locf", "interpolate", "zero"], "n": "zero"},
    ).orderBy("g", "bucket")
    rows = out.collect()
    a = [r for r in rows if r["g"] == "a"]
    b = [r for r in rows if r["g"] == "b"]
    assert len(a) == 4 and len(b) == 1
    assert [r["bucket"].hour for r in a] == [0, 1, 2, 3]
    assert [r["is_gap"] for r in a] == [False, True, True, False]
    assert [r["n_zero"] for r in a] == [2, 0, 0, 1]
    assert [r["total"] for r in a] == [30.0, None, None, 40.0]
    assert [r["total_locf"] for r in a] == [30.0, 30.0, 30.0, 40.0]
    # linear between (t=0h, 30.0) and (t=3h, 40.0)
    got = [r["total_interpolate"] for r in a]
    exp = [30.0, 30.0 + 10.0 / 3, 30.0 + 20.0 / 3, 40.0]
    assert all(abs(x - y) < 1e-9 for x, y in zip(got, exp))
    assert [r["total_zero"] for r in a] == [30.0, 0.0, 0.0, 40.0]
    assert b[0]["is_gap"] is False and b[0]["total"] == 7.0


def test_time_bucket_gapfill_leading_trailing_gap_semantics(spark):
    from gcs_parquet_dataflow_spark.operators.temporal import (
        time_bucket_gapfill,
    )

    # Force leading + trailing gaps by aggregating a filtered value
    # column: buckets 0 and 4 exist (spine anchors) but only buckets
    # 1 and 2 carry a non-null value.
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", None),
            ("a", "2024-01-01 01:00:00", 10.0),
            ("a", "2024-01-01 02:00:00", 20.0),
            ("a", "2024-01-01 04:00:00", None),
        ],
        "g string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = time_bucket_gapfill(
        df,
        group_cols=["g"],
        ts_col="ts",
        bucket_seconds=3600,
        aggs=[F.sum("v").alias("total")],
        fill={"total": ["locf", "interpolate"]},
    ).orderBy("bucket")
    rows = out.collect()
    assert len(rows) == 5  # hour 3 densified
    # leading gap: LOCF and interpolate both NULL (Timescale semantics)
    assert rows[0]["total_locf"] is None
    assert rows[0]["total_interpolate"] is None
    # interior gap interpolates, trailing gap carries forward but does
    # not extrapolate
    assert rows[3]["total_locf"] == 20.0
    # hour-3 gap has no LATER non-null observation → no interpolation
    assert rows[3]["total_interpolate"] is None
    assert rows[4]["total_locf"] == 20.0
    assert rows[4]["total_interpolate"] is None


def test_time_bucket_gapfill_properties(spark):
    """Property-style invariants over random sparse series: contiguous
    spine, gap flags match nulls, LOCF carries the latest observation,
    interpolation stays inside its bracketing observations and is NULL
    outside the observed range."""
    import random

    from gcs_parquet_dataflow_spark.operators.temporal import (
        time_bucket_gapfill,
    )

    rng = random.Random(42)
    rows = []
    for g in ("a", "b", "c"):
        hours = sorted(rng.sample(range(0, 50), rng.randint(1, 8)))
        for h in hours:
            rows.append((g, h, float(rng.randint(1, 999))))
    df = spark.createDataFrame(rows, "g string, h int, v double").select(
        "g",
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(hours=F.col("h"))).alias("ts"),
        "v",
    )
    out = time_bucket_gapfill(
        df,
        group_cols=["g"],
        ts_col="ts",
        bucket_seconds=3600,
        aggs=[F.sum("v").alias("total")],
        fill={"total": ["locf", "interpolate", "zero"]},
    ).orderBy("g", "bucket").collect()

    by_g: dict = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    for g, rs in by_g.items():
        # contiguous hourly spine
        hours = [int((r["bucket"] - rs[0]["bucket"]).total_seconds() // 3600)
                 for r in rs]
        assert hours == list(range(len(rs))), g
        # endpoints observed by construction
        assert rs[0]["total"] is not None and rs[-1]["total"] is not None
        last_seen = None
        for i, r in enumerate(rs):
            assert r["is_gap"] == (r["total"] is None)
            assert r["total_zero"] == (r["total"] or 0.0)
            if r["total"] is not None:
                last_seen = r["total"]
                assert r["total_locf"] == r["total"]
                assert r["total_interpolate"] == r["total"]
            else:
                assert r["total_locf"] == last_seen
                prev_obs = next(rs[j]["total"] for j in range(i, -1, -1)
                                if rs[j]["total"] is not None)
                next_obs = next(rs[j]["total"] for j in range(i, len(rs))
                                if rs[j]["total"] is not None)
                lo, hi = min(prev_obs, next_obs), max(prev_obs, next_obs)
                assert lo - 1e-9 <= r["total_interpolate"] <= hi + 1e-9


def test_nearest_join_picks_closer_side_tie_earlier_and_horizon(spark):
    from gcs_parquet_dataflow_spark.operators.temporal import nearest_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"),   # closer to s1 (09:59) than s2
         (1, "2024-01-01 11:30:00", "b"),   # exactly between s2/s3 -> earlier
         (2, "2024-01-01 09:00:00", "c"),   # key with no right rows
         (3, "2024-01-01 09:00:00", "d")],  # only match 2h away
        "k long, ts string, ev string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:59:00", "s1"),
         (1, "2024-01-01 11:00:00", "s2"),
         (1, "2024-01-01 12:00:00", "s3"),
         (3, "2024-01-01 11:00:00", "far")],
        "k long, ts string, state string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["ev"]: (r["state"], r["gap_us"]) for r in
           nearest_join(left, right, ["k"]).collect()}
    assert got["a"] == ("s1", 60_000_000)
    assert got["b"] == ("s2", 1800_000_000)     # tie -> earlier right row
    assert got["c"] == (None, None)
    assert got["d"] == ("far", 7200_000_000)
    # horizon: the 2h match falls outside a 1h gap limit
    capped = {r["ev"]: r["state"] for r in
              nearest_join(left, right, ["k"], max_gap_seconds=3600).collect()}
    assert capped["d"] is None and capped["a"] == "s1"


def test_fit_trend_poly_matches_closed_form_and_fits_curvature(spark):
    """Grouped-map polyfit: degree-1 coefficients reproduce the exact
    closed-form OLS on a noiseless line per group, and degree-2
    recovers planted quadratic coefficients."""
    from gcs_parquet_dataflow_spark.operators.temporal import fit_trend_poly

    rows = []
    for g, (a0, a1) in {"g1": (3.0, 2.0), "g2": (-1.0, 0.5)}.items():
        for x in range(10):
            rows.append((g, float(x), a0 + a1 * x))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    fit = {r["g"]: r for r in fit_trend_poly(df, ["g"], "x", "y", 1).collect()}
    assert fit["g1"]["n_points"] == 10
    assert abs(fit["g1"]["c0"] - 3.0) < 1e-9 and abs(fit["g1"]["c1"] - 2.0) < 1e-9
    assert abs(fit["g2"]["c0"] + 1.0) < 1e-9 and abs(fit["g2"]["c1"] - 0.5) < 1e-9

    quad = spark.createDataFrame(
        [("q", float(x), 1.0 + 2.0 * x + 0.5 * x * x) for x in range(12)],
        "g string, x double, y double",
    )
    f2 = fit_trend_poly(quad, ["g"], "x", "y", 2).first()
    assert abs(f2["c0"] - 1.0) < 1e-7
    assert abs(f2["c1"] - 2.0) < 1e-7
    assert abs(f2["c2"] - 0.5) < 1e-7

    # under-determined group yields NaN coefficients, not a crash
    tiny = spark.createDataFrame([("t", 1.0, 1.0)], "g string, x double, y double")
    f3 = fit_trend_poly(tiny, ["g"], "x", "y", 2).first()
    import math

    # NaN may surface as NULL after the Arrow hop; either marks "no fit"
    assert f3["c2"] is None or math.isnan(f3["c2"])
