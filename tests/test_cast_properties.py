"""Property-based tests (SURVEY §5 item 3): for random scalars, the Spark
cast-ladder expressions agree with the documented reference Python
semantics (tests/reference_semantics.py is the oracle)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gcs_parquet_dataflow_spark.functions import casts
from tests import reference_semantics as ref

# keep per-case Spark jobs cheap: batch many values into one DataFrame
N_EXAMPLES = 20

finite_doubles = st.floats(allow_infinity=False, width=64)
small_strings = st.one_of(
    st.sampled_from(
        ["", " ", "true", "TRUE", "t", "y", "yes", "1", "0", "no",
         "false", "12", "-3", "12.5", "abc", "1e3", " 7 ", "NaN"]
    ),
    st.text(max_size=8),
)


def run_ladder(spark, values, dtype, builder):
    schema = T.StructType([T.StructField("x", dtype)])
    df = spark.createDataFrame([(v,) for v in values], schema)
    col = casts.nan_to_null(F.col("x"), dtype)
    return [r[0] for r in df.select(builder(col, dtype).alias("y")).collect()]


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(st.lists(st.one_of(st.none(), finite_doubles), min_size=1, max_size=30))
def test_boolean_of_double(spark, xs):
    got = run_ladder(spark, xs, T.DoubleType(), casts.cast_boolean)
    want = [ref.ref_boolean(x) for x in xs]
    assert got == want


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(st.lists(st.one_of(st.none(), small_strings), min_size=1, max_size=30))
def test_boolean_of_string(spark, xs):
    got = run_ladder(spark, xs, T.StringType(), casts.cast_boolean)
    want = [ref.ref_boolean(x) for x in xs]
    assert got == want


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(st.lists(st.one_of(st.none(), st.integers(-2**62, 2**62)),
                min_size=1, max_size=30))
def test_integer_of_long(spark, xs):
    got = run_ladder(spark, xs, T.LongType(), casts.cast_integer)
    want = [ref.ref_integer(x) for x in xs]
    assert got == want


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(st.lists(st.one_of(st.none(), small_strings), min_size=1, max_size=30))
def test_integer_of_string(spark, xs):
    got = run_ladder(spark, xs, T.StringType(), casts.cast_integer)
    want = [ref.ref_integer(x) for x in xs]
    want = [None if w is ref.OMIT else w for w in want]
    # Python int("12.5") raises (→ omit/None); int(" 7 ") == 7. Spark
    # try_cast agrees on both. Whitespace-only → None both sides.
    assert got == want


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(st.lists(st.one_of(st.none(), finite_doubles), min_size=1, max_size=30))
def test_string_of_double(spark, xs):
    got = run_ladder(spark, xs, T.DoubleType(), casts.cast_string)
    want = [ref.ref_string(x) for x in xs]
    # float formatting: Python repr and Java Double.toString agree on
    # shortest-roundtrip for doubles, except Java uses E notation earlier;
    # normalize through float() round-trip instead of string equality.
    for g, w in zip(got, want):
        if w is None:
            assert g is None
        else:
            assert g is not None and math.isclose(float(g), float(w),
                                                  rel_tol=0, abs_tol=0) or float(g) == float(w)


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(st.lists(st.one_of(st.none(), st.integers(-2**31, 2**31),
                          finite_doubles),
                min_size=1, max_size=30))
def test_unix_timestamp_auto_numeric(spark, xs):
    xs = [float(x) if x is not None else None for x in xs]
    got = run_ladder(spark, xs, T.DoubleType(),
                     lambda c, t: casts.cast_unix_timestamp_auto(c, t))
    want = [ref.ref_unix_timestamp_auto(float(x)) if x is not None else None
            for x in xs]
    # Spark double→long saturates at long range; Python int() is unbounded.
    # Compare only within the safe range.
    for g, w, x in zip(got, want, xs):
        if x is not None and abs(float(x)) < 2**62:
            assert g == w, f"x={x!r}: spark={g} ref={w}"
