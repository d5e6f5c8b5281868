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


# --- dateutil-grammar fallback (SURVEY §7 hard part 2) --------------------

EXOTIC_TS = [
    "Jan 5th '24",
    "5 January 2024 10:30",
    "2024.01.05",
    "20240105T101112",
    "Sat Jan 6 14:15:16 2024",
    "January 2024",
    "10:30 AM",            # time-only: dateutil fills today's date
    "5th of January 2024",
    "02/29/2024 23:59:59.123",
    "1996-07-10T14:00:00+02:00",
    "garbage!!",
    "",
    None,
]


def _ts_strategy():
    dates = st.datetimes(
        min_value=__import__("datetime").datetime(1971, 1, 1),
        max_value=__import__("datetime").datetime(2037, 12, 31),
    )
    fmts = st.sampled_from([
        "%Y-%m-%d %H:%M:%S", "%d %b %Y %H:%M:%S", "%b %d %Y",
        "%A, %B %d, %Y", "%Y%m%dT%H%M%S", "%d/%m/%Y" , "%I:%M %p %d %b %Y",
    ])
    return st.builds(lambda d, f: d.strftime(f), dates, fmts)


def run_fallback_parse(spark, values):
    schema = T.StructType([T.StructField("x", T.StringType())])
    df = spark.createDataFrame([(v,) for v in values], schema)
    col = casts.cast_unix_timestamp_auto(
        F.col("x"), T.StringType(), dateutil_fallback=True
    )
    return [r[0] for r in df.select(col.alias("y")).collect()]


def test_dateutil_fallback_parses_exotic_forms(spark):
    # skip inputs whose dateutil result depends on "today" (time-only /
    # partial dates) — nondeterministic between driver and executor runs
    fixed = [v for v in EXOTIC_TS if v not in ("10:30 AM", "January 2024")]
    got = run_fallback_parse(spark, fixed)
    want = [ref.ref_unix_timestamp_auto(v) for v in fixed]
    assert got == want, list(zip(fixed, got, want))


def test_dateutil_fallback_accepts_date_filling_forms(spark):
    # partial forms parse to SOMETHING (non-null), value is date-relative
    got = run_fallback_parse(spark, ["10:30 AM", "January 2024"])
    assert all(g is not None for g in got)


def test_strict_mode_has_no_python_stage(spark):
    schema = T.StructType([T.StructField("x", T.StringType())])
    df = spark.createDataFrame([("2024-01-05",)], schema)
    strict = df.select(
        casts.cast_unix_timestamp_auto(F.col("x"), T.StringType()).alias("y")
    )
    plan = strict._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # JVM-only hot path preserved


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(st.lists(_ts_strategy(), min_size=1, max_size=20))
def test_dateutil_fallback_matches_reference_grammar(spark, xs):
    got = run_fallback_parse(spark, xs)
    want = [ref.ref_unix_timestamp_auto(v) for v in xs]
    assert got == want, list(zip(xs, got, want))


# --- URL canonicalization properties -------------------------------------

_url_host = st.from_regex(r"[A-Za-z]([A-Za-z0-9-]{0,8})(\.[A-Za-z]{2,4}){1,2}", fullmatch=True)
_url_path = st.lists(
    st.from_regex(r"[A-Za-z0-9._~-]{1,6}", fullmatch=True), max_size=3
).map(lambda segs: "".join("/" + s for s in segs))
_url_param = st.one_of(
    st.from_regex(r"(utm_[a-z]{1,6}|fbclid|gclid|msclkid)=[A-Za-z0-9]{0,5}", fullmatch=True),
    st.from_regex(r"[a-z]{1,4}=[A-Za-z0-9]{0,5}", fullmatch=True),
)
_urls = st.builds(
    lambda scheme, www, host, path, params, slash, frag: (
        scheme
        + ("www." if www else "")
        + host
        + path
        + (("?" + "&".join(params)) if params else "")
        + ("/" if slash and not params else "")
        + (("#" + frag) if frag else "")
    ),
    st.sampled_from(["http://", "https://", "HTTPS://", "HtTp://"]),
    st.booleans(),
    _url_host,
    _url_path,
    st.lists(_url_param, max_size=3),
    st.booleans(),
    st.one_of(st.none(), st.from_regex(r"[A-Za-z0-9-]{0,6}", fullmatch=True)),
)


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(st.lists(_urls, min_size=1, max_size=25))
def test_canonicalize_url_idempotent_and_clean(spark, urls):
    """canonicalize(canonicalize(u)) == canonicalize(u), the output
    never retains fragments/tracking params/dangling delimiters, and
    the scheme+host is lowercase."""
    import re

    from gcs_parquet_dataflow_spark.functions.text import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonicalize_url(F.col("url"))
    twice = canonicalize_url(once)
    rows = df.select(once.alias("c1"), twice.alias("c2")).collect()
    for r in rows:
        assert r["c1"] == r["c2"]  # idempotent
        c = r["c1"]
        assert "#" not in c
        assert not re.search(r"(utm_[a-z]+|fbclid|gclid|msclkid)=", c)
        assert not re.search(r"[?&]$", c) and "?&" not in c and "&&" not in c
        m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", c)
        if m:
            assert m.group(0) == m.group(0).lower()
            assert not m.group(0).split("://", 1)[1].startswith("www.")
