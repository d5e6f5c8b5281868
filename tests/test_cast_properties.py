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
         "false", "12", "-3", "12.5", "abc", "1e3", " 7 ", "NaN",
         # regression set: control chars (int() does NOT strip \x1c-\x1f
         # though Spark's bare cast does), digit underscores, Unicode Nd
         # digits (BMP + astral), Python-only float forms
         "0\x1f", "\x1c5", "1_0", "1__0", "_1", "1_", "٣", "𝟏𝟐", "١_٢",
         "1.", ".5", "1.e3", "-.5", "inf", "-Infinity", "+nan", "1_0.5e1_0",
         "\t12\n", "\xa012", "+", "-", "."]
    ),
    st.text(max_size=8),
)


def same_float(g, w):
    """NaN-aware float equality (float('nan') is a VALUE in the reference
    output, not a missing property)."""
    if g is None or w is None:
        return g is None and w is None
    return (math.isnan(g) and math.isnan(w)) or g == w


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
@given(st.lists(st.one_of(st.none(), small_strings), min_size=1, max_size=30))
def test_float_of_string(spark, xs):
    """The latent twin of the '0\\x1f' integer bug (VERDICT r3): Spark's
    bare string→double cast over-accepts; the grammar-gated ladder must
    reproduce Python float() exactly, incl. inf/nan words, '1.'/'.5'
    forms, digit underscores, and Unicode digits."""
    got = run_ladder(spark, xs, T.StringType(), casts.cast_float)
    want = [ref.ref_float(x) for x in xs]
    want = [None if w is ref.OMIT else w for w in want]
    assert all(same_float(g, w) for g, w in zip(got, want)), list(
        zip(xs, got, want)
    )


def test_integer_of_string_regressions(spark):
    """Deterministic pin of the hypothesis counterexample plus the grammar
    corners (verdict r3 item 1): control chars reject, underscores accept,
    Unicode Nd digits accept."""
    cases = {
        "0\x1f": None, "\x1c5": None, "5\x1d": None,  # int() keeps \x1c-\x1f
        "1_0": 10, "1__0": None, "_1": None, "1_": None,
        "٣": 3, "𝟏𝟐": 12, "١_٢": 12,
        " 7 ": 7, "\t12\n": 12, "\xa012": 12, " 7　": 7,
        "12.5": None, "+12": 12, "-0": 0, "": None, "+": None,
    }
    got = run_ladder(spark, list(cases), T.StringType(), casts.cast_integer)
    assert got == list(cases.values()), list(zip(cases, got, cases.values()))


def test_float_of_string_regressions(spark):
    cases = {
        "0\x1f": None, "1_.5": None, "1._5": None, "1e_5": None,
        "1.": 1.0, ".5": 0.5, "1.e3": 1000.0, "-.5": -0.5,
        "1_0.5_5e1_0": 105500000000.0, "٣.٥": 3.5,
        "inf": float("inf"), "-Infinity": float("-inf"),
        "INFINITY": float("inf"), "5e999": float("inf"), "1e-999": 0.0,
        "+nan": float("nan"), "NaN": float("nan"),
        "0x10": None, "1j": None, ".": None,
    }
    got = run_ladder(spark, list(cases), T.StringType(), casts.cast_float)
    assert all(same_float(g, w) for g, w in zip(got, cases.values())), list(
        zip(cases, got, cases.values())
    )


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(st.lists(st.one_of(st.none(), finite_doubles), min_size=1, max_size=30))
def test_float_of_double(spark, xs):
    got = run_ladder(spark, xs, T.DoubleType(), casts.cast_float)
    want = [ref.ref_float(x) for x in xs]
    want = [None if w is ref.OMIT else w for w in want]
    assert all(same_float(g, w) for g, w in zip(got, want))


def _sig_digits(s):
    return (
        s.split("e")[0].replace("-", "").replace(".", "").lstrip("0").rstrip("0")
    )


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(st.lists(st.one_of(st.none(), finite_doubles), min_size=1, max_size=30))
def test_string_of_double(spark, xs):
    """cast_string reformats Spark's Java-style cast into Python repr()
    STYLE exactly (plain vs e+XX decided by Python's exponent rules).
    Java 17's Double.toString occasionally emits MORE digits than the
    shortest repr (JDK-4511638 — e.g. 2^-24 → '...0625e-08', subnormals,
    many |v| ≥ 2^53), which a reformat cannot undo; the contract is:
    byte-identical to repr() whenever Java's digits are shortest (the
    overwhelmingly common case), and ALWAYS round-trip value-equal in
    Python's format style."""
    got = run_ladder(spark, xs, T.DoubleType(), casts.cast_string)
    want = [ref.ref_string(x) for x in xs]
    for x, g, w in zip(xs, got, want):
        if w is None:
            assert g is None
            continue
        assert g is not None and float(g) == float(w), (x, g, w)
        assert ("e" in g) == ("e" in w), (x, g, w)  # same style either way
        if _sig_digits(g) == _sig_digits(w):
            assert g == w, (x, g, w)  # shortest digits ⇒ byte-exact


def test_string_of_double_regressions(spark):
    cases = [0.0, -0.0, 0.1, 1e16, -1e16, 1e15, 1.5e7, 12345678.0,
             0.0001, 1e-5, -1e-5, 1e22, 2.2250738585072014e-308,
             1.7976931348623157e308,
             9.999e-4, 1234567.0, 9999999.0, 10000000.0, 123.0,
             float("inf"), float("-inf")]
    got = run_ladder(spark, cases, T.DoubleType(), casts.cast_string)
    assert got == [repr(v) for v in cases], list(zip(cases, got))


def test_string_of_double_jdk4511638_tail(spark):
    """The shorten-and-verify branch (VERDICT r4 item 8): Java-17
    digit-overshoot cases that round 5 made byte-exact — the 2⁻²⁴-class
    17-digit ties via the round-trip-verified %.15E rendering, and the
    min subnormal. Measured tail pass rate on the known-overshoot
    set: 5/7 byte-exact (r4: 0/7); the two residuals are documented
    classes (≤16-digit overshoot like 7.666663e19, short-subnormal
    6.32e-322) and must stay round-trip value-equal in Python style."""
    fixed = [2**-24, -(2**-24), 4.9e-324, -4.9e-324, 2**-1074,
             1.1125369292536007e-308, 3.141592653589793e-200]
    got = run_ladder(spark, fixed, T.DoubleType(), casts.cast_string)
    assert got == [repr(v) for v in fixed], list(zip(fixed, got))
    residual = [7.666663e19, 6.3e-322]
    got_r = run_ladder(spark, residual, T.DoubleType(), casts.cast_string)
    for v, g in zip(residual, got_r):
        assert float(g) == v and ("e" in g) == ("e" in repr(v)), (v, g)


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


def test_unix_timestamp_auto_intlike_strings(spark):
    """Reference _parse_timestamp routes STRINGS through dateutil even
    when they look numeric (main.py:131-149): '20240105' parses as a
    DATE, '1700000000' raises → None — NOT an epoch-seconds passthrough.
    ('123'/'2024' fill month/day from today → nondeterministic, excluded;
    covered by the non-null partial-form test above.)"""
    vals = ["20240105", "19991231", "1700000000", "0", "999999999999",
            "00000000"]
    got = run_fallback_parse(spark, vals)
    want = [ref.ref_unix_timestamp_auto(v) for v in vals]
    assert got == want, list(zip(vals, got, want))


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
