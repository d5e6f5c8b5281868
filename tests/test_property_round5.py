"""Property-based tests for the round-5 shared functions: every
example runs real Spark expressions over hypothesis-generated inputs —
the contracts (bounds, invariance, determinism) the oracle's fixed
fixtures can't probe.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.functions import text as TX

N_EXAMPLES = 8

words = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x2FF
        ),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=30,
)


def one_value(spark, col_expr, text):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(col_expr(F.col("text")).alias("v"))
        .first()["v"]
    )


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(ws=words)
def test_quality_score_bounded_for_any_text(spark, ws):
    """quality_score is a convex mix of three [0,1] terms → always in
    [0,1], whatever the text."""
    v = one_value(spark, TX.quality_score, " ".join(ws))
    assert 0.0 <= v <= 1.0


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(ws=words)
def test_encoding_ok_ascii_clean_and_damage_always_caught(spark, ws):
    """Pure-ASCII text always passes the encoding gate; appending the
    replacement character (or a mojibake lead byte) always fails it —
    for ANY base text."""
    base = " ".join(w.encode("ascii", "ignore").decode() or "x" for w in ws)
    assert one_value(spark, TX.encoding_ok, base) is True
    assert one_value(spark, TX.encoding_ok, base + " �") is False
    assert one_value(spark, TX.encoding_ok, base + " cafÃ©") is False


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(ws=words)
def test_canonicalize_url_is_idempotent(spark, ws):
    """canon(canon(u)) == canon(u) for arbitrary path/query junk —
    the property that makes canonical keys safe to re-derive."""
    url = "HTTPS://WWW.Example.COM/" + "/".join(ws[:5]) + "?utm_source=x&id=1"
    once = one_value(spark, TX.canonicalize_url, url)
    again = one_value(spark, TX.canonicalize_url, once)
    assert again == once


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(ws=words)
def test_hash32_stable_and_in_range(spark, ws):
    """hash32 is deterministic across sessions/partitions (it is pure
    md5 arithmetic) and always in [0, 2^32)."""
    s = " ".join(ws)
    df = (
        (lambda sp: sp.createDataFrame([(s,), (s,)], "t string"))(spark)
        .select(TX.hash32(F.col("t")).alias("h"))
        .collect()
    )
    assert df[0]["h"] == df[1]["h"]
    assert 0 <= df[0]["h"] < 2**32


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(ws=words)
def test_token_count_matches_split_semantics(spark, ws):
    """token_count equals the naive whitespace-split length for
    single-spaced text (the shared tokenizer contract every corpus
    operator assumes)."""
    s = " ".join(ws)
    n = one_value(spark, TX.token_count, s)
    assert n == len(s.split(" "))
