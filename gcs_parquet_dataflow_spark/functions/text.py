"""Text-analysis column builders for the training-data pipeline surface:
tokenization, token counting, quality scoring, language-ID, and document
fingerprinting (BASELINE.json extension operators).

Everything here is pure Column expressions — whole-stage-codegen'd
JVM-side, no Python in the hot path — and every function has an exact
DuckDB-SQL equivalent so the driver's differential oracle can check
values bit-for-bit (see queries/extensions.py).

The shared hash primitive is ``hash32``: the first 8 hex digits of
md5 as a BIGINT. md5 is identical in every engine, which is what makes
MinHash / SimHash / fingerprints oracle-checkable; it is also uniform
enough for sketching. (Spark's native ``xxhash64`` would be ~2× faster
but has no DuckDB twin; at 100 TB swap ``HASH32_IMPL`` if differential
checking is not needed.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword sets for the n-gram language-ID heuristic. Tiny on purpose:
# the operator demonstrates deterministic, SQL-expressible language
# scoring; production would swap in real per-language lists (the plan
# shape — score = stopword hits / tokens, argmax with tie priority —
# is unchanged).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "es": ("el", "la", "de", "los", "las", "y", "que"),
    "de": ("der", "die", "das", "und", "ein", "ist", "nicht"),
    "fr": ("le", "la", "les", "de", "et", "est", "une"),
}
LANG_PRIORITY = ("en", "es", "de", "fr")  # tie-break order

# consonant-cluster + vowel-run ≈ syllable; the "BPE-ish" subtoken unit
BPE_ISH_PATTERN = r"[bcdfghjklmnpqrstvwxyz]*[aeiou]+"


def hash32(col: Column) -> Column:
    """First 32 bits of md5(utf8(col)) as a non-negative BIGINT.

    DuckDB twin: ``CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 8), 16, 10).cast(
        "long"
    )


def tokens(col: Column) -> Column:
    """Whitespace tokens. DuckDB twin: ``string_split(x, ' ')``."""
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    # F.size(NULL) is -1 (non-ANSI); propagate NULL instead
    return F.when(col.isNull(), F.lit(None)).otherwise(
        F.size(tokens(col))
    ).cast("long")


def bpe_ish_count(col: Column) -> Column:
    """Syllable-like subtoken count via BPE-ish regex.

    DuckDB twin: ``len(regexp_extract_all(x, pattern))``.
    """
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN)).cast("long")


def distinct_token_ratio(col: Column) -> Column:
    """|distinct tokens| / |tokens| — low values = repetitive/spammy.
    NULL text → NULL (size(NULL) would otherwise yield -1/-1 = 1.0)."""
    t = tokens(col)
    return F.when(col.isNull(), F.lit(None).cast("double")).otherwise(
        F.round(F.size(F.array_distinct(t)).cast("double") / F.size(t), 6)
    )


def stopword_hits(col: Column, words: tuple[str, ...]) -> Column:
    t = tokens(col)
    return F.when(col.isNull(), F.lit(None)).otherwise(
        F.size(F.filter(t, lambda x: x.isin(*words)))
    ).cast("long")


def stopword_ratio(col: Column, words: tuple[str, ...]) -> Column:
    return F.round(
        stopword_hits(col, words).cast("double") / token_count(col), 6
    )


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio (the n-gram LID signal)."""
    return {lang: stopword_ratio(col, ws) for lang, ws in LANG_STOPWORDS.items()}


def lang_id(col: Column) -> Column:
    """argmax of lang_scores with LANG_PRIORITY tie-break; all-zero → 'und'.

    Expressed as a when-chain (greatest + ordered equality) so the DuckDB
    oracle can state the identical CASE ladder.
    """
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.when(col.isNull(), F.lit(None).cast("string"))
    expr = expr.when(best == 0, F.lit("und"))
    for lang in LANG_PRIORITY:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + lexical diversity
    + an English-stopword floor. Deterministic, exact-rational arithmetic
    (rounded at the end) so the oracle matches.
    """
    n = F.length(col).cast("double")
    length_score = F.least(n / 200.0, F.lit(1.0))
    diversity = distinct_token_ratio(col)
    stop = stopword_ratio(col, LANG_STOPWORDS["en"])
    stop_score = F.least(stop * 10.0, F.lit(1.0))
    return F.round(
        0.4 * length_score + 0.4 * diversity + 0.2 * stop_score, 6
    )


# PII patterns shared verbatim with the DuckDB oracle — restricted to
# syntax Java regex and RE2 interpret identically. Replacement order is
# dict order: URLs first (so an email inside a URL is already gone),
# then emails, then phone-shaped digit runs.
PII_PATTERNS: dict[str, str] = {
    "url": r"https?://[^\s]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9 ()\-]{6,}[0-9]",
}


def scrub_pii(col: Column) -> Column:
    """Redact URLs/emails/phone-shaped runs with <URL>/<EMAIL>/<PHONE>
    placeholders — the standard pre-training scrub pass. Pure
    ``regexp_replace`` chain: per-row, zero shuffle, runs in the scan
    stage at any scale."""
    out = col
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind redaction counts over the RAW text (each pattern counted
    independently, before any replacement)."""
    return {
        name: F.regexp_count(col, F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


# URL canonicalization steps shared verbatim with the DuckDB oracle
# (Java regex and RE2 read these identically; no backreferences, so the
# replacement strings also transfer as-is). Order matters:
# fragment → tracking params → delimiter cleanup; the host-lowercasing
# step sits between the two lists because it is extract+concat, not a
# plain replace.
URL_CANON_PRE: list[tuple[str, str]] = [
    (r"#.*$", ""),  # drop fragment
    (r"(utm_[a-zA-Z]+|fbclid|gclid|msclkid)=[^&#]*", ""),  # tracking args
    (r"&&+", "&"),  # collapse runs left by removed params
    (r"\?&", "?"),  # '?&x' → '?x'
    (r"[?&]+$", ""),  # dangling '?'/'&'
]
URL_SCHEME_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
URL_CANON_POST: list[tuple[str, str]] = [
    (r"://www\.", "://"),  # strip www. (host already lowercased)
    (r"/+$", ""),  # trailing slash(es)
]


def canonicalize_url(col: Column) -> Column:
    """Canonical URL form for dedup/rollup keys: drop the fragment and
    tracking query params (utm_*/fbclid/gclid/msclkid), lowercase the
    scheme+host (paths stay case-sensitive), strip ``www.`` and trailing
    slashes. Pure regexp chain — per-row, zero shuffle, scan-stage cost
    at any scale. SQL twin built from the SAME constants by
    ``canonicalize_url_sql``."""
    u = col
    for pat, rep in URL_CANON_PRE:
        u = F.regexp_replace(u, pat, rep)
    u = F.concat(
        F.lower(F.regexp_extract(u, URL_SCHEME_HOST, 0)),
        F.regexp_replace(u, URL_SCHEME_HOST, ""),
    )
    for pat, rep in URL_CANON_POST:
        u = F.regexp_replace(u, pat, rep)
    return u


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB expression applying exactly the steps of
    ``canonicalize_url`` to SQL expression ``expr`` (oracle twin;
    'g' flag because DuckDB replaces first-match by default while
    Spark/Java replaces all)."""
    u = expr
    for pat, rep in URL_CANON_PRE:
        u = f"regexp_replace({u}, '{pat}', '{rep}', 'g')"
    u = (
        f"lower(regexp_extract({u}, '{URL_SCHEME_HOST}')) || "
        f"regexp_replace({u}, '{URL_SCHEME_HOST}', '')"
    )
    for pat, rep in URL_CANON_POST:
        u = f"regexp_replace({u}, '{pat}', '{rep}', 'g')"
    return u


def doc_md5(col: Column) -> Column:
    """Whole-document fingerprint: md5 hex of the normalized text
    (lowercased, whitespace collapsed)."""
    normalized = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    return F.md5(F.encode(normalized, "UTF-8"))


def rolling_min_fingerprint(col: Column, gram: int = 8) -> Column:
    """Winnowing-style content fingerprint: min hash32 over all character
    ``gram``-grams. Robust to local edits (an edit perturbs ≤``gram``
    grams, usually not the minimum). Per-row compute, no shuffle — at
    100 TB this runs inside the scan stage.

    DuckDB twin:
    ``list_min([CAST('0x'||substr(md5(substr(x,i,g)),1,8) AS BIGINT)
                for i in range(1, len(x)-g+2)])``
    """
    n = F.length(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (gram - 1), F.lit(1))),
        lambda i: col.substr(i, F.lit(gram)),
    )
    return F.array_min(F.transform(grams, hash32))


def pseudonymize(col: Column, pepper: str) -> Column:
    """Keyed pseudonymization: sha256(pepper ‖ value) hex — stable
    within a pepper (joins/groupBys still line up across tables) while
    unlinkable to the raw id without it. Rotate the pepper to unlink
    historical releases. DuckDB twin: ``sha256(pepper || CAST(x AS
    VARCHAR))``. This is scan-stage Column work (JVM sha2, codegen);
    for k-anonymity of the RELEASE, pair with the QI audits — tokens
    alone don't anonymize quasi-identifiers."""
    return F.sha2(F.concat(F.lit(pepper), col.cast("string")), 256)


# HTML strip pipeline: ordered (pattern, replacement) steps shared
# verbatim with the DuckDB twin. RE2-safe (no backreferences, no
# lookaround) so both engines' regex dialects agree; entity decode
# runs &amp; LAST so double-escaped entities decode exactly once.
HTML_STRIP_STEPS = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
)
HTML_ENTITY_STEPS = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_html(col: Column) -> Column:
    """Main-text extraction from raw HTML — the first stage of every
    crawl-curation pipeline: drop script/style/comment blocks, strip
    tags, decode the common entities, collapse whitespace. Pure
    regexp_replace chain (scan-stage, codegen'd, zero shuffle);
    the DuckDB twin is :func:`strip_html_sql` built from the SAME step
    tables. For layout-aware boilerplate removal (trafilatura-class),
    slot a pandas_udf behind the same signature — this chain is the
    deterministic, dependency-free baseline."""
    out = col
    for pat, rep in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in HTML_ENTITY_STEPS:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def strip_html_sql(x: str) -> str:
    """DuckDB twin of :func:`strip_html` (same step tables)."""
    out = x
    for pat, rep in HTML_STRIP_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    for ent, ch in HTML_ENTITY_STEPS:
        ch_sql = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{ch_sql}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


def encoding_ok(col: Column) -> Column:
    """True iff the text shows no signs of encoding damage: no U+FFFD
    replacement character (lossy decode) and no Latin-1-supplement
    mojibake lead bytes À-Å (the 'Ã©'-style double-decode signature).

    The Column form of the text_mojibake_audit / pipeline-v5 gate —
    exposed here so the recipe stage, the audit query, and any ad-hoc
    filter share one definition. DuckDB twin:
    ``NOT contains(text, chr(65533)) AND length(list_filter(
    string_split_regex(text, ''), c -> c >= chr(192) AND
    c <= chr(197))) = 0``.
    """
    return (~col.contains("�")) & (
        F.regexp_count(col, F.lit("[À-Å]")) == 0
    )


# Rae et al. 2021 (Gopher), §A1.1 — the standard document-level quality
# heuristics; thresholds as published. The stop-word list is the paper's.
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(col: Column) -> Column:
    """The Gopher quality-filter rule set as one struct Column —
    (n_words, ok_word_count, ok_mean_word_len, ok_symbol_ratio,
    ok_bullet_lines, ok_ellipsis_lines, ok_alpha_words, ok_stop_words,
    pass_gopher). Complements text_repetition_signals (the paper's
    repetition half, already a query row).

    All pure Column expressions; the three array filters (bullet /
    ellipsis lines, alpha words) are higher-order filters over PER-ROW
    arrays bounded by words-per-doc — not the corpus-wide hot path the
    explode+groupBy rule governs. Mean word length uses
    Σlen(w) = len(replace(text,' ','')) (tokens split on single
    spaces), so no fold is needed. Every expression has an exact
    DuckDB twin (quality_gopher_rules row)."""
    t = tokens(col)
    lines = F.split(col, "\n")
    n = F.size(t).cast("long")
    sum_len = F.length(F.regexp_replace(col, " ", ""))
    mean_wl = sum_len.cast("double") / n
    hashes = F.length(col) - F.length(F.regexp_replace(col, "#", ""))
    ellipses = (
        F.length(col)
        - F.length(F.replace(col, F.lit("..."), F.lit("")))
    ) / 3
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("- ")
            | l.startswith("• ")
            | l.startswith("* "),
        )
    )
    ell_end = F.size(F.filter(lines, lambda l: l.endswith("...")))
    alpha = F.size(F.filter(t, lambda w: w.rlike("[A-Za-z]")))
    stops = F.size(
        F.array_intersect(t, F.array(*[F.lit(w) for w in GOPHER_STOP_WORDS]))
    )
    ok_wc = (n >= 50) & (n <= 100_000)
    ok_mwl = (mean_wl >= 3) & (mean_wl <= 10)
    ok_sym = (hashes + ellipses).cast("double") / n <= 0.1
    ok_bul = bullet.cast("double") / n_lines <= 0.9
    ok_ell = ell_end.cast("double") / n_lines <= 0.3
    ok_alpha = alpha.cast("double") / n >= 0.8
    ok_stop = stops >= 2
    return F.struct(
        n.alias("n_words"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_bul.alias("ok_bullet_lines"),
        ok_ell.alias("ok_ellipsis_lines"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stop_words"),
        (
            ok_wc & ok_mwl & ok_sym & ok_bul & ok_ell & ok_alpha & ok_stop
        ).alias("pass_gopher"),
    )
