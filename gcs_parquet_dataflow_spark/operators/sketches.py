"""Mergeable cardinality sketches (Apache DataSketches HLL via Spark's
``hll_sketch_agg`` family): the 100 TB rollup pattern where per-shard /
per-day sketch TABLES are materialized once and any later rollup —
across days, sources, or the whole corpus — is a cheap sketch union
instead of a re-scan of raw data.

Why this matters at scale: exact count-distinct over 100 TB shuffles the
distinct keys every time someone asks; a persisted sketch table reduces
every follow-up rollup to reading kilobyte-sized binaries. The sketches
are associative and commutative, so shard → daily → monthly rollups
compose without ever touching raw rows again.

Approximate ops are deliberately NOT in the DuckDB oracle surface
(engine sketch implementations differ); correctness is asserted as an
error-bound + mergeability test (tests/test_scale_patterns.py).

No reference analog (the reference computes no aggregates at all —
SURVEY §2.7); this is extension surface for the training-data stack
(e.g. distinct-document / distinct-user reach per source over time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Materialize one HLL sketch per group → (group_cols…, hll: binary).

    The output is a tiny, parquet-writable sketch table (a sketch at
    lgConfigK=12 is ≤ 4 KiB regardless of input cardinality). One hash
    aggregation with map-side partials — the same shape as an exact
    count-distinct's first phase, but the shuffle carries fixed-size
    sketch buffers instead of every distinct key.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lgk)).alias(
            "hll"
        )
    )


def merge_estimates(
    sketch_df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll",
) -> DataFrame:
    """Roll sketches up to ``group_cols`` → (group_cols…, approx_distinct).

    Pure sketch-union aggregation: runs on the sketch table alone, never
    re-reads raw data. Pass a coarser ``group_cols`` than the sketch
    table's (or ``[]`` … via a constant column) to roll up across
    shards/days; unions are associative so any rollup ladder gives the
    same estimate as a single-shot sketch over the union of inputs.
    """
    return sketch_df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col)))
        .cast("long")
        .alias("approx_distinct")
    )


def value_histogram(
    df: DataFrame,
    group_cols: list[str],
    cents_col: str,
) -> DataFrame:
    """Mergeable EXACT-quantile rollup table: per-group distinct-value
    counts over an integer (cents) column → (group_cols…, v, n).

    The quantile analog of the HLL sketch tables: histograms from
    different shards/days merge by summing counts per (group, v), and
    ``quantiles_from_histogram`` recovers the exact interpolated
    percentile — bit-identical to sorting the raw rows — without ever
    re-scanning them. Size is bounded by the column's distinct-value
    count (for 2-decimal money at any realistic range: ≤ a few million
    rows per group axis, parquet-tiny), NOT by the row count, which is
    what makes it a 100 TB pattern.
    """
    return df.groupBy(*group_cols, F.col(cents_col).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def merge_histograms(parts: list[DataFrame]) -> DataFrame:
    """Union shard histograms into one (sum counts per (group, v))."""
    if not parts:
        raise ValueError("no histograms to merge")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    keys = [c for c in u.columns if c != "n"]
    return u.groupBy(*keys).agg(F.sum("n").cast("long").alias("n"))


def quantiles_from_histogram(
    hist: DataFrame,
    group_cols: list[str],
    ps: list[float],
) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` / DuckDB
    ``quantile_cont`` semantics: h = p·(n−1), linear between the values
    at ⌊h⌋/⌈h⌉) computed FROM the histogram → (group_cols…, n_rows,
    p_<p>…). One per-group cumulative window over distinct values +
    one conditional aggregate per percentile — cost is histogram-sized,
    independent of the original row count."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*group_cols).orderBy("v")
    h = (
        hist.withColumn("cum", F.sum("n").over(w))
        .withColumn("tot", F.sum("n").over(W.partitionBy(*group_cols)))
    )
    aggs = [F.max("tot").cast("long").alias("n_rows")]
    for p in ps:
        hp = F.lit(p) * (F.col("tot") - 1)
        lo_i = F.floor(hp)
        hi_i = F.ceil(hp)
        # value covering 0-based index i is the min v with cum > i
        v_lo = F.min(F.when(F.col("cum") > lo_i, F.col("v")))
        v_hi = F.min(F.when(F.col("cum") > hi_i, F.col("v")))
        frac = F.max(hp - lo_i)  # constant per group
        name = f"p{str(p).replace('0.', '').replace('.', '_')}"
        aggs.append(
            F.round((v_lo + frac * (v_hi - v_lo)) / 100, 6).alias(name)
        )
    return h.groupBy(*group_cols).agg(*aggs)


# ---------------------------------------------------------------------------
# Deterministic distinct-count sketch (salted-min / bottom-1×k, the
# Flajolet–Martin-style estimator over k independent salted md5 hashes).
# Unlike the HLL surface above, this one is DETERMINISTIC and therefore
# value-exact oracle-checkable: both engines compute the identical
# integer minima and the identical IEEE estimate expression.
# ---------------------------------------------------------------------------

HASH_SPACE = 4294967296.0  # 2^32 — hash32's value range


def salted_min_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Per-group minimum of ``n_salts`` independently salted 32-bit
    hashes of ``value_col`` → (group_cols…, m0..m{k−1}).

    The mergeable distinct sketch in its simplest deterministic form:
    state per group is k longs, the aggregation is one shuffle with
    map-side combine, and shard sketches merge by per-salt ``min`` —
    associative, so shard → day → total rollups give bit-identical
    estimates to a single-shot pass. At 100 TB the shuffle carries
    k×8 bytes per group instead of every distinct key.
    """
    from gcs_parquet_dataflow_spark.functions.text import hash32

    v = F.col(value_col).cast("string")
    aggs = [
        F.min(hash32(F.concat(v, F.lit(f"#s{i}")))).alias(f"m{i}")
        for i in range(n_salts)
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def merge_min_sketches(
    sketch_df: DataFrame, group_cols: list[str], n_salts: int = 8
) -> DataFrame:
    """Roll salted-min sketches up to coarser ``group_cols`` (per-salt
    ``min`` over the sketch table only — never re-reads raw data)."""
    return sketch_df.groupBy(*group_cols).agg(
        *[F.min(f"m{i}").alias(f"m{i}") for i in range(n_salts)]
    )


def distinct_estimate_from_mins(
    sketch_df: DataFrame, group_cols: list[str], n_salts: int = 8
) -> DataFrame:
    """Distinct-count estimate from a salted-min sketch.

    For n distinct values, each salted min is ≈ 2^32/(n+1); averaging
    the k ratios R_i = (m_i+1)/2^32 and inverting gives
    n̂ = 1/mean(R) − 1. The expression is written in one fixed
    order (integer sum, then two divisions, then the subtraction) so
    the DuckDB oracle twin produces the bit-identical double.
    """
    merged = merge_min_sketches(sketch_df, group_cols, n_salts)
    s = F.col("m0") + F.lit(n_salts)
    for i in range(1, n_salts):
        s = s + F.col(f"m{i}")
    mean_r = s / F.lit(n_salts * HASH_SPACE)
    est = F.round(F.lit(1.0) / mean_r - F.lit(1.0), 2)
    return merged.select(*group_cols, est.alias("approx_distinct"))


def salted_min_sql(value_sql: str, n_salts: int = 8) -> list[str]:
    """DuckDB twins of ``salted_min_sketch``'s aggregates (one per
    salt), for inlining into oracle SQL."""
    return [
        "min(CAST('0x' || substr(md5(" + value_sql + f" || '#s{i}'), 1, 8) "
        "AS BIGINT))"
        for i in range(n_salts)
    ]


def distinct_estimate_sql(n_salts: int = 8) -> str:
    """DuckDB twin of ``distinct_estimate_from_mins``'s projection over
    columns m0..m{k−1} (same operation order → bit-identical double)."""
    s = " + ".join([f"m0 + {n_salts}"] + [f"m{i}" for i in range(1, n_salts)])
    return f"round(1.0 / (({s}) / {n_salts * HASH_SPACE!r}) - 1.0, 2)"


# ---------------------------------------------------------------------------
# Count–min sketch: mergeable frequency table of depth×width counters.
# Deterministic (salted md5 bucket hashes) → value-exact oracle twin.
# ---------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 512


def count_min_build(
    df: DataFrame,
    value_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Build the sketch: (d, b, n) counter rows, ≤ depth×width of them.

    One explode(depth) + hash aggregation with map-side combine; the
    shuffle carries at most depth×width counter rows per partition no
    matter how many input rows or distinct keys — the bounded-memory
    frequency summary for heavy-hitter queries over unbounded key
    spaces. Sketches from different shards merge by summing n per
    (d, b) (linearity of counters).
    """
    from gcs_parquet_dataflow_spark.functions.text import hash32

    v = F.col(value_col).cast("string")
    pairs = F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("d"),
                (hash32(F.concat(v, F.lit(f"#cm{d}"))) % width).alias("b"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.d", "p.b")
        .groupBy("d", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def count_min_lookup(
    sketch: DataFrame,
    keys_df: DataFrame,
    value_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-estimate counts for ``keys_df[value_col]``: min over the
    key's depth buckets (the classic CM upper-bound estimate, ≥ truth,
    overcount from collisions only). The sketch side is ≤ depth×width
    rows → Spark broadcasts it; the probe never touches raw data."""
    from gcs_parquet_dataflow_spark.functions.text import hash32

    v = F.col(value_col).cast("string")
    probes = keys_df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("long").alias("d"),
                        (hash32(F.concat(v, F.lit(f"#cm{d}"))) % width).alias(
                            "b"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select(*keys_df.columns, "p.d", "p.b")
    # rename the counter column so a probe table carrying its own "n"
    # (e.g. an exact-count audit) never collides
    sk = sketch.withColumnRenamed("n", "_cm_n")
    joined = probes.join(F.broadcast(sk), ["d", "b"], "inner")
    return joined.groupBy(*keys_df.columns).agg(
        F.min("_cm_n").cast("long").alias("n_cm")
    )


def cm_join_size(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two count–min sketches built
    on the join keys: |A ⋈ B| = Σ_k a_k·b_k ≤ min_d Σ_b A_d[b]·B_d[b]
    (the AMS/CM inner-product upper bound). One depth×width-sized join —
    the pre-flight size check a planner (or an engineer) runs before
    committing to a shuffle strategy, without touching either table.
    → single row (est_join_size: long)."""
    j = sketch_a.alias("a").join(
        sketch_b.alias("b"),
        (F.col("a.d") == F.col("b.d")) & (F.col("a.b") == F.col("b.b")),
    )
    # round-9 overflow audit: the inner product Σ n_a·n_b bounds the
    # JOIN SIZE — at 100 TB a single hot bucket holds ~1e12/width rows
    # per side, so the per-bucket product alone exceeds int64.
    # Operand-cast into DECIMAL(38,0) (exact to 1e38) and KEEP the
    # estimate decimal: a long cast at the end would silently wrap the
    # very skew bomb this estimator exists to warn about.
    per_depth = j.groupBy(F.col("a.d")).agg(
        F.sum(F.col("a.n").cast("decimal(38,0)") * F.col("b.n")).alias("s")
    )
    return per_depth.agg(F.min("s").alias("est_join_size"))


# ---------------------------------------------------------------------------
# Bloom filter: deterministic bit-packed membership sketch — the classic
# 100 TB semi-join prune (ship a megabyte of bits instead of shuffling the
# big side against a dimension). Deterministic salted-md5 positions →
# value-exact oracle twin, like the salted-min / count-min families above.
# ---------------------------------------------------------------------------

BLOOM_BITS = 8192
BLOOM_K = 3
# Bits per packed word. 63, not 64: bit 63 is never used, so every mask
# and every OR-ed word stays positive — DuckDB raises OutOfRange on
# (1::BIGINT << 63) and Spark would flip the sign, so the 63-bit layout
# is what keeps the two engines (and any signed-long consumer) aligned.
WORD_BITS = 63


def _bloom_positions(value: "F.Column", m_bits: int, k: int) -> "F.Column":
    """Array of the key's k bit positions in [0, m_bits): salted hash32,
    same salt scheme ('#b<i>') inlined into the oracle twins."""
    from gcs_parquet_dataflow_spark.functions.text import hash32

    v = value.cast("string")
    return F.array(
        *[hash32(F.concat(v, F.lit(f"#b{i}"))) % m_bits for i in range(k)]
    )


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Build the packed filter → (word_idx: long, word: long), at most
    ⌈m_bits/63⌉ rows (absent words mean all-zero).

    One explode(k) + hash aggregation with map-side ``bit_or`` partials;
    the shuffle carries at most m_bits/63 word rows per partition no
    matter how many input keys. Duplicate inputs are free (OR is
    idempotent) — no distinct pass needed. Filters built over different
    shards merge by ``bloom_merge`` (OR is associative/commutative), so
    a per-day filter lake rolls up without re-reading raw keys.
    """
    pos = _bloom_positions(F.col(value_col), m_bits, k)
    return (
        df.select(F.explode(pos).alias("_bp"))
        .select(
            (F.col("_bp") / WORD_BITS).cast("long").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(_bp % {WORD_BITS} AS INT))"
            ).alias("_bmask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bmask").alias("word"))
    )


def bloom_merge(parts: list[DataFrame]) -> DataFrame:
    """Union shard filters into one (``bit_or`` per word_idx). Built-once
    filters over disjoint OR overlapping key sets merge identically to a
    single-shot build over the unioned keys (proven hash-exact by the
    bloom_merge_equivalence oracle row)."""
    if not parts:
        raise ValueError("no bloom filters to merge")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_probe(
    keys_df: DataFrame,
    sketch: DataFrame,
    value_col: str,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership test → ``keys_df``'s columns + ``bloom_pass: boolean``,
    ROW-PRESERVING (duplicate input rows stay duplicate output rows).

    A key passes iff ALL k of its bits are set — no false negatives ever
    (set bits are never cleared), false positives at the standard
    (1 − e^(−kn/m))^k rate. The filter side is ≤ m_bits/63 rows →
    broadcast (a 2^30-bit filter is ~17M words ≈ 136 MB: still
    broadcastable on executor-sized memory; beyond that, shuffle both
    sides on word_idx via the explode form). Plan shape: k sequential
    BroadcastHashJoins on the word index — map-only, ZERO shuffle of
    the key rows (the first form here exploded k probe rows per key and
    re-grouped, shuffling k×|keys| full-width rows; this one never
    touches the keys' partitioning)."""
    reserved = {
        c for i in range(k) for c in (f"_bp{i}", f"_wi{i}", f"_wd{i}")
    }
    clash = reserved & set(keys_df.columns)
    if clash:
        raise ValueError(f"keys_df carries reserved bloom columns: {clash}")
    from gcs_parquet_dataflow_spark.functions.text import hash32

    v = F.col(value_col).cast("string")
    probes = keys_df.select(
        "*",
        *[
            (hash32(F.concat(v, F.lit(f"#b{i}"))) % m_bits).alias(f"_bp{i}")
            for i in range(k)
        ],
    )
    # OR-merge the sketch side defensively: an append-only bloom LAKE
    # (bloom words written per batch, never compacted) has multiple rows
    # per word_idx, and joining those raw would both fan out key rows
    # and produce FALSE NEGATIVES (a bit set only in the OR of two
    # partial words fails on each individually). The merge is ≤ m/63
    # groups — noise next to the joins it protects.
    sketch = sketch.groupBy("word_idx").agg(F.bit_or("word").alias("word"))
    hits = []
    for i in range(k):
        sk = sketch.select(
            F.col("word_idx").alias(f"_wi{i}"), F.col("word").alias(f"_wd{i}")
        )
        probes = probes.join(
            F.broadcast(sk),
            (F.col(f"_bp{i}") / WORD_BITS).cast("long") == F.col(f"_wi{i}"),
            "left",
        )
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(_bp{i} % {WORD_BITS} AS INT))"
        )
        hits.append(
            F.col(f"_wd{i}").isNotNull()
            & (F.col(f"_wd{i}").bitwiseAND(mask) == mask)
        )
    bloom_pass = hits[0]
    for h in hits[1:]:
        bloom_pass = bloom_pass & h
    return probes.select(*keys_df.columns, bloom_pass.alias("bloom_pass"))


def bloom_pos_sql(value_sql: str, m_bits: int = BLOOM_BITS) -> str:
    """DuckDB twin of one salted probe position; expects an ``i`` column
    (salt index from ``range(k)``) in scope."""
    return (
        "CAST('0x' || substr(md5(CAST(" + value_sql + " AS VARCHAR) || '#b' "
        f"|| CAST(i AS VARCHAR)), 1, 8) AS BIGINT) % {m_bits}"
    )


def bloom_word_sql(pos_col: str = "p") -> tuple[str, str]:
    """DuckDB twins of the packed-word projection: (word_idx expr,
    mask expr) over a position column."""
    return (
        f"{pos_col} // {WORD_BITS}",
        f"(CAST(1 AS BIGINT) << CAST({pos_col} % {WORD_BITS} AS INT))",
    )
