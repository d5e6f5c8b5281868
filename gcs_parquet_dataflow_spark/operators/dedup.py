"""Deduplication operators for the training-data pipeline surface
(BASELINE.json extensions): exact, MinHash+LSH, SimHash, and n-gram
Jaccard. Embedding-cosine near-dup lives in operators/similarity.py.

Scale design (the point of each shape):

- **Exact dedup** is one hash aggregation — map-side partial combine
  means the shuffle carries one row per distinct key per partition.
- **Near-dup never does O(n²)**: candidates come from an inverted-index
  equi-join (shingle hash, LSH band, or SimHash band) — the standard
  shuffle-on-bucket pattern that scales linearly with candidate count.
  Banding is exact-recall for SimHash at small radius (pigeonhole:
  a 32-bit signature split into 4 bands must share a band when
  hamming ≤ 3), probabilistic-recall for MinHash-LSH (by design).
- All sketches are Column expressions over the md5-based ``hash32``
  (functions/text.py) — no Python UDFs, and every value is exactly
  reproducible in DuckDB for the differential oracle.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.functions.text import hash32, tokens
from gcs_parquet_dataflow_spark.operators.partitioning import (
    ensure_parallelism,
    persist_intermediate,
)

MERSENNE_PRIME = 2147483647  # 2^31 - 1; hash32 < 2^32, a*(h%p)+b < 2^62


def minhash_perms(num_perm: int = 16, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) parameters for the minhash permutations
    h_i(x) = (a_i * (x mod p) + b_i) mod p. Fixed seed → the same
    constants are inlined into the DuckDB oracle SQL."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_PRIME), rng.randrange(0, MERSENNE_PRIME))
        for _ in range(num_perm)
    ]


# ---------------------------------------------------------------------------
# Column builders (sketches)
# ---------------------------------------------------------------------------


def word_shingle_hashes(col: Column, k: int = 3) -> Column:
    """Distinct hash32 values of the word ``k``-gram shingles of ``col``.

    DuckDB twin: ``list_distinct([hash32(array_to_string(
    list_slice(w, i+1, i+k), ' ')) for i in range(len(w)-k+1)])``.
    Jaccard over hashed shingles equals Jaccard over shingles up to
    32-bit collisions — and both engines hash identically, so even a
    collision agrees.
    """
    t = tokens(col)
    shingles = F.when(
        F.size(t) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j + 1) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.transform(shingles, hash32))


def minhash_signature(col: Column, perms: list[tuple[int, int]]) -> Column:
    """array<long> minhash signature of the shingle-hash set ``col``.

    sig[i] = min over shingle hashes h of (a_i*(h%p) + b_i) % p —
    plain min/transform expressions, fully codegen'd.
    """
    p = F.lit(MERSENNE_PRIME)
    return F.array(
        *[
            F.array_min(
                F.transform(col, lambda h: (F.lit(a) * (h % p) + F.lit(b)) % p)
            )
            for a, b in perms
        ]
    )


def simhash32(col: Column) -> Column:
    """32-bit SimHash of the token stream (term-frequency weighted: every
    occurrence votes). bit j of the result is set iff the sum over tokens
    of ±1 (sign of bit j of the token's hash32) is positive.

    One pass: fold token hashes into a 32-long bit-vote accumulator via
    ``aggregate``+``zip_with``, then fold votes into the integer.
    """
    return simhash32_from_hashes(F.transform(tokens(col), hash32))


def simhash32_from_hashes(hashes: Column) -> Column:
    """SimHash fold over an ALREADY-hashed array — the shared core of
    the text simhash and the byte-gram media phash
    (operators/multimodal.py phash_stub)."""
    pow2 = lambda j: F.pow(F.lit(2.0), j).cast("long")  # exact for j ≤ 31
    bit = lambda h, j: ((h / pow2(j)).cast("long") % 2)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 32),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(F.sequence(F.lit(0), F.lit(31)), lambda j: 2 * bit(h, j) - 1),
            lambda x, y: x + y,
        ),
    )
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(31)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.when(F.element_at(votes, j + 1) > 0, F.pow(F.lit(2.0), j).cast("long"))
        .otherwise(F.lit(0)),
    )


def hamming32(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b)).cast("long")


# ---------------------------------------------------------------------------
# DataFrame-level sketch builders (the scale path)
#
# The Column builders above fold arrays with higher-order functions —
# correct, but Spark evaluates HOF lambdas interpreted, outside
# whole-stage codegen, and a self-join downstream re-evaluates them per
# band and per side. These builders compute the identical values via
# explode + groupBy aggregates: every expression is codegen'd, the
# partial aggregation is map-side, and the sketch is materialized ONCE.
# At 100 TB you would persist the sketch output as a table; here the
# pair operators persist() it before the candidate join.
# ---------------------------------------------------------------------------


def with_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    perms: list[tuple[int, int]],
    k: int = 3,
    out: str = "sig",
) -> DataFrame:
    """→ (id_col, out: array<long>) — same values as
    ``minhash_signature(word_shingle_hashes(text))`` but via an exploded
    inverted index + one codegen'd min-aggregate per permutation.
    Documents with fewer than ``k`` tokens drop out (empty shingle set)."""
    from pyspark.sql import Window

    p = F.lit(MERSENNE_PRIME)
    df = ensure_parallelism(df, id_col)  # sketching is compute-bound
    # Shingles via posexplode + window lead — fully codegen'd, ONE
    # shuffle: the window partitions by id, and the groupBy below reuses
    # that partitioning (no second exchange). The array-lambda shingle
    # builder (word_shingle_hashes) computes identical values but runs
    # interpreted; measured ~2× slower end-to-end.
    tok = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("_pos", "_t")
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    leads = [F.col("_t")] + [F.lead("_t", j).over(w) for j in range(1, k)]
    sh = tok.select(
        F.col(id_col),
        F.when(
            leads[-1].isNotNull(), F.concat_ws(" ", *leads)
        ).alias("_shingle"),
    ).filter(F.col("_shingle").isNotNull())
    # no distinct: duplicate shingle hashes cannot change any min
    hmod = hash32(F.col("_shingle")) % p
    aggs = [
        F.min((F.lit(a) * hmod + F.lit(b)) % p).alias(f"_m{i}")
        for i, (a, b) in enumerate(perms)
    ]
    return (
        sh.groupBy(id_col)
        .agg(*aggs)
        .select(
            id_col, F.array(*[f"_m{i}" for i in range(len(perms))]).alias(out)
        )
    )


def with_simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    out: str = "simhash",
) -> DataFrame:
    """→ (id_col, out: long) — same values as ``simhash32(text)`` but via
    token explode + BIT-PACKED sum-aggregates (one shuffle, map-side
    partial). Documents with no tokens drop out.

    Instead of 32 per-bit ±1 sums, each token's 32 hash bits are packed
    into 8 longs of four 16-bit lanes (long g carries bits 4g..4g+3);
    summing the packed longs popcounts every lane simultaneously, so the
    aggregate count drops 32→9 (8 lane-sums + 1 row count). Bit j of the
    result is set iff its popcount exceeds half the tokens —
    ``2*cnt > n`` ⟺ the ±1 vote sum is positive, exactly. Lane capacity
    is 2^16-1 tokens per document (a 65k-token doc is ~0.5 MB of text;
    split longer docs upstream)."""
    df = ensure_parallelism(df, id_col)  # sketching is compute-bound
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    ).select(id_col, hash32(F.col("_t")).alias("_h"))
    return _simhash_fold(tok, id_col, out)


def _simhash_fold(
    hashed: DataFrame, id_col: str, out: str, hash_col: str = "_h"
) -> DataFrame:
    """The bit-packed simhash vote aggregate over an exploded
    (id, hash) stream — shared by the text path (:func:`with_simhash`)
    and the byte-gram media phash (:func:`with_byte_phash`)."""
    h = F.col(hash_col)
    lane_sums = []
    for g in range(8):
        packed = None
        for i in range(4):
            term = F.shiftright(h, 4 * g + i).bitwiseAND(F.lit(1)) * F.lit(
                2 ** (16 * i)
            )
            packed = term if packed is None else packed + term
        lane_sums.append(F.sum(packed).alias(f"_s{g}"))
    agg = hashed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"), *lane_sums
    )
    n = F.col("_n")
    sim = None
    for j in range(32):
        g, i = divmod(j, 4)
        cnt = F.shiftright(F.col(f"_s{g}"), 16 * i).bitwiseAND(F.lit(0xFFFF))
        term = F.when(cnt * 2 > n, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    # beyond lane capacity a popcount would silently bleed into the next
    # lane — emit NULL (visible, joinable to a long-doc handler) instead
    # of a wrong sketch
    guarded = F.when(n < F.lit(2**16), sim)
    return agg.select(id_col, guarded.alias(out))


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep one representative (min id) per exact key. One shuffle with
    map-side combine; at 100 TB this is the cheapest possible dedup."""
    others = [c for c in df.columns if c not in key_cols and c != id_col]
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col),
        *[F.min_by(c, F.col(id_col)).alias(c) for c in others],
    )


def minhash_bands(
    df: DataFrame,
    id_col: str,
    sig_col: str,
    rows_per_band: int = 2,
) -> DataFrame:
    """Explode a signature column into its LSH band table →
    (_id, band, key: array<long>) — the shared banding step of
    :func:`lsh_candidate_pairs` and the incremental sketch index."""
    num_perm_col = F.size(F.col(sig_col))
    bands = F.transform(
        F.sequence(F.lit(0), (num_perm_col / rows_per_band).cast("int") - 1),
        lambda b: F.struct(
            b.alias("band"),
            F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band).alias(
                "key"
            ),
        ),
    )
    return df.select(
        F.col(id_col).alias("_id"), F.explode(bands).alias("bk")
    ).select("_id", "bk.band", F.col("bk.key").cast("array<long>").alias("key"))


@dataclass(frozen=True)
class AutoCap:
    """Self-scaling hot-bucket cap (VERDICT r5 item 1). A FIXED cap
    saturates under growth — the round-5 20× smoke proved it: at
    cap=256 every (event_type, hour) bucket exceeded the cap and the
    capped co-activity build silently returned 0 edges. ``AutoCap``
    derives the cap from the OBSERVED bucket-size distribution instead:
    cap = max(floor, ⌈quantile(sizes, q) × slack⌉), one cheap exact
    percentile over the (already-needed) bucket-size table. Under
    uniform growth the quantile grows with the buckets, so normal
    buckets stay in and only distribution OUTLIERS (boilerplate bands,
    "everyone was active that hour") are guarded away — the planted-
    community 20× smoke retains its edges where cap=256 returned none
    (tests/test_scale_patterns.py)."""

    quantile: float = 0.99
    slack: float = 4.0
    floor: int = 16


@dataclass(frozen=True)
class PairBudgetCap:
    """Cap chosen against an explicit candidate-pair budget: the
    largest cap c with Σ_buckets min(|b|, c)² ≤ ``pair_budget`` —
    i.e. "spend at most B candidate comparisons, however the bucket
    distribution is shaped". Resolution collects the bucket-size
    HISTOGRAM (|distinct sizes| rows — bounded driver scalar) and
    binary-searches c; monotone, so exact. Use when the downstream
    join cost must be bounded a priori (SLA-driven pipelines) rather
    than relative to the distribution."""

    pair_budget: int
    floor: int = 1


@dataclass
class CapReport:
    """What the hot-bucket guard actually did — emitted per cap
    application so a pipeline can ALARM on saturation instead of
    discovering an empty graph downstream (the round-5 failure mode).
    ``saturation`` is the fraction of input rows the guard dropped."""

    metric_name: str
    cap: int
    n_buckets: int
    n_hot_buckets: int
    n_rows: int
    n_dropped_rows: int

    @property
    def saturation(self) -> float:
        return self.n_dropped_rows / self.n_rows if self.n_rows else 0.0

    def as_dict(self) -> dict:
        return {
            "metric_name": self.metric_name,
            "cap": self.cap,
            "n_buckets": self.n_buckets,
            "n_hot_buckets": self.n_hot_buckets,
            "n_rows": self.n_rows,
            "n_dropped_rows": self.n_dropped_rows,
            "saturation": self.saturation,
        }


_CAP_REPORTS: list[CapReport] = []


def cap_reports() -> list[CapReport]:
    """All guard reports emitted this driver process (append order)."""
    return list(_CAP_REPORTS)


def last_cap_report() -> CapReport | None:
    return _CAP_REPORTS[-1] if _CAP_REPORTS else None


def observe_cap_guard(df: DataFrame, report: CapReport):
    """Attach the guard verdict to a downstream DataFrame as an
    ``Observation`` (the engine's metrics surface — metrics.py): after
    any action on the returned df, ``observation.get`` yields the cap,
    dropped-row count and saturation alongside the live output row
    count, so streaming/batch pipelines alarm in-band instead of
    parsing logs. (The guard itself computes these eagerly — it must,
    to CHOOSE the cap — so the observation carries exact constants
    plus one live counter; it is attached by the CALLER at the point
    in the plan read exactly once, because guard outputs typically
    feed self-joins where an embedded observe node would double-fire.)
    Returns (df, observation)."""
    from pyspark.sql import Observation

    obs = Observation(f"cap_guard_{report.metric_name}_{len(_CAP_REPORTS)}")
    return (
        df.observe(
            obs,
            F.count(F.lit(1)).cast("long").alias("n_out_rows"),
            F.max(F.lit(report.cap)).alias("cap"),
            F.max(F.lit(report.n_dropped_rows)).alias("n_dropped_rows"),
            F.max(F.lit(report.saturation)).alias("saturation"),
        ),
        obs,
    )


CapSpec = "int | str | AutoCap | PairBudgetCap"


def resolve_bucket_cap(
    sizes: DataFrame,
    spec,
    size_col: str = "_sz",
) -> int:
    """Resolve an auto-cap spec against an observed bucket-size table.

    ``AutoCap``: one ``approx_percentile`` aggregate (accuracy 10⁴ —
    rank error ≤ 1e-4·|buckets|, exact whenever |buckets| ≤ 10⁴) over
    the sizes table.  Exact ``percentile`` buffers every value in one
    reducer, and |buckets| can approach |records| at the 100 TB design
    point — a single-node memory hotspot inside a guard whose whole job
    is protecting scale (ADVICE r6).  The cap is a guard dial, not an
    oracle-pinned output, so sketch-grade rank accuracy is the right
    trade.  ``PairBudgetCap``: collect the size histogram (bounded by
    |distinct sizes| — a driver scalar) and binary-search the largest
    cap whose Σ min(|b|, c)² fits the budget."""
    if spec == "auto":
        spec = AutoCap()
    if isinstance(spec, AutoCap):
        p = sizes.agg(
            F.expr(
                f"approx_percentile({size_col}, {spec.quantile}, 10000)"
            ).alias("p")
        ).first()["p"]
        if p is None:
            return spec.floor
        return max(spec.floor, int(-(-float(p) * spec.slack // 1)))
    if isinstance(spec, PairBudgetCap):
        hist = (
            sizes.groupBy(F.col(size_col).alias("sz"))
            .agg(F.count(F.lit(1)).cast("long").alias("nb"))
            .collect()
        )
        if not hist:
            return spec.floor
        pairs = [(int(r["sz"]), int(r["nb"])) for r in hist]

        def cost(c: int) -> int:
            return sum(nb * min(sz, c) ** 2 for sz, nb in pairs)

        lo, hi = spec.floor, max(sz for sz, _ in pairs)
        if cost(hi) <= spec.pair_budget:
            return hi
        # largest c in [lo, hi] with cost(c) <= budget (cost monotone)
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if cost(mid) <= spec.pair_budget:
                lo = mid
            else:
                hi = mid - 1
        return lo
    raise TypeError(f"unsupported cap spec: {spec!r}")


def cap_hot_buckets(
    exploded: DataFrame,
    bucket_cols: list[str],
    max_bucket_size,
    metric_name: str = "hot_buckets",
) -> DataFrame:
    """Drop every row belonging to a bucket with more than
    ``max_bucket_size`` members — the hot-bucket guard for candidate
    generators whose join cost is Σ|bucket|² (SCALE.md: boilerplate
    headers/footers/licence blocks put 10⁵⁺ docs in one LSH band or
    shingle bucket, and that single bucket's |b|² dwarfs the whole join).

    The hot set is structurally tiny (a handful of boilerplate keys), so
    removal is a broadcast LEFT ANTI join — the corpus-sized side never
    reshuffles. A bucket that hot carries no discriminative signal:
    members still meet through their OTHER buckets, which is why recall
    on genuine near-dup pairs survives (asserted by
    tests/test_scale_patterns.py).

    ``max_bucket_size`` is an int (fixed cap, lazy — the plan the
    oracle rows pin), the string ``"auto"`` / an :class:`AutoCap`
    (distribution-tracking cap), or a :class:`PairBudgetCap`. The auto
    specs resolve the cap EAGERLY from the bucket-size table (they
    must, to choose it), and every auto application appends a
    :class:`CapReport` — cap chosen, buckets guarded, rows dropped,
    saturation — to :func:`cap_reports`, with
    :func:`observe_cap_guard` available to surface it in-band."""
    if isinstance(max_bucket_size, bool) or not isinstance(
        max_bucket_size, int
    ):
        return _cap_hot_buckets_auto(
            exploded, bucket_cols, max_bucket_size, metric_name
        )
    hot = (
        exploded.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("_sz"))
        .filter(F.col("_sz") > max_bucket_size)
        .select(*bucket_cols)
    )
    return exploded.join(F.broadcast(hot), bucket_cols, "left_anti")


def resolve_cap_with_report(
    sizes: DataFrame, spec, metric_name: str, size_col: str = "_sz"
) -> int:
    """Resolve an auto-cap spec against a (persisted) size table AND
    append the saturation :class:`CapReport` — the shared eager arm of
    every auto-capped guard (LSH/SimHash/Jaccard buckets, stop
    shingles, contamination shingles, co-activity buckets, triangle
    hub degrees)."""
    cap = resolve_bucket_cap(sizes, spec, size_col)
    stats = sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(size_col).cast("long").alias("n_rows"),
        F.count_if(F.col(size_col) > cap).cast("long").alias("n_hot"),
        F.coalesce(
            F.sum(F.when(F.col(size_col) > cap, F.col(size_col))).cast(
                "long"
            ),
            F.lit(0).cast("long"),
        ).alias("n_dropped"),
    ).first()
    _CAP_REPORTS.append(
        CapReport(
            metric_name=metric_name,
            cap=cap,
            n_buckets=int(stats["n_buckets"]),
            n_hot_buckets=int(stats["n_hot"]),
            n_rows=int(stats["n_rows"] or 0),
            n_dropped_rows=int(stats["n_dropped"]),
        )
    )
    return cap


def _cap_hot_buckets_auto(
    exploded: DataFrame, bucket_cols: list[str], spec, metric_name: str
) -> DataFrame:
    """Auto-cap arm of :func:`cap_hot_buckets`: persist the bucket-size
    table once (the fixed arm computes it too — here it feeds cap
    resolution, the saturation report, AND the hot set), resolve the
    cap, report, guard."""
    sizes = persist_intermediate(
        exploded.groupBy(*bucket_cols).agg(
            F.count(F.lit(1)).cast("long").alias("_sz")
        )
    )
    cap = resolve_cap_with_report(sizes, spec, metric_name)
    hot = sizes.filter(F.col("_sz") > cap).select(*bucket_cols)
    return exploded.join(F.broadcast(hot), bucket_cols, "left_anti")


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    sig_col: str,
    rows_per_band: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash-LSH banding: explode (band_idx, band_slice) and self-join.

    → (id_a, id_b, n_shared_bands), id_a < id_b. The join key is the
    band content — docs never meet unless a whole band matches, so the
    shuffle is |docs|×|bands| rows, not |docs|².

    ``max_bucket_size`` arms the hot-bucket guard (:func:`cap_hot_buckets`):
    bands shared by more members are excluded from candidate generation,
    bounding the join at Σ min(|bucket|, cap)². Output is IDENTICAL when
    no bucket exceeds the cap (oracle row
    dedup_minhash_lsh_pairs_capped); with hot buckets, pairs meeting
    ONLY through a hot band are dropped and n_shared_bands counts cold
    bands only — the documented trade for a bounded plan.
    """
    exploded = minhash_bands(df, id_col, sig_col, rows_per_band)
    if max_bucket_size is not None:
        exploded = cap_hot_buckets(
            exploded, ["band", "key"], max_bucket_size,
            metric_name="lsh_bands",
        )
    # materialize once: both self-join sides read the persisted band table
    # instead of re-deriving the (possibly expensive) signature lineage;
    # registered for release_intermediates() after the consuming action
    exploded = persist_intermediate(exploded)
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .groupBy(
            F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float,
) -> DataFrame:
    """Exact n-gram Jaccard via inverted-index join: explode shingle
    hashes, equi-join on the hash, count intersections, compute
    |A∩B| / (|A|+|B|-|A∩B|). Only pairs sharing ≥1 shingle are ever
    materialized. → (id_a, id_b, jaccard) at jaccard ≥ threshold."""
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(shingle_col).alias("_sh"),
        F.size(F.col(shingle_col)).alias("_n"),
    )
    inv = persist_intermediate(
        base.select("_id", "_n", F.explode("_sh").alias("h"))
    )
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n").alias("n_a"),
            F.col("b._n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.round(
        F.col("n_common").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        6,
    )
    return inter.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


@dataclass
class CCReport:
    """What a :func:`connected_components` run actually did (VERDICT
    r10 item 4 — the iterative analog of :class:`CapReport`): appended
    per run so a pipeline capping ``max_iter`` can ALARM on
    non-convergence instead of silently consuming labels that only
    propagated ``max_iter`` hops.  ``converged`` is False iff the run
    stopped at the iteration cap with ``changed_at_stop`` labels still
    moving — the output is then the min id within ``max_iter`` hops,
    a refinement of the true components (over-split, never merged
    wrongly)."""

    metric_name: str
    max_iter: int
    iterations: int
    converged: bool
    changed_at_stop: int
    # the propagation scheme that actually ran: "label", "jump", or
    # "auto→jump@K" when the stall detector escalated at round K
    # (round 12 — the auto dial's audit trail)
    algorithm: str = "label"


_CC_REPORTS: list[CCReport] = []


def cc_reports() -> list[CCReport]:
    """All convergence reports emitted this driver process."""
    return list(_CC_REPORTS)


def last_cc_report() -> CCReport | None:
    return _CC_REPORTS[-1] if _CC_REPORTS else None


def drain_reports() -> tuple[list["CapReport"], list[CCReport]]:
    """Snapshot AND clear both in-memory guard registries (cap + CC) —
    the consumption API for the ops-lake writer (round 12, VERDICT r11
    item 5): on a real cluster these driver lists die with the driver,
    so a 100 TB run's ``converged=False`` / saturation evidence
    vanished unless something persisted it.
    ``streaming.observability.write_guard_reports`` drains per
    micro-batch into the ops lake; draining (rather than copying)
    keeps each batch's partition = exactly the reports its guards
    emitted, which is what makes a checkpoint replay's batch-keyed
    overwrite idempotent."""
    caps, ccs = list(_CAP_REPORTS), list(_CC_REPORTS)
    del _CAP_REPORTS[: len(caps)]
    del _CC_REPORTS[: len(ccs)]
    return caps, ccs


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "_id",
    max_iter: int = 20,
    checkpoint_every: int = 5,
    metric_name: str = "connected_components",
    raise_on_nonconverged: bool = False,
    algorithm: str = "label",
) -> DataFrame:
    """Cluster near-dup pairs into components: → (id_col, cluster) where
    ``cluster`` is the MIN node id reachable through the pair graph
    (deterministic canonical representative).

    Pregel-style min-label propagation: each iteration joins labels to
    edges and takes the min over {self} ∪ neighbors, converging in
    O(graph diameter) rounds — near-dup graphs are shallow (duplicates
    of a common source), so this is a handful of shuffles even at
    100 TB. Labels persist per round; convergence is checked with a
    count of changed labels (small driver scalar, not a collect of data).

    Two r13 loop properties (measured 3-7× on the sweep rows):

    - **Entry frames are localCheckpoint-ed** (edges + initial labels):
      without the truncation every round RE-PLANS the full upstream
      pair-pipeline DAG inside its action (measured: a round-3 count
      plan of 9.6k lines with 740 parquet scans at sf0.001) — the
      driver-side planning cost, not executor work, dominated the
      clustering rows.
    - **Frontier propagation**: the neighbor-min join input is only the
      labels that moved last round.  An unmoved neighbor s last moved
      in round j < i, so s sat in round j+1's frontier and every
      neighbor d took min with s's still-current label then; labels
      only decrease, so d.cluster ≤ s.cluster ever since — the
      frontier min equals the all-neighbors min EVERY round, making
      per-round labels (and changed counts) pointwise identical to
      full propagation (tests/test_opt12.py pins them).

    ``max_iter`` is the PRODUCTION iteration dial (VERDICT r10 item 4):
    it bounds wall-clock on adversarially deep graphs (a chain of
    pairwise near-dups — crawl rings, templated page series — has
    diameter O(n), and an unbounded loop would run O(n) shuffle rounds
    on it).  Every run appends a :class:`CCReport`; a capped stop
    yields labels = min id within ``max_iter`` hops — an OVER-SPLIT
    refinement of the true components (never a wrong merge), flagged
    via ``converged=False`` / ``changed_at_stop`` rather than silently
    returned.  ``raise_on_nonconverged=True`` upgrades the flag to an
    error for pipelines where a split cluster is not acceptable.

    ``algorithm`` picks the propagation scheme (round 11):

    - ``"label"`` (default — the plan every prior oracle row pins):
      min over {self} ∪ neighbors per round; the min label moves ONE
      hop per round, so convergence is O(diameter) rounds.  Right for
      near-dup graphs, whose components are shallow.
    - ``"jump"``: the same neighbor-min PLUS a pointer-jumping step —
      each node also adopts its current label's label
      (``labels ⋈ labels ON a.cluster = b.id``, the hash-to-min /
      Blelloch shortcut).  The min's reach roughly DOUBLES per round,
      so convergence is O(log diameter) — a 5000-hop chain closes in
      ~13 propagation rounds instead of 5000 (measured; SCALE.md).
      One extra self-join shuffle per round buys exponentially fewer
      rounds: the right trade exactly when the graph may be deep
      (crawl rings, templated series), i.e. when the ``max_iter``
      dial would otherwise have to truncate.  Identical fixed point
      (min reachable id), so capped≡uncapped and jump≡label proofs
      share one oracle.
    - ``"auto"`` (round 12 — VERDICT r11 "what's wrong" #1: label-vs-
      jump was a folklore choice about the graph's depth): start in
      label mode and ESCALATE to jump permanently when the changed
      count stalls — ``changed ≥ 0.8 × previous changed`` with both
      positive.  A shallow near-dup graph collapses geometrically
      (ratio ≪ 0.8 every round), so auto runs pure label there — no
      extra self-join, sweep cost ≡ the label row; a deep chain moves
      its frontier one hop per round (ratio ≈ 1), trips the detector
      after two label rounds, and finishes in O(log diameter).  Same
      fixed point as both parents, so the existing oracle twins pin
      it; the :class:`CCReport` records ``auto→jump@K`` when the
      escalation fired.

    Every ``checkpoint_every`` rounds the label frame is
    ``localCheckpoint``-ed to TRUNCATE LINEAGE — without it each round
    nests the previous round's plan and a deep graph blows up analysis/
    optimization time (the classic iterative-DataFrame failure). The
    final labels handle is registered for ``release_intermediates()``.
    """
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        register_intermediate,
    )

    if algorithm not in ("label", "jump", "auto"):
        raise ValueError(
            f"unknown algorithm {algorithm!r}: label, jump, or auto"
        )
    mode = "label" if algorithm == "auto" else algorithm
    algo_used = algorithm if algorithm != "auto" else "label"
    # ONE exchange on src replaces the old .distinct()'s exchange on
    # (src, dst): hash(src) already co-locates equal (src, dst) rows,
    # so the dedup aggregate runs partition-local on top of it — same
    # exchange count, but the cached edge table comes out partitioned
    # by src, the per-round join key. At cluster scale (labels too big
    # to broadcast) the label⋈edges sort-merge join then reuses the
    # cached partitioning instead of re-shuffling the edge table EVERY
    # round (r12 optimization; locally the labels side broadcasts and
    # the layout is free either way).
    edges = (
        pairs.selectExpr(f"{pairs.columns[0]} as src", f"{pairs.columns[1]} as dst")
        .union(
            pairs.selectExpr(
                f"{pairs.columns[1]} as src", f"{pairs.columns[0]} as dst"
            )
        )
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(
        F.col(id_col).alias("id"),
        F.col(id_col).cast("long").alias("cluster"),
        F.lit(True).alias("_moved"),
    ).localCheckpoint(eager=True)
    changed = -1
    prev_changed = -1
    iterations = 0
    converged = False
    for i in range(max_iter):
        # FRONTIER propagation (r13, guide §2.3 — shuffle fewer bytes):
        # only nodes whose label MOVED last round can improve a
        # neighbor this round.  An unmoved neighbor s last moved in
        # some round j < i; it was in the frontier of round j+1, so
        # every neighbor d already took min with s's (still current)
        # label there and, labels being monotone non-increasing,
        # d.cluster <= s.cluster ever since.  Hence min over frontier
        # neighbors == min over all neighbors, EVERY round — per-round
        # labels (and changed counts, test_opt12 pins) are pointwise
        # identical to full propagation, but the join input shrinks
        # geometrically as the graph collapses.
        frontier = labels.filter(F.col("_moved")).select("id", "cluster")
        neighbor_min = (
            frontier.join(edges, frontier.id == edges.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("cluster").alias("_nmin"))
        )
        new_labels = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.col("cluster").alias("_prev"),
            F.least(
                F.col("cluster"), F.coalesce(F.col("_nmin"), F.col("cluster"))
            ).alias("cluster"),
        )
        if mode == "jump":
            # pointer jump: adopt my label's CURRENT label too — the
            # shortcut edge (u → label(u)) that makes reach double.
            # Build side pre-filtered to cluster < id (r13): a target
            # whose label IS itself contributes least(a.cluster,
            # a.cluster) — exactly what the left-join null path yields
            # — so dropping those rows is value-identical while the
            # broadcast build shrinks from |nodes| to the non-root
            # component members.
            jumped = (
                new_labels.alias("a")
                .join(
                    labels.filter(F.col("cluster") < F.col("id")).select(
                        F.col("id").alias("_jid"),
                        F.col("cluster").alias("_jcluster"),
                    ),
                    F.col("a.cluster") == F.col("_jid"),
                    "left",
                )
                .select(
                    F.col("a.id").alias("id"),
                    F.col("a._prev").alias("_prev"),
                    F.least(
                        F.col("a.cluster"),
                        F.coalesce(F.col("_jcluster"), F.col("a.cluster")),
                    ).alias("cluster"),
                )
            )
            new_labels = jumped
        # A min-label only ever decreases, so "this label moved" is a
        # per-row comparison against the round's STARTING label —
        # carried as a column so the convergence check is a
        # filter-count over the frame this round materializes anyway.
        # Before r12-opt it was a second labels⋈labels join per round:
        # a full |nodes| shuffle at cluster scale, an extra broadcast
        # build + stage locally, per iteration, for one driver scalar.
        new_labels = new_labels.select(
            "id",
            "cluster",
            (F.col("cluster") < F.col("_prev")).alias("_moved"),
        )
        if (i + 1) % checkpoint_every == 0:
            # materializes AND cuts the logical plan back to a leaf
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = new_labels.filter(F.col("_moved")).count()
        labels.unpersist()
        labels = new_labels
        iterations = i + 1
        if changed == 0:
            converged = True
            break
        if (
            algorithm == "auto"
            and mode == "label"
            and prev_changed > 0
            and changed >= 0.8 * prev_changed
        ):
            # stall: the frontier is crawling (deep graph), not
            # collapsing (shallow graph) — escalate to pointer
            # jumping for the remaining rounds
            mode = "jump"
            algo_used = f"auto→jump@{iterations}"
        prev_changed = changed
    edges.unpersist()
    _CC_REPORTS.append(
        CCReport(
            metric_name=metric_name,
            max_iter=max_iter,
            iterations=iterations,
            converged=converged,
            changed_at_stop=int(changed),
            algorithm=algo_used,
        )
    )
    if raise_on_nonconverged and not converged:
        register_intermediate(labels)
        raise RuntimeError(
            f"{metric_name}: min-label propagation did not converge in "
            f"{max_iter} iterations ({changed} labels still moving) — "
            f"the graph is deeper than the cap; raise max_iter or accept "
            f"the over-split refinement (raise_on_nonconverged=False)"
        )
    register_intermediate(labels)
    return labels.select(F.col("id").alias(id_col), "cluster")


def shingle_hashes_exploded(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """→ (id_col, _h): the DISTINCT word-k-gram shingle hashes, one row
    each — the codegen'd (posexplode + window lead) twin of
    ``word_shingle_hashes`` for operators that consume shingles exploded
    anyway (inverted-index joins)."""
    from pyspark.sql import Window

    df = ensure_parallelism(df, id_col)
    tok = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("_pos", "_t")
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    leads = [F.col("_t")] + [F.lead("_t", j).over(w) for j in range(1, k)]
    return (
        tok.select(
            F.col(id_col),
            F.when(leads[-1].isNotNull(), F.concat_ws(" ", *leads)).alias(
                "_shingle"
            ),
        )
        .filter(F.col("_shingle").isNotNull())
        .select(F.col(id_col), hash32(F.col("_shingle")).alias("_h"))
        .distinct()
    )


def drop_stop_shingles(sh: DataFrame, max_df) -> DataFrame:
    """Document-frequency stop-shingle filter over an exploded
    (id, _h) shingle table: shingles present in more than ``max_df``
    documents are boilerplate (navigation chrome, licence text) and are
    removed BEFORE the inverted-index self-join — each one would
    otherwise contribute df² join rows while carrying no near-dup
    signal. Broadcast anti-join like :func:`cap_hot_buckets` (the input
    is one row per (doc, shingle), so the bucket count IS the df).
    ``max_df`` takes the same int/``"auto"``/:class:`AutoCap`/
    :class:`PairBudgetCap` specs as :func:`cap_hot_buckets`."""
    return cap_hot_buckets(sh, ["_h"], max_df, metric_name="stop_shingles")


def jaccard_pairs_from_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs straight from text: codegen'd exploded
    shingle sets → set sizes (join; broadcast at small scale, SMJ at
    large — AQE decides) → inverted-index self-join → |A∩B| counts.
    Identical output to ``jaccard_pairs`` over ``word_shingle_hashes``
    arrays, without materializing per-doc arrays or interpreted lambdas.

    ``max_df`` arms :func:`drop_stop_shingles`; set sizes are then
    computed over the SURVIVING (informative) shingle space so identical
    docs still score 1.0. Output is identical when no shingle exceeds
    the cap (oracle row corpus_jaccard_pairs_capped)."""
    sh = shingle_hashes_exploded(df, id_col, text_col, k)
    if max_df is not None:
        sh = drop_stop_shingles(sh, max_df)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    inv = persist_intermediate(sh.join(sizes, id_col).select(
        F.col(id_col).alias("_id"), "_n", F.col("_h").alias("h")
    ))
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n").alias("n_a"),
            F.col("b._n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.round(
        F.col("n_common").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        6,
    )
    return inter.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def containment_pairs_from_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup pairs by shingle CONTAINMENT
    ``|A∩B| / min(|A|, |B|)`` — catches what symmetric Jaccard
    structurally cannot: a truncated copy, a quoted excerpt, or a doc
    embedded in a larger page scores containment ≈ 1 while its Jaccard
    sits near |small|/|big| (≈ 0.5 for a half-doc), under every usual
    threshold. The standard complement to Jaccard in pretraining dedup
    (the broder resemblance/containment pair).

    → (id_a, id_b, containment, contained_id) where ``contained_id`` is
    the smaller (subsumed) side — the natural drop candidate.

    Scale shape: identical to :func:`jaccard_pairs_from_text` — one
    exploded shingle pass, one size agg reusing its partitioning, and
    an inverted-index equi-join on the 8-byte shingle hash so only
    pairs sharing ≥1 shingle ever materialize. Nothing quadratic;
    ``max_df`` arms the :func:`drop_stop_shingles` guard exactly as in
    :func:`jaccard_pairs_from_text` (sizes over surviving shingles).
    """
    sh = shingle_hashes_exploded(df, id_col, text_col, k)
    if max_df is not None:
        sh = drop_stop_shingles(sh, max_df)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    inv = persist_intermediate(
        sh.join(sizes, id_col).select(
            F.col(id_col).alias("_id"), "_n", F.col("_h").alias("h")
        )
    )
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(
            b, (F.col("a.h") == F.col("b.h")) & (F.col("a._id") < F.col("b._id"))
        )
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n").alias("n_a"),
            F.col("b._n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    containment = F.round(
        F.col("n_common").cast("double") / F.least("n_a", "n_b"), 6
    )
    contained = F.when(
        F.col("n_a") <= F.col("n_b"), F.col("id_a")
    ).otherwise(F.col("id_b"))
    return (
        inter.select(
            "id_a",
            "id_b",
            containment.alias("containment"),
            contained.cast("long").alias("contained_id"),
        )
        .filter(F.col("containment") >= threshold)
    )


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_shared: int = 5,
    max_df: int | None = None,
) -> DataFrame:
    """Benchmark-contamination detection: corpus documents sharing at
    least ``min_shared`` word-``k``-gram shingles with any benchmark
    document → (corpus_id, bench_id, n_shared). Same inverted-index
    equi-join shape as near-dup (only co-occurring pairs materialize),
    but CROSS-table — the shuffle carries |corpus|+|benchmark| shingle
    rows, and the benchmark side is typically small enough that AQE
    broadcasts it.

    ``max_df`` arms the corpus-side stop-shingle guard: a shingle in
    C corpus docs and B bench docs joins C×B rows, so one boilerplate
    phrase present in both sides couples the whole corpus to the whole
    benchmark. Shingles above the corpus document-frequency cap are
    removed from BOTH sides (n_shared then counts informative shingles
    only — a pair contaminated solely through boilerplate no longer
    trips min_shared, the intended reading). Accepts the same
    ``"auto"``/:class:`AutoCap`/:class:`PairBudgetCap` specs as
    :func:`cap_hot_buckets` (resolved against the CORPUS document
    frequencies, with a saturation :class:`CapReport`)."""
    c = shingle_hashes_exploded(corpus, id_col, text_col, k).select(
        F.col(id_col).alias("corpus_id"), "_h"
    )
    if max_df is not None:
        if isinstance(max_df, int) and not isinstance(max_df, bool):
            cap = max_df
            sizes = c.groupBy("_h").agg(F.count(F.lit(1)).alias("_sz"))
        else:
            sizes = persist_intermediate(
                c.groupBy("_h").agg(
                    F.count(F.lit(1)).cast("long").alias("_sz")
                )
            )
            cap = resolve_cap_with_report(
                sizes, max_df, "contamination_stop_shingles"
            )
        hot = persist_intermediate(
            sizes.filter(F.col("_sz") > cap).select("_h")
        )
        c = c.join(F.broadcast(hot), "_h", "left_anti")
    b = shingle_hashes_exploded(benchmark, id_col, text_col, k).select(
        F.col(id_col).alias("bench_id"), "_h"
    )
    if max_df is not None:
        b = b.join(F.broadcast(hot), "_h", "left_anti")
    return (
        c.join(b, "_h")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_shared: int = 5,
    max_df: int | None = None,
) -> DataFrame:
    """Drop corpus documents contaminated by the benchmark set (eval-set
    leakage removal): left-anti join against the contaminated-id set.
    ``max_df`` passes through to :func:`contamination_pairs`."""
    bad = contamination_pairs(
        corpus, benchmark, id_col, text_col, k, min_shared, max_df=max_df
    ).select(F.col("corpus_id").alias(id_col)).distinct()
    return corpus.join(bad, id_col, "left_anti")


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    simhash_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs via banded candidate join + exact hamming
    filter. With 32 bits in ``n_bands`` bands, recall is EXACT for
    ``max_hamming < n_bands`` (pigeonhole: <4 differing bits can't touch
    all 4 bands). → (id_a, id_b, hamming).

    ``max_bucket_size`` arms :func:`cap_hot_buckets` — same exposure as
    the MinHash bands (a boilerplate cluster collapses onto one band
    key); note the pigeonhole-exactness claim then holds only for pairs
    whose shared bands survive the cap."""
    width = 32 // n_bands
    pow2w = 2**width
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            (
                (F.col(simhash_col) / F.pow(F.lit(2.0), b * width).cast("long"))
                .cast("long")
                % pow2w
            ).alias("key"),
        ),
    )
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.col(simhash_col).alias("_sh"),
        F.explode(bands).alias("bk"),
    ).select("_id", "_sh", "bk.band", "bk.key")
    if max_bucket_size is not None:
        exploded = cap_hot_buckets(
            exploded, ["band", "key"], max_bucket_size,
            metric_name="simhash_bands",
        )
    exploded = persist_intermediate(exploded)
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming32(F.col("a._sh"), F.col("b._sh")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def duplicated_window_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """Substring-level duplication profile (the ExactSubstr signal of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better", re-expressed relationally): hash every k-token sliding
    window, mark windows whose hash occurs in >= 2 DISTINCT documents,
    and report per document how much of it is duplicated text.
    → (id_col, n_windows, n_dup_windows, dup_fraction).

    The paper removes 50-token duplicated byte spans with a suffix
    array; a suffix array is a single-machine construct. The same
    signal distributes as an inverted index: posexplode + window lead
    builds the sliding windows inside one doc-keyed shuffle (the
    MinHash shingle idiom), one hash-agg counts distinct docs per
    window hash, and an equi-join tags each occurrence. Nothing is
    O(n²) and every step is codegen'd, so at 100 TB this is two
    shuffles over windows (~tokens × 1 rows) — the same cost class as
    MinHash sketching. Downstream use: filter dup_fraction > tau, or
    feed the flagged spans to a span-removal rewrite.

    Documents shorter than ``k`` tokens contribute no windows and drop
    out (they cannot contain a duplicated k-gram)."""
    from pyspark.sql import Window

    df = ensure_parallelism(df, id_col)
    tok = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("_pos", "_t")
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    leads = [F.col("_t")] + [F.lead("_t", j).over(w) for j in range(1, k)]
    win = (
        tok.select(
            F.col(id_col),
            F.when(leads[-1].isNotNull(), hash32(F.concat_ws(" ", *leads))).alias(
                "_h"
            ),
        )
        .filter(F.col("_h").isNotNull())
    )
    win = persist_intermediate(win)
    dup = (
        win.groupBy("_h")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("_h", F.lit(True).alias("_dup"))
    )
    return (
        win.join(dup, "_h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.count_if(F.col("_dup").isNotNull()).cast("long").alias(
                "n_dup_windows"
            ),
        )
        .select(
            id_col,
            "n_windows",
            "n_dup_windows",
            F.round(
                F.col("n_dup_windows") / F.col("n_windows").cast("double"), 6
            ).alias("dup_fraction"),
        )
    )


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Llama training-hygiene
    step): flag every corpus document sharing a k-token window with the
    evaluation benchmark → (id_col, n_windows, n_contam,
    contam_fraction, is_contaminated). Filter ``is_contaminated`` (or
    threshold the fraction) before training so eval scores measure
    generalization, not leakage.

    Scale shape: both sides build sliding-window hashes with the
    doc-keyed posexplode + lead idiom (one shuffle each, codegen'd);
    the benchmark's DISTINCT hash set is typically millions of rows —
    tiny next to the corpus — so the membership join is an equi-join
    the optimizer happily broadcasts. Nothing is O(corpus × bench).
    """
    from pyspark.sql import Window

    def window_hashes(df: DataFrame) -> DataFrame:
        d = ensure_parallelism(df, id_col)
        tok = d.select(
            F.col(id_col),
            F.posexplode(tokens(F.col(text_col))).alias("_pos", "_t"),
        )
        w = Window.partitionBy(id_col).orderBy("_pos")
        leads = [F.col("_t")] + [F.lead("_t", j).over(w) for j in range(1, k)]
        return tok.select(
            F.col(id_col),
            F.when(
                leads[-1].isNotNull(), hash32(F.concat_ws(" ", *leads))
            ).alias("_h"),
        ).filter(F.col("_h").isNotNull())

    cw = window_hashes(corpus)
    bh = (
        window_hashes(benchmark)
        .select(F.col("_h"))
        .distinct()
        .withColumn("_m", F.lit(1))
    )
    j = cw.join(bh, "_h", "left")
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.sum(F.when(F.col("_m").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_contam"),
    ).select(
        id_col,
        "n_windows",
        "n_contam",
        F.round(F.col("n_contam") / F.col("n_windows").cast("double"), 6).alias(
            "contam_fraction"
        ),
        (F.col("n_contam") > 0).alias("is_contaminated"),
    )


def remove_duplicated_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """The REMOVAL half of ExactSubstr dedup (Lee et al.): delete every
    token covered by a k-token window that occurs in ≥ 2 distinct
    documents, and rebuild the surviving text →
    (id_col, n_tokens, n_removed, cleaned_text).

    Where ``duplicated_window_stats`` reports the signal, this applies
    the edit: a token at position p is covered iff some duplicated
    window STARTS in [p−k+1, p], computed with one ROWS-frame max over
    the per-doc position axis (positions are dense, so the frame is
    exact interval cover-merge); the cleaned text is the ordered
    concat of uncovered tokens. Docs shorter than ``k`` tokens carry
    no windows and pass through untouched.

    Scale shape: the same two codegen'd shuffles as the stats op
    (doc-keyed windows + one hash-agg over window hashes) plus one
    doc-keyed rebuild aggregation — cost class unchanged; no Python,
    no O(n²)."""
    from pyspark.sql import Window

    d = ensure_parallelism(df, id_col)
    tok = d.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "_t"),
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    leads = [F.col("_t")] + [F.lead("_t", j).over(w) for j in range(1, k)]
    win = tok.select(
        F.col(id_col),
        "_pos",
        "_t",
        F.when(leads[-1].isNotNull(), hash32(F.concat_ws(" ", *leads))).alias(
            "_h"
        ),
    )
    counts = (
        win.filter(F.col("_h").isNotNull())
        .groupBy("_h")
        .agg(F.countDistinct(id_col).alias("_docs"))
        .filter(F.col("_docs") >= 2)
        .select("_h", F.lit(1).alias("_dup"))
    )
    marked = win.join(counts, "_h", "left").select(
        F.col(id_col),
        "_pos",
        "_t",
        F.coalesce(F.col("_dup"), F.lit(0)).alias("_start_dup"),
    )
    cover = marked.withColumn(
        "_covered",
        F.max("_start_dup").over(
            Window.partitionBy(id_col)
            .orderBy("_pos")
            .rowsBetween(-(k - 1), 0)
        ),
    )
    return cover.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("_covered").cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_covered") == 0,
                            F.struct(F.col("_pos"), F.col("_t")),
                        )
                    )
                ),
                lambda s: s.getField("_t"),
            ),
            " ",
        ).alias("cleaned_text"),
    )
