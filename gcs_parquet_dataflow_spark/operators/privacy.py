"""Deterministic differential-privacy release mechanism (round 7).

The governance suite already carries the release AUDITS — k-anonymity,
l-diversity, per-user contribution bounds, keyed pseudonymization
(queries/extensions.py privacy_*) — but no release MECHANISM.  This
module adds the mechanism: contribution-clamped rollups with
hash-derived Laplace noise and per-release ε accounting.

Determinism contract (the same discipline as minhash seed 7 /
hyperplanes seed 13): the "random" draw is the shared md5-based
``hash32`` of (seed, group key), mapped to a uniform in (−½, ½), run
through the exact Laplace inverse CDF.  Every constant is inlined into
the DuckDB oracle SQL at import time, so the noise arithmetic sits in
the differential gate verbatim on both sides — a release is a pure
function of (data, seed, ε, Δ) and reproduces bit-identically across
partitionings, cluster sizes, and engines.

Deterministic seeded noise is also what production DP systems do for
replayable releases (a PRF of a release key — see e.g. the PRG
discussion in Google's DP building-block libraries); true physical
randomness would break both the differential oracle and replay
idempotence.

Privacy semantics (standard central-model accounting):

- Per-privacy-unit contribution to each released statistic is clamped
  FIRST (counts: min(c, Δ); sums: clamp to ±Δ), so one unit changes
  any released aggregate by at most Δ — the L∞ (per-coordinate)
  sensitivity the audit row ``privacy_contribution_bounds`` measures.
- A unit may appear in MANY groups (one user under several event
  types), so the L1 sensitivity of the whole release vector is
  G·Δ where G is the number of groups the unit touches.  Pass
  ``group_cap`` to bound G: each unit is deterministically restricted
  to at most ``group_cap`` groups BEFORE aggregation (seeded-hash
  rank within unit — the max-groups-contributed bound of DP SQL
  engines), and the Laplace scale becomes b = group_cap·Δ/ε, giving a
  true unit-level ε-DP release.  Without ``group_cap`` the noise
  b = Δ/ε protects each COORDINATE at ε but the unit-level guarantee
  degrades to G·ε — the ledger then over-trusts the budget; releases
  meant for sign-off must set ``group_cap``.
- ``group_cap`` can SUPPRESS whole groups from the released output
  (ADVICE r8): a group vanishes when every unit touching it hashes it
  out of its own top-``group_cap`` set, so the released KEY SET is a
  function of the seed, and a group appearing/disappearing across seed
  epochs is itself an unnoised signal.  This is the standard behavior
  of contribution-bounded DP engines (a unit's group list is private
  input, so the key set cannot be data-independent anyway); the
  production mitigation is key-set stability / thresholding — release
  only groups whose NOISY count clears a threshold τ chosen for
  (ε, δ)-style key-set protection, which this deterministic
  differential harness deliberately omits.
- The released rollup carries (epsilon, sensitivity, noise_scale,
  group_cap, l1_sensitivity) columns so a ledger can sum ε over
  releases (sequential composition) and see which rows are
  unit-level-bounded (group_cap non-NULL).
- One caveat a real deployment must add on top: the seed must be kept
  secret with the raw data (a public seed lets anyone re-derive the
  noise), and a NEW seed must be drawn per release epoch.

Scale shape: a (group, unit) partial aggregate with map-side combine,
then a |groups|-sized rollup; the noise term is a pure Column over the
group key — no extra shuffle, no Python, nothing data-sized on the
driver.  Reference has no privacy surface (this is part of the 100 TB
training-data extension brief, like operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.functions.text import hash32

# Inlined into oracle SQL at import time; changing it changes BOTH
# engines through this module only (the sketch-constants discipline).
DP_RELEASE_SEED = "dp-release-r7"

# 2^32 — hash32's range; the uniform is (h + 0.5) / 2^32 − 0.5, an
# exact dyadic rational strictly inside (−½, ½) so ln(1 − 2|u|) is
# always finite and sign(u) never 0.
_HASH_DENOM = 4294967296.0


def uniform_from_key(key: Column, seed: str = DP_RELEASE_SEED) -> Column:
    """Deterministic uniform in (−½, ½) from the shared md5 hash of
    (seed, key).  Exact dyadic arithmetic up to the final value — both
    engines produce the identical double."""
    h = hash32(F.concat_ws("|", F.lit(seed), key.cast("string")))
    return (h + F.lit(0.5)) / F.lit(_HASH_DENOM) - F.lit(0.5)


def laplace_noise(
    key: Column, scale: Column, seed: str = DP_RELEASE_SEED
) -> Column:
    """Laplace(0, scale) sample via the exact inverse CDF on the
    deterministic uniform: X = −b·sign(u)·ln(1 − 2|u|).

    ln() is the one non-dyadic step; the established ln parity between
    Spark (Math.log) and DuckDB (libm log) — already load-bearing in
    source_unigram_kl / the entropy rows — plus the 6-decimal output
    rounding keeps releases hash-identical in the differential gate.
    """
    u = uniform_from_key(key, seed)
    return -scale * F.signum(u) * F.log(F.lit(1.0) - 2.0 * F.abs(u))


def laplace_noise_sql(
    key_expr: str, scale_expr: str, seed: str = DP_RELEASE_SEED
) -> str:
    """DuckDB twin of :func:`laplace_noise`, with the seed and hash
    constants inlined — paste into oracle SQL so the noise arithmetic
    is differentially checked verbatim."""
    u = (
        f"((CAST('0x' || substr(md5(concat_ws('|', '{seed}', "
        f"CAST({key_expr} AS VARCHAR))), 1, 8) AS BIGINT) + 0.5)"
        f" / {_HASH_DENOM:.1f} - 0.5)"
    )
    return f"(-({scale_expr}) * sign({u}) * ln(1.0 - 2.0 * abs({u})))"


def _check_budget(
    epsilon: float, contribution_cap: int, group_cap: int | None
) -> float:
    """Laplace scale for the release: b = L1/ε where L1 = group_cap·Δ
    when the per-unit group participation is bounded, else the
    per-coordinate Δ (L∞-only accounting — see module docstring)."""
    if not epsilon > 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if contribution_cap < 1:
        raise ValueError(
            f"contribution_cap must be >= 1, got {contribution_cap}"
        )
    if group_cap is not None and group_cap < 1:
        raise ValueError(f"group_cap must be >= 1, got {group_cap}")
    l1 = contribution_cap * (group_cap if group_cap is not None else 1)
    return l1 / epsilon


def group_rank_hash_sql(
    unit_expr: str, group_expr: str, seed: str = DP_RELEASE_SEED
) -> str:
    """DuckDB twin of the per-unit group-selection rank hash used by
    ``group_cap`` (the 'gcap' salt element) — paste into oracle SQL as
    the ORDER BY key of a row_number() PARTITION BY unit window."""
    return (
        f"CAST('0x' || substr(md5(concat_ws('|', '{seed}', 'gcap', "
        f"CAST({unit_expr} AS VARCHAR), CAST({group_expr} AS VARCHAR)"
        f")), 1, 8) AS BIGINT)"
    )


def _cap_unit_groups(
    per_unit: DataFrame,
    group_cols: list[str],
    unit_col: str,
    group_cap: int,
    seed: str,
) -> DataFrame:
    """Deterministically keep at most ``group_cap`` (unit, group) rows
    per unit: rank groups within each unit by the seeded hash of
    (seed, 'gcap', unit, group) with the group key as tie-break, keep
    the first ``group_cap``.  The kept set is a pure function of the
    unit's own rows (+ seed), so neighboring datasets differ in at
    most ``group_cap`` released coordinates — the L1 bound the noise
    scale relies on.  Side effect (documented, ADVICE r8): a group
    every unit hashes out of its kept set is dropped from the release
    entirely — the released key set is seed-dependent; see the module
    docstring's thresholding note.  Plan: one window partitioned by unit over the
    already-aggregated (group, unit) rows; row_number ≤ cap compiles
    to WindowGroupLimit per-partition heaps — no global sort."""
    from pyspark.sql import Window as W

    gkey = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in group_cols]
    )
    h = hash32(
        F.concat_ws(
            "|",
            F.lit(seed),
            F.lit("gcap"),
            F.col(unit_col).cast("string"),
            gkey,
        )
    )
    w = W.partitionBy(unit_col).orderBy(h.asc(), gkey.asc())
    return (
        per_unit.withColumn("_gr", F.row_number().over(w))
        .filter(F.col("_gr") <= group_cap)
        .drop("_gr")
    )


def dp_release_counts(
    df: DataFrame,
    group_cols: list[str],
    unit_col: str,
    epsilon: float,
    contribution_cap: int,
    seed: str = DP_RELEASE_SEED,
    include_internals: bool = False,
    group_cap: int | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """ε-DP released count per group with per-unit contribution
    clamping: released = Σ_units min(c_unit, Δ) + Laplace(b) where
    b = group_cap·Δ/ε when ``group_cap`` bounds the number of groups a
    unit may touch (deterministic seeded-rank selection,
    :func:`_cap_unit_groups`) — the true unit-level ε guarantee — and
    b = Δ/ε otherwise (per-COORDINATE ε only; a unit present in G
    groups is protected at G·ε — module docstring caveat).

    Released-key-set caveat (module docstring, ADVICE r8): with
    ``group_cap`` a group can be suppressed ENTIRELY when every unit
    touching it drops it from its top-``group_cap`` hash-ranked set —
    the set of released group keys varies with the seed; production
    releases add noisy-count thresholding on top.  ``threshold``
    (round 9) IS that mitigation: when set, only groups whose NOISY
    released count exceeds τ are emitted (a ``threshold`` column
    records τ), so membership in the released key set is decided by
    the same noise that protects the values — the standard
    (ε, δ)-style stability release, with δ bounded by
    P[Lap(b) > τ − L1] for a group a single unit created.  In this
    deterministic harness the draw is seeded, so the released set is
    a pure function of (data, seed, ε, Δ, τ) and both engines emit
    the identical key set — filter on the ROUNDED released value, as
    the oracle twin does.

    Output: group_cols + (released, epsilon, sensitivity, noise_scale,
    group_cap, l1_sensitivity) — group_cap/l1_sensitivity are NULL for
    the unbounded form so a ledger can see which rows carry the
    unit-level guarantee; ``include_internals`` adds (clamped_count,
    noise) for tests and utility audits — NEVER publish those columns.

    The noise key is the group key alone (plus the release seed): two
    releases of the same group under the same seed reuse the same draw
    (idempotent replay), and a changed seed redraws everything.
    """
    b = _check_budget(epsilon, contribution_cap, group_cap)
    per_unit = df.groupBy(*group_cols, unit_col).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    if group_cap is not None:
        per_unit = _cap_unit_groups(
            per_unit, group_cols, unit_col, group_cap, seed
        )
    clamped = per_unit.groupBy(*group_cols).agg(
        F.sum(F.least(F.col("_c"), F.lit(int(contribution_cap))))
        .cast("long")
        .alias("_clamped")
    )
    key = F.concat_ws(
        "", *[F.col(c).cast("string") for c in group_cols]
    )
    noise = laplace_noise(key, F.lit(float(b)), seed)
    out = clamped.select(
        *group_cols,
        F.round(F.col("_clamped") + noise, 6).alias("released"),
        F.lit(float(epsilon)).alias("epsilon"),
        F.lit(int(contribution_cap)).cast("long").alias("sensitivity"),
        F.round(F.lit(float(b)), 6).alias("noise_scale"),
        F.lit(group_cap).cast("long").alias("group_cap"),
        F.lit(
            None if group_cap is None else group_cap * contribution_cap
        ).cast("long").alias("l1_sensitivity"),
        F.col("_clamped").alias("clamped_count"),
        F.round(noise, 6).alias("noise"),
    )
    if threshold is not None:
        out = out.filter(
            F.col("released") > F.lit(float(threshold))
        ).withColumn("threshold", F.lit(float(threshold)))
    if include_internals:
        return out
    return out.drop("clamped_count", "noise")


def epsilon_ledger(releases: list) -> DataFrame:
    """Sequential-composition ε accounting over a set of releases:
    ``releases`` is ``[(name, released_df), ...]`` where each df came
    from :func:`dp_release_counts` / :func:`dp_release_sums` (and so
    carries the constant epsilon/sensitivity/noise_scale columns).

    → one row per release (release, epsilon, sensitivity, noise_scale,
    group_cap, n_groups) plus a running ``epsilon_spent`` in
    release-name order — the sequential-composition upper bound Σε a
    privacy officer signs off on.  ``epsilon_spent`` is a UNIT-LEVEL
    bound only for rows with a non-NULL ``group_cap``: an unbounded
    release protects each coordinate at ε but a unit touching G groups
    at G·ε, so its ledger ε under-counts — sign-off releases must be
    built with ``group_cap`` set.  Each per-release aggregate is one
    |groups|-sized rollup; the ledger itself is |releases| rows
    (window allowlisted: tiny, aggregate-bounded)."""
    from pyspark.sql import Window as W

    if not releases:
        raise ValueError("at least one release is required")
    parts = []
    for name, df in releases:
        parts.append(
            df.agg(
                F.max("epsilon").alias("epsilon"),
                F.max("sensitivity").cast("long").alias("sensitivity"),
                F.max("noise_scale").alias("noise_scale"),
                F.max("group_cap").cast("long").alias("group_cap"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
            ).withColumn("release", F.lit(name))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.select(
        "release",
        "epsilon",
        "sensitivity",
        "noise_scale",
        "group_cap",
        "n_groups",
        F.round(
            F.sum("epsilon").over(
                W.orderBy("release").rowsBetween(
                    W.unboundedPreceding, W.currentRow
                )
            ),
            6,
        ).alias("epsilon_spent"),
    )


def dp_release_sums(
    df: DataFrame,
    group_cols: list[str],
    unit_col: str,
    value_col: str,
    epsilon: float,
    value_cap: int,
    seed: str = DP_RELEASE_SEED,
    include_internals: bool = False,
    group_cap: int | None = None,
) -> DataFrame:
    """ε-DP released sum per group: each unit's per-group value sum is
    clamped to [−Δ, Δ] (Δ = ``value_cap``, integer so the clamped sum
    stays exact), then Laplace noise keyed on the group — scale
    group_cap·Δ/ε when ``group_cap`` bounds per-unit group
    participation (unit-level ε), else Δ/ε (per-coordinate ε only;
    see :func:`dp_release_counts` — including its released-key-set
    caveat: ``group_cap`` can suppress whole groups, seed-dependently).

    ``value_col`` must be integer-valued (the engine's money-in-cents /
    token-count convention); for doubles, quantize first — exactness of
    the pre-noise sum is what makes the release differential-checkable.
    """
    b = _check_budget(epsilon, value_cap, group_cap)
    per_unit = df.groupBy(*group_cols, unit_col).agg(
        F.sum(F.col(value_col).cast("long")).alias("_v")
    )
    if group_cap is not None:
        per_unit = _cap_unit_groups(
            per_unit, group_cols, unit_col, group_cap, seed
        )
    clamped = per_unit.groupBy(*group_cols).agg(
        F.sum(
            F.greatest(
                F.least(F.col("_v"), F.lit(int(value_cap))),
                F.lit(-int(value_cap)),
            )
        )
        .cast("long")
        .alias("_clamped")
    )
    key = F.concat_ws(
        "", *[F.col(c).cast("string") for c in group_cols]
    )
    noise = laplace_noise(key, F.lit(float(b)), seed)
    out = clamped.select(
        *group_cols,
        F.round(F.col("_clamped") + noise, 6).alias("released"),
        F.lit(float(epsilon)).alias("epsilon"),
        F.lit(int(value_cap)).cast("long").alias("sensitivity"),
        F.round(F.lit(float(b)), 6).alias("noise_scale"),
        F.lit(group_cap).cast("long").alias("group_cap"),
        F.lit(
            None if group_cap is None else group_cap * value_cap
        ).cast("long").alias("l1_sensitivity"),
        F.col("_clamped").alias("clamped_sum"),
        F.round(noise, 6).alias("noise"),
    )
    if include_internals:
        return out
    return out.drop("clamped_sum", "noise")
