"""Deterministic sampling and dataset splitting.

``df.sample()``/``sampleBy()`` are seeded per-partition — results change
with partitioning, which breaks reproducibility across cluster shapes
and makes train/test splits unauditable. Training-data pipelines need
CONTENT-derived sampling: a row's split is a pure function of its key,
so any engine, any partitioning, any day recomputes the same assignment
(and the split can be proven disjoint/exhaustive in SQL — see the
oracle for ``sample_hash_split``).

Buckets come from the md5-based ``hash32`` (functions/text.py), uniform
over [0, 2^32); bucket = hash % denominator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.functions.text import hash32


def hash_bucket(key: Column, denominator: int = 10000) -> Column:
    """Stable bucket in [0, denominator) from the key's string form."""
    return hash32(key.cast("string")) % denominator


def deterministic_sample(
    df: DataFrame, key: str | Column, fraction: float, denominator: int = 10000
) -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen by key hash — reproducible
    under any partitioning, and a row's membership never changes as the
    dataset around it grows (critical for incremental pipelines)."""
    k = F.col(key) if isinstance(key, str) else key
    return df.filter(hash_bucket(k, denominator) < int(fraction * denominator))


def stratified_sample(
    df: DataFrame,
    key: str | Column,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    denominator: int = 10000,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    fraction of rows, chosen by key hash — the content-derived twin of
    ``df.sampleBy()`` (which is partitioning-dependent). Strata absent
    from ``fractions`` keep ``default_fraction``. Reproducible under
    any partitioning; membership is stable as the dataset grows."""
    k = F.col(key) if isinstance(key, str) else key
    bucket = hash_bucket(k, denominator)
    thresh: Column | None = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        lim = F.lit(int(frac * denominator))
        thresh = F.when(cond, lim) if thresh is None else thresh.when(cond, lim)
    default = F.lit(int(default_fraction * denominator))
    thresh = default if thresh is None else thresh.otherwise(default)
    return df.filter(bucket < thresh)


def weighted_sample(
    df: DataFrame,
    key: str | Column,
    weight: Column,
    denominator: int = 10000,
) -> DataFrame:
    """Keep each row with probability ``weight`` (clamped to [0,1]),
    decided by the row's OWN key hash — deterministic importance
    sampling (e.g. ``weight = quality_score`` keeps good documents
    proportionally more often). Same stability guarantees as
    ``deterministic_sample``: membership is a pure function of
    (key, weight), independent of partitioning."""
    k = F.col(key) if isinstance(key, str) else key
    thresh = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0)) * denominator
    return df.filter(hash_bucket(k, denominator) < thresh)


def resample_to_mixture(
    df: DataFrame,
    key: str | Column,
    source_col: str,
    weights: dict[str, float],
    denominator: int = 10000,
) -> DataFrame:
    """Downsample each source so the surviving rows match a target
    mixture (the domain-weighting step of training-mix curation: e.g.
    web 40% / wiki 40% / books 20%).

    Only ever downsamples: the achievable total is bounded by the
    scarcest source, T = min_s(n_s / w_s), and each source keeps
    rate_s = w_s * T / n_s of its rows (the bottleneck source keeps
    everything). Sources absent from ``weights`` are dropped.

    Scale shape: per-source counts are a tiny hash aggregate (one row
    per source); rates come back onto the data via a broadcast join;
    membership is the same content-hash filter as
    ``deterministic_sample`` — no driver collect, no full shuffle,
    stable under any partitioning.
    """
    k = F.col(key) if isinstance(key, str) else key
    w_expr: Column | None = None
    for src, w in weights.items():
        cond = F.col(source_col) == src
        w_expr = (
            F.when(cond, float(w))
            if w_expr is None
            else w_expr.when(cond, float(w))
        )
    w_expr = F.lit(0.0) if w_expr is None else w_expr.otherwise(F.lit(0.0))

    caps = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
        .withColumn("_w", w_expr)
        .filter(F.col("_w") > 0)
        .withColumn("_cap", F.col("_n") / F.col("_w"))
    )
    t_min = caps.agg(F.min("_cap").alias("_t"))
    rates = caps.crossJoin(F.broadcast(t_min)).select(
        source_col,
        F.least(
            F.col("_w") * F.col("_t") / F.col("_n"), F.lit(1.0)
        ).alias("_rate"),
    )
    kept = df.join(F.broadcast(rates), source_col, "inner").filter(
        hash_bucket(k, denominator) < F.col("_rate") * denominator
    )
    return kept.drop("_rate")


def hash_split(
    df: DataFrame,
    key: str | Column,
    fractions: dict[str, float],
    out: str = "split",
    denominator: int = 10000,
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test …) by
    key-hash range; fractions must sum to ≤ 1 (remainder → last split).
    Disjoint and exhaustive by construction."""
    k = F.col(key) if isinstance(key, str) else key
    bucket = hash_bucket(k, denominator)
    expr = None
    edge = 0.0
    names = list(fractions.keys())
    for name in names[:-1]:
        edge += fractions[name]
        cond = bucket < int(edge * denominator)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return df.withColumn(out, last if expr is None else expr.otherwise(last))


def gumbel_topk_sample(
    df: DataFrame,
    key: str,
    weight: Column,
    n: int,
    salt: str = "gumbel-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, size exactly ``n``
    (Efraimidis–Spirakis via Gumbel-top-k): rank rows by
    ``ln(w) + Gumbel(hash)`` and keep the top n — each subset's
    selection probability proportional to its weights, in ONE pass +
    one top-k, no sequential draws. The noise is a pure function of
    (salt, key): u = (hash32 + 0.5) / 2³², g = −ln(−ln(u)) — so the
    sample is reproducible and partitioning-independent, and a new
    ``salt`` is a fresh draw. Rows with non-positive weight are
    excluded (ln undefined — and their probability is 0 anyway).

    → input columns + (gumbel_key, sample_rank). At 100 TB the global
    top-k is the two-phase per-partition pattern AQE already applies
    to ORDER BY…LIMIT; DSIR importance weights (sample_dsir_importance)
    plug in directly as ``weight = exp(avg_log_ratio)`` — i.e. add the
    log-ratio to the key instead."""
    from pyspark.sql import Window as W

    from gcs_parquet_dataflow_spark.functions.text import hash32

    u = (
        hash32(F.concat(F.lit(salt), F.lit(":"), F.col(key).cast("string")))
        + 0.5
    ) / F.lit(float(2**32))
    gk = F.log(weight) - F.log(-F.log(u))
    w = W.orderBy(F.desc("gumbel_key"), F.asc(key))
    return (
        df.filter(weight > 0)
        .withColumn("gumbel_key", gk)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= n)
    )


def quota_per_key(
    df: DataFrame,
    key_cols: list[str],
    n: int,
    order_by: list[Column],
) -> DataFrame:
    """Keep at most ``n`` rows per key — the per-domain / per-entity
    page cap every large-crawl pipeline applies so one hot site (or
    one over-represented resolved entity) cannot dominate the corpus.

    ``order_by`` must be a DETERMINISTIC total order within a key
    (convention: content ``hash32`` first — an unbiased "random" pick
    reproducible under any partitioning — with a unique id as the tie
    break); the kept set is then a pure function of the data, like
    every other sampler in this module.

    Scale shape: one exchange on the key + a rank-limited window —
    Spark's WindowGroupLimit pushes the ``row_number() <= n`` filter
    into a per-partition top-n heap, so no key's full row list is ever
    sorted or materialized (the same bound as window_topk_per_group).
    High-cardinality keys are exactly the safe case for a partitioned
    window; there is no single-partition fallback.
    """
    from pyspark.sql import Window

    if "_quota_rn" in df.columns:
        # Same guard as deterministic_shuffle's __ds_h: silently
        # overwriting a caller column then dropping it corrupts data.
        raise ValueError(
            "quota_per_key: input already has a '_quota_rn' column; "
            "rename it before calling"
        )
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        df.withColumn("_quota_rn", F.row_number().over(w))
        .filter(F.col("_quota_rn") <= int(n))
        .drop("_quota_rn")
    )


def _source_weight_expr(source_col: str, weights: dict[str, float]) -> Column:
    w_expr: Column | None = None
    for src, w in weights.items():
        cond = F.col(source_col) == src
        w_expr = (
            F.when(cond, float(w))
            if w_expr is None
            else w_expr.when(cond, float(w))
        )
    return F.lit(0.0) if w_expr is None else w_expr.otherwise(F.lit(0.0))


def _token_mixture_rates(
    df: DataFrame,
    source_col: str,
    token_col: str,
    weights: dict[str, float],
    token_budget: float | None,
) -> DataFrame:
    """Per-source (available_tokens, weight, T) — the shared core of
    :func:`mixture_plan` and :func:`resample_to_token_mixture`.  T is
    the achievable mixture total in TOKENS: min over sources of
    available/weight (the scarcest source pins the mix, as in
    :func:`resample_to_mixture`), further capped by ``token_budget``
    when one is given."""
    caps = (
        df.groupBy(source_col)
        .agg(F.sum(token_col).cast("double").alias("_avail"))
        .withColumn("_w", _source_weight_expr(source_col, weights))
        .filter(F.col("_w") > 0)
        .withColumn("_cap", F.col("_avail") / F.col("_w"))
    )
    t_min = caps.agg(F.min("_cap").alias("_t"))
    if token_budget is not None:
        t_min = t_min.select(
            F.least(F.col("_t"), F.lit(float(token_budget))).alias("_t")
        )
    return caps.crossJoin(F.broadcast(t_min))


def mixture_plan(
    df: DataFrame,
    source_col: str,
    token_col: str,
    weights: dict[str, float],
    token_budget: float | None = None,
) -> DataFrame:
    """The training-mix PLANNING table — mixtures are specified in
    TOKENS, not documents, so the planning unit must be token mass
    (``resample_to_mixture`` is the doc-count form).  Per source:

    - available_tokens: what the corpus holds;
    - target_weight: the requested share;
    - target_tokens: weight × T where T = min(min_s avail_s/w_s,
      token_budget) — the largest mixture total reachable WITHOUT
      repeating data, budget-capped;
    - keep_rate: the downsampling rate hitting target_tokens;
    - epochs_at_budget: (weight × budget)/available — how many passes
      over the source the FULL budget would demand at these weights.
      > 1 is the data-constrained regime (you must repeat that source
      or re-weight); NULL without a budget.

    One tiny per-source hash aggregate + a 1-row broadcast scalar —
    the plan for a 100 TB corpus is k rows.  Deterministic: doubles
    rounded to 6."""
    rates = _token_mixture_rates(
        df, source_col, token_col, weights, token_budget
    )
    epochs = (
        F.round(
            F.col("_w") * F.lit(float(token_budget)) / F.col("_avail"), 6
        )
        if token_budget is not None
        else F.lit(None).cast("double")
    )
    return rates.select(
        source_col,
        F.col("_avail").cast("long").alias("available_tokens"),
        F.round(F.col("_w"), 6).alias("target_weight"),
        F.round(F.col("_w") * F.col("_t"), 6).alias("target_tokens"),
        F.round(
            F.least(F.col("_w") * F.col("_t") / F.col("_avail"), F.lit(1.0)),
            6,
        ).alias("keep_rate"),
        epochs.alias("epochs_at_budget"),
    )


def resample_to_token_mixture(
    df: DataFrame,
    key: str | Column,
    source_col: str,
    token_col: str,
    weights: dict[str, float],
    token_budget: float | None = None,
    denominator: int = 10000,
) -> DataFrame:
    """Downsample each source to the token-mass mixture of
    :func:`mixture_plan` (never upsamples; sources absent from
    ``weights`` drop).  Membership is the content-hash rule shared by
    every sampler here, so the kept set is reproducible under any
    partitioning; the hash keeps ~rate of each source's ROWS, which
    converges to ~rate of its TOKENS because membership is independent
    of document length (the standard row-level approximation — a
    length-stratified variant is :func:`quota_per_key` composed per
    length band)."""
    k = F.col(key) if isinstance(key, str) else key
    rates = _token_mixture_rates(
        df, source_col, token_col, weights, token_budget
    ).select(
        source_col,
        F.least(
            F.col("_w") * F.col("_t") / F.col("_avail"), F.lit(1.0)
        ).alias("_rate"),
    )
    kept = df.join(F.broadcast(rates), source_col, "inner").filter(
        hash_bucket(k, denominator) < F.col("_rate") * denominator
    )
    return kept.drop("_rate")
