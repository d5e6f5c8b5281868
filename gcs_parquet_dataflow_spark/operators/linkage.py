"""Entity resolution / record linkage as Catalyst plans.

Re-expresses the classic Fellegi–Sunter record-linkage pipeline —
multi-pass blocking → bounded candidate comparison → integer
field-agreement weights → threshold decision → transitive closure →
survivorship (golden records) — on the engine's existing scale
primitives. The Beam reference has no ER surface (its DAGs stop at
per-record transforms, main.py:329-413); this module belongs to the
100 TB training-data extension brief: author/user/source metadata
records arrive spelled differently across crawls and snapshots, and
per-entity quotas, dedup survivorship and RTBF erasure
(sinks/parquet_lake.delete_keys) must see ONE entity, not N spellings.

Scale design (the same cost classes as every other candidate
generator in this engine):

- ``blocked_candidate_pairs`` is a MULTI-PASS blocked self-equi-join:
  each record emits one (pass, key) row per blocking pass, pairs meet
  only inside a shared block, so the join is bounded by
  Σ_passes Σ_blocks |block|² — never |records|². Multiple passes give
  the recall a union of independent chances (a pair missed by the
  balance band because a perturbation crossed a boundary is still
  caught by the name-digits pass) at additive, individually-bounded
  cost.
- Every pass runs through the shared hot-bucket guard family
  (operators.dedup.cap_hot_buckets: fixed cap / AutoCap /
  PairBudgetCap, all emitting saturation CapReports) — a frequent
  blocking key ("UNKNOWN", empty digits) is excluded from candidate
  generation instead of detonating the self-join.
- Match scores are pure integer Column arithmetic on the pair stream
  (no UDFs), so scoring stays inside whole-stage codegen; in
  production the integer weights are the quantized log-likelihood
  ratios log2(m/u) estimated per field (Winkler EM) — here they are
  explicit dials, single-sourced with the differential oracles.
- Clustering reuses the Pregel min-label ``connected_components``
  (operators.dedup, O(graph diameter) shuffles, lineage-checkpointed);
  survivorship is ONE aggregate with min_by canonical selection —
  deterministic because record ids are unique.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators.dedup import (
    cap_hot_buckets,
    connected_components,
)
from gcs_parquet_dataflow_spark.operators.partitioning import (
    persist_intermediate,
)


def blocking_keys(
    df: DataFrame, id_col: str, passes: list[tuple[str, Column]]
) -> DataFrame:
    """(_rid, _bkey) rows — one per record per non-NULL pass key; the
    shared key derivation under every blocking consumer (self-join
    pairs, cross-table probes, and the ER stream's Bloom prefilter,
    which must hash the EXACT same key strings on both the entity
    build side and the batch probe side).

    The concat is NULL if the pass key is NULL → filtered: the record
    skips that pass instead of forming a giant NULL block."""
    out = None
    for name, key in passes:
        part = df.select(
            F.col(id_col).alias("_rid"),
            F.concat(F.lit(name + ":"), key.cast("string")).alias("_bkey"),
        ).filter(F.col("_bkey").isNotNull())
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("at least one blocking pass is required")
    return out


def blocked_candidate_pairs(
    records: DataFrame,
    id_col: str,
    passes: list[tuple[str, Column]],
    max_block_size=None,
    metric_name: str = "er_blocks",
) -> DataFrame:
    """Multi-pass blocking → distinct candidate pairs.

    ``passes`` is a list of (pass_name, blocking-key Column); each
    record contributes one key row per pass (NULL keys are dropped —
    a record with no extractable key simply skips that pass). Pairs
    are generated inside (pass, key) blocks only and deduplicated
    across passes: → (id_a, id_b, n_passes) with id_a < id_b, where
    ``n_passes`` counts how many passes independently proposed the
    pair (a cheap match-prior signal).

    ``max_block_size`` arms the shared hot-bucket guard (int cap,
    AutoCap, or PairBudgetCap — see operators.dedup): oversize blocks
    are excluded from candidate generation, bounding the self-join at
    Σ min(|block|, cap)² with a saturation CapReport. The keyed table
    is persisted once so both self-join sides read it instead of
    re-deriving the (possibly expensive) blocking-key lineage.
    """
    keyed = blocking_keys(records, id_col, passes)
    if max_block_size is not None:
        keyed = cap_hot_buckets(
            keyed, ["_bkey"], max_block_size, metric_name=metric_name
        )
    keyed = persist_intermediate(keyed)
    left, right = keyed.alias("l"), keyed.alias("r")
    return (
        left.join(
            right,
            (F.col("l._bkey") == F.col("r._bkey"))
            & (F.col("l._rid") < F.col("r._rid")),
        )
        .groupBy(
            F.col("l._rid").alias("id_a"), F.col("r._rid").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_passes"))
    )


def blocked_pairs_between(
    left: DataFrame,
    right: DataFrame,
    id_left: str,
    id_right: str,
    passes: list[tuple[str, Column]],
    max_block_size=None,
    metric_name: str = "er_blocks_lr",
) -> DataFrame:
    """Two-table blocked candidate pairs: (id_a from ``left``, id_b
    from ``right``, n_passes), every pair meeting through at least one
    shared blocking key. The cross-table sibling of
    :func:`blocked_candidate_pairs` — probe records against an
    existing entity table without an all-pairs comparison. Both inputs
    must expose the attribute columns the pass Columns reference.

    Cost is Σ_passes Σ_keys |left_block|·|right_block|; the hot-bucket
    guard (``max_block_size``) is applied PER SIDE, so a key that is
    hot on either side is excluded from candidate generation on that
    side (and therefore entirely, since pairs need both sides).
    """
    def keyed(df: DataFrame, idc: str) -> DataFrame:
        out = blocking_keys(df, idc, passes)
        if max_block_size is not None:
            out = cap_hot_buckets(
                out, ["_bkey"], max_block_size, metric_name=metric_name
            )
        return persist_intermediate(out)

    kl = keyed(left, id_left).alias("l")
    kr = keyed(right, id_right).alias("r")
    return (
        kl.join(kr, F.col("l._bkey") == F.col("r._bkey"))
        .groupBy(
            F.col("l._rid").alias("id_a"), F.col("r._rid").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_passes"))
    )


def golden_view(
    members: DataFrame,
    id_col: str,
    attrs: list[str],
) -> DataFrame:
    """Current golden COMPARISON view from an entity-membership table
    (``id_col``, ``entity_id``, attrs…): one row per entity carrying
    the min-id member's attributes under their ORIGINAL names (so the
    same blocking passes / agreement predicates apply unchanged when
    probing new records against it), plus ``n_records`` and
    ``canonical_id`` (the min member id — the merge key that makes
    views MERGEABLE: min distributes over any split of the members).
    One hash aggregate on entity_id.
    """
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.min(F.col(id_col)).cast("long").alias("canonical_id"),
    ]
    aggs += [
        F.min_by(F.col(c), F.col(id_col)).alias(c) for c in attrs
    ]
    return members.groupBy("entity_id").agg(*aggs)


def merge_golden_views(
    views: list[DataFrame],
    attrs: list[str],
) -> DataFrame:
    """Merge partial golden views (outputs of :func:`golden_view` over
    DISJOINT member sets) into the view of their union WITHOUT
    re-scanning members — the incremental-maintenance step the
    streaming ER composition relies on: per batch, merge(prev snapshot,
    view(batch members)) ≡ golden_view(all members so far).

    Correct because every column is a mergeable aggregate: n_records
    sums, canonical_id is a min, and the canonical attributes travel
    with whichever partial view holds the smaller canonical_id
    (min_by over canonical_id — member ids are unique, so the pick is
    deterministic). One |entities|-sized hash aggregate; the raw
    membership table is never re-read.
    """
    if not views:
        raise ValueError("at least one view is required")
    u = views[0]
    for v in views[1:]:
        u = u.unionByName(v)
    aggs = [
        F.sum("n_records").cast("long").alias("n_records"),
        F.min("canonical_id").cast("long").alias("canonical_id"),
    ]
    aggs += [
        F.min_by(F.col(c), F.col("canonical_id")).alias(c) for c in attrs
    ]
    return u.groupBy("entity_id").agg(*aggs)


def pair_attributes(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str,
    attrs: list[str],
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Attach both sides' comparison attributes to a candidate-pair
    stream: each ``attr`` appears as ``<attr>_a`` / ``<attr>_b``.

    Two equi-joins on the record id. Post-blocking the pair stream is
    the SMALL side (bounded by the block guard), so at cluster scale
    these resolve as shuffle-hash or broadcast joins on the id key —
    the full record table is scanned once per side with only
    ``attrs`` read (column pruning reaches the parquet scan).
    """
    proj = records.select(id_col, *attrs)
    side_a = proj.select(
        F.col(id_col).alias(a_col),
        *[F.col(c).alias(f"{c}_a") for c in attrs],
    )
    side_b = proj.select(
        F.col(id_col).alias(b_col),
        *[F.col(c).alias(f"{c}_b") for c in attrs],
    )
    return pairs.join(side_a, a_col).join(side_b, b_col)


def entity_clusters(
    records: DataFrame,
    match_pairs: DataFrame,
    id_col: str,
    max_iter: int = 20,
    algorithm: str = "label",
) -> DataFrame:
    """Transitive closure of the match decision: → (id_col, cluster)
    where ``cluster`` is the min record id reachable through matched
    pairs (every unmatched record is its own singleton cluster).
    Delegates to the Pregel min-label ``connected_components`` —
    match graphs are shallow (variants of a common entity), so this
    is a handful of shuffles even at 100 TB.  ``algorithm="jump"``
    (round 11) switches to pointer-jumping for the rare DEEP match
    graph (daisy-chained variants) — O(log diameter) rounds at one
    extra self-join per round; same fixed point, same CCReport.
    """
    return connected_components(
        records.select(id_col),
        match_pairs,
        id_col=id_col,
        max_iter=max_iter,
        metric_name="entity_clusters",
        algorithm=algorithm,
    )


def fellegi_sunter_score(
    pairs: DataFrame,
    agreements: list[tuple[Column, int]],
    score_col: str = "score",
) -> DataFrame:
    """Integer Fellegi–Sunter match score: Σ weight over satisfied
    field-agreement predicates, as ONE codegen'd Column expression on
    the (bounded) candidate-pair stream — no UDFs, no extra shuffle.

    ``agreements`` is a list of (predicate Column over the paired
    attributes, integer weight). In production the weights are the
    quantized log2(m/u) log-likelihood ratios estimated per field
    (Winkler EM); here they are explicit integer dials so the score is
    exactly reproducible in the differential oracle. A NULL predicate
    (NULL attribute on either side) contributes 0 — agreement must be
    POSITIVE evidence.
    """
    total = None
    for cond, weight in agreements:
        term = F.when(cond, F.lit(int(weight))).otherwise(F.lit(0))
        total = term if total is None else total + term
    if total is None:
        raise ValueError("at least one agreement predicate is required")
    return pairs.withColumn(score_col, total.cast("long"))


def em_weight_step(
    pairs: DataFrame,
    agreements: list[tuple[str, Column]],
    p_tenths: int = 1,
    m_tenths: int = 9,
    u_tenths: int = 1,
    micro: int = 1_000_000,
) -> DataFrame:
    """One EM iteration of Fellegi–Sunter m/u weight estimation over
    the candidate-pair stream — the step that turns the hand-dialed
    integer weights of :func:`fellegi_sunter_score` into ESTIMATED
    log-likelihood ratios (Winkler's unsupervised EM).

    E-step per pair: with priors p = p_tenths/10, m = m_tenths/10,
    u = u_tenths/10 (a one-decimal grid so every per-pair posterior is
    an exact integer ratio), the match posterior is

        w = A / (A + B),  A = p₁₀·Π(γ_k ? m₁₀ : 10−m₁₀),
                          B = (10−p₁₀)·Π(γ_k ? u₁₀ : 10−u₁₀)

    quantized to µ-units with truncate-toward-zero integer division
    (Spark ``div`` ≡ DuckDB ``//`` — the same pinned idiom as the
    classifier's gradient step). M-step per field: exact int64 sums

        m_k' = Σ wq·γ_k / Σ wq,   u_k' = Σ (micro−wq)·γ_k / Σ (micro−wq)

    → (field, support_match, support_unmatch, m_new, u_new) with the
    supports exact longs and the estimates doubles rounded to 6. A
    NULL agreement predicate counts as disagreement (γ = 0), matching
    :func:`fellegi_sunter_score`. ONE aggregate over the bounded pair
    stream; the per-field stack is K rows on the driver side of a
    1-row aggregate — nothing here scales with the corpus.
    """
    if not agreements:
        raise ValueError("at least one agreement predicate is required")
    # int64 overflow bound (ADVICE r6): the posterior numerator is
    # micro · p₁₀ · Π factor with every factor ≤ 9, so K fields cost at
    # most micro·10·9^K — that must stay below 2^63.  micro=1e6 admits
    # K ≤ 12; silently exceeding it corrupts wq and every m/u estimate,
    # so fail loudly (same contract as step1_weights' documented 10^12
    # limit).
    k_max = 0
    lim = (2**63 - 1) // (int(micro) * 10)
    while 9 ** (k_max + 1) <= lim:
        k_max += 1
    if len(agreements) > k_max:
        raise ValueError(
            f"em_weight_step: {len(agreements)} agreement fields exceeds "
            f"the int64-exact bound of {k_max} for micro={micro} "
            "(micro*10*9^K must stay < 2^63); reduce fields or micro"
        )
    names = [n for n, _ in agreements]
    g = {
        n: F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("long")
        for n, cond in agreements
    }
    a_num = F.lit(int(p_tenths)).cast("long")
    b_num = F.lit(10 - int(p_tenths)).cast("long")
    for n in names:
        a_num = a_num * F.when(
            g[n] == 1, F.lit(int(m_tenths))
        ).otherwise(F.lit(10 - int(m_tenths)))
        b_num = b_num * F.when(
            g[n] == 1, F.lit(int(u_tenths))
        ).otherwise(F.lit(10 - int(u_tenths)))
    per_pair = pairs.select(
        *[g[n].alias(f"_g_{n}") for n in names],
        a_num.alias("_a"),
        b_num.alias("_b"),
    ).select(
        *[F.col(f"_g_{n}") for n in names],
        F.expr(f"({micro} * _a) div (_a + _b)").cast("long").alias("_wq"),
    )
    aggs = [F.sum("_wq").alias("_sw"),
            F.sum(F.lit(micro) - F.col("_wq")).alias("_snw")]
    for n in names:
        aggs.append(
            F.sum(F.col("_wq") * F.col(f"_g_{n}")).alias(f"_swg_{n}")
        )
        aggs.append(
            F.sum((F.lit(micro) - F.col("_wq")) * F.col(f"_g_{n}"))
            .alias(f"_snwg_{n}")
        )
    totals = per_pair.agg(*aggs)
    stack = ", ".join(
        f"'{n}', _swg_{n}, _snwg_{n}" for n in names
    )
    return totals.selectExpr(
        f"stack({len(names)}, {stack})"
        " as (field, support_match, support_unmatch)",
        "_sw", "_snw",
    ).select(
        "field",
        F.col("support_match").cast("long").alias("support_match"),
        F.col("support_unmatch").cast("long").alias("support_unmatch"),
        F.round(
            F.col("support_match").cast("double") / F.col("_sw"), 6
        ).alias("m_new"),
        F.round(
            F.col("support_unmatch").cast("double") / F.col("_snw"), 6
        ).alias("u_new"),
    )


def golden_records(
    labeled: DataFrame,
    id_col: str,
    cluster_col: str = "cluster",
    canonical: tuple[str, ...] = (),
    extra_aggs: tuple[Column, ...] = (),
) -> DataFrame:
    """Survivorship: one golden record per entity cluster.

    ``canonical`` columns are taken from the member with the MIN
    record id (min_by — deterministic, ids are unique); domain rules
    that are aggregates rather than picks (max balance, latest
    timestamp, any-true flags) ride along via ``extra_aggs``. One
    hash aggregate on the cluster key — the cheapest possible shape.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n_records")]
    aggs += [
        F.min_by(F.col(c), F.col(id_col)).alias(f"canonical_{c}")
        for c in canonical
    ]
    aggs += list(extra_aggs)
    return labeled.groupBy(
        F.col(cluster_col).alias("entity_id")
    ).agg(*aggs)


def first_token_block(col: Column) -> Column:
    """Cheapest useful blocking key: the first whitespace token."""
    return F.split_part(col, F.lit(" "), F.lit(1))


def soundex_block(col: Column) -> Column:
    """Phonetic blocking key (JVM-builtin soundex of the first token):
    survives the misspellings edit-distance matching is meant to catch
    ("Smith"/"Smyth" share a block; a first-token equality key would
    separate them)."""
    return F.soundex(F.split_part(col, F.lit(" "), F.lit(1)))


def sorted_token_prefix_block(col: Column, k: int = 2) -> Column:
    """Token-order-insensitive blocking key: the first ``k`` tokens of
    the SORTED token set ("Corp Acme" and "Acme Corp" share a block).
    The classic sorted-neighborhood key, as one codegen'd expression —
    split, sort, slice, join."""
    return F.array_join(
        F.slice(F.array_sort(F.split(col, "\\s+")), 1, int(k)), " "
    )


def fuzzy_pairs_blocked(
    df: DataFrame,
    key_col: str,
    text_col: str,
    block: Column,
    max_dist: int,
    dedupe_names: bool = True,
) -> DataFrame:
    """Pairs of records whose ``text_col`` values are within
    ``max_dist`` edits, compared only inside equal-``block`` groups.

    With ``dedupe_names`` (default), identical strings collapse to one
    representative (min key) before pairing — exact duplicates are a
    solved problem (operators/dedup.py) and would otherwise quadratically
    inflate blocks. Output: (key_a, key_b, text_a, text_b, dist) with
    key_a < key_b.
    """
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(text_col).alias("_t"),
        block.alias("_blk"),
    )
    if dedupe_names:
        base = base.groupBy("_t", "_blk").agg(F.min("_k").alias("_k"))
    names = persist_intermediate(base)
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._k") < F.col("b._k")),
        )
        .filter(F.levenshtein(F.col("a._t"), F.col("b._t")) <= max_dist)
        .select(
            F.col("a._k").alias("key_a"),
            F.col("b._k").alias("key_b"),
            F.col("a._t").alias("text_a"),
            F.col("b._t").alias("text_b"),
            F.levenshtein(F.col("a._t"), F.col("b._t")).alias("dist"),
        )
    )


def refine_pairs_difflib(
    pairs: DataFrame,
    left_text: str = "text_a",
    right_text: str = "text_b",
    min_ratio: float = 0.9,
) -> DataFrame:
    """Exact-verify CANDIDATE pairs with difflib's Ratcliff/Obershelp
    similarity (Arrow-batched ``mapInPandas``): the two-stage near-dup
    contract — cheap sketch joins (LSH bands / blocked fuzzy keys)
    produce a candidate set orders of magnitude smaller than n², then
    the expensive Python comparator runs ONLY on that bounded set.
    Adds ``ratio`` (rounded to 6) and keeps pairs ≥ ``min_ratio``.

    Python-per-PAIR is the documented slow path, priced correctly
    here: cost scales with |candidates|, never with |corpus|²; difflib
    is deterministic so re-runs and retries are stable. Swap in any
    Python comparator (jellyfish, rapidfuzz wheels on a real cluster)
    behind the same contract."""
    import pandas as pd

    cols = pairs.columns
    schema = ", ".join(
        f"{c} {dict(pairs.dtypes)[c]}" for c in cols
    ) + ", ratio double"

    def score(batches):
        from difflib import SequenceMatcher

        for pdf in batches:
            ratios = [
                round(
                    SequenceMatcher(
                        None, a if a is not None else "",
                        b if b is not None else ""
                    ).ratio(),
                    6,
                )
                for a, b in zip(pdf[left_text], pdf[right_text])
            ]
            out = pdf.copy()
            out["ratio"] = pd.Series(ratios, index=pdf.index, dtype="float64")
            yield out[out["ratio"] >= min_ratio]

    return pairs.mapInPandas(score, schema=schema)


def recluster_members(
    members: DataFrame,
    id_col: str,
    attrs: list[str],
    passes: list[tuple[str, Column]],
    agreements: list[tuple[Column, int]],
    threshold: int,
    max_block_size=None,
    max_iter: int = 20,
) -> DataFrame:
    """Full batch re-resolution over an entity-membership table — the
    COMPACTION that heals the incremental stream's documented
    approximation (two records matched to two different existing
    entities never merge those entities online). Re-runs the complete
    pipeline over the member RECORDS: blocking → scoring → transitive
    closure; returns the members with a fresh ``entity_id`` (min
    reachable record id — the same canonical rule, so entities that
    were already correct keep their ids and downstream keys are
    stable).

    Run it offline on the append-only members lake at whatever cadence
    split-rate monitoring suggests; the cost class is exactly the
    batch pipeline's (cap-guarded Σ|block|² + O(diameter) shuffles),
    independent of how many increments built the lake.
    """
    recs = persist_intermediate(members.select(id_col, *attrs))
    pairs = blocked_candidate_pairs(
        recs, id_col, passes, max_block_size=max_block_size,
        metric_name="er_recluster_blocks",
    )
    scored = fellegi_sunter_score(
        pair_attributes(pairs, recs, id_col, attrs), agreements
    )
    clusters = entity_clusters(
        recs,
        scored.filter(F.col("score") >= int(threshold))
        .select("id_a", "id_b"),
        id_col,
        max_iter=max_iter,
    )
    return recs.join(clusters, id_col).select(
        id_col, F.col("cluster").alias("entity_id"), *attrs
    )
