"""Trained quality classifier (VERDICT r5 item 4): the fastText-shape
discriminative filter production pretraining pipelines deploy next to
the heuristic gates — logistic regression over HASHED word n-gram
counts (unigrams + bigrams → hash32 % dim buckets), trained
full-batch and distributed.

The engine-design problem is the one every distributed trainer hits:
a parallel Σ of float gradient contributions is order-dependent, so
the learned weights would vary with partitioning and the differential
oracle could never pin them. Everything here is therefore EXACT
INTEGER arithmetic except one bounded per-row step:

- features x_ij are counts (int);
- weights live in micro-units (long);
- the margin s_i = Σ_j w_j·x_ij is an exact int64 sum;
- the per-doc residual r_i = round(1e6·(σ(s_i/1e6) − y_i)) is computed
  from the doc's OWN exact margin (one float op per doc, identical on
  every layout);
- the gradient g_j = Σ_i r_i·x_ij is again an exact int64 sum, so the
  weight update — and the whole training run — is bit-identical under
  any partitioning (asserted by tests/test_round6.py).

At w = 0 the sigmoid is exactly ½, so the first gradient is the pure
integer Σ (1 − 2y_i)·x_ij — the quantity the differential oracle row
quality_classifier_gradient checks hash-exact against DuckDB.

Scale shape: the feature build is one explode + map-side-combined
count (the shuffle carries one row per distinct (doc, bucket)); each
training iteration is one broadcast join against the dim-sized weight
table plus two hash aggregations. The corpus is scanned once to build
features; iterations are feature-table-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.functions.text import hash32, tokens
from gcs_parquet_dataflow_spark.operators.partitioning import (
    ensure_parallelism,
    persist_intermediate,
)

HASH_DIM = 1024          # feature buckets (the fastText hashing trick)
MICRO = 1_000_000        # fixed-point unit for weights and residuals


def hashed_ngram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = HASH_DIM,
) -> DataFrame:
    """→ (id_col, bucket, x): counts of hashed word unigrams AND
    bigrams per document. Empty tokens are dropped BEFORE bigram
    formation (so bigrams span the cleaned adjacency — the DuckDB
    twin list_filters first). One posexplode + window lead (the
    with_minhash shingle pattern, fully codegen'd) feeding a
    map-side-combined count."""
    from pyspark.sql import Window as W

    d = ensure_parallelism(
        df.filter(F.col(text_col).isNotNull()), id_col
    )
    tok = (
        d.select(
            F.col(id_col),
            F.posexplode(tokens(F.col(text_col))).alias("_pos", "_t"),
        )
        .filter(F.col("_t") != "")
    )
    tok = persist_intermediate(tok)
    uni = tok.select(F.col(id_col), F.col("_t").alias("gram"))
    w = W.partitionBy(id_col).orderBy("_pos")
    bi = (
        tok.withColumn("_nxt", F.lead("_t").over(w))
        .filter(F.col("_nxt").isNotNull())
        .select(
            F.col(id_col),
            F.concat_ws(" ", "_t", "_nxt").alias("gram"),
        )
    )
    return (
        uni.unionAll(bi)
        .select(
            F.col(id_col),
            (hash32(F.col("gram")) % dim).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )


def hashed_char_ngram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    dim: int = HASH_DIM,
) -> DataFrame:
    """→ (id_col, bucket, x): counts of hashed character ``n``-grams —
    the classic textcat/langid.py feature set (character trigrams carry
    the orthographic signal word features miss for language-ID).

    Same plan shape as :func:`hashed_ngram_features`: explode an index
    sequence (guarded — Spark's ``sequence(1, 0)`` would DESCEND, so
    short texts map to an empty array), substring per index, hash %
    dim, map-side-combined count.  No Python, no HOF lambdas in the
    per-row hot path beyond the index explode."""
    d = ensure_parallelism(
        df.filter(F.col(text_col).isNotNull()), id_col
    )
    idx = F.when(
        F.length(F.col(text_col)) >= n,
        F.sequence(F.lit(1), F.length(F.col(text_col)) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = d.select(
        F.col(id_col),
        F.col(text_col).alias("_txt"),
        F.explode(idx).alias("_i"),
    ).select(
        F.col(id_col),
        F.expr(f"substring(_txt, _i, {int(n)})").alias("gram"),
    )
    return (
        grams.select(
            F.col(id_col),
            (hash32(F.col("gram")) % dim).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )


def gradient_at_zero(
    feats: DataFrame, labels: DataFrame, id_col: str
) -> DataFrame:
    """The first full-batch logistic gradient, doubled to stay
    integer: at w = 0, ∂L/∂w_j = ½·Σ_i (1 − 2y_i)·x_ij — this returns
    → (bucket, grad_x2) with grad_x2 = Σ (1 − 2y_i)·x_ij, an EXACT
    int64 (the oracle-checked quantity; labels carry y ∈ {0, 1})."""
    return (
        feats.join(labels, id_col)
        .groupBy("bucket")
        .agg(
            F.sum((1 - 2 * F.col("y")) * F.col("x"))
            .cast("long")
            .alias("grad_x2")
        )
    )


def step1_weights(
    feats: DataFrame, labels: DataFrame, id_col: str
) -> DataFrame:
    """Closed-form FIRST gradient-descent step from w = 0 as a
    DataFrame → (bucket, wv) in µ-units — the oracle-expressible
    slice of the iterative trainer. At w = 0 the residual is exactly
    r_i = 500000·(1 − 2y_i), so with the default lr = 2.0 the update
    collapses to the pure integer

        wv_j = −((10⁶ · grad_x2_j) div n_docs)

    with BOTH engines' truncate-toward-zero integer division (Spark
    ``div`` ≡ DuckDB ``//``; the iterative trainer's Python ``//``
    floors instead — at most 1 µ-unit apart on negative quotients,
    which is why this closed form, not the trainer loop, is the
    differential surface). 10⁶·|grad_x2| must fit int64: fine through
    ~10¹² feature-count mass; beyond that normalize grad by n first
    (the iterative trainer's regime).

    Scale shape: one equi-join + hash aggregate over the feature
    table, then a 1-row-aggregate scalar attach (bounded crossJoin)."""
    g = gradient_at_zero(feats, labels, id_col)
    n = labels.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    return g.crossJoin(F.broadcast(n)).select(
        "bucket",
        F.expr(f"-(({MICRO} * grad_x2) div _n)").cast("long").alias("wv"),
    )


def margin_scores(
    feats: DataFrame, weights_df: DataFrame, id_col: str
) -> DataFrame:
    """→ (id_col, s): the exact int64 margin s_i = Σ_j wv_j·x_ij from
    a (bucket, wv) weight DataFrame — the quantity every downstream
    gate should threshold on (s ≥ 0 ⇔ σ ≥ ½ exactly; thresholding the
    rounded float probability instead invites boundary flips). One
    broadcast join against the dim-bounded weight table."""
    return (
        feats.join(F.broadcast(weights_df), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("wv") * F.col("x")).cast("long").alias("s"))
    )


def train_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    labels: DataFrame,
    dim: int = HASH_DIM,
    n_iters: int = 8,
    lr_micro: int = 2 * MICRO,
) -> dict[int, int]:
    """Full-batch gradient descent → {bucket: weight_micro}.

    Per iteration (all joins broadcast the dim-sized weight table —
    the corpus-sized feature table never reshuffles):

        s_i   = Σ_j w_j·x_ij                      (exact int64 µ-units)
        r_i   = round(1e6·(σ(s_i/1e6) − y_i))     (one float op per doc)
        g_j   = Σ_i r_i·x_ij                      (exact int64)
        w_j  −= lr·g_j div (1e6·n_docs)           (integer update)

    Deterministic under any partitioning — see module docstring."""
    feats = persist_intermediate(
        hashed_ngram_features(df, id_col, text_col, dim)
    )
    lab = persist_intermediate(
        labels.select(F.col(id_col), F.col("y").cast("long").alias("y"))
    )
    return _train_on_feats(
        feats, lab, id_col, dim, n_iters, lr_micro, df.sparkSession
    )


def _train_on_feats(
    feats: DataFrame,
    lab: DataFrame,
    id_col: str,
    dim: int,
    n_iters: int,
    lr_micro: int,
    spark,
) -> dict[int, int]:
    """The shared full-batch GD loop over a prebuilt feature table —
    factored out so one-vs-rest multiclass training (lang-ID) reuses
    the SAME persisted features for every class instead of rebuilding
    the corpus-sized table per language."""
    n_docs = lab.count()
    if n_docs == 0:
        return {}
    weights = {b: 0 for b in range(dim)}
    for _ in range(n_iters):
        wdf = spark.createDataFrame(
            [(b, w) for b, w in weights.items() if w != 0] or [(0, 0)],
            "bucket long, w long",
        )
        margins = (
            feats.join(F.broadcast(wdf), "bucket", "left")
            .groupBy(id_col)
            .agg(
                F.sum(F.coalesce("w", F.lit(0)) * F.col("x"))
                .cast("long")
                .alias("s")
            )
        )
        # residual from the doc's own exact margin: one float sigmoid
        # per doc, rounded to µ-units before the distributed Σ
        resid = (
            lab.join(margins, id_col, "left")
            .select(
                id_col,
                F.round(
                    MICRO
                    * (
                        F.lit(1.0)
                        / (
                            1.0
                            + F.exp(
                                -F.coalesce("s", F.lit(0)).cast("double")
                                / MICRO
                            )
                        )
                        - F.col("y")
                    ),
                    0,
                )
                .cast("long")
                .alias("r"),
            )
        )
        grad = (
            feats.join(resid, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("r") * F.col("x")).cast("long").alias("g"))
            .collect()
        )
        for row in grad:
            b, g = int(row["bucket"]), int(row["g"])
            weights[b] = weights[b] - (lr_micro * g) // (MICRO * n_docs)
    return {b: w for b, w in weights.items() if w != 0}


def classifier_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[int, int],
    dim: int = HASH_DIM,
    out: str = "clf_prob",
) -> DataFrame:
    """Apply trained weights → df + (out): σ(Σ w_j·x_ij / 1e6) rounded
    to 6 — the deployable filter score, one broadcast join against the
    dim-sized weight table."""
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(int(b), int(w)) for b, w in weights.items()] or [(0, 0)],
        "bucket long, w long",
    )
    feats = hashed_ngram_features(df, id_col, text_col, dim)
    s = (
        feats.join(F.broadcast(wdf), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce("w", F.lit(0)) * F.col("x"))
            .cast("long")
            .alias("_s")
        )
    )
    return (
        df.join(s, id_col, "left")
        .withColumn(
            out,
            F.round(
                1.0
                / (
                    1.0
                    + F.exp(
                        -F.coalesce("_s", F.lit(0)).cast("double") / MICRO
                    )
                ),
                6,
            ),
        )
        .drop("_s")
    )


def train_langid_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    langs: list[str] | None = None,
    n: int = 3,
    dim: int = HASH_DIM,
    n_iters: int = 8,
    lr_micro: int = 2 * MICRO,
) -> dict[str, dict[int, int]]:
    """TRAINED language-ID (VERDICT r6 item 4): one-vs-rest logistic
    regression over hashed character ``n``-gram counts — the
    langid.py / fastText-textcat shape — on the engine's exact-integer
    training machinery, so the learned weights are bit-identical under
    any partitioning (the same determinism contract as
    :func:`train_quality_classifier`).

    Returns ``{lang: {bucket: weight_micro}}``.  The char-n-gram
    feature table is built and persisted ONCE and shared by every
    class's training loop (K classes cost K dim-sized iterations, one
    corpus scan).  This is the trained upgrade path behind the
    stopword heuristic ``functions/text.py lang_id``: score with
    :func:`langid_predict`, which falls back to nothing — texts with
    no features keep NULL/'und'."""
    base = df.filter(
        F.col(text_col).isNotNull() & F.col(label_col).isNotNull()
    )
    if langs is None:
        langs = sorted(
            r[0]
            for r in base.select(label_col).distinct().collect()
        )
    feats = persist_intermediate(
        hashed_char_ngram_features(base, id_col, text_col, n=n, dim=dim)
    )
    out: dict[str, dict[int, int]] = {}
    for lang in langs:
        lab = persist_intermediate(
            base.select(
                F.col(id_col),
                (F.col(label_col) == lang).cast("long").alias("y"),
            )
        )
        out[lang] = _train_on_feats(
            feats, lab, id_col, dim, n_iters, lr_micro, df.sparkSession
        )
    return out


def langid_predict(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights_by_lang: dict[str, dict[int, int]],
    n: int = 3,
    dim: int = HASH_DIM,
    out: str = "pred_lang",
    fallback: str = "und",
) -> DataFrame:
    """Apply a trained one-vs-rest lang-ID model: per-language exact
    int64 margins via ONE broadcast join against the (lang, bucket, w)
    table, argmax with (margin desc, lang asc) tie-break — fully
    deterministic, like the heuristic it upgrades.  Texts producing no
    features (NULL / shorter than ``n``) get ``fallback``.

    Scale shape: feature explode + one broadcast join + two hash
    aggregations keyed on the doc id; the weight table is
    |langs|·dim bounded.  No Python in the scoring path."""
    spark = df.sparkSession
    rows = [
        (lang, int(b), int(w))
        for lang, ws in weights_by_lang.items()
        for b, w in ws.items()
    ]
    if not rows:
        return df.withColumn(out, F.lit(fallback))
    wdf = spark.createDataFrame(rows, "lang string, bucket long, w long")
    feats = hashed_char_ngram_features(df, id_col, text_col, n=n, dim=dim)
    margins = (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy(id_col, "lang")
        .agg(F.sum(F.col("w") * F.col("x")).cast("long").alias("s"))
    )
    best = margins.groupBy(id_col).agg(
        F.min_by(
            "lang", F.struct((-F.col("s")).alias("_ns"), F.col("lang"))
        ).alias("_pred")
    )
    return df.join(best, id_col, "left").withColumn(
        out, F.coalesce(F.col("_pred"), F.lit(fallback))
    ).drop("_pred")


def auc_of_scores(scored: DataFrame, prob_col: str, label_col: str) -> float:
    """Exact ROC-AUC via the rank-sum (Mann–Whitney) identity with
    midrank tie handling — one window-free computation: group by
    score, cumulative counts via aggregate-then-join (bounded by
    |distinct scores|). Driver scalar for tests."""
    by_s = (
        scored.groupBy(prob_col)
        .agg(
            F.count_if(F.col(label_col) == 1).cast("long").alias("np"),
            F.count_if(F.col(label_col) == 0).cast("long").alias("nn"),
        )
        .orderBy(prob_col)
        .collect()
    )
    n_pos = sum(r["np"] for r in by_s)
    n_neg = sum(r["nn"] for r in by_s)
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    below = 0  # negatives with strictly lower score
    u = 0.0
    for r in by_s:
        u += r["np"] * (below + r["nn"] / 2.0)
        below += r["nn"]
    return u / (n_pos * n_neg)


def calibration_bins(
    scored: DataFrame,
    margin_col: str,
    label_col: str,
    bin_micro: int = 500_000,
    clamp: int = 4,
) -> DataFrame:
    """Reliability table for a margin-scored classifier → one row per
    margin bin: (bin, n, mean_pred, pos_rate, gap).

    Bins are INTEGER floors of the exact µ-unit margin
    (floor(s / bin_micro), clamped to ±clamp) — never the rounded
    probability, so no float sits on a bin boundary (the
    no-float-boundary discipline; s is an exact int64). Per bin:
    mean predicted probability (σ(s/1e6), one double sum — grain
    ~1e-13 under round-6), the empirical positive rate as a TRUNCATED
    micro-unit integer ratio (identical doubles by construction), and
    |gap|, the per-bin calibration error whose n-weighted sum is ECE.

    Scale: one |rows| map pass + a ≤(2·clamp+1)-row hash aggregate —
    map-side combined, nothing driver-sized."""
    s = F.col(margin_col).cast("long")
    b = F.greatest(
        F.lit(-clamp),
        F.least(
            F.lit(clamp),
            F.floor(s.cast("double") / F.lit(float(bin_micro))).cast("long"),
        ),
    )
    prob = 1.0 / (1.0 + F.exp(-s.cast("double") / F.lit(float(MICRO))))
    g = (
        scored.select(
            b.alias("bin"),
            prob.alias("_p"),
            F.col(label_col).cast("long").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_p").alias("_sp"),
            F.sum("_y").cast("long").alias("_pos"),
        )
    )
    mean_pred = F.round(F.col("_sp") / F.col("n"), 6)
    pos_rate = (
        F.expr("CAST((1000000 * _pos) div n AS BIGINT)") / F.lit(1e6)
    )
    return g.select(
        "bin",
        "n",
        mean_pred.alias("mean_pred"),
        pos_rate.alias("pos_rate"),
        F.round(F.abs(mean_pred - pos_rate), 6).alias("gap"),
    ).orderBy("bin")
