"""Round-6 semantic tests: trained quality classifier (integer-exact
distributed training), plus the distributed prefix-sum operator."""

from __future__ import annotations

from pyspark.sql import functions as F


def _planted_docs(spark):
    """40 docs in two planted classes: 'good' docs use a clean
    vocabulary, 'spam' docs a disjoint spammy one — linearly separable
    in hashed n-gram space, so a working trainer must reach high AUC."""
    good_words = ["the", "quick", "brown", "fox", "jumps", "analysis",
                  "report", "summary", "data", "result"]
    spam_words = ["buy", "cheap", "now", "click", "winner", "free",
                  "offer", "deal", "prize", "cash"]
    rows = []
    for i in range(20):
        rows.append(
            (i, " ".join(good_words[(i + j) % 10] for j in range(12)), 1)
        )
    for i in range(20, 40):
        rows.append(
            (i, " ".join(spam_words[(i + j) % 10] for j in range(12)), 0)
        )
    return spark.createDataFrame(rows, "doc_id long, text string, y long")


def test_classifier_trains_separates_and_is_partitioning_independent(spark):
    """The full-batch integer-µ-unit trainer must (a) separate the
    planted classes (AUC ≥ 0.95), (b) learn IDENTICAL weights under
    any input partitioning — the module's exact-arithmetic claim —
    and (c) score through the recipe-stage surface."""
    from gcs_parquet_dataflow_spark.operators.classifier import (
        auc_of_scores,
        classifier_scores,
        train_quality_classifier,
    )
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )

    docs = _planted_docs(spark)
    labels = docs.select("doc_id", "y")
    w = train_quality_classifier(
        docs, "doc_id", "text", labels, dim=256, n_iters=6
    )
    release_intermediates()
    assert w, "trainer returned no weights"
    w2 = train_quality_classifier(
        docs.repartition(13), "doc_id", "text", labels.repartition(3),
        dim=256, n_iters=6,
    )
    release_intermediates()
    assert w == w2  # bit-identical training under re-partitioning

    scored = classifier_scores(docs, "doc_id", "text", w, dim=256)
    auc = auc_of_scores(scored, "clf_prob", "y")
    assert auc >= 0.95, auc
    # scores are calibrated in direction: mean good > mean spam
    means = scored.groupBy("y").agg(F.avg("clf_prob").alias("m")).collect()
    by_y = {r["y"]: r["m"] for r in means}
    assert by_y[1] > by_y[0]

    # recipe-stage surface: same scores, plus the gate
    from gcs_parquet_dataflow_spark.plans.recipe import compile_recipe

    recipe = [
        {"op": "classifier_score",
         "weights": {str(b): v for b, v in w.items()},
         "dim": 256, "out": "clf_prob", "min_prob": 0.5},
    ]
    gated = compile_recipe(docs, recipe, id_col="doc_id", text_col="text")
    kept = {r["doc_id"] for r in gated.select("doc_id").collect()}
    good = set(range(20))
    # the gate keeps mostly good docs (AUC-consistent)
    assert len(kept & good) >= 18 and len(kept - good) <= 2


def test_gradient_at_zero_matches_hand_computation(spark):
    """grad_x2 = Σ (1 − 2y)·x on a fixture small enough to enumerate:
    one positive doc 'a a b', one negative doc 'a c' (dim large enough
    that the grams don't collide)."""
    from gcs_parquet_dataflow_spark.functions.text import hash32
    from gcs_parquet_dataflow_spark.operators.classifier import (
        gradient_at_zero,
        hashed_ngram_features,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    labels = spark.createDataFrame([(1, 1), (2, 0)], "doc_id long, y long")
    dim = 1 << 20
    feats = hashed_ngram_features(docs, "doc_id", "text", dim=dim)
    got = {
        r["bucket"]: r["grad_x2"]
        for r in gradient_at_zero(feats, labels, "doc_id").collect()
    }
    hb = {
        g: r["h"]
        for g, r in (
            (g, spark.range(1).select(
                (hash32(F.lit(g)) % dim).alias("h")).first())
            for g in ["a", "b", "c", "a a", "a b", "a c"]
        )
    }
    # doc1 (y=1, sign −1): a×2, b×1, 'a a'×1, 'a b'×1
    # doc2 (y=0, sign +1): a×1, c×1, 'a c'×1
    expect = {
        hb["a"]: -2 + 1,
        hb["b"]: -1,
        hb["a a"]: -1,
        hb["a b"]: -1,
        hb["c"]: 1,
        hb["a c"]: 1,
    }
    assert got == expect


def test_global_prefix_sum_exact(spark):
    """global_prefix_sum equals the single-window running sum under
    the same total order, for any partitioning and num_partitions."""
    from pyspark.sql import Window as W

    from gcs_parquet_dataflow_spark.operators.partitioning import (
        global_prefix_sum,
        release_intermediates,
    )

    df = spark.createDataFrame(
        [(i, (i * 37) % 101, (i * 13) % 7 + 1) for i in range(500)],
        "k long, ord long, val long",
    )
    expected = {
        r["k"]: r["cum"]
        for r in df.withColumn(
            "cum",
            F.sum("val").over(
                W.orderBy("ord", "k").rowsBetween(
                    W.unboundedPreceding, W.currentRow
                )
            ),
        ).collect()
    }
    for parts in (2, 7):
        got = {
            r["k"]: r["cum"]
            for r in global_prefix_sum(
                df.repartition(parts),
                ["ord", "k"],
                "val",
                num_partitions=parts + 3,
            ).collect()
        }
        release_intermediates()
        assert got == expected
