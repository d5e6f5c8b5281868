"""Round-7 guard and consolidation tests: the VERDICT r6 / ADVICE r6
closures — oracle_check failing loudly on unknown query names, the
quota_per_key temp-column collision guard, the em_weight_step int64
field-count bound, and the epoch-allocation integer-div/zero-token
semantics."""

from __future__ import annotations

import subprocess
import sys

import pytest
from pyspark.sql import functions as F


def test_oracle_check_unknown_name_fails_loudly():
    """VERDICT r6 item 4: a typo'd query name passed to oracle_check
    must FAIL (non-zero exit), never a clean "N pass" line.  Parse the
    module's name-diff logic without paying a Spark session: run the
    tool against a name that matches nothing and assert the process
    exits non-zero with the unknown name reported."""
    proc = subprocess.run(
        [
            sys.executable,
            "/root/repo/tools/oracle_check.py",
            "/root/testdata/sf0.001",
            "this_query_does_not_exist",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode != 0
    assert "this_query_does_not_exist" in proc.stdout
    assert "unknown query name" in proc.stdout
    assert "0 pass" in proc.stdout


def test_quota_per_key_rejects_reserved_column(spark):
    """ADVICE r6: an input already carrying _quota_rn must raise, not be
    silently overwritten then dropped (the __ds_h footgun class)."""
    from gcs_parquet_dataflow_spark.operators.sampling import quota_per_key

    df = spark.range(10).select(
        F.lit("k").alias("k"), F.col("id").alias("_quota_rn")
    )
    with pytest.raises(ValueError, match="_quota_rn"):
        quota_per_key(df, ["k"], 3, [F.col("_quota_rn")])


def test_em_weight_step_field_count_bound(spark):
    """ADVICE r6: micro·10·9^K must stay under 2^63 — K=12 is the
    int64-exact bound at micro=1e6; 13 fields must raise, 12 must run."""
    from gcs_parquet_dataflow_spark.operators import linkage

    df = spark.createDataFrame([(1, 1)], "a long, b long")
    ok = [(f"f{i}", F.col("a") == F.col("b")) for i in range(12)]
    out = linkage.em_weight_step(df, ok)
    assert out.count() == 12

    too_many = [(f"f{i}", F.col("a") == F.col("b")) for i in range(13)]
    with pytest.raises(ValueError, match="int64-exact bound"):
        linkage.em_weight_step(df, too_many)

    # smaller micro admits more fields (the bound scales with micro)
    out2 = linkage.em_weight_step(df, too_many, micro=1_000)
    assert out2.count() == 13


def test_dp_release_noise_scale_matches_epsilon_over_delta(spark):
    """The deterministic Laplace draws must actually BE Laplace(Δ/ε):
    over many group keys, mean |noise| ≈ b = Δ/ε (Laplace E|X| = b) and
    the |noise| median ≈ b·ln 2, within statistical tolerance.  A wrong
    inverse CDF or a mis-scaled b fails these immediately."""
    import math

    from gcs_parquet_dataflow_spark.operators.privacy import (
        dp_release_counts,
    )

    # 4000 groups, one unit each → clamped_count = 1 per group
    df = spark.range(4000).select(
        F.col("id").cast("string").alias("g"), F.lit("u").alias("unit")
    )
    rel = dp_release_counts(
        df, ["g"], "unit", epsilon=0.5, contribution_cap=8,
        include_internals=True,
    )
    b = 8 / 0.5
    stats = rel.agg(
        F.avg(F.abs(F.col("noise"))).alias("mean_abs"),
        F.expr("percentile(abs(noise), 0.5)").alias("med_abs"),
        F.max(F.col("clamped_count")).alias("maxc"),
    ).first()
    # Laplace: E|X| = b, median|X| = b·ln2; stderr of mean ≈ b/√n ≈ 0.25
    assert abs(stats["mean_abs"] - b) < 4 * b / math.sqrt(4000)
    assert abs(stats["med_abs"] - b * math.log(2)) < 1.0
    assert stats["maxc"] == 1
    # epsilon accounting columns ride every row
    row = rel.first()
    assert row["epsilon"] == 0.5
    assert row["sensitivity"] == 8
    assert row["noise_scale"] == b


def test_dp_release_clamp_conservation_and_neighbor_bound(spark):
    """Contribution clamping is the sensitivity proof: (a) the clamped
    count equals Σ min(c_u, Δ) exactly; (b) removing ONE unit changes
    the clamped count by at most Δ — the neighboring-dataset bound the
    ε guarantee rests on."""
    from gcs_parquet_dataflow_spark.operators.privacy import (
        dp_release_counts,
    )

    rows = [("g1", "heavy")] * 50 + [("g1", "light")] * 2 + [
        ("g2", "only")
    ] * 3
    df = spark.createDataFrame(rows, "g string, unit string")
    rel = {
        r["g"]: r
        for r in dp_release_counts(
            df, ["g"], "unit", epsilon=1.0, contribution_cap=5,
            include_internals=True,
        ).collect()
    }
    assert rel["g1"]["clamped_count"] == 5 + 2  # heavy clamped 50→5
    assert rel["g2"]["clamped_count"] == 3
    # neighbor: drop the heavy unit entirely → change ≤ Δ
    rel2 = {
        r["g"]: r
        for r in dp_release_counts(
            df.filter(F.col("unit") != "heavy"),
            ["g"], "unit", epsilon=1.0, contribution_cap=5,
            include_internals=True,
        ).collect()
    }
    delta = rel["g1"]["clamped_count"] - rel2["g1"]["clamped_count"]
    assert 0 <= delta <= 5
    # same group key + seed → identical noise draw on both datasets
    assert rel["g1"]["noise"] == rel2["g1"]["noise"]


def test_dp_release_deterministic_and_seed_sensitive(spark):
    """Releases are pure functions of (data, seed, ε, Δ): identical
    under repartitioning, different under a different seed."""
    from gcs_parquet_dataflow_spark.operators.privacy import (
        dp_release_counts,
        dp_release_sums,
    )

    df = spark.range(300).select(
        (F.col("id") % 7).cast("string").alias("g"),
        (F.col("id") % 31).cast("string").alias("unit"),
        (F.col("id") % 100).cast("long").alias("v"),
    )
    a = sorted(
        dp_release_counts(df, ["g"], "unit", 0.5, 3).collect()
    )
    b = sorted(
        dp_release_counts(
            df.repartition(13), ["g"], "unit", 0.5, 3
        ).collect()
    )
    assert a == b
    c = sorted(
        dp_release_counts(
            df, ["g"], "unit", 0.5, 3, seed="other-seed"
        ).collect()
    )
    assert [r["released"] for r in a] != [r["released"] for r in c]

    # sums: per-unit value clamped to ±cap before the group sum
    s = {
        r["g"]: r
        for r in dp_release_sums(
            df, ["g"], "unit", "v", 0.25, 50, include_internals=True
        ).collect()
    }
    raw = {
        r["g"]: r["cs"]
        for r in df.groupBy("g", "unit")
        .agg(F.sum("v").alias("uv"))
        .groupBy("g")
        .agg(
            F.sum(
                F.greatest(F.least(F.col("uv"), F.lit(50)), F.lit(-50))
            ).alias("cs")
        )
        .collect()
    }
    for g, r in s.items():
        assert r["clamped_sum"] == raw[g]


def test_dp_release_recipe_stage_equals_operator(spark):
    from gcs_parquet_dataflow_spark.operators.privacy import (
        dp_release_counts,
    )
    from gcs_parquet_dataflow_spark.plans.recipe import compile_recipe

    df = spark.createDataFrame(
        [("d1", "s1"), ("d2", "s1"), ("d3", "s2")],
        "doc_id string, source string",
    )
    got = sorted(
        compile_recipe(
            df, [{"op": "dp_release", "epsilon": 0.5}]
        ).collect()
    )
    want = sorted(
        dp_release_counts(df, ["source"], "doc_id", 0.5, 1).collect()
    )
    assert got == want


def _langid_fixture(spark):
    """Deterministic labeled multilingual corpus with REAL language
    signal: each language has a distinctive content vocabulary that is
    NOT in the heuristic's tiny stopword lists, and every even-indexed
    doc carries a misleading English 'the' — so the stopword heuristic
    predicts 'en' or 'und' everywhere while a trained char-n-gram
    model can read the orthography.  (The documents.parquet lang label
    is synthetic NOISE by design — lang_id_confusion_matrix docstring —
    so beating the heuristic there would only measure memorization;
    this fixture measures learning.)"""
    vocab = {
        "en": ["house", "water", "morning", "people", "working"],
        "es": ["casa", "agua", "manana", "gente", "trabajo"],
        "de": ["haus", "wasser", "morgen", "leute", "arbeit"],
        "fr": ["maison", "eau", "matin", "gens", "travail"],
    }
    rows = []
    for lang, words in vocab.items():
        for i in range(80):
            toks = [words[(i + j) % 5] for j in range(12)]
            if i % 2 == 0:
                toks.append("the")
            rows.append((f"{lang}-{i}", lang, " ".join(toks)))
    return spark.createDataFrame(
        rows, "doc_id string, lang string, text string"
    )


def test_trained_langid_beats_stopword_heuristic(spark):
    """VERDICT r6 item 4's 'done' bar: the trained one-vs-rest char
    trigram classifier must beat the stopword heuristic where language
    signal exists."""
    from gcs_parquet_dataflow_spark.functions.text import lang_id
    from gcs_parquet_dataflow_spark.operators.classifier import (
        langid_predict,
        train_langid_classifier,
    )

    d = _langid_fixture(spark)
    n = d.count()
    heur_acc = (
        d.select(
            (lang_id(F.col("text")) == F.col("lang"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.sum("ok"))
        .first()[0]
        / n
    )
    weights = train_langid_classifier(d, "doc_id", "text", "lang")
    trained_acc = (
        langid_predict(d, "doc_id", "text", weights)
        .select(
            (F.col("pred_lang") == F.col("lang")).cast("int").alias("ok")
        )
        .agg(F.sum("ok"))
        .first()[0]
        / n
    )
    # heuristic can at best get the 'the'-carrying English docs right
    assert heur_acc <= 0.3
    assert trained_acc > heur_acc + 0.3
    assert trained_acc >= 0.9


def test_langid_predict_deterministic_and_fallback(spark):
    """Deploy-path invariants: partitioning-independent argmax with
    the (margin desc, lang asc) tie-break, and texts with no features
    (NULL / shorter than n) fall back to 'und'."""
    from gcs_parquet_dataflow_spark.operators.classifier import (
        langid_predict,
        train_langid_classifier,
    )

    d = _langid_fixture(spark)
    w = train_langid_classifier(
        d, "doc_id", "text", "lang", n_iters=2
    )
    a = sorted(
        langid_predict(d, "doc_id", "text", w)
        .select("doc_id", "pred_lang")
        .collect()
    )
    b = sorted(
        langid_predict(d.repartition(17), "doc_id", "text", w)
        .select("doc_id", "pred_lang")
        .collect()
    )
    assert a == b
    edge = spark.createDataFrame(
        [("e1", None), ("e2", "ab")], "doc_id string, text string"
    )
    got = {
        r["doc_id"]: r["pred_lang"]
        for r in langid_predict(edge, "doc_id", "text", w).collect()
    }
    assert got == {"e1": "und", "e2": "und"}


def test_lang_annotate_weights_stage_and_streamable_guard(spark):
    """The recipe stage's trained path equals langid_predict, and the
    trained variant is rejected by the streamable validator (it joins
    aggregation state back — no longer a pure scan-stage map)."""
    import pytest as _pytest

    from gcs_parquet_dataflow_spark.operators.classifier import (
        langid_predict,
        train_langid_classifier,
    )
    from gcs_parquet_dataflow_spark.plans.recipe import (
        RecipeError,
        compile_recipe,
        validate_streamable,
    )

    d = _langid_fixture(spark)
    w = train_langid_classifier(d, "doc_id", "text", "lang", n_iters=2)
    stage = [{"op": "lang_annotate", "weights": w, "out": "pred_lang"}]
    got = sorted(
        compile_recipe(d, stage).select("doc_id", "pred_lang").collect()
    )
    want = sorted(
        langid_predict(d, "doc_id", "text", w)
        .select("doc_id", "pred_lang")
        .collect()
    )
    assert got == want
    with _pytest.raises(RecipeError, match="lang_annotate"):
        validate_streamable(stage)
    # the heuristic form stays streamable
    validate_streamable([{"op": "lang_annotate"}])


_V5_RECIPE = [
    {"op": "encoding_gate"},
    {"op": "token_stats", "out": "n_tokens"},
    {"op": "quality_annotate", "out": "quality"},
    {"op": "curriculum_annotate", "hi": 0.75, "lo": 0.5,
     "out": "stage", "shuffle_out": "shuffle_key"},
    {"op": "epoch_allocation", "max_extra": 3, "out": "epochs"},
    {"op": "manifest", "out": "position", "top_k": 50},
]


def test_incremental_recipe_equals_full_recompute(spark, tmp_path):
    """VERDICT r6 item 5's 'done' bar: training_data_pipeline_v5's
    recipe shape, run incrementally over ledger batches with merged
    state, must produce EXACTLY the full one-shot manifest — and the
    merged stats snapshot must equal a direct aggregate of the curated
    lake (the mergeable-carrier invariant). Also batch-split
    invariance: 2 batches and 5 batches give the same finalize."""
    from gcs_parquet_dataflow_spark.catalog import load_table
    from gcs_parquet_dataflow_spark.plans.incremental_recipe import (
        batch_source_stats,
        finalize_manifest,
        ledger_batches,
        run_incremental_batch,
    )
    from gcs_parquet_dataflow_spark.plans.recipe import compile_recipe

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = sorted(compile_recipe(docs, _V5_RECIPE).collect())

    results = {}
    for n_batches in (2, 5):
        state = str(tmp_path / f"state{n_batches}")
        for bid, batch in ledger_batches(docs, n_batches):
            run_incremental_batch(
                spark, batch, _V5_RECIPE, state, bid
            )
        results[n_batches] = sorted(
            finalize_manifest(spark, _V5_RECIPE, state).collect()
        )
        # merged stats snapshot == direct aggregate of the lake (exact
        # int64 carriers — order/batching cannot perturb them)
        lake = spark.read.parquet(f"{state}/curated").drop("_batch_id")
        direct = {
            r["source"]: (r["n"], r["tokens"], r["q_micro"])
            for r in batch_source_stats(lake).collect()
        }
        snap = spark.read.parquet(f"{state}/stats")
        last = snap.agg(F.max("_batch_id")).first()[0]
        merged = {
            r["source"]: (r["n"], r["tokens"], r["q_micro"])
            for r in snap.filter(F.col("_batch_id") == last).collect()
        }
        assert merged == direct

    assert results[2] == full
    assert results[5] == full


def test_incremental_recipe_batch_replay_idempotent(spark, tmp_path):
    """Replaying a batch id (the streaming failure mode) must leave
    both the curated lake and the stats snapshot unchanged — the
    batch-keyed dynamic-overwrite + predecessor-merge contract."""
    from gcs_parquet_dataflow_spark.catalog import load_table
    from gcs_parquet_dataflow_spark.plans.incremental_recipe import (
        finalize_manifest,
        ledger_batches,
        run_incremental_batch,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    state = str(tmp_path / "state")
    batches = ledger_batches(docs, 3)
    for bid, batch in batches:
        run_incremental_batch(spark, batch, _V5_RECIPE, state, bid)
    before = sorted(finalize_manifest(spark, _V5_RECIPE, state).collect())
    # replay the LAST batch (its stats merge must re-derive from the
    # predecessor snapshot, not double-count)
    bid, batch = batches[-1]
    run_incremental_batch(spark, batch, _V5_RECIPE, state, bid)
    after = sorted(finalize_manifest(spark, _V5_RECIPE, state).collect())
    assert after == before
    snap = spark.read.parquet(f"{state}/stats")
    last = snap.agg(F.max("_batch_id")).first()[0]
    n_docs = docs.count()
    total_n = (
        snap.filter(F.col("_batch_id") == last)
        .agg(F.sum("n"))
        .first()[0]
    )
    # every non-gated doc counted exactly once
    assert total_n <= n_docs
    lake_n = (
        spark.read.parquet(f"{state}/curated").count()
    )
    assert total_n == lake_n


def test_incremental_recipe_rejects_corpus_level_prefix(spark):
    """A recipe whose corpus-level stage is NOT deferrable (dedup /
    decontaminate) must fail at split time with a pointer to the
    streaming index path."""
    import pytest as _pytest

    from gcs_parquet_dataflow_spark.plans.incremental_recipe import (
        split_recipe,
    )
    from gcs_parquet_dataflow_spark.plans.recipe import RecipeError

    ok_prefix, ok_suffix = split_recipe(_V5_RECIPE)
    assert [e["op"] for e in ok_suffix] == [
        "epoch_allocation", "manifest",
    ]
    with _pytest.raises(RecipeError, match="streaming index"):
        split_recipe(
            [{"op": "token_stats"}, {"op": "dedup_exact"},
             {"op": "manifest"}]
        )


def test_bmp_roundtrip_and_real_resize():
    """The REAL uncompressed-image path (no codec): encode → decode
    recovers exact dims and channel sums including the padded-stride
    case (w=3 → row 9 bytes, 3 pad); nearest-neighbor resize_bmp
    produces a valid BMP whose pixels match the integer index map."""
    import numpy as np

    from gcs_parquet_dataflow_spark.operators.multimodal import (
        bmp_bytes,
        decode_bmp,
        resize_bmp,
    )

    rng = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(5, 3, 3)
    payload = bmp_bytes(rng)
    meta = decode_bmp(payload)
    assert (meta["width"], meta["height"], meta["bpp"]) == (3, 5, 24)
    assert meta["sum_r"] == int(rng[:, :, 0].sum())
    assert meta["sum_g"] == int(rng[:, :, 1].sum())
    assert meta["sum_b"] == int(rng[:, :, 2].sum())

    up = resize_bmp(payload, 6, 10)
    meta2 = decode_bmp(up)
    assert (meta2["width"], meta2["height"]) == (6, 10)
    # nearest-neighbor with i_src = i_dst*src//dst duplicates each
    # pixel exactly 2x2 → sums quadruple
    assert meta2["sum_r"] == 4 * meta["sum_r"]
    assert meta2["sum_b"] == 4 * meta["sum_b"]
    down = decode_bmp(resize_bmp(payload, 1, 1))
    assert (down["width"], down["height"]) == (1, 1)
    assert down["sum_r"] == int(rng[0, 0, 0])

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"\x89PNG----------------------------------------------------")


def test_wav_roundtrip_and_dispatch(spark):
    """PCM16 WAV encode → decode recovers channel/rate/count and exact
    integer signal stats; the mapInPandas dispatch routes BMP/WAV to
    the real decoders and unknown bytes to kind='opaque' with NULLs
    instead of failing the batch."""
    import numpy as np

    from gcs_parquet_dataflow_spark.operators.multimodal import (
        bmp_bytes,
        decode_uncompressed_features,
        decode_wav,
        wav_bytes,
    )

    s = np.array([0, 100, -200, 32767, -32768], dtype="<i2")
    meta = decode_wav(wav_bytes(s, sample_rate=44100))
    assert meta["n_channels"] == 1
    assert meta["sample_rate"] == 44100
    assert meta["n_samples"] == 5
    assert meta["sum_abs"] == 0 + 100 + 200 + 32767 + 32768
    assert meta["peak"] == 32768

    bmp = bmp_bytes(np.full((2, 2, 3), 7, dtype=np.uint8))
    rows = spark.createDataFrame(
        [
            (1, bytearray(bmp)),
            (2, bytearray(wav_bytes(s))),
            (3, bytearray(b"\xff\xd8\xffJPEG-like")),
        ],
        "media_id long, payload binary",
    )
    got = {
        r["media_id"]: r
        for r in decode_uncompressed_features(rows).collect()
    }
    assert got[1]["kind"] == "bmp" and got[1]["sum_r"] == 4 * 7
    assert got[2]["kind"] == "wav" and got[2]["peak"] == 32768
    assert got[3]["kind"] == "opaque" and got[3]["width"] is None


def test_tfidf_budget_cap_is_monotone_subset(spark):
    """The PairBudgetCap'd TF-IDF pair join may only LOSE pairs, never
    invent them: every tf·idf weight is ≥ 0, so the capped dot is a
    lower bound and the ≥0.9 pair set shrinks monotonically; and at
    non-binding scale the capped row must equal the uncapped row
    exactly."""
    from gcs_parquet_dataflow_spark.queries.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in CATALOG["text_tfidf_cosine_pairs"].build(spark, sf).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in CATALOG["text_tfidf_cosine_pairs_budget"]
        .build(spark, sf)
        .collect()
    }
    assert capped <= uncapped
    # budget 1e7 does not bind at sf0.001 → identical pair sets
    assert capped == uncapped


def test_byte_phash_scale_path_equals_column_form(spark):
    """with_byte_phash (explode + bit-packed sums) must produce the
    IDENTICAL sketch values as the phash_stub HOF Column form it
    replaces in the hot path — including the ≥1-gram empty-payload
    convention — and be invariant to input partitioning."""
    from gcs_parquet_dataflow_spark.operators.multimodal import (
        phash_stub,
        with_byte_phash,
    )

    rows = [
        (1, bytearray(b"hello world, this is payload one")),
        (2, bytearray(b"hello world, this is payload two")),
        (3, bytearray(b"")),
        (4, bytearray(b"abc")),
        (5, bytearray(bytes(range(256)) * 3)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    want = {
        r["media_id"]: r["ph"]
        for r in df.select(
            "media_id", phash_stub(F.col("payload")).alias("ph")
        ).collect()
    }
    got = {
        r["media_id"]: r["ph"]
        for r in with_byte_phash(df, "media_id", "payload").collect()
    }
    assert got == want
    got2 = {
        r["media_id"]: r["ph"]
        for r in with_byte_phash(
            df.repartition(7), "media_id", "payload"
        ).collect()
    }
    assert got2 == want


def test_epoch_allocation_zero_token_source_gets_base_epoch(spark):
    """ADVICE r6: a source whose token sum is 0 must get exactly the
    base epoch (no NULLs from div-by-zero), and the div path must agree
    with the old float-floor path on normal data."""
    from gcs_parquet_dataflow_spark.plans.recipe import compile_recipe

    df = spark.createDataFrame(
        [
            ("a", 100, 0.9),
            ("a", 50, 0.9),
            ("b", 0, 0.5),
            ("b", 0, 0.5),
            ("c", 10, 0.99),
        ],
        "source string, n_tokens long, quality double",
    )
    out = compile_recipe(
        df,
        [{"op": "epoch_allocation", "max_extra": 3}],
        id_col="source",
    )
    got = {
        r["source"]: r["epochs"]
        for r in out.select("source", "epochs").distinct().collect()
    }
    # zero-token source: base epoch only, never NULL
    assert got["b"] == 1
    assert all(v is not None for v in got.values())
    # corpus=160; c (best quality, 10 tokens) div → min(3,16)=3 extra
    assert got["c"] == 4


# ---------------------------------------------------------------------------
# Bloom filter (operators/sketches.py bloom_*)
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_merge_equivalence(spark):
    """Every inserted key must pass the probe (set bits are never
    cleared), shard-merge must equal the single-shot build word-for-
    word, and false positives on a generously-sized filter must be
    rare (theory: (1−e^(−kn/m))^k ≈ 5e-5 at n=100, m=8192, k=3)."""
    from gcs_parquet_dataflow_spark.operators import sketches as SK

    members = spark.range(100).select(F.col("id").alias("k"))
    others = spark.range(100, 300).select(F.col("id").alias("k"))
    sketch = SK.bloom_build(members, "k")

    probed = SK.bloom_probe(members.unionByName(others), sketch, "k")
    rows = {r["k"]: r["bloom_pass"] for r in probed.collect()}
    assert all(rows[k] for k in range(100)), "false negative!"
    fps = sum(1 for k in range(100, 300) if rows[k])
    assert fps <= 2, f"implausibly many false positives: {fps}"

    direct = SK.bloom_build(members.unionByName(others), "k")
    shards = [SK.bloom_build(members, "k"), SK.bloom_build(others, "k")]
    merged = SK.bloom_merge(shards)
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )
    # every packed word stays positive (63-bit layout, bit 63 unused)
    assert all(w >= 0 for _, w in merged.collect())


def test_bloom_probe_rejects_reserved_columns(spark):
    from gcs_parquet_dataflow_spark.operators import sketches as SK

    members = spark.range(10).select(F.col("id").alias("k"))
    sketch = SK.bloom_build(members, "k")
    bad = members.withColumn("_bp0", F.lit(1))
    with pytest.raises(ValueError, match="reserved bloom columns"):
        SK.bloom_probe(bad, sketch, "k")
    # a keys_df carrying "word"/"word_idx" is fine in the row-preserving
    # probe (the sketch side is renamed per join)
    ok = members.withColumn("word", F.lit(1))
    assert SK.bloom_probe(ok, sketch, "k").filter("bloom_pass").count() == 10
    with pytest.raises(ValueError, match="no bloom filters"):
        SK.bloom_merge([])


# ---------------------------------------------------------------------------
# PNG codec (operators/multimodal.py png_bytes / decode_png)
# ---------------------------------------------------------------------------


def test_png_roundtrip_exact_and_guards():
    import numpy as np

    from gcs_parquet_dataflow_spark.operators import multimodal as MM

    rng = np.random.default_rng(42)
    for h, w in [(1, 1), (2, 3), (6, 9), (17, 5)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = MM.png_bytes(arr)
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        meta = MM.decode_png(blob)
        sums = arr.astype(np.int64).sum(axis=(0, 1))
        assert (meta["width"], meta["height"], meta["bpp"]) == (w, h, 24)
        assert (meta["sum_r"], meta["sum_g"], meta["sum_b"]) == tuple(
            map(int, sums)
        )
    # corrupted CRC must raise, not mis-decode
    bad = bytearray(MM.png_bytes(rng.integers(0, 256, (3, 3, 3), dtype=np.uint8)))
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        MM.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="not a PNG"):
        MM.decode_png(b"BM123456")


def test_png_encoder_filtered_bytes_match_spec():
    """Round-trip alone can hide a matched encoder/decoder bug (any
    self-inverse predictor pair cancels). Pin the encoder's FILTERED
    scanlines against PNG-spec arithmetic computed independently with
    scalar math here, for a hand-sized image exercising all 5 filter
    types — encoder conformance + exact round trip ⇒ decoder
    conformance."""
    import struct
    import zlib

    import numpy as np

    from gcs_parquet_dataflow_spark.operators import multimodal as MM

    rng = np.random.default_rng(7)
    h, w, bpp = 5, 2, 3
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    blob = MM.png_bytes(arr)
    # pull the IDAT chunk (single chunk in our encoder)
    pos = 8
    idat = None
    while pos + 12 <= len(blob):
        size = struct.unpack_from(">I", blob, pos)[0]
        if blob[pos + 4 : pos + 8] == b"IDAT":
            idat = blob[pos + 8 : pos + 8 + size]
        pos += 12 + size
    raw = zlib.decompress(idat)
    stride = w * bpp
    px = [[int(v) for v in arr[y].reshape(-1)] for y in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    expect = bytearray()
    for y in range(h):
        ft = y % 5
        expect.append(ft)
        for x in range(stride):
            cur = px[y][x]
            a = px[y][x - bpp] if x >= bpp else 0
            b = px[y - 1][x] if y >= 1 else 0
            c = px[y - 1][x - bpp] if (y >= 1 and x >= bpp) else 0
            pred = [0, a, b, (a + b) // 2, paeth(a, b, c)][ft]
            expect.append((cur - pred) % 256)
    assert raw == bytes(expect)


def test_bloom_prefilter_equivalent_dedup(spark, tmp_path):
    """dedup_batch_against_index with bloom_path must return EXACTLY the
    same survivors as without it (the bloom has no false negatives, so
    pre-filtering probes loses no true index collision), across batches
    with intra-batch dups, cross-batch dups, and an all-novel batch
    (the skip-the-index fast path)."""
    from gcs_parquet_dataflow_spark.operators.dedup import minhash_perms
    from gcs_parquet_dataflow_spark.operators.incremental import (
        dedup_batch_against_index,
    )

    perms = minhash_perms(num_perm=16, seed=7)
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    batches = [
        [(1, base), (2, base + " extra"), (3, "completely different words "
          "about spark adaptive execution and shuffle partitions tuning")],
        [(10, base), (11, "another fully novel document regarding parquet "
          "row group pruning and column statistics for data skipping")],
        [(20, "a third batch that is entirely novel text on broadcast "
          "joins and skew salting strategies for wide aggregations")],
    ]
    results = {}
    for variant, kwargs in [
        ("plain", {}),
        ("bloom", {"bloom_path": None}),  # path set per-variant below
    ]:
        idx = str(tmp_path / f"idx_{variant}")
        if variant == "bloom":
            kwargs = {"bloom_path": str(tmp_path / "bloomlake")}
        out = []
        for rows in batches:
            b = spark.createDataFrame(rows, "doc_id LONG, text STRING")
            s = dedup_batch_against_index(
                spark, b, "doc_id", "text", idx, perms, **kwargs
            )
            out.append(sorted(r["doc_id"] for r in s.collect()))
        results[variant] = out
    assert results["plain"] == results["bloom"], results
    # cross-batch dup (10 ~ 1) was dropped on both paths
    assert 10 not in results["bloom"][1]
    # the all-novel batch survived intact through the bloom fast path
    assert results["bloom"][2] == [20]


def test_calibration_bins_clamps_and_scores_perfect_separation(spark):
    """A perfectly-separated margin set: extreme margins clamp into the
    edge bins, σ saturates, and gap is ~0 when empirical rates match
    the saturated predictions (and large when labels are flipped)."""
    from gcs_parquet_dataflow_spark.operators.classifier import (
        calibration_bins,
    )

    rows = [(50_000_000, 1)] * 20 + [(-50_000_000, 0)] * 20
    df = spark.createDataFrame(rows, "m LONG, y LONG")
    out = {r["bin"]: r for r in calibration_bins(
        df, "m", "y", bin_micro=1_000_000, clamp=4
    ).collect()}
    assert set(out) == {-4, 4}          # clamped to the edge bins
    assert out[4]["n"] == 20 and out[4]["pos_rate"] == 1.0
    assert out[-4]["pos_rate"] == 0.0
    assert out[4]["gap"] < 1e-6 and out[-4]["gap"] < 1e-6

    flipped = spark.createDataFrame(
        [(50_000_000, 0)] * 20, "m LONG, y LONG"
    )
    bad = calibration_bins(flipped, "m", "y", 1_000_000, 4).collect()[0]
    assert bad["gap"] > 0.99            # confidently wrong → max gap


def test_bloom_armed_late_bootstraps_from_existing_index(spark, tmp_path):
    """The completeness invariant: arming bloom_path on a pipeline whose
    index ALREADY has history must not create false negatives — the
    bloom is bootstrapped from the full index, so duplicates of
    pre-bloom documents are still dropped (this exact scenario silently
    re-admitted the whole prior corpus before the round-7 review fix)."""
    from gcs_parquet_dataflow_spark.operators.dedup import minhash_perms
    from gcs_parquet_dataflow_spark.operators.incremental import (
        dedup_batch_against_index,
    )

    perms = minhash_perms(num_perm=16, seed=7)
    idx = str(tmp_path / "idx")
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    b1 = spark.createDataFrame([(1, base)], "doc_id LONG, text STRING")
    s1 = dedup_batch_against_index(
        spark, b1, "doc_id", "text", idx, perms  # NO bloom yet
    )
    assert [r["doc_id"] for r in s1.collect()] == [1]

    # now arm the bloom: a duplicate of pre-bloom doc 1 must still drop
    bloom = str(tmp_path / "bloomlake")
    b2 = spark.createDataFrame(
        [(10, base), (11, "entirely new words about catalyst pushdown "
                          "and adaptive shuffle partition coalescing")],
        "doc_id LONG, text STRING",
    )
    s2 = dedup_batch_against_index(
        spark, b2, "doc_id", "text", idx, perms, bloom_path=bloom
    )
    assert sorted(r["doc_id"] for r in s2.collect()) == [11]


def test_decode_dispatch_routes_malformed_magic_payloads_to_opaque(spark):
    """Malformed payloads that MATCH a magic prefix must row out as
    kind='opaque', not fail the batch: PNG magic + garbage chunks
    (struct.error), PNG with a CRC-valid header but corrupt DEFLATE
    body (zlib.error), truncated BMP/WAV (struct/ValueError)."""
    import struct as _st
    import zlib as _zl

    from gcs_parquet_dataflow_spark.operators import multimodal as MM

    def chunk(ctype, body):
        return (_st.pack(">I", len(body)) + ctype + body
                + _st.pack(">I", _zl.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = _st.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bad_deflate = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", b"\x00not-deflate\xff")
                   + chunk(b"IEND", b""))
    payloads = [
        (1, b"\x89PNG\r\n\x1a\n" + b"\x00\x00"),        # truncated chunks
        (2, bad_deflate),                                  # zlib.error
        (3, b"BM" + b"\x00" * 10),                        # truncated BMP
        (4, b"RIFF\x00\x00\x00\x00WAVE" + b"\x01"),      # chunkless WAV
        (5, MM.png_bytes([[[1, 2, 3]]])),                  # one GOOD png
    ]
    df = spark.createDataFrame(payloads, "media_id LONG, payload BINARY")
    out = {r["media_id"]: r for r in
           MM.decode_uncompressed_features(df).collect()}
    assert [out[i]["kind"] for i in (1, 2, 3, 4)] == ["opaque"] * 4
    assert out[5]["kind"] == "png" and out[5]["width"] == 1


@pytest.mark.overflow
def test_aqp_variance_accumulator_exact_past_int64(spark):
    """The y² accumulator must survive sums past 2^63 (the round-7
    review found the int64 form wraps silently around sf≈4 on Spark
    while DuckDB raises). Pin the fixed decimal path against exact
    Python integers in the overflow regime, and document that the old
    int64 form really does wrap there."""
    y = 2_500_000_000  # y² = 6.25e18, two of them > int64 max
    df = spark.createDataFrame([(y,), (y,), (y,)], "y LONG")
    dec = df.agg(
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("s")
    ).first()["s"]
    assert int(dec) == 3 * y * y  # exact: 1.875e19 > 9.22e18
    wrapped = df.agg(F.sum(F.col("y") * F.col("y")).alias("s")).first()["s"]
    assert wrapped != 3 * y * y  # the old accumulator silently wraps
