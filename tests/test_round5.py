"""Semantic invariant tests for the round-5 additions (SURVEY §11).

The oracle gate proves Spark↔DuckDB VALUE equality; these tests prove
the values mean what the operators claim — the properties a user would
rely on (CUPED reduces variance, KM survival is monotone, quantile
bins are balanced, planted defects are detected exactly, thresholds
hold). Same discipline as tests/test_property_round4.py.
"""

from __future__ import annotations

import math

from gcs_parquet_dataflow_spark.queries.catalog import CATALOG

import pytest

pytestmark = pytest.mark.fast  # driver quick-gate module (r13)

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return CATALOG[name].build(spark, SF).collect()


def test_cuped_reduces_or_preserves_arm_gap(spark):
    """CUPED adjustment must keep both arm means finite and the
    adjusted values centered near the raw means (theta shifts
    variance, not the pooled level)."""
    out = {r["variant"]: r for r in rows(spark, "ab_cuped_adjustment")}
    assert set(out) == {0, 1}
    th = {r["theta"] for r in out.values()}
    assert len(th) == 1  # pooled theta is shared across arms
    n = sum(r["n_users"] for r in out.values())
    raw = sum(r["mean_post"] * r["n_users"] for r in out.values()) / n
    adj = sum(
        r["mean_post_cuped"] * r["n_users"] for r in out.values()
    ) / n
    # pooled mean is invariant under y - theta*(x - mean(x))
    assert abs(raw - adj) < 1e-4


def test_kaplan_meier_survival_is_monotone_nonincreasing(spark):
    out = rows(spark, "survival_kaplan_meier")
    assert out, "KM curve must have event rows"
    last = 1.0 + 1e-9
    for r in out:
        assert 0.0 <= r["survival"] <= last + 1e-9
        assert r["n_events"] >= 1
        assert r["n_at_risk"] >= r["n_events"]
        last = r["survival"]


def test_quantile_bins_are_balanced_and_monotone(spark):
    out = rows(spark, "feature_quantile_bins")
    assert [r["bin"] for r in out] == list(range(1, 11))
    counts = [r["n_rows"] for r in out]
    assert max(counts) - min(counts) <= 1  # equal-frequency
    for a, b in zip(out, out[1:]):
        assert a["hi"] <= b["lo"] + 1e-9  # edges monotone


def test_int8_quantize_codes_bounded_and_low_error(spark):
    out = rows(spark, "embedding_int8_quantize")
    for r in out:
        assert r["code_max"] <= 127
        assert r["scale"] > 0
        # mse_ppm is sum of squared per-component errors × 1e6; each
        # |err| ≤ scale/2, so the 64-dim sum is ≤ 64·(scale/2)²·1e6
        assert r["mse_ppm"] <= 64 * (r["scale"] / 2) ** 2 * 1e6 + 1e-6


def test_media_sniff_counts_match_planting(spark):
    import duckdb

    out = {r["mime"]: r["n_files"] for r in rows(spark, "media_type_sniff")}
    con = duckdb.connect()
    n = {
        m: con.execute(
            f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
            f" WHERE doc_id % 4 = {m}"
        ).fetchone()[0]
        for m in range(4)
    }
    assert out["image/png"] == n[0]
    assert out["image/jpeg"] == n[1]
    assert out["audio/wav"] == n[2]
    assert out["application/octet-stream"] == n[3]


def test_mojibake_audit_detects_exactly_planted_docs(spark):
    import duckdb

    out = rows(spark, "text_mojibake_audit")
    con = duckdb.connect()
    planted = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
        " WHERE doc_id % 17 = 0"
    ).fetchone()[0]
    assert sum(r["n_replacement_docs"] for r in out) == planted
    assert sum(r["n_mojibake_docs"] for r in out) == planted


def test_hard_negatives_exclude_near_duplicates(spark):
    out = rows(spark, "contrastive_hard_negatives")
    assert out
    for r in out:
        assert r["cos"] < 0.98  # planted twins (cos≈0.996) excluded
        assert r["cand_id"] != r["query_id"]
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == [
            1,
            2,
            3,
        ]


def test_knn_label_eval_weights_and_accuracy_consistent(spark):
    out = rows(spark, "knn_label_eval")
    n_total = sum(r["n_vectors"] for r in out)
    k = len(out)
    for r in out:
        assert 0.0 <= r["knn_accuracy"] <= 1.0
        expect = n_total / (k * r["n_vectors"])
        assert abs(r["class_weight"] - expect) < 1e-5


def test_activity_entropy_separates_planted_bots(spark):
    out = {r["entropy_bucket"]: r for r in rows(spark, "user_activity_entropy")}
    assert 0 in out, "planted view-only bots must land in bucket 0"
    assert max(out) >= 5, "organic users sit near ln(5)≈1.61 → bucket 6"


def test_bollinger_rows_are_true_breakouts(spark):
    for r in rows(spark, "window_bollinger_flags"):
        assert r["breakout_hi"] != r["breakout_lo"]
        if r["breakout_hi"]:
            assert r["revenue"] > r["band_hi"] - 1e-6
        else:
            assert r["revenue"] < r["band_lo"] + 1e-6


def test_referential_audit_orphan_counts_match_planting(spark):
    out = {r["relation"]: r for r in rows(spark, "referential_integrity_audit")}
    # planted lineitem orphans: every l_orderkey % 97 == 0 row shifted
    assert out["lineitem->orders"]["n_orphans"] > 0
    assert out["lineitem->part"]["n_orphans"] > 0
    assert out["lineitem->supplier"]["n_orphans"] > 0
    assert out["orders->customer"]["n_orphans"] > 0
    for r in out.values():
        assert r["n_orphans"] < r["n_child"]
        assert abs(
            r["orphan_rate"] - r["n_orphans"] / r["n_child"]
        ) < 1e-6


def test_curriculum_positions_are_stage_ordered(spark):
    out = rows(spark, "curriculum_order_manifest")
    assert [r["position"] for r in out] == list(range(1, len(out) + 1))
    stages = [r["stage"] for r in out]
    assert stages == sorted(stages)  # easy stages first


def test_minhash_estimate_error_bounded(spark):
    """16 lanes → SE ≈ sqrt(J(1-J)/16) ≤ 0.125; allow 4 SE."""
    out = rows(spark, "dedup_minhash_estimate_error")
    assert out
    for r in out:
        assert 0.0 <= r["jaccard_est"] <= 1.0
        assert r["abs_error"] <= 0.5
    mean_err = sum(r["abs_error"] for r in out) / len(out)
    assert mean_err <= 0.25


def test_autocorr_in_valid_range(spark):
    out = rows(spark, "timeseries_autocorr_by_type")
    assert {r["lag_k"] for r in out} == {1, 7}
    for r in out:
        assert -1.0 - 1e-9 <= r["autocorr"] <= 1.0 + 1e-9
        assert r["n_pairs"] >= 2


def test_source_unigram_kl_nonnegative(spark):
    out = rows(spark, "source_unigram_kl")
    assert out
    for r in out:
        # KL over the restricted shared support can dip only ~0 from
        # smoothing; it must never be materially negative
        assert r["kl_to_corpus"] >= -1e-3
        assert r["n_vocab_tokens"] > 0


def test_json_drift_fractions_sum_to_one_per_key(spark):
    out = rows(spark, "json_schema_drift_audit")
    by_key = {}
    for r in out:
        by_key.setdefault(r["key"], 0.0)
        by_key[r["key"]] += r["frac"]
    for k, s in by_key.items():
        assert abs(s - 1.0) < 1e-4, (k, s)


def test_privacy_clamp_never_increases_rows(spark):
    for r in rows(spark, "privacy_contribution_bounds"):
        assert r["rows_after_clamp"] <= r["n_rows"]
        assert r["max_user_rows"] >= math.ceil(r["p99_user_rows"]) - 1


def test_seasonal_components_sum_near_zero(spark):
    """Additive weekly seasonal indices average ~0 over the cycle."""
    out = rows(spark, "seasonal_decompose_dow")
    assert len(out) == 7
    weighted = sum(r["seasonal"] * r["n_days"] for r in out)
    n = sum(r["n_days"] for r in out)
    lvl = max(abs(r["seasonal"]) for r in out) + 1.0
    assert abs(weighted / n) <= lvl  # bounded; exact-zero not required


def test_surprisal_ranked_descending_and_positive(spark):
    out = rows(spark, "behavior_sequence_surprisal")
    assert out and [r["rank"] for r in out] == list(range(1, len(out) + 1))
    vals = [r["mean_surprisal"] for r in out]
    assert vals == sorted(vals, reverse=True)
    assert all(v > 0 for v in vals)  # -ln p of probs < 1


def test_forecast_backtest_winner_matches_maes(spark):
    for r in rows(spark, "forecast_backtest_naive"):
        if r["mae_seasonal_naive"] < r["mae_persistence"]:
            assert r["winner"] == "seasonal_naive"
        else:
            assert r["winner"] == "persistence"
        assert r["mae_persistence"] >= 0 and r["mae_seasonal_naive"] >= 0


def test_embedding_norm_audit_finds_planted_zero_vectors(spark):
    import duckdb

    (r,) = rows(spark, "embedding_norm_audit")
    con = duckdb.connect()
    planted = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF}/embeddings.parquet')"
        " WHERE vec_id % 50 = 0"
    ).fetchone()[0]
    assert r["n_zero_vectors"] == planted
    assert r["n_bad_dim"] == 0
    assert r["min_norm"] > 0 and r["max_norm"] >= r["min_norm"]


def test_session_window_native_matches_island_sessionize_totals(spark):
    """The native-operator query and the island query must agree on
    the total number of sessions (same gap rule, same data)."""
    from pyspark.sql import functions as F

    native = (
        CATALOG["session_window_native"].build(spark, SF).count()
    )
    assert native == 20  # top-20 contract
    sess = CATALOG["sessionize_events"].build(spark, SF)
    total_island = sess.agg(F.sum("n_sessions")).collect()[0][0]
    e = spark.read.parquet(f"{SF}/events.parquet")
    total_native = (
        e.groupBy(
            F.session_window(F.col("ts"), "30 minutes"), "user_id"
        )
        .count()
        .count()
    )
    assert total_native == total_island


def test_retrieval_mrr_planted_phrases_rank_first(spark):
    out = rows(spark, "retrieval_mrr_eval")
    assert len(out) == 5
    for r in out:
        # the source document contains its own query phrase verbatim →
        # maximal overlap → rank 1 with the doc_id tie-break
        assert r["hit_at_1"] and r["relevant_rank"] == 1
        assert r["top1_doc"] == r["query_id"]
        assert r["reciprocal_rank"] == 1.0


def test_epoch_allocation_respects_budget_and_caps(spark):
    out = rows(spark, "mixture_epoch_allocation")
    corpus = sum(r["tokens"] for r in out)
    allocated = sum(r["allocated_tokens"] for r in out)
    assert allocated <= 2 * corpus  # budget = 2× corpus
    for r in out:
        assert 1 <= r["epochs"] <= 4
        assert r["allocated_tokens"] == r["tokens"] * r["epochs"]
    # greedy: epochs are non-increasing in quality rank
    es = [r["epochs"] for r in sorted(out, key=lambda r: r["quality_rank"])]
    assert all(a >= b for a, b in zip(es, es[1:]))


def test_pareto_abc_shares_sum_to_one_and_head_is_small(spark):
    out = {r["abc_class"]: r for r in rows(spark, "pareto_abc_parts")}
    assert abs(sum(r["revenue_share"] for r in out.values()) - 1.0) < 1e-4
    if "A" in out and "C" in out:
        # the head class earns more per part than the tail class
        a = out["A"]["revenue"] / out["A"]["n_parts"]
        c = out["C"]["revenue"] / out["C"]["n_parts"]
        assert a > c


def test_confusion_matrix_rows_normalize(spark):
    out = rows(spark, "lang_id_confusion_matrix")
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], 0.0)
        by_label[r["label"]] += r["row_frac"]
    for lbl, s in by_label.items():
        assert abs(s - 1.0) < 1e-4, (lbl, s)


def test_ship_latency_percentiles_ordered(spark):
    for r in rows(spark, "order_to_ship_latency"):
        assert 0 <= r["p50_days"] <= r["p95_days"] <= r["max_days"]


def test_linear_attribution_conserves_credit(spark):
    from pyspark.sql import functions as F

    out = rows(spark, "attribution_linear_touch")
    e = spark.read.parquet(f"{SF}/events.parquet")
    n_purchases = e.filter(F.col("event_type") == "purchase").count()
    total_credit = sum(r["credit"] for r in out)
    assert abs(total_credit - n_purchases) < 1e-3  # conservation
    assert abs(sum(r["share"] for r in out) - 1.0) < 1e-4


def test_lsh_precision_recall_catches_planted_dups(spark):
    (r,) = rows(spark, "dedup_lsh_precision_recall")
    assert r["n_truth"] > 0  # planted near-dups form the truth set
    assert r["recall"] == 1.0  # 8×2 banding must catch J≈0.9 pairs
    assert 0.0 < r["precision"] <= 1.0
    assert r["n_hit"] <= min(r["n_pred"], r["n_truth"])


def test_pipeline_v5_manifest_contract(spark):
    out = rows(spark, "training_data_pipeline_v5")
    assert [r["position"] for r in out] == list(range(1, len(out) + 1))
    for r in out:
        assert r["doc_id"] % 17 != 0  # planted mojibake docs gated out
        assert 1 <= r["epochs"] <= 4
        assert r["stage"] in (1, 2, 3)
    stages = [r["stage"] for r in out]
    assert stages == sorted(stages)


def test_srm_does_not_alarm_on_clean_hash_split(spark):
    (r,) = rows(spark, "experiment_srm_check")
    assert not r["srm_alarm"]  # deterministic hash split is balanced
    assert r["n0"] + r["n1"] > 0 and r["chi2"] >= 0


def test_dimension_variance_shares_well_formed(spark):
    out = rows(spark, "embedding_dimension_variance")
    assert len(out) == 16
    vs = [r["variance"] for r in out]
    assert vs == sorted(vs, reverse=True)
    assert all(v >= 0 for v in vs)
    cs = [r["cum_share"] for r in out]
    assert cs == sorted(cs) and cs[-1] <= 1.0 + 1e-6


def test_release_gate_passes_on_clean_fixtures(spark):
    (r,) = rows(spark, "release_gate_scoreboard")
    assert r["release_ok"]
    assert r["n_fk_orphans"] == 0
    assert r["n_encoding_damaged"] == 0
    assert r["n_zero_vectors"] == 0
    assert not r["srm_alarm"]


def test_tfidf_pairs_are_symmetric_free_and_high(spark):
    out = rows(spark, "text_tfidf_cosine_pairs")
    assert out  # the fixture's natural template near-dups
    seen = set()
    for r in out:
        assert r["id_a"] < r["id_b"]  # canonical orientation, no dupes
        assert r["cosine"] >= 0.9
        assert (r["id_a"], r["id_b"]) not in seen
        seen.add((r["id_a"], r["id_b"]))


def test_power_mde_positive_and_scales_with_sd(spark):
    (r,) = rows(spark, "experiment_power_mde")
    assert r["mde_absolute"] > 0 and r["mde_relative"] > 0
    assert r["sd_revenue"] > 0
    # MDE formula consistency: mde = 2.801585*sqrt(2*var/(n/2))
    import math

    expect = 2.801585 * math.sqrt(
        2 * (r["sd_revenue"] ** 2) / (r["n"] / 2.0)
    )
    assert abs(r["mde_absolute"] - expect) < 2e-2 * expect + 1e-4


def test_filter_agreement_kappa_bounded(spark):
    out = rows(spark, "filter_agreement_matrix")
    assert len(out) == 3
    for r in out:
        assert 0.0 <= r["po"] <= 1.0
        assert -1.0 - 1e-9 <= r["kappa"] <= 1.0 + 1e-9
        assert r["n_agree"] <= r["n"]


def test_quality_tradeoff_curve_monotone(spark):
    out = rows(spark, "quality_threshold_tradeoff")
    assert len(out) == 9
    docs = [r["docs_kept"] for r in out]
    toks = [r["tokens_kept"] for r in out]
    assert docs == sorted(docs, reverse=True)  # raising the gate keeps fewer
    assert toks == sorted(toks, reverse=True)
    assert out[0]["doc_retention"] == 1.0  # threshold 0 keeps everything


def test_cross_source_matrix_every_source_pairs_with_its_mirror(spark):
    out = rows(spark, "dedup_cross_source_matrix")
    assert out
    for r in out:
        assert r["source_a"] != r["source_b"]
        assert r["n_shared_docs"] > 0
    # planted mirrors dominate: each (src, mirror-src) pair present
    mirror_pairs = {
        (r["source_a"], r["source_b"])
        for r in out
        if r["source_b"] == f"mirror-{r['source_a']}"
    }
    assert len(mirror_pairs) >= 10  # every source cycle member mirrored


def test_bounce_rate_bounded_and_sessions_positive(spark):
    out = rows(spark, "session_bounce_rate_daily")
    assert out
    for r in out:
        assert 0.0 <= r["bounce_rate"] <= 1.0
        assert r["n_bounces"] <= r["n_sessions"]


def test_ivf_nprobe_curve_monotone_to_perfect_recall(spark):
    out = rows(spark, "knn_ivf_nprobe_curve")
    assert [r["nprobe"] for r in out] == [1, 2, 4, 8]
    rec = [r["recall_at_5"] for r in out]
    assert rec == sorted(rec)  # more probes never hurt recall
    assert rec[-1] == 1.0  # probing all 8 lists IS exact search


def test_lsh_band_curve_recall_precision_tradeoff(spark):
    out = {r["config"]: r for r in rows(spark, "dedup_lsh_band_config_curve")}
    assert set(out) == {"16x1", "8x2", "4x4"}
    # more rows per band -> stricter candidates: fewer predictions
    assert out["16x1"]["n_pred"] >= out["8x2"]["n_pred"] >= out["4x4"]["n_pred"]
    # recall never increases as bands get stricter
    assert out["16x1"]["recall"] >= out["8x2"]["recall"] >= out["4x4"]["recall"]
    # the production default must keep full recall on planted J≈0.9 pairs
    assert out["8x2"]["recall"] == 1.0


def test_rake_prefers_long_phrases_and_is_ranked(spark):
    out = rows(spark, "text_rake_keyphrases")
    assert len(out) == 20
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # degree/freq scoring: top phrases are multi-word (RAKE's point)
    assert any(" " in r["phrase"] for r in out[:5])
    stops = {"the", "a", "of", "and", "to", "is", "in"}
    for r in out:
        assert r["n_occurrences"] >= 1
        assert not (set(r["phrase"].split()) & stops)  # no stopwords inside


def test_session_funnel_counts_nest(spark):
    (r,) = rows(spark, "funnel_within_session")
    assert (
        r["n_converted_sessions"]
        <= r["n_sessions_with_view"]
        <= r["n_sessions"]
    )
    assert 0.0 <= r["session_conversion_rate"] <= 1.0


def test_feature_matrix_internally_consistent(spark):
    out = rows(spark, "user_feature_matrix")
    assert out
    for r in out:
        assert r["n_purchases"] <= r["n_events"]
        assert 1 <= r["n_types"] <= 5
        assert r["n_active_days"] <= r["tenure_days"]
        assert r["recency_days"] >= 0
        assert 0.0 < r["active_day_ratio"] <= 1.0
        assert (r["monetary"] > 0) == (r["n_purchases"] > 0)


def test_language_purity_rates_bounded(spark):
    out = rows(spark, "text_language_purity")
    assert out
    for r in out:
        assert 0.0 <= r["mixed_rate"] <= 1.0
        assert r["n_mixed"] <= r["n_docs"]


def test_completeness_trend_matches_planting(spark):
    out = rows(spark, "completeness_daily_trend")
    assert out
    # planted null rates: ~1/13 for user_id, ~1/19 for value, 0 for props
    tot = sum(r["n_rows"] for r in out)
    u = sum(r["null_rate_user_id"] * r["n_rows"] for r in out) / tot
    v = sum(r["null_rate_value"] * r["n_rows"] for r in out) / tot
    assert abs(u - 1 / 13) < 0.02
    assert abs(v - 1 / 19) < 0.02
    assert all(r["null_rate_props"] == 0.0 for r in out)


def test_dedup_venn_partitions_the_corpus(spark):
    (r,) = rows(spark, "dedup_url_vs_content_venn")
    assert (
        r["url_only"] + r["content_only"] + r["both_dup"] + r["neither"]
        == r["n_docs"]
    )
    # both planted phenomena must be detected
    assert r["content_only"] + r["both_dup"] > 0  # replaced bodies
    assert r["url_only"] + r["both_dup"] > 0      # tracking-param variants


def test_survivorship_rates_bounded_and_planted_sources_lose(spark):
    out = rows(spark, "dedup_survivorship_by_source")
    assert out
    for r in out:
        assert 0.0 <= r["removal_rate"] <= 1.0
        assert r["n_removed"] <= r["n_docs"]
    assert sum(r["n_removed"] for r in out) > 0  # planted twins removed


def test_pack_efficiency_accounts_for_all_docs(spark):
    import duckdb

    out = rows(spark, "pack_efficiency_report")
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
        " WHERE text IS NOT NULL"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in out) == n_docs  # nothing dropped
    for r in out:
        assert 0 <= r["fill_decile"] <= 10
        assert r["padding_tokens"] >= 0


def test_otsu_flags_exactly_one_optimal_threshold(spark):
    out = rows(spark, "quality_otsu_threshold")
    assert len(out) == 19
    best = [r for r in out if r["is_otsu_optimal"]]
    assert len(best) >= 1  # ties share the max, but at least one
    mx = max(r["between_var"] for r in out)
    for r in best:
        assert r["between_var"] == mx > 0
    for r in out:
        assert r["n_below"] + r["n_above"] == out[0]["n_below"] + out[0]["n_above"]


def test_lm_gap_heldout_worse_than_train(spark):
    (r,) = rows(spark, "lm_generalization_gap")
    assert r["n_train_bigrams"] > r["n_heldout_bigrams"] > 0
    assert r["train_ppl"] > 1.0
    # the model has seen the train split: heldout can't be easier
    assert r["generalization_ratio"] >= 1.0 - 1e-6


def test_blocking_loses_no_planted_pairs_but_cuts_candidates(spark):
    (r,) = rows(spark, "dedup_blocking_effectiveness")
    assert r["planted_found_blocked"] == r["planted_found_unblocked"] > 0
    assert r["n_candidates_blocked"] <= r["n_candidates_unblocked"]
    assert 0.0 <= r["candidate_reduction"] < 1.0


def test_rank_movers_consistent_permutation(spark):
    out = rows(spark, "metric_rank_movers_wow")
    assert out
    prevs = sorted(r["rank_prev"] for r in out)
    nows = sorted(r["rank_now"] for r in out)
    assert prevs == nows == list(range(1, len(out) + 1))
    for r in out:
        assert r["rank_delta"] == r["rank_prev"] - r["rank_now"]


def test_double_charge_detects_exactly_planted_dupes(spark):
    import duckdb

    out = rows(spark, "orders_double_charge_detect")
    con = duckdb.connect()
    planted = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF}/orders.parquet')"
        " WHERE o_orderkey % 211 = 0"
    ).fetchone()[0]
    # fixtures have no natural (cust, date, amount) collisions, so the
    # flagged groups are exactly the planted resubmissions
    assert len(out) == planted
    for r in out:
        assert r["n_charges"] == 2
        assert abs(r["overcharge"] - r["amount"]) < 1e-6


def test_heatmap_bands_partition_each_day(spark):
    out = rows(spark, "events_hour_dow_heatmap")
    assert len(out) == 7 and [r["dow"] for r in out] == list(range(7))
    for r in out:
        assert (
            r["h00_05"] + r["h06_11"] + r["h12_17"] + r["h18_23"]
            == r["total"]
        )


def test_hhi_bounded_by_definition(spark):
    out = rows(spark, "supplier_concentration_hhi")
    assert out
    for r in out:
        # HHI in (10000/n, 10000]: equality at perfect monopoly
        assert 10000.0 / r["n_suppliers"] - 1e-3 <= r["hhi"] <= 10000.0 + 1e-6
        assert r["market_class"] in ("competitive", "moderate", "concentrated")
