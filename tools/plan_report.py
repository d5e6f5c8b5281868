"""Generate PLANS.md: the executed physical plan (AQE-final) of a
representative query per operator family, with the scale-relevant
properties to look for. Run: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

REPRESENTATIVE = [
    ("q1_pricing_summary", "scan → partial agg → final agg; one exchange of group rows"),
    ("q3_shipping_priority", "customer broadcast; lineitem⋈orders shuffled on orderkey"),
    ("q8_market_share", "7-dim star join — every dimension BroadcastHashJoin, one fact shuffle"),
    ("filter_project_pushdown", "PushedFilters + pruned ReadSchema at the parquet scan"),
    ("dedup_minhash_lsh_pairs", "codegen'd sketch (no Python eval nodes), banded self-join on persisted band table"),
    ("knn_ivf_probe", "map-only list assignment, broadcast probe join, windowed top-k"),
    ("asof_join_latest_state", "single key exchange: union + window last-non-null"),
    ("range_join_time_windows", "binned equi-join (no BroadcastNestedLoop/cartesian)"),
    ("transform_cast_ladders", "whole-stage codegen: the compiled config transform is pure Project"),
    ("corpus_shuffle_deterministic", "partitioned window (no single-partition global sort)"),
    ("pack_sequences_budget", "bucketed window cumsum — packing with no global sort"),
    ("scd2_user_state_history", "gaps-and-islands: lag, run-sum, agg, lead all on ONE user-key exchange"),
    ("corpus_line_dedup", "segment-hash agg → broadcast anti-join ban list → one doc-key rebuild exchange"),
    ("timeseries_gapfill_locf", "one data-sized rollup; spine join + fill windows on bucket-count-sized data"),
    ("regression_trend_by_type", "five int64 sums in ONE map-side-combined aggregation"),
    ("quality_lm_bigram_score", "two vocab-sized hash aggs; scoring joins keyed on the bigram, doc-keyed average"),
    ("dedup_duplicated_window_fraction", "window hashes in one doc-keyed exchange; dup tagging is an equi-join"),
    ("graph_pagerank_coactivity", "fixed-point iteration: one lazy DAG, per round one edge-key join + hash agg, broadcast rank table reused"),
    ("graph_pagerank_coactivity_shuffle", "same iteration, shuffle path: edge list partitioned on src ONCE, rank table shuffles per round"),
    ("graph_triangle_participation_degord", "degree-ordered wedge join: fan-out anchored at min-rank apex, O(E^1.5)"),
    ("dedup_minhash_lsh_pairs_capped", "hot-bucket guard: bucket-size agg + broadcast LEFT ANTI before the band self-join"),
    ("knn_ivfpq", "map-only encode + list assignment; broadcast query tables; one (query,candidate) hash agg"),
    ("anomaly_seasonal_zscore", "baseline FILTER agg; big side map-only inner broadcast join; tiny fill-join"),
    # round-5 additions
    ("feature_quantile_bins", "exact global rank WITHOUT a single-partition sort: range partition + local windows + broadcast offsets; ntile math is pure int64 projection"),
    ("graph_coactivity_edges_capped", "hot-bucket guard on the quadratic bucket self-join: bucket-size agg + broadcast LEFT ANTI before candidates"),
    ("graph_bfs_reachability_rcte", "recursive CTE (UnionLoop): each level one distributed frontier⋈edges equi-join, bounded depth"),
    ("json_variant_extract", "VARIANT path extraction is map-only whole-stage-codegen projection — no shuffle, no Python"),
    # round-6 additions
    ("graph_triangle_capped", "exact-hub capped closure: interior wedge join over hub-free edges + three hub-incident wedge classes, merged — no NULLs, no full-graph fan-out"),
    ("pareto_abc_parts", "distributed prefix sum: range partition + partition-local running sums + broadcast value offsets — no single-partition |parts| window"),
    ("unigram_em_piece_counts", "unrolled in-JVM Viterbi DP over the word-TYPE table; vocab rides as a 1-row broadcast map; corpus scanned once"),
    ("quality_classifier_gradient", "hashed n-gram features: one explode + map-side-combined count; integer gradient is one equi-join + hash agg"),
    ("er_blocked_candidates", "multi-pass ER blocking: persisted key table read by both self-join sides, hot blocks removed by broadcast anti-join, pair join keyed on the block — Σ|block|², never |records|²"),
    # round-7 additions
    ("er_incremental_probe", "two-table blocked probe: batch and golden-view keys capped per side, pair join on the shared block key — Σ|block_l|·|block_r|, never |batch|×|entities|"),
    ("privacy_dp_release", "(type,user) partial agg with map-side combine → |groups| rollup; Laplace noise is a pure codegen'd Column on the group key — no extra shuffle"),
    ("langid_train_step1", "char-trigram features: guarded index explode + map-side-combined count; per-class gradient = equi-join + hash agg over ONE persisted feature table"),
    ("media_bmp_decode", "Arrow-batched mapInPandas generate+decode in the scan stage; payload bytes never shuffle; only feature-sized rows flow on"),
    ("bloom_probe_fpr", "131-word filter built by explode(k)+bit_or map-side partials, broadcast to the probe side; the semi-join prune shape that replaces shuffling a fact table against a dimension"),
    ("aqp_sample_sum_ci", "deterministic Bernoulli sample filter in the scan stage; estimate + variance from one |groups|-row map-side-combined aggregation"),
    ("dedup_minhash_signature", "per-doc sketches on the explode+min-aggregate path (one doc-key exchange), not interpreted array folds — 64 s → 8 s at sf0.1"),
    # round-8/9 additions (VERDICT r8 item 3)
    ("media_png_decode", "PNG synth+decode inside one scan-stage Arrow batch; zlib entropy coding in Python but payloads never shuffle"),
    ("media_jpeg_decode", "baseline-JPEG encode→decode in the scan stage (mapInPandas); 10% doc sample bounds codec time; feature-sized output only"),
    ("knn_label_eval_ann", "IVF-candidate LOO eval: equi-join on list id with BOTH sides corpus-sized (correctly not broadcast), norms computed once pre-join"),
    ("classifier_calibration_bins", "margin scoring via broadcast weight join + doc-key agg; bins are a |bins|-row rollup"),
    # round-9 additions
    ("media_jpeg_decode_variants", "grayscale + 4:4:4 codec paths, same scan-stage Arrow batch shape as the 4:2:0 row"),
    ("privacy_dp_thresholded_release", "group-cap DP release + noisy-threshold filter on the |groups| rollup — key-set stability with zero extra shuffle"),
    # round-10 additions
    ("dedup_embedding_cosine_pairs_capped", "cosine candidate generator behind the hot-bucket guard: bucket-size agg + broadcast LEFT ANTI before the bucket self-join (the last uncapped path, closed)"),
    ("dedup_embedding_cosine_pairs_multitable", "multi-table LSH recall dial: posexplode over L plane tables, capped per (table, bucket), distinct on the deterministic pair triple"),
    ("dedup_embedding_batch_pairs", "incremental batch-vs-corpus probe: corpus-side cap, bucket equi-join Σ|batch_b|·|corpus_b| — never |batch|×|corpus|"),
    ("layout_hilbert_key_3d", "Skilling Hilbert SSA steps as chained codegen'd projections — data-dependent bit algorithm with no UDF and no expression blow-up"),
    # round-11 additions
    ("dedup_minhash_clusters_capped", "iteration-dialed connected components: per-round FRONTIER(_moved)⋈edges min-agg over localCheckpoint-truncated entry frames (r13 — no per-round re-planning of the pair pipeline), CCReport on stop"),
    ("knn_index_family_crossover", "one shared corpus keying pass (both bucket sigs + IVF assignment + precomputed norms, r13) feeding the exact ground truth AND three candidate joins + rescore — recall/cost per index family in one plan"),
    ("dedup_minhash_clusters_jump", "pointer-jumping CC round: frontier neighbor-min aggregate PLUS the labels self-join shortcut with its build side filtered to non-root rows (r13) — O(log diameter) rounds"),
    ("dedup_minhash_clusters_auto", "auto CC on the shallow fixture: the stall detector never fires, so every round is the PLAIN label plan — no jump self-join paid (r12, the no-folklore dial)"),
    ("decontam_semantic_pairs", "semantic decontamination: bench-vs-corpus capped bucket equi-join with precomputed norms — the embedding companion to the lexical shingle filter, |bench|-bounded like every batch-vs-corpus probe"),
    ("knn_ivf_list_quality", "IVF list audit: one map-side projection (k+1 dot folds), posexplode to k rows, two hash aggs with map-side combine, then a k²-row broadcast DB join — O(n·k), never O(n²) silhouette"),
]


def main() -> None:
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )
    from gcs_parquet_dataflow_spark.queries.catalog import CATALOG
    from gcs_parquet_dataflow_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-report")
    out = [
        "# PLANS — executed physical plans (AQE-final) at "
        f"`{sf_dir}`\n",
        "Generated by `python tools/plan_report.py`. One representative",
        "query per operator family; the note above each plan names the",
        "property that makes it the plan you'd want at 100 TB.\n",
    ]
    for name, note in REPRESENTATIVE:
        df = CATALOG[name].build(spark, sf_dir)
        df.collect()  # finalize AQE
        plan = df._jdf.queryExecution().executedPlan().toString()
        release_intermediates()
        out.append(f"## {name}\n\n*{note}*\n")
        out.append("```\n" + plan.strip()[:6000] + "\n```\n")
    with open("PLANS.md", "w", encoding="utf-8") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(REPRESENTATIVE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
