"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}`` for the driver's BENCH_r{N}.json.

Each query is forced with a cheap ``count()``-style action so timing
covers scan→compute→aggregate, not result serialization to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_topk_per_group",
    "explode_words",
    "event_time_window_agg",
    "events_transform",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine_pairs",
    "knn_brute_force_cosine",
    "text_fingerprint",
]

# primary scanned table per headline query — rows/s denominators
# (BASELINE.md asks the engine to self-report per-operator rows/s)
PRIMARY_TABLE = {
    "q1_pricing_summary": "lineitem",
    "q3_shipping_priority": "lineitem",
    "q5_local_supplier_volume": "lineitem",
    "window_topk_per_group": "orders",
    "explode_words": "documents",
    "event_time_window_agg": "events",
    "events_transform": "events",
    "dedup_minhash_lsh_pairs": "documents",
    "dedup_simhash_pairs": "documents",
    "dedup_embedding_cosine_pairs": "embeddings",
    "knn_brute_force_cosine": "embeddings",
    "text_fingerprint": "documents",
}

# non-headline extended set: round-3 operator families (timed and
# reported, excluded from the headline total for baseline comparability)
EXTENDED = [
    "timeseries_gapfill_locf",
    "dedup_containment_pairs",
    "graph_triangle_participation",
    "training_data_pipeline_v3",
    "embedding_cluster_centroids",
    "event_transition_probs",
    "quality_lm_bigram_score",
    "dedup_duplicated_window_fraction",
    "window_ewma_value",
    "quantile_histogram_rollup",
    "knn_pq_adc",
    "knn_ivfpq",
    "graph_pagerank_coactivity",
    "nearest_error_per_purchase",
    # round-4 additions
    "sketch_fm_distinct_users",
    "sketch_count_min_heavy_hitters",
    "affinity_basket_pairs",
    "corr_matrix_lineitem",
    "privacy_k_anonymity_audit",
    "bpe_pair_frequencies",
    "rollup_incremental_merge",
    "dedup_benchmark_decontaminate",
    "dedup_remove_duplicated_spans",
    "text_html_extract",
    "training_data_pipeline_v4",
    "concurrency_peak_by_day",
    "forecast_holt_linear",
    # round-5 additions (driver round 4): guard/dial equivalence rows
    "dedup_minhash_lsh_pairs_capped",
    "dedup_jaccard_pairs_capped",
    "graph_triangle_participation_degord",
    "graph_pagerank_coactivity_shuffle",
    "quality_gopher_rules",
    "quality_c4_rules",
    "text_line_repetition",
    "scalar_float_repr",
    # round-5 additions: plans changed this round (distributed rank,
    # top-k bound, edge cap) or new SQL surfaces — tracked for deltas
    "feature_quantile_bins",
    "skew_hot_key_report",
    "corpus_shuffle_global_rank",
    "graph_coactivity_edges_capped",
    "graph_bfs_reachability_rcte",
    "json_variant_extract",
    "graph_triangle_capped",
    # round-6 additions: new operators + plans changed this round
    "unigram_em_piece_counts",
    "quality_classifier_gradient",
    "graph_coactivity_edges_autocap",
    "inequality_gini_revenue",
    "pareto_abc_parts",
    "user_rfm_segments",
    "vocab_zipf_fit",
    "training_data_pipeline_v5",
    # round-6 additions: entity-resolution suite + quota sampling
    "er_blocked_candidates",
    "er_golden_records",
    "er_em_weight_step",
    "er_threshold_tradeoff",
    "sample_quota_per_source",
    # round-12 optimization: plans changed this round (inverted-index
    # MRR scoring; shared IVF assignment pass) — tracked for deltas
    "retrieval_mrr_eval",
    "knn_ivf_nprobe_curve",
]


def _load1() -> float:
    """1-minute host load average — recorded per pass so a bench
    artifact carries its own contention context (VERDICT r5 item 5:
    three rounds of 'is 7.6 vs 6.4 a regression?' adjudication were
    spent re-deriving what /proc/loadavg already knew)."""
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - /proc-less platforms
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gcs_parquet_dataflow_spark.queries.catalog import CATALOG
    from gcs_parquet_dataflow_spark.session import get_spark

    spark = get_spark(app_name="bench")
    names = [n for n in HEADLINE if n in CATALOG]
    # extension queries are registered later; include any marked headline
    names += [n for n, q in CATALOG.items()
              if getattr(q, "headline", False) and n not in names]

    # warm the JVM + parquet footers once so timings measure the engine
    CATALOG[names[0]].build(spark, sf_dir).count()

    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )

    # table row counts (parquet metadata read, effectively free)
    table_rows = {
        tbl: spark.read.parquet(f"{sf_dir}/{tbl}.parquet").count()
        for tbl in sorted(set(PRIMARY_TABLE.values()))
    }

    # Three passes per query, report the min: pass 1 pays one-time
    # whole-stage-codegen compilation + JIT warm-up (measured 2-6× on the
    # sketch queries), which a long-lived cluster job pays once per plan,
    # not per batch — and the shared host shows sporadic multi-second
    # contention bursts (verified: same query 1.3 s vs 13 s minutes apart
    # with zero steal in between). The min is the engine's steady-state
    # throughput; first-pass times are still reported (queries_cold).
    load_start = _load1()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    passes: dict[str, list[float]] = {}
    loads: dict[str, list[float]] = {}
    rows_per_sec: dict[str, int] = {}
    for name in names:
        per_pass: list[float] = []
        per_load: list[float] = []
        for _ in range(3):
            per_load.append(_load1())
            start = time.perf_counter()
            df = CATALOG[name].build(spark, sf_dir)
            df.count()
            per_pass.append(time.perf_counter() - start)
            release_intermediates()
        cold[name] = round(per_pass[0], 3)
        passes[name] = [round(t, 3) for t in per_pass]
        loads[name] = per_load
        elapsed = min(per_pass)
        timings[name] = round(elapsed, 3)
        tbl = PRIMARY_TABLE.get(name)
        if tbl and elapsed > 0:
            rows_per_sec[name] = int(table_rows[tbl] / elapsed)

    # Round-3 operator families, timed identically but kept OUT of the
    # headline total so `value` stays comparable to BASELINE/BENCH_r1.
    extended: dict[str, float] = {}
    extended_passes: dict[str, list[float]] = {}
    extended_loads: dict[str, list[float]] = {}
    for name in EXTENDED:
        if name not in CATALOG:
            continue
        per_pass = []
        per_load = []
        for _ in range(3):
            per_load.append(_load1())
            start = time.perf_counter()
            CATALOG[name].build(spark, sf_dir).count()
            per_pass.append(time.perf_counter() - start)
            release_intermediates()
        extended[name] = round(min(per_pass), 3)
        extended_passes[name] = [round(t, 3) for t in per_pass]
        extended_loads[name] = per_load

    # Incremental embedding index probe (VERDICT r10 item 6): not a
    # catalog row (it WRITES a persisted index), timed here so a
    # partition-pruning regression in cosine_batch_against_index — or a
    # compaction that breaks the pruning layout — shows up in the bench
    # artifact instead of only in sweep scale ratios.  Same batch shape
    # as the dedup_embedding_batch_pairs oracle row (the probe's inline
    # twin), 4 batch partitions so compaction has something to fold.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.operators import similarity as SIM
    from gcs_parquet_dataflow_spark.queries.extensions import (
        COS_DUP_THRESHOLD,
        PLANES,
    )

    probe: dict[str, float] = {}
    probe_passes: dict[str, list[float]] = {}
    probe_loads: dict[str, list[float]] = {}
    idx_root = tempfile.mkdtemp(prefix="bench_cosine_idx_")
    idx = os.path.join(idx_root, "idx")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    batch = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("v", lambda x: x + 0.01).alias("v"),
    )

    def _probe_timed(label: str, fn) -> None:
        pp: list[float] = []
        pl: list[float] = []
        for _ in range(3):
            pl.append(_load1())
            start = time.perf_counter()
            fn()
            pp.append(round(time.perf_counter() - start, 3))
            release_intermediates()
        probe[label] = min(pp)
        probe_passes[label] = pp
        probe_loads[label] = pl

    start = time.perf_counter()
    for b in range(4):
        SIM.build_cosine_bucket_index(
            emb.filter(F.col("vec_id") % 4 == b), idx,
            planes=PLANES, id_col="vec_id", vec_col="v", batch_id=b,
        )
    release_intermediates()
    probe["index_build_4_batches"] = round(time.perf_counter() - start, 3)

    def _run_probe() -> None:
        SIM.cosine_batch_against_index(
            spark, idx, batch, COS_DUP_THRESHOLD, planes=PLANES,
            id_col="vec_id", vec_col="v",
        ).count()

    _probe_timed("cosine_batch_against_index", _run_probe)
    start = time.perf_counter()
    SIM.compact_cosine_index(spark, idx, keep_last=2)
    probe["compact_cosine_index"] = round(time.perf_counter() - start, 3)
    _probe_timed("cosine_batch_against_index_postcompact", _run_probe)
    shutil.rmtree(idx_root, ignore_errors=True)
    load_end = _load1()

    # Effective parallelism, recorded in BOTH artifacts (VERDICT r12
    # item 2a: the driver's scaling probe flagged suspect_cpus_ignored
    # because ~equal 8-core vs 32-core totals at this overhead-bound SF
    # were indistinguishable from a hard-coded master — the line itself
    # must attest the core count the session actually ran with).
    cpus_effective = spark.sparkContext.defaultParallelism
    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(timings.values()), 3)
    # Full detail goes to the bench_result.json sidecar; stdout gets a
    # COMPACT line (headline value + per-headline-query seconds only).
    # BENCH_r03/r04 came back "parsed": null because the driver's tail
    # capture keeps only the last 2000 chars of stdout and the full line
    # (2.6 kB) lost its front — so the stdout line must stay well under
    # that window (~550 B here), with a hard assert to keep it honest.
    sidecar = json.dumps({
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "passes_per_query": 3,
        "queries_passes": passes,
        "queries_load1": loads,
        "rows_per_sec": rows_per_sec,
        "queries_extended": extended,
        "queries_extended_passes": extended_passes,
        "queries_extended_load1": extended_loads,
        "queries_probe": probe,
        "queries_probe_passes": probe_passes,
        "queries_probe_load1": probe_loads,
        "load1_start": load_start,
        "load1_end": load_end,
        "table_rows": table_rows,
        "cpus": cpus_effective,
        "cpus_env": cpus_env,
        "sf": sf_val,
    })
    line = json.dumps({
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "load1": [load_start, load_end],
        "cpus": cpus_effective,
        "sf": sf_val,
    })
    assert len(line) < 1800, f"stdout bench line too long: {len(line)}B"
    # Stop the JVM BEFORE printing so nothing (progress bars are already
    # off via session.py, but also shutdown logs) can land on stdout after
    # — or interleave with — the JSON line the driver tail-captures.
    spark.stop()
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_result.json"), "w") as f:
        f.write(sidecar + "\n")
    sys.stdout.write(line + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
