"""Empirical scaling probe: run representative queries at sf0.001 /
sf0.01 / sf0.1 and report wall-time ratios against the data-size ratio.

A linear (or better) time ratio across a 10× data step is the local
evidence for the SCALE.md claims — an operator whose cost curve bends
upward here (pair joins gone quadratic, windows gone single-partition)
would bend harder at cluster scale.

Usage: python tools/scaling_probe.py [query ...]  (default: the probe set)
Prints one markdown table row per query; paste into SCALE.md §Scaling
evidence.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE = [
    "q1_pricing_summary",          # scan + agg (data-sized)
    "q3_shipping_priority",        # fact⋈fact join
    "dedup_minhash_lsh_pairs",     # sketch + banded self-join
    "dedup_containment_pairs",     # inverted-index containment join
    "knn_brute_force_cosine",      # linear similarity scan
    "timeseries_gapfill_locf",     # rollup + bucket-sized fill
    "graph_triangle_participation",  # bucket self-join + triangle join
    "event_transition_probs",      # per-entity window + tiny agg
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    names = sys.argv[1:] or PROBE
    from gcs_parquet_dataflow_spark import get_spark
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )
    from gcs_parquet_dataflow_spark.queries.catalog import CATALOG

    spark = get_spark()
    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | 0.01→0.1 ratio |")
    print("|---|---|---|---|---|")
    for name in names:
        q = CATALOG[name]
        times = []
        for sf in SFS:
            best = None
            for _ in range(3):  # min-of-3: host has contention bursts
                t0 = time.time()
                q.build(spark, sf).count()
                dt = time.time() - t0
                release_intermediates()
                best = dt if best is None else min(best, dt)
            times.append(best)
        ratio = times[2] / times[1] if times[1] > 0 else float("nan")
        print(
            f"| {name} | {times[0]:.2f} | {times[1]:.2f} | {times[2]:.2f} "
            f"| {ratio:.1f}× |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
