"""Compare two oracle_check --json sweep artifacts across scale
factors: per-query wall-time ratios vs the data ratio, flagging
super-linear queries (VERDICT r6 item 1's 'done' bar — any query whose
sf0.01→sf0.1 ratio exceeds the ~10× data ratio must be named and
explained).

Usage:
    python tools/sweep_compare.py SMALL.json BIG.json [data_ratio]
    python tools/sweep_compare.py SMALL.json BIG.json [data_ratio] \
        --recheck [BIG_SF_DIR]

Prints a summary line plus the queries whose spark-side ratio exceeds
the data ratio, worst first.  Wall times on a contended host are noisy
(CLAUDE.md: never trust one pass), so treat the flag list as the
read-the-plan queue, not a verdict.

``--recheck`` mechanizes the adjudication loop round 10 ran by hand:
every flagged query is re-timed WARM (two passes in one live session,
min reported) at ``BIG_SF_DIR`` (default /root/testdata/sf0.1) and
re-judged against the small-scale time — a sweep times every query
session-cold, so on this host single-pass flags are routinely
cold/contention artifacts (r10: two different second rows flagged in
two passes; both re-timed at prior-round parity warm).  Only queries
still over the ratio after the warm re-time deserve a plan read.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _recheck(flagged, small, data_ratio, sf_dir) -> int:
    import time

    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )
    from gcs_parquet_dataflow_spark.queries import CATALOG
    from gcs_parquet_dataflow_spark.session import get_spark

    spark = get_spark(app_name="sweep-recheck")
    still_over = 0
    try:
        for _, name, s_sec, b_sec in flagged:
            times = []
            for _ in range(2):
                t0 = time.monotonic()
                CATALOG[name].build(spark, sf_dir).count()
                times.append(time.monotonic() - t0)
                release_intermediates()
            warm = min(times)
            ratio = warm / max(s_sec, 0.05)
            verdict = "STILL OVER — read the plan" if ratio > data_ratio \
                else "cold/contention artifact"
            if ratio > data_ratio:
                still_over += 1
            print(
                f"  recheck {name}: sweep {b_sec:.2f}s -> warm {warm:.2f}s "
                f"({ratio:.1f}x vs small) — {verdict}"
            )
    finally:
        spark.stop()
    return still_over


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--recheck"]
    do_recheck = "--recheck" in sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 2
    with open(argv[0]) as f:
        small = json.load(f)
    with open(argv[1]) as f:
        big = json.load(f)
    rest = argv[2:]
    data_ratio = float(rest[0]) if rest and rest[0].replace(
        ".", "", 1).isdigit() else 10.0
    sf_dir = next(
        (a for a in rest if not a.replace(".", "", 1).isdigit()),
        "/root/testdata/sf0.1",
    )

    rows = []
    for name, b in big["queries"].items():
        s = small["queries"].get(name)
        if not s or "spark_sec" not in s or "spark_sec" not in b:
            continue
        lo = max(s["spark_sec"], 0.05)  # floor: sub-50ms times are noise
        rows.append((b["spark_sec"] / lo, name, s["spark_sec"], b["spark_sec"]))
    rows.sort(reverse=True)

    n_over = sum(1 for r in rows if r[0] > data_ratio)
    print(
        f"{len(rows)} timed queries; data ratio {data_ratio:.0f}x; "
        f"{n_over} exceed it (spark side)"
    )
    for ratio, name, s_sec, b_sec in rows:
        if ratio > data_ratio:
            print(f"  {ratio:6.1f}x  {name}: {s_sec:.2f}s -> {b_sec:.2f}s")
    med = sorted(r[0] for r in rows)[len(rows) // 2] if rows else 0.0
    print(f"median ratio {med:.2f}x")
    if do_recheck and n_over:
        flagged = [r for r in rows if r[0] > data_ratio]
        still = _recheck(flagged, small, data_ratio, sf_dir)
        print(f"recheck: {still}/{len(flagged)} still over after warm re-time")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
