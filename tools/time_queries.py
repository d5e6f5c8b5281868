"""Warm per-query timer + plan capture for optimization rounds.

Times registered queries in ONE warm session (min-of-N like bench.py,
quoting load1 per pass) and optionally writes each query's
``explain('formatted')`` to a directory — the before/after instrument
for OPTIMIZATION_r*.md (bench.py covers only the headline set; sweep
artifacts time session-cold under arbitrary contention).

Usage:
    python tools/time_queries.py [--sf-dir D] [--passes N]
        [--plans-dir plans/r12 --plans-suffix before] query [query ...]

Prints one line per query: ``name  min_s  passes  load1`` and a JSON
tail for machine capture.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    def _positive(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("--passes must be >= 1")
        return n

    ap.add_argument("--passes", type=_positive, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plans-suffix", default="before")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )
    from gcs_parquet_dataflow_spark.queries.catalog import CATALOG
    from gcs_parquet_dataflow_spark.session import get_spark

    unknown = [q for q in args.queries if q not in CATALOG]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="time-queries")
    # one warm-up action so the first timed query doesn't pay JVM/codegen
    # cold start (same convention as bench.py).  NOTE (ADVICE r12): the
    # warm-up builds queries[0], so the FIRST listed query gets a plan-
    # specific extra warm pass later queries don't — cross-query
    # comparisons within one invocation carry that bias; before/after
    # runs of the same query list are unaffected (both sides warm the
    # same plan).
    CATALOG[args.queries[0]].build(spark, args.sf_dir).count()
    release_intermediates()

    out: dict[str, dict] = {}
    for name in args.queries:
        per_pass: list[float] = []
        per_load: list[float] = []
        for _ in range(args.passes):
            per_load.append(round(os.getloadavg()[0], 2))
            start = time.perf_counter()
            df = CATALOG[name].build(spark, args.sf_dir)
            df.count()
            per_pass.append(round(time.perf_counter() - start, 3))
            release_intermediates()
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = CATALOG[name].build(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            release_intermediates()
            path = os.path.join(
                args.plans_dir, f"{name}_{args.plans_suffix}.txt"
            )
            with open(path, "w", encoding="utf-8") as f:
                f.write(plan)
        out[name] = {
            "min_s": min(per_pass),
            "passes": per_pass,
            "load1": per_load,
        }
        print(f"{name:45s} min={min(per_pass):8.3f}  passes={per_pass} "
              f"load1={per_load}")
    spark.stop()
    line = json.dumps({"sf_dir": args.sf_dir, "timings": out})
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
