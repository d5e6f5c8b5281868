"""Compare two oracle_check --json sweep artifacts across scale
factors: per-query wall-time ratios vs the data ratio, flagging
super-linear queries (VERDICT r6 item 1's 'done' bar — any query whose
sf0.01→sf0.1 ratio exceeds the ~10× data ratio must be named and
explained).

Usage:
    python tools/sweep_compare.py SMALL.json BIG.json [data_ratio]

Prints a summary line plus the queries whose spark-side ratio exceeds
the data ratio, worst first.  Wall times on a contended host are noisy
(CLAUDE.md: never trust one pass), so treat the flag list as the
read-the-plan queue, not a verdict.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    with open(sys.argv[1]) as f:
        small = json.load(f)
    with open(sys.argv[2]) as f:
        big = json.load(f)
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
