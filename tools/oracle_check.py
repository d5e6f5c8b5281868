"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables, compare row count + column names + values
(order-insensitive), and report per-query PASS/FAIL with diffs.

Usage: python tools/oracle_check.py [--json out.json] [--since COMMIT]
       [sf_dir] [query ...]

Requested query names that match nothing in the registry are reported as
FAIL (exit non-zero): a typo'd name must never produce a clean "N pass"
line (VERDICT r6 item 4).  ``--json PATH`` records per-query status and
wall-clock seconds (spark side / oracle side) for sweep artifacts such as
the sf0.1 full-suite proof.

``--since COMMIT`` (round 12 — the dev-loop subset mode): select only
queries whose BUILDER FUNCTION's source lines intersect ``git diff
COMMIT`` hunks in the query modules.  Approximate by design — a change
to a shared helper or an inlined constant outside the builder body is
not traced transitively (the full sweep remains the round gate) — but
it keeps the per-change loop at minutes as the registry grows.
Composable with explicit names (union).
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and format to a stable repr
        return repr(v + 0.0)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return repr(v)


def rows_key(columns, rows):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        out.append(tuple(normalize(r[i]) for i in order))
    out.sort()
    return [columns[i] for i in order], out


def queries_changed_since(commit: str, queries: dict) -> set[str]:
    """Names of registered queries whose builder function's current
    source-line range intersects a ``git diff <commit>`` hunk in its
    module.  One subprocess per distinct module file."""
    import inspect
    import os
    import subprocess

    by_file: dict[str, list[tuple[str, int, int]]] = {}
    for name, fn in queries.items():
        f = inspect.unwrap(fn)
        # the registry stores bound builders; reach the original def
        target = getattr(f, "__wrapped__", f)
        try:
            lines, start = inspect.getsourcelines(target)
            path = inspect.getsourcefile(target)
        except (OSError, TypeError):
            continue
        if path:
            by_file.setdefault(os.path.abspath(path), []).append(
                (name, start, start + len(lines) - 1)
            )
    changed: set[str] = set()
    for path, spans in by_file.items():
        try:
            diff = subprocess.run(
                ["git", "diff", "--unified=0", commit, "--", path],
                capture_output=True, text=True, cwd="/root/repo",
                check=True,
            ).stdout
        except subprocess.CalledProcessError as exc:
            raise SystemExit(
                f"--since: git diff {commit} failed: {exc.stderr}"
            ) from exc
        hunks = []
        for line in diff.splitlines():
            if line.startswith("@@"):
                # @@ -a,b +c,d @@ — the NEW-side range is what maps to
                # the current source lines inspect reports
                new = line.split("+", 1)[1].split(" ", 1)[0]
                c, _, d = new.partition(",")
                lo = int(c)
                n = int(d) if d else 1
                hunks.append((lo, lo + max(n, 1) - 1))
        for name, lo, hi in spans:
            if any(h_lo <= hi and lo <= h_hi for h_lo, h_hi in hunks):
                changed.add(name)
    return changed


def main():
    import duckdb

    import __spark_entry__ as entry
    from gcs_parquet_dataflow_spark.catalog import TABLES
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )
    from gcs_parquet_dataflow_spark.session import get_spark

    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print(
                "usage: oracle_check.py [--json OUT] [sf_dir] [query ...]"
                "\n--json requires an output path",
                file=sys.stderr,
            )
            return 2
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    since = None
    if "--since" in argv:
        i = argv.index("--since")
        if i + 1 >= len(argv):
            print("--since requires a commit-ish", file=sys.stderr)
            return 2
        since = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    if since is not None:
        hit = queries_changed_since(since, queries)
        print(
            f"--since {since}: {len(hit)} builder(s) changed"
            + (": " + " ".join(sorted(hit)) if hit else "")
        )
        only |= hit
        if not only:
            print("== nothing changed since that commit; 0 selected ==")
            spark.stop()
            return 0
    unknown = sorted(only - set(queries))
    n_pass = n_fail = n_weak = 0
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            results[name] = {"status": "fail", "err": f"spark: {e}"[:500]}
            continue
        finally:
            release_intermediates()
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle, rows-only)")
            n_weak += 1
            results[name] = {
                "status": "rows_only",
                "rows": len(srows),
                "spark_sec": round(t_spark, 3),
            }
            continue
        t1 = time.monotonic()
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            results[name] = {"status": "fail", "err": f"duckdb: {e}"[:500]}
            continue
        t_duck = time.monotonic() - t1
        ok = True
        msgs = []
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if ok:
            _, skey = rows_key(scols, [tuple(r) for r in srows])
            _, dkey = rows_key(dcols, drows)
            if skey != dkey:
                ok = False
                diffs = [
                    (a, b) for a, b in zip(skey, dkey) if a != b
                ][:3]
                extra = abs(len(skey) - len(dkey))
                msgs.append(f"values differ: first diffs {diffs} (+{extra} len)")
        if ok:
            print(f"PASS  {name}: rows={len(srows)} ({t_spark:.2f}s/{t_duck:.2f}s)")
            n_pass += 1
            results[name] = {
                "status": "pass",
                "rows": len(srows),
                "spark_sec": round(t_spark, 3),
                "oracle_sec": round(t_duck, 3),
            }
        else:
            print(f"FAIL  {name}: {'; '.join(msgs)}")
            n_fail += 1
            results[name] = {"status": "fail", "err": "; ".join(msgs)[:500]}
    for name in unknown:
        print(f"FAIL  {name}: unknown query name (not in registry)")
        n_fail += 1
        results[name] = {"status": "fail", "err": "unknown query name"}
    print(f"\n== {n_pass} pass, {n_weak} rows-only, {n_fail} fail ==")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "pass": n_pass,
                    "rows_only": n_weak,
                    "fail": n_fail,
                    "queries": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_path}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
