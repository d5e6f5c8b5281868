"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables, compare row count + column names + values
(order-insensitive), and report per-query PASS/FAIL with diffs.

Usage: python tools/oracle_check.py [--json out.json] [sf_dir] [query ...]

Requested query names that match nothing in the registry are reported as
FAIL (exit non-zero): a typo'd name must never produce a clean "N pass"
line (VERDICT r6 item 4).  ``--json PATH`` records per-query status and
wall-clock seconds (spark side / oracle side) for sweep artifacts such as
the sf0.1 full-suite proof.
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
