"""Single-node throughput: the compiled Catalyst transform vs a
reference-style per-row Python interpreter on the same events table.

The reference executes its transform as interpreted Python per row
inside Beam DoFns (main.py:84-293). This tool measures that
architecture's ceiling (a faithful per-row dict loop over Arrow-read
rows, single process — the per-worker unit Dataflow scales out) against
this engine's compiled whole-stage-codegen path on all local cores,
plus the single-core engine rate for an apples-to-apples per-core view.

Methodology (pinned, VERDICT r4 item 6 — the r4 ratio drift 11.5×→6×
per core came from comparing a warm engine against a sometimes-cold
Python loop on a contended host): BOTH paths now run three passes and
report the min, after an untimed warm-up pass each — the Python loop's
warm-up pays the OS page-cache fill for the parquet file, the engine's
pays JVM/codegen/footer. The min-of-3 is the same steady-state
discipline bench.py uses; cross-round ratios are comparable only
between runs using this scheme (r5 onward).

Usage: python tools/throughput_compare.py [sf_dir]
Prints one JSON line with rows/sec for both paths.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

CONFIG_DICT = {
    "config_id": "events",
    "source_gcs_prefix": "gs://any/",
    "mixpanel_event_name_from_field": "event_type",
    "field_mappings": [
        {"source_field": "ts", "mixpanel_field": "time",
         "type": "unix_timestamp_auto"},
        {"source_field": "user_id", "mixpanel_field": "$user_id",
         "type": "string"},
        {"source_field": "event_id", "mixpanel_field": "$insert_id",
         "type": "string"},
        {"source_field": "value", "mixpanel_field": "value", "type": "float"},
        {"source_field": "*", "mixpanel_field": "*"},
    ],
}


def python_reference_loop(sf_dir: str) -> tuple[int, float]:
    """Faithful reference-style row loop: Arrow batches → to_pylist →
    per-row dict transform → json.dumps (main.py:84-293 shape)."""
    import math

    import pyarrow.parquet as pq

    mappings = CONFIG_DICT["field_mappings"]
    explicit = [m for m in mappings if m["source_field"] != "*"]
    mapped_fields = {m["source_field"] for m in explicit}

    def clean_nan(v):
        if isinstance(v, float) and math.isnan(v):
            return None
        return v

    def one_pass() -> tuple[int, float]:
        n = 0
        start = time.perf_counter()
        pf = pq.ParquetFile(f"{sf_dir}/events.parquet")
        for batch in pf.iter_batches(batch_size=20000):  # main_batch.py:89
            for row in batch.to_pylist():  # the row-ification the reference does
                row = {k: clean_nan(v) for k, v in row.items()}
                event = row.get("event_type")
                if not event:
                    continue
                props = {}
                for m in explicit:
                    v = row.get(m["source_field"])
                    if v is None:
                        continue
                    t = m.get("type", "passthrough")
                    try:
                        if t == "string":
                            v = str(v)
                        elif t == "float":
                            v = float(v)
                        elif t == "unix_timestamp_auto":
                            v = int(v.timestamp()) if hasattr(v, "timestamp") else int(v)
                    except (ValueError, TypeError):
                        continue
                    props[m["mixpanel_field"]] = v
                for k, v in row.items():
                    if k not in mapped_fields and v is not None:
                        props[k] = v
                json.dumps({"event": event, "properties": props}, default=str)
                n += 1
        return n, time.perf_counter() - start

    one_pass()  # warm-up: OS page cache for the parquet file
    passes = [one_pass() for _ in range(3)]
    return passes[0][0], min(s for _, s in passes)


def spark_compiled(sf_dir: str, cores: str) -> tuple[int, float]:
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.catalog import load_table
    from gcs_parquet_dataflow_spark.config.model import load_configs
    from gcs_parquet_dataflow_spark.plans.compiler import compile_config
    from gcs_parquet_dataflow_spark.session import get_spark

    spark = get_spark(app_name=f"throughput-{cores}", master=f"local[{cores}]")
    e = load_table(spark, sf_dir, "events")
    compiled = compile_config(load_configs([CONFIG_DICT])[0], e.schema)
    out = compiled.serialize(e).filter(F.col("_error").isNull())
    out.count()  # warm: JVM, code gen, parquet footer
    best = None
    for _ in range(3):
        start = time.perf_counter()
        n = out.count()
        elapsed = time.perf_counter() - start
        best = elapsed if best is None else min(best, elapsed)
    spark.stop()
    return n, best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ref_n, ref_s = python_reference_loop(sf_dir)
    eng1_n, eng1_s = spark_compiled(sf_dir, "1")
    engN_n, engN_s = spark_compiled(sf_dir, "*")
    print(json.dumps({
        "sf_dir": sf_dir,
        "rows": ref_n,
        "reference_style_python_rows_per_sec": round(ref_n / ref_s),
        "engine_1core_rows_per_sec": round(eng1_n / eng1_s),
        "engine_allcores_rows_per_sec": round(engN_n / engN_s),
        "speedup_1core": round((eng1_n / eng1_s) / (ref_n / ref_s), 1),
        "speedup_allcores": round((engN_n / engN_s) / (ref_n / ref_s), 1),
    }))


if __name__ == "__main__":
    main()
