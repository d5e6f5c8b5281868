"""Run a JSON curation recipe end-to-end from the command line.

Usage:
    python tools/run_recipe.py RECIPE.json [SF_DIR] [OUT_DIR]
    python tools/run_recipe.py --incremental N RECIPE.json [SF_DIR] [OUT_DIR]

Reads the ``documents`` table from SF_DIR (default
$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01), compiles the recipe
(gcs_parquet_dataflow_spark.plans.recipe), writes the surviving corpus
manifest as parquet to OUT_DIR (default ./recipe_out), and prints a
one-line JSON summary — the operator-facing face of the recipe
compiler, mirroring how the reference is driven by a fetched JSON
config.

``--incremental N`` drives the recipe through the LEDGER path instead
(plans/incremental_recipe): the corpus arrives as N deterministic
hash-split batches, each batch runs only the row-local prefix and
lands batch-keyed in OUT_DIR/state (curated lake + merged per-source
stats snapshot), and the deferred scheduling suffix finalizes over the
lake — raw data is scanned once per batch, never re-scanned at
finalize.  The summary carries per-batch curated counts and the final
manifest size; finalize == the one-shot run exactly
(tests/test_round7.py pins the equivalence).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    n_batches = 0
    if argv and argv[0] == "--incremental":
        n_batches = int(argv[1])
        argv = argv[2:]
    if not argv:
        print(__doc__)
        raise SystemExit(2)
    recipe_path = argv[0]
    sf_dir = (
        argv[1]
        if len(argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    out_dir = argv[2] if len(argv) > 2 else "./recipe_out"

    from gcs_parquet_dataflow_spark.catalog import load_table
    from gcs_parquet_dataflow_spark.plans.recipe import (
        compile_recipe,
        load_recipe,
    )
    from gcs_parquet_dataflow_spark.session import get_spark

    with open(recipe_path) as f:
        recipe = load_recipe(f.read())

    spark = get_spark(app_name="run_recipe")
    try:
        docs = load_table(spark, sf_dir, "documents")
        n_in = docs.count()
        if n_batches:
            from gcs_parquet_dataflow_spark.plans.incremental_recipe import (
                finalize_manifest,
                ledger_batches,
                run_incremental_batch,
            )

            state_dir = os.path.join(out_dir, "state")
            ledger = []
            for bid, batch in ledger_batches(docs, n_batches):
                ledger.append(
                    run_incremental_batch(
                        spark, batch, recipe, state_dir, bid
                    )
                )
            out = finalize_manifest(spark, recipe, state_dir)
            out.write.mode("overwrite").parquet(
                os.path.join(out_dir, "manifest")
            )
            written = spark.read.parquet(os.path.join(out_dir, "manifest"))
            summary = {
                "recipe": recipe_path,
                "sf_dir": sf_dir,
                "out_dir": out_dir,
                "mode": f"incremental[{n_batches}]",
                "stages": [e["op"] for e in recipe],
                "rows_in": n_in,
                "ledger": ledger,
                "rows_out": written.count(),
                "columns": written.columns,
            }
        else:
            out = compile_recipe(docs, recipe)
            out.write.mode("overwrite").parquet(out_dir)
            written = spark.read.parquet(out_dir)
            summary = {
                "recipe": recipe_path,
                "sf_dir": sf_dir,
                "out_dir": out_dir,
                "stages": [e["op"] for e in recipe],
                "rows_in": n_in,
                "rows_out": written.count(),
                "columns": written.columns,
            }
        print(json.dumps(summary))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
