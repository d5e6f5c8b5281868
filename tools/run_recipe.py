"""Run a JSON curation recipe end-to-end from the command line.

Usage:
    python tools/run_recipe.py RECIPE.json [SF_DIR] [OUT_DIR]

Reads the ``documents`` table from SF_DIR (default
$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01), compiles the recipe
(gcs_parquet_dataflow_spark.plans.recipe), writes the surviving corpus
manifest as parquet to OUT_DIR (default ./recipe_out), and prints a
one-line JSON summary — the operator-facing face of the recipe
compiler, mirroring how the reference is driven by a fetched JSON
config.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    recipe_path = sys.argv[1]
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "./recipe_out"

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
