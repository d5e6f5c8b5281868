"""Interchange exports: NDJSON / CSV out of the lake.

The reference's only egress is the HTTP NDJSON sink (K1); real
pipelines also hand data to other systems as files. Rules mirrored
from the ingest side (sources/text_formats.py):

- NDJSON is the default interchange (schema-free, line-splittable,
  gzip-friendly — the same shape the HTTP sink posts); CSV only for
  flat schemas (nested columns are rejected loudly rather than
  stringified silently).
- Writes go through the same partitioned layout helpers as the lake
  (optional partition columns, optional gzip, bounded file count), so
  an export is just another table directory any engine can read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _writer(df: DataFrame, n_files: int | None, partition_by: list[str] | None):
    out = df if n_files is None else df.coalesce(n_files)
    w = out.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w


def write_ndjson(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    gzip: bool = False,
    n_files: int | None = None,
) -> None:
    """Export as newline-delimited JSON (one object per row, null
    fields omitted — matching the HTTP sink's serialization and
    ``to_json`` defaults)."""
    w = _writer(df, n_files, partition_by)
    if gzip:
        w = w.option("compression", "gzip")
    w.json(path)


def write_csv(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    header: bool = True,
    gzip: bool = False,
    n_files: int | None = None,
) -> None:
    """Export as CSV. Nested columns (struct/array/map) are refused:
    CSV has no lossless encoding for them — export NDJSON instead or
    flatten first."""
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType))
    ]
    if bad:
        raise ValueError(
            f"CSV cannot represent nested columns {bad}; "
            "use write_ndjson or flatten first"
        )
    w = _writer(df, n_files, partition_by).option(
        "header", str(header).lower()
    )
    if gzip:
        w = w.option("compression", "gzip")
    w.csv(path)


def export_dataset_layout(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    split_col: str = "split",
    shards_per_split: int | None = None,
    target_shard_bytes: int = 256 * 1024 * 1024,
) -> dict:
    """Write the curated corpus in the datasets-library layout the
    training side actually loads: one directory per split holding
    deterministically numbered parquet shards
    (``<split>/part-...parquet``) plus a ``_manifest.json`` with
    per-split row counts, shard counts, and the schema — the handoff
    artifact between the curation pipeline and a training loader
    (load via ``load_dataset("parquet", data_files=...)`` or any
    parquet reader).

    Shard count defaults to size-targeted (``target_shard_bytes``
    estimated from a sampled row) and both loaders and re-runs see a
    complete split or none: each split is written with overwrite into
    its own directory, and the manifest is written LAST — readers that
    check the manifest never observe a half-written layout.

    Returns the manifest dict. Scale shape: one repartition per split
    (the writer parallelism IS the shard count); no driver-side data.
    """
    import json as _json
    import math

    splits = [r[0] for r in df.select(split_col).distinct().collect()]
    if not splits:
        raise ValueError("no rows to export")
    manifest: dict = {"splits": {}, "schema": df.schema.jsonValue()}
    out_cols = [c for c in df.columns if c != split_col]
    for s in sorted(splits):
        part = df.filter(F.col(split_col) == s).select(*out_cols)
        n = part.count()
        if shards_per_split is not None:
            shards = shards_per_split
        else:
            sample = part.limit(100).toPandas()
            est_row = max(
                64,
                int(
                    sample.memory_usage(index=False, deep=True).sum()
                    / max(1, len(sample))
                ),
            )
            shards = max(1, math.ceil(n * est_row / target_shard_bytes))
        part.repartition(shards).write.mode("overwrite").parquet(
            f"{path}/{s}"
        )
        manifest["splits"][s] = {"num_rows": n, "num_shards": shards}
    # manifest last: its presence certifies a complete layout
    spark.createDataFrame(
        [(_json.dumps(manifest),)], "manifest string"
    ).coalesce(1).write.mode("overwrite").text(f"{path}/_manifest")
    return manifest
