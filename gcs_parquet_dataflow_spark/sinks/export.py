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

from pyspark.sql import DataFrame
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
