"""Schema-enforced JSON-lines / CSV ingestion with a corrupt-record DLQ.

The reference ingests only Parquet (sources.json `file_type`:
"PARQUET"); a complete engine needs the text formats those same
pipelines receive upstream. Two rules make these reads behave at 100 TB:

- **Schema is REQUIRED, never inferred.** Inference is a full extra
  pass over the data before the real read; at scale that doubles the
  scan. Callers pass the expected StructType (usually from the routed
  SourceConfig), and every field stays nullable so missing keys become
  NULLs instead of failures.
- **Malformed rows are quarantined, not dropped or fatal.** PERMISSIVE
  mode parks the raw text of any unparseable row in a corrupt-record
  column; we split that into the same (ok, dlq) pair the transform
  compiler produces (plans/compiler.py split_dlq), so bad input reaches
  the dead-letter lake with full fidelity instead of killing the job
  (the reference's transform-DLQ philosophy, main.py:211-223, applied
  to the parse step).

Spark restriction honored here: a query may not reference ONLY the
corrupt-record column of a JSON/CSV scan (SPARK-26108); both splits
project the full row, and the parsed frame is persisted once so the ok
and dlq branches share a single file pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gcs_parquet_dataflow_spark.operators.partitioning import (
    persist_intermediate,
)

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not already contain {CORRUPT_COL}")
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def _split(df: DataFrame, data_cols: list[str]) -> tuple[DataFrame, DataFrame]:
    df = persist_intermediate(df)
    ok = df.filter(F.col(CORRUPT_COL).isNull()).select(*data_cols)
    dlq = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return ok, dlq


def read_jsonl_with_dlq(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """NDJSON read → (ok rows typed to ``schema``, dlq of raw malformed
    lines). A line parses if it is valid JSON and every present field
    casts to its declared type; anything else (truncated JSON, type
    garbage) lands in the DLQ verbatim."""
    full = _with_corrupt_field(schema)
    df = (
        spark.read.schema(full)
        .options(mode="PERMISSIVE", columnNameOfCorruptRecord=CORRUPT_COL)
        .options(**options)
        .json(paths)
    )
    return _split(df, [f.name for f in schema.fields])


def read_csv_with_dlq(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """CSV read → (ok rows typed to ``schema``, dlq of raw malformed
    lines): wrong column count or an uncastable value quarantines the
    whole raw line."""
    full = _with_corrupt_field(schema)
    df = (
        spark.read.schema(full)
        .options(
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=CORRUPT_COL,
            header=str(header).lower(),
        )
        .options(**options)
        .csv(paths)
    )
    return _split(df, [f.name for f in schema.fields])
