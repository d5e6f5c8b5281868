"""UDTF extension-point surface (SURVEY §2.12): SQL-registered
row→rows functions with DoFn-style lifecycle hooks."""

from __future__ import annotations

from gcs_parquet_dataflow_spark.functions.udtfs import register_udtfs

import pytest

pytestmark = pytest.mark.fast  # driver quick-gate module (r13)


def test_chunk_text_udtf_lateral_join(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, None)],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM udtf_docs, LATERAL chunk_text(text, 2) AS c
        ORDER BY doc_id, chunk_idx
        """
    ).collect()
    got = [(r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens) for r in rows]
    assert got == [
        (1, 0, "a b", 2),
        (1, 1, "c d", 2),
        (1, 2, "e", 1),
        (2, 0, "x y", 2),
    ]  # NULL text yields no rows, matching the explode-based operator


def test_chunk_text_matches_native_operator(spark):
    """The UDTF twin and the native explode-based chunker agree —
    the point of keeping the slow path out of pipelines."""
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.operators.corpus import chunk_by_tokens

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "one two three four five six seven"), (2, "a b c")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("udtf_docs2")
    via_udtf = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in spark.sql(
            "SELECT doc_id, c.* FROM udtf_docs2, "
            "LATERAL chunk_text(text, 3) AS c"
        ).collect()
    }
    via_native = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in chunk_by_tokens(df, "doc_id", "text", 3, overlap=0)
        .select("doc_id", "chunk_idx", F.col("chunk_text"))
        .collect()
    }
    assert via_udtf == via_native


def test_tagged_explode_terminate_hook(spark):
    register_udtfs(spark)
    df = spark.createDataFrame([("a,b,c",), ("d,e",)], "csv string")
    df.coalesce(1).createOrReplaceTempView("udtf_csv")
    rows = spark.sql(
        "SELECT t.event, t.n_in_bundle FROM udtf_csv, "
        "LATERAL tagged_explode(csv) AS t"
    ).collect()
    events = [r.event for r in rows if r.event != "__bundle_end__"]
    bundles = [r.n_in_bundle for r in rows if r.event == "__bundle_end__"]
    assert sorted(events) == ["a", "b", "c", "d", "e"]
    # every partition flushed a summary row; totals add up to 5
    assert sum(bundles) == 5
