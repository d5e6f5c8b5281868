"""End-to-end batch backfill: files on disk → glob match → route →
read → transform → events + DLQ + unmatched (reference run_batch DAG)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.config.model import load_configs
from gcs_parquet_dataflow_spark.plans.compiler import CompilerOptions
from gcs_parquet_dataflow_spark.sources.batch import list_files, run_batch

pytestmark = pytest.mark.fast  # driver quick-gate module (r13)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("lake")


@pytest.fixture(scope="module")
def lake(spark, data_dir):
    """Two routed sources with different schemas + one unrouted file."""
    a = spark.createDataFrame(
        [("click", 1, "2024-01-01 00:00:00"), ("view", 2, "2024-01-02 00:00:00")],
        "event_name string, user_id long, ts string",
    )
    a.coalesce(1).write.mode("overwrite").parquet(str(data_dir / "src_a" / "d1"))
    b = spark.createDataFrame(
        [(3.5, "u9"), (float("nan"), "u10")], "amount double, uid string"
    )
    b.coalesce(1).write.mode("overwrite").parquet(str(data_dir / "src_b" / "d1"))
    c = spark.createDataFrame([(1,)], "x long")
    c.coalesce(1).write.mode("overwrite").parquet(str(data_dir / "other" / "d1"))
    return data_dir


def configs_for(root):
    return load_configs(
        [
            {
                "config_id": "a",
                "source_gcs_prefix": f"file:{root}/src_a/",
                "file_type": "PARQUET",
                "mixpanel_event_name_from_field": "event_name",
                "field_mappings": [
                    {"source_field": "ts", "mixpanel_field": "time",
                     "type": "unix_timestamp_auto"},
                    {"source_field": "user_id", "mixpanel_field": "$user_id",
                     "type": "string"},
                ],
            },
            {
                "config_id": "b",
                "source_gcs_prefix": f"file:{root}/src_b/",
                "file_type": "PARQUET",
                "mixpanel_event_name": "payment",
                "field_mappings": [
                    {"source_field": "amount", "mixpanel_field": "amount",
                     "type": "float", "is_required_in_source": True},
                    {"source_field": "uid", "mixpanel_field": "$user_id",
                     "type": "string"},
                ],
            },
        ]
    )


def test_list_files_glob(spark, lake):
    files = list_files(spark, f"file:{lake}/*/*/*.parquet")
    names = [r["uri"] for r in files.collect()]
    assert len(names) == 3
    assert all(n.endswith(".parquet") for n in names)


def test_run_batch_end_to_end(spark, lake):
    opts = CompilerOptions(
        token="tk", now_epoch=F.lit(1700000000), uuid=F.lit("fixed-uuid")
    )
    ok, dlq, unmatched = run_batch(
        spark, configs_for(lake), f"file:{lake}/*/*/*.parquet", opts
    )
    ok_rows = [json.loads(r["event_json"]) for r in ok.collect()]
    events = sorted(d["event"] for d in ok_rows)
    # src_a: click+view; src_b: one ok payment (NaN row is required-null → DLQ)
    assert events == ["click", "payment", "view"]
    assert dlq.count() == 1
    [drow] = dlq.collect()
    assert drow["_error"]["error_type"] == "missing_required_field"
    # the 'other' dir file routed nowhere
    assert [os.path.basename(r["uri"]).startswith("part")
            for r in unmatched.collect()] == [True]
    payment = next(d for d in ok_rows if d["event"] == "payment")
    assert payment["properties"]["amount"] == 3.5
    assert payment["properties"]["$user_id"] == "u9"


def test_plan_batch_reads_json_config_files(spark, tmp_path):
    """file_type dispatch beyond the reference's parquet-only surface:
    a JSON-typed config's files read through spark.read.json with the
    same route-first / per-config-schema flow."""
    import json as _json

    from gcs_parquet_dataflow_spark.config.model import load_configs
    from gcs_parquet_dataflow_spark.sources.batch import plan_batch

    pdir = tmp_path / "p"
    jdir = tmp_path / "j"
    pdir.mkdir(); jdir.mkdir()
    spark.createDataFrame(
        [("click", 1)], "event_name string, user_id long"
    ).coalesce(1).write.mode("append").parquet(str(pdir))
    (jdir / "a.json").write_text(
        _json.dumps({"event_name": "jtap", "user_id": 9}) + "\n"
    )
    configs = load_configs([
        {"config_id": "pq", "source_gcs_prefix": f"file:{pdir}",
         "file_type": "PARQUET",
         "mixpanel_event_name_from_field": "event_name",
         "field_mappings": [{"source_field": "user_id",
                             "mixpanel_field": "$user_id", "type": "string"}]},
        {"config_id": "js", "source_gcs_prefix": f"file:{jdir}",
         "file_type": "JSON",
         "mixpanel_event_name_from_field": "event_name",
         "field_mappings": [{"source_field": "user_id",
                             "mixpanel_field": "$user_id", "type": "string"}]},
    ])
    batches, unmatched = plan_batch(
        spark, configs, f"file:{tmp_path}/*/*", parquet_only=False
    )
    by_id = {b.config.config_id: b for b in batches}
    assert set(by_id) == {"pq", "js"}
    import json as _json2

    j_events = [
        _json2.loads(r["event_json"])
        for r in by_id["js"].events().filter(F.col("_error").isNull()).collect()
    ]
    assert [e["event"] for e in j_events] == ["jtap"]
    assert j_events[0]["properties"]["$user_id"] == "9"


def test_read_with_lineage_csv_with_schema(spark, tmp_path):
    from gcs_parquet_dataflow_spark.sources.batch import read_with_lineage

    p = tmp_path / "c.csv"
    p.write_text("event_name,user_id\nbuy,7\nclick,8\n")
    df = read_with_lineage(
        spark, f"file:{p}", file_type="CSV",
        schema="event_name string, user_id long",
    )
    rows = sorted((r["event_name"], r["user_id"]) for r in df.collect())
    assert rows == [("buy", 7), ("click", 8)]
    assert all(r["_uri"].endswith("c.csv") for r in df.collect())


def test_read_jsonl_with_dlq_quarantines_malformed_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from gcs_parquet_dataflow_spark.sources.text_formats import (
        read_jsonl_with_dlq,
    )

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "score": 1.5}\n'
        '{"id": 2, "name": "b"}\n'                       # missing field -> NULL
        '{"id": "x", "name": "c", "score": 2.0}\n'       # uncastable id
        '{"id": 3, "name": "d", "score":\n'              # truncated JSON
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    ok, dlq = read_jsonl_with_dlq(spark, str(p), schema)
    rows = {r["id"]: r for r in ok.collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["score"] is None
    bad = [r["raw_record"] for r in dlq.collect()]
    assert len(bad) == 2 and all(b.startswith('{"id":') for b in bad)


def test_read_csv_with_dlq_quarantines_bad_rows(spark, tmp_path):
    from pyspark.sql import types as T

    from gcs_parquet_dataflow_spark.sources.text_formats import (
        read_csv_with_dlq,
    )

    p = tmp_path / "in.csv"
    p.write_text("id,name,score\n1,a,1.5\nnope,b,2.0\n3,c,oops\n4,d,4.0\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    ok, dlq = read_csv_with_dlq(spark, str(p), schema)
    assert {r["id"] for r in ok.collect()} == {1, 4}
    assert sorted(r["raw_record"] for r in dlq.collect()) == [
        "3,c,oops",
        "nope,b,2.0",
    ]


def test_backfill_ledger_resumes_and_records_failures(spark, tmp_path):
    """Resumable backfill: a mid-run failure is recorded and re-raised
    after all units are attempted; re-invoking skips completed units
    and re-runs only the failed one; a third run is a no-op."""
    import pytest as _pytest

    from gcs_parquet_dataflow_spark.sources.batch import backfill

    ledger = str(tmp_path / "ledger")
    out = tmp_path / "out"
    out.mkdir()
    calls = []

    def mk(fail_units):
        def process(unit):
            calls.append(unit)
            if unit in fail_units:
                raise RuntimeError(f"boom {unit}")
            (out / f"{unit}.ok").write_text("done")
        return process

    units = ["d1", "d2", "d3", "d4"]
    with _pytest.raises(RuntimeError, match="boom d3"):
        backfill(spark, units, mk({"d3"}), ledger)
    assert calls == units                      # one failure didn't stop d4
    assert (out / "d4.ok").exists()

    calls.clear()
    res = backfill(spark, units, mk(set()), ledger)
    assert calls == ["d3"]                     # only the failed unit reran
    assert res == {"d1": "done", "d2": "done", "d3": "done", "d4": "done"}

    calls.clear()
    res = backfill(spark, units, mk(set()), ledger)
    assert calls == [] and set(res.values()) == {"done"}


def test_register_views_enables_raw_sql_with_pushdown(spark):
    """SQL entry point: registered views answer plain spark.sql with
    results identical to the DataFrame builder, and filters still reach
    the parquet scan (same Catalyst plans either way)."""
    from gcs_parquet_dataflow_spark.catalog import load_table, register_views
    from gcs_parquet_dataflow_spark.queries.catalog import CATALOG

    names = register_views(spark, "/root/testdata/sf0.001")
    assert "lineitem" in names and len(names) == 10

    sql_rows = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        """
    )
    df_rows = (
        load_table(spark, "/root/testdata/sf0.001", "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
    )
    assert sorted(map(tuple, sql_rows.collect())) == sorted(
        map(tuple, df_rows.collect())
    )

    pushed = spark.sql(
        "SELECT l_orderkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01'"
    )
    pushed.collect()
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_shipdate" in plan.split(
        "PushedFilters", 1
    )[1][:300]


def test_resilient_read_skips_corrupt_files_and_quarantine_names_them(
    spark, tmp_path
):
    """One torn upload must not fail the batch: read_resilient returns
    every row of the healthy files, and quarantine_corrupt_files names
    exactly the corrupt member."""
    from gcs_parquet_dataflow_spark.sources.batch import (
        quarantine_corrupt_files,
        read_resilient,
    )

    d = tmp_path / "lake"
    d.mkdir()
    spark.range(0, 50).toDF("id").coalesce(1).write.parquet(str(d / "p1"))
    spark.range(50, 100).toDF("id").coalesce(1).write.parquet(str(d / "p2"))
    # flatten the two part files into one dir + plant a torn file
    import glob
    import shutil

    files = glob.glob(str(d / "p*" / "*.parquet"))
    for i, f in enumerate(files):
        shutil.copy(f, str(d / f"part-{i}.parquet"))
    shutil.rmtree(str(d / "p1"))
    shutil.rmtree(str(d / "p2"))
    (d / "part-torn.parquet").write_bytes(b"PAR1 this is not a real footer")

    got = read_resilient(spark, str(d))
    assert sorted(r["id"] for r in got.collect()) == list(range(100))

    ok, bad = quarantine_corrupt_files(spark, str(d / "*.parquet"))
    assert len(ok) == 2 and len(bad) == 1
    assert bad[0].endswith("part-torn.parquet")


def test_read_with_lineage_orc(spark, tmp_path):
    """ORC joins the file_type dispatch as the second Spark-native
    columnar format: self-describing schema, vectorized scan, per-row
    lineage — a reference user's pipeline swaps formats by config."""
    from gcs_parquet_dataflow_spark.sources.batch import read_with_lineage

    p = str(tmp_path / "orc_data")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"
    ).write.orc(p)
    df = read_with_lineage(spark, p, file_type="ORC")
    rows = sorted((r["id"], r["s"]) for r in df.collect())
    assert rows == [(1, "a"), (2, "b")]
    assert all(r["_uri"] for r in df.collect())
    # predicate pushes into the ORC scan like parquet
    plan = (
        df.filter(F.col("id") > 1)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "PushedFilters" in plan and "id" in plan.split("PushedFilters", 1)[1][:200]
