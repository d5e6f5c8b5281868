"""G2 metrics via df.observe: counters computed during the pipeline
action (no second pass), matching the reference's Beam counter set."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.config.model import load_configs
from gcs_parquet_dataflow_spark.operators.metrics import (
    observe_routing,
    observe_transform,
)
from gcs_parquet_dataflow_spark.operators.routing import with_routing
from gcs_parquet_dataflow_spark.plans.compiler import CompilerOptions, compile_config

import pytest

pytestmark = pytest.mark.fast  # driver quick-gate module (r13)


def test_observe_transform_counters(spark):
    df = spark.createDataFrame(
        [
            (1, "click", "u1"),
            (2, "click", None),   # required $user_id null → DLQ
            (3, None, "u3"),      # dynamic event name null → DLQ
            (4, "view", "u4"),
        ],
        "event_id long, event_type string, user_id string",
    )
    config = load_configs(
        [
            {
                "config_id": "m",
                "source_gcs_prefix": "gs://b/",
                "mixpanel_event_name_from_field": "event_type",
                "field_mappings": [
                    {"source_field": "user_id", "mixpanel_field": "$user_id",
                     "type": "string", "is_required_in_source": True},
                ],
            }
        ]
    )[0]
    out = compile_config(config, df.schema, CompilerOptions()).apply(df)
    observed, obs = observe_transform(out)
    observed.collect()  # one action drives pipeline AND counters
    got = obs.get
    assert got["n_rows"] == 4
    assert got["n_ok"] == 2
    assert got["n_dlq"] == 2
    assert got["n_missing_required"] == 1
    assert got["n_missing_event_name"] == 1
    assert got["n_missing_ids"] == 0


def test_observe_routing_counters(spark):
    configs = load_configs(
        [
            {"config_id": "a", "source_gcs_prefix": "gs://x/",
             "field_mappings": []},
        ]
    )
    df = spark.createDataFrame(
        [("gs://x/f1",), ("gs://x/f2",), ("gs://other/f3",)], "uri string"
    )
    routed = with_routing(df, configs, uri_col="uri")
    observed, obs = observe_routing(routed)
    observed.collect()
    assert obs.get == {"n_uris": 3, "n_routed": 2, "n_unmatched": 1}


def test_connected_components_chain(spark):
    """Transitive closure: a chain clusters to its min id; isolated
    nodes keep their own id."""
    from gcs_parquet_dataflow_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 20)], "id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {r["id"]: r["cluster"] for r in connected_components(nodes, pairs, "id").collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}
