"""Round-12 optimization pins: the CC loop's convergence count is now a
``_moved`` flag folded into the round's label frame (no per-round
labels⋈labels join) and the edge cache is partitioned by ``src``. These
tests pin the EXACT per-round changed semantics the old join-based
count defined, on a hand-computed chain — a drifted flag (e.g. compared
against the wrong round's labels, or `<=` instead of `<`) shifts these
numbers and the auto dial's escalation points with them."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators import dedup as DD

import pytest

pytestmark = pytest.mark.fast  # driver quick-gate module (r13)


def _chain(spark, n):
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    return nodes, pairs


def test_cc_changed_count_exact_on_truncated_chain(spark):
    """0–5 chain, label mode, max_iter=2: round 1 moves nodes 1..5
    (changed=5), round 2 moves nodes 2..5 (changed=4) — the report must
    carry the ROUND-2 count, and labels must be min-within-2-hops."""
    nodes, pairs = _chain(spark, 6)
    got = DD.connected_components(
        nodes, pairs, id_col="doc_id", max_iter=2,
        metric_name="cc_changed_exact",
    )
    labels = {r["doc_id"]: r["cluster"] for r in got.collect()}
    rep = DD.last_cc_report()
    assert labels == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 3}
    assert rep.iterations == 2 and not rep.converged
    assert rep.changed_at_stop == 4
    assert "doc_id" in got.columns and "cluster" in got.columns
    assert "_moved" not in got.columns  # internal flag never leaks


def test_cc_changed_count_exact_jump_mode(spark):
    """Same chain, jump mode, max_iter=2: the changed count compares
    against the round's STARTING labels (after both the neighbor-min
    AND the pointer-jump step): round 2 moves nodes 2..5 → 4."""
    nodes, pairs = _chain(spark, 6)
    got = DD.connected_components(
        nodes, pairs, id_col="doc_id", max_iter=2, algorithm="jump",
        metric_name="cc_changed_exact_jump",
    )
    labels = {r["doc_id"]: r["cluster"] for r in got.collect()}
    rep = DD.last_cc_report()
    assert labels == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 2}
    assert rep.iterations == 2 and not rep.converged
    assert rep.changed_at_stop == 4
