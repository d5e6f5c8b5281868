"""Round-13 optimization pins.

1. Frontier propagation + jump build-side filter in
   ``connected_components`` must be VALUE-identical to full
   propagation — pinned here on a graph shaped to catch the classic
   frontier bug (a node whose neighbor stops moving must still hold
   the label it already absorbed, and a late-arriving smaller label
   must re-open the frontier through it).
2. ``_list_data_files`` (the local-FS fast listing behind the swap
   lease epoch) must see exactly the data files — skipping markers,
   checksums and _SUCCESS — and ``_dest_epoch`` must move iff the data
   file set moves.
3. ``brute_force_topk_precomputed`` (shared-assignment ground truth)
   must be row-identical to ``brute_force_topk`` including the cos
   doubles.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators import dedup as DD
from gcs_parquet_dataflow_spark.operators import similarity as SIM

import pytest

pytestmark = pytest.mark.fast  # driver quick-gate module (r13)


def _cc(spark, pairs, algorithm, max_iter=20):
    nodes = (
        pairs.selectExpr("id_a as doc_id")
        .union(pairs.selectExpr("id_b as doc_id"))
        .distinct()
    )
    got = DD.connected_components(
        nodes, pairs, id_col="doc_id", max_iter=max_iter,
        metric_name=f"opt13_{algorithm}", algorithm=algorithm,
    )
    return {r["doc_id"]: r["cluster"] for r in got.collect()}


def test_frontier_matches_closure_on_merging_chains(spark):
    """Two chains that meet late: 10-1-2-3 and 0-4-5-6 plus bridge 3-6.
    Node 3's neighbor 2 stops moving rounds before the 0-label arrives
    over the bridge — a frontier bug that drops absorbed-but-stale
    neighbors, or never re-opens through the bridge, breaks the min-id
    fixed point here."""
    pairs = spark.createDataFrame(
        [(10, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6), (3, 6)],
        ["id_a", "id_b"],
    )
    expected = {n: 0 for n in (0, 1, 2, 3, 4, 5, 6, 10)}
    for algo in ("label", "jump", "auto"):
        assert _cc(spark, pairs, algo) == expected, algo
        assert DD.last_cc_report().converged


def test_jump_build_filter_on_deep_chain(spark):
    """A 40-hop chain in jump mode: pointer jumping must still converge
    in O(log n) rounds with the build side filtered to non-root rows
    (every intermediate node IS non-root here, so the filter prunes
    only the true roots — dropping anything else would stall the
    shortcut)."""
    n = 40
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    labels = _cc(spark, pairs, "jump", max_iter=12)
    assert labels == {i: 0 for i in range(n)}
    rep = DD.last_cc_report()
    assert rep.converged and rep.iterations <= 9  # ~log2(40)+const, not 40


def test_list_data_files_and_epoch(spark, tmp_path):
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
        _dest_epoch,
        _fs_and_path,
        _list_data_files,
    )

    root = tmp_path / "tbl"
    (root / "_t=0" / "_bucket=3").mkdir(parents=True)
    (root / "_t=0" / "_bucket=3" / "part-0.parquet").write_bytes(b"abcd")
    (root / "_t=0" / "_bucket=3" / ".part-0.parquet.crc").write_bytes(b"x")
    (root / "_SUCCESS").write_bytes(b"")
    (root / "_fold_gen_0_COMMITTED").write_bytes(b"{}")

    fs, hpath, jvm = _fs_and_path(spark, str(root))
    files = _list_data_files(fs, hpath)
    assert [(os.path.basename(p), sz) for p, sz in files] == [
        ("part-0.parquet", 4)
    ]

    e1 = _dest_epoch(fs, hpath, jvm)
    assert e1 == _dest_epoch(fs, hpath, jvm)  # stable on no change
    (root / "_t=0" / "_bucket=3" / "part-1.parquet").write_bytes(b"ef")
    assert _dest_epoch(fs, hpath, jvm) != e1  # any new data file moves it
    # missing dir = empty epoch (pre-create table state)
    gone = jvm.org.apache.hadoop.fs.Path(str(tmp_path / "absent"))
    assert _dest_epoch(fs, gone, jvm) == frozenset()


def test_brute_force_topk_precomputed_bit_identical(spark):
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = emb.filter(F.col("vec_id") < 3)
    base = SIM.brute_force_topk(emb, q, k=4, vec_col="v")
    assigned = SIM.ivf_assigned_corpus(emb, vec_col="v")
    fast = SIM.brute_force_topk_precomputed(assigned, q, k=4, vec_col="v")
    cols = ["query_id", "neighbor_id", "rank", "cos"]
    assert base.select(*cols).exceptAll(fast.select(*cols)).count() == 0
    assert fast.select(*cols).exceptAll(base.select(*cols)).count() == 0
