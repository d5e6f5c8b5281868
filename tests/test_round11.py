"""Round-11 pins: the connected-components iteration dial (VERDICT
r10 item 4) and the cosine family's precomputed-norm invariants
(VERDICT r10 item 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators import dedup as DD
from gcs_parquet_dataflow_spark.operators import similarity as SIM


def _chain(spark, n):
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    return nodes, pairs


def test_cc_dial_truncates_loudly_and_refines_never_merges(spark):
    """A diameter-39 chain capped at max_iter=5: the run must stop at
    the cap with a LOUD CCReport (converged=False, labels still
    moving), and the capped labels must be a REFINEMENT of the true
    single component — every capped cluster id is a real node id that
    is <= its members (min-within-k-hops), never a cross-component
    merge."""
    nodes, pairs = _chain(spark, 40)
    capped = DD.connected_components(
        nodes, pairs, id_col="doc_id", max_iter=5,
        metric_name="cc_chain_test",
    )
    got = {r["doc_id"]: r["cluster"] for r in capped.collect()}
    rep = DD.last_cc_report()
    assert rep.metric_name == "cc_chain_test"
    assert rep.max_iter == 5 and rep.iterations == 5
    assert not rep.converged and rep.changed_at_stop > 0
    # refinement: label = min id within 5 hops = max(0, id - 5)
    assert got == {i: max(0, i - 5) for i in range(40)}
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )

    release_intermediates()


def test_cc_dial_converges_when_raised(spark):
    """The same chain with the dial above the diameter converges to
    ONE component and reports it — capped≡uncapped exactly when the
    report says converged (the contract the two *_capped oracle rows
    lean on)."""
    nodes, pairs = _chain(spark, 40)
    full = DD.connected_components(
        nodes, pairs, id_col="doc_id", max_iter=45,
        metric_name="cc_chain_test_full",
    )
    assert {r["cluster"] for r in full.collect()} == {0}
    rep = DD.last_cc_report()
    assert rep.converged
    # one propagation round per hop for the min label + the no-change
    # confirmation round: diameter-bound, not max_iter-bound
    assert rep.iterations <= 41
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )

    release_intermediates()


def test_cc_dial_raise_on_nonconverged(spark):
    nodes, pairs = _chain(spark, 40)
    with pytest.raises(RuntimeError, match="did not converge"):
        DD.connected_components(
            nodes, pairs, id_col="doc_id", max_iter=3,
            raise_on_nonconverged=True,
        )
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )

    release_intermediates()


def test_cc_report_is_noop_on_shallow_graph(spark):
    """Star components (the fixture shape): cap far above the diameter
    is a no-op and the report proves it — the capped oracle rows'
    premise."""
    nodes = spark.range(9).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 5)] + [(5, i) for i in range(6, 9)],
        "id_a long, id_b long",
    )
    out = DD.connected_components(
        nodes, pairs, id_col="doc_id", max_iter=10
    )
    got = {r["doc_id"]: r["cluster"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 5, 7: 5, 8: 5}
    rep = DD.last_cc_report()
    assert rep.converged and rep.iterations <= 3
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )

    release_intermediates()


def test_bucket_keyed_norm_matches_inline_norm(spark):
    """The precomputed ``_norm`` column must be the bit-identical
    double of the inline ``norm()`` fold — the invariant that lets the
    cosine family swap 3 HOF folds per pair for 1 without moving a
    single oracle hash."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [round(rng.uniform(-1, 1), 6) for _ in range(16)])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    planes = SIM.hyperplanes(n_planes=4, dim=16, seed=13)
    keyed = SIM._bucket_keyed(df, [planes], "vec_id", "v")
    check = keyed.withColumn("_n2", SIM.norm(F.col("_v")))
    assert check.filter(F.col("_norm") != F.col("_n2")).count() == 0


def test_probe_reads_stored_norm_and_handles_legacy_index(
    spark, tmp_path
):
    """New indexes store _norm; a pre-r11 index without it must still
    probe correctly (inline-norm fallback, same doubles)."""
    import random

    rng = random.Random(11)
    corpus = spark.createDataFrame(
        [
            (i, [round(rng.uniform(-1, 1), 6) for _ in range(16)])
            for i in range(60)
        ],
        "vec_id long, v array<double>",
    )
    batch = corpus.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("v", lambda x: x + 0.001).alias("v"),
    ).limit(10)
    planes = SIM.hyperplanes(n_planes=4, dim=16, seed=13)

    new_idx = str(tmp_path / "new_idx")
    SIM.build_cosine_bucket_index(
        corpus, new_idx, planes=planes, id_col="vec_id", vec_col="v"
    )
    assert "_norm" in spark.read.parquet(new_idx).columns
    want = sorted(
        tuple(r)
        for r in SIM.cosine_batch_pairs(
            batch, corpus, 0.99, planes=planes, id_col="vec_id", vec_col="v"
        ).collect()
    )
    got_new = sorted(
        tuple(r)
        for r in SIM.cosine_batch_against_index(
            spark, new_idx, batch, 0.99, planes=planes,
            id_col="vec_id", vec_col="v",
        ).collect()
    )
    assert got_new == want and want  # non-vacuous

    # legacy layout: same index minus the _norm column
    legacy_idx = str(tmp_path / "legacy_idx")
    spark.read.parquet(new_idx).drop("_norm").write.partitionBy(
        "_t", "_bucket"
    ).parquet(legacy_idx)
    got_legacy = sorted(
        tuple(r)
        for r in SIM.cosine_batch_against_index(
            spark, legacy_idx, batch, 0.99, planes=planes,
            id_col="vec_id", vec_col="v",
        ).collect()
    )
    assert got_legacy == want


def test_index_probe_corpus_cap_bounds_degenerate_bucket(spark, tmp_path):
    """ADVICE r10: the streaming probe's corpus-side cap — a
    degenerate all-identical cluster indexed into ONE bucket is
    excluded by max_bucket_size, so the probe cost stays bounded as
    the bucket accretes; normal buckets are untouched."""
    import random

    rng = random.Random(13)
    dim = 16
    normal = [
        (i, [round(rng.uniform(-1, 1), 6) for _ in range(dim)])
        for i in range(40)
    ]
    bomb = [(10_000 + i, [0.5] * dim) for i in range(300)]
    corpus = spark.createDataFrame(
        normal + bomb, "vec_id long, v array<double>"
    )
    planes = SIM.hyperplanes(n_planes=4, dim=dim, seed=13)
    idx = str(tmp_path / "idx")
    SIM.build_cosine_bucket_index(
        corpus, idx, planes=planes, id_col="vec_id", vec_col="v"
    )
    probe = spark.createDataFrame(
        [(99_999, [0.5] * dim)] + normal[:5], "vec_id long, v array<double>"
    ).select((F.col("vec_id") + 500_000).alias("vec_id"), "v")

    uncapped = SIM.cosine_batch_against_index(
        spark, idx, probe, 0.999, planes=planes,
        id_col="vec_id", vec_col="v",
    ).count()
    assert uncapped >= 300  # the bomb matches itself 300×

    capped = SIM.cosine_batch_against_index(
        spark, idx, probe, 0.999, planes=planes,
        id_col="vec_id", vec_col="v", max_bucket_size=50,
    )
    n_capped = capped.count()
    # bomb bucket (300 members) excluded; the 5 normal self-probes
    # (and whatever shares their buckets under the cap) survive
    assert n_capped < 300
    got_ids = {
        r["corpus_id"] for r in capped.collect()
    }
    assert not any(cid >= 10_000 for cid in got_ids)
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )

    release_intermediates()


def test_embedding_dedup_stream_cap_dial_is_noop_on_benign_data(
    spark, tmp_path
):
    """The stream's max_index_bucket_size plumb (ADVICE r10): on
    benign data the armed guard must change NOTHING (capped ≡
    unarmed index + report — the hot-bucket no-op proof pattern), so
    the dial is safe to leave on in production where it exists to
    bound a degenerate cluster's accretion."""
    import random as _rnd

    from gcs_parquet_dataflow_spark.streaming.pipeline import (
        run_embedding_dedup_stream,
    )

    dim = 16
    planes = SIM.hyperplanes(n_planes=6, dim=dim, seed=13)
    rng = _rnd.Random(53)

    def vec():
        return [round(rng.uniform(-1, 1), 6) for _ in range(dim)]

    v1, v2, v12 = vec(), vec(), vec()
    indir = tmp_path / "vecs"
    indir.mkdir()
    spark.createDataFrame(
        [(1, v1), (2, v2)], "vec_id long, v array<double>"
    ).coalesce(1).write.parquet(str(indir / "f0"))
    spark.createDataFrame(
        [(10, [x + 0.01 for x in v1]), (11, v12)],
        "vec_id long, v array<double>",
    ).coalesce(1).write.parquet(str(indir / "f1"))

    def run(tag, cap):
        index = str(tmp_path / f"idx_{tag}")
        report = str(tmp_path / f"rep_{tag}")
        stream = (
            spark.readStream.schema("vec_id long, v array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(indir / "*"))
        )
        q = run_embedding_dedup_stream(
            spark, stream, index, report, str(tmp_path / f"ck_{tag}"),
            threshold=0.98, planes=planes, id_col="vec_id", vec_col="v",
            max_index_bucket_size=cap, available_now=True,
        )
        q.awaitTermination(180)
        idx = sorted(
            (r["corpus_id"], r["_batch_id"])
            for r in spark.read.parquet(index).collect()
        )
        rep = sorted(
            (r["kind"], r["dup_id"], r["kept_id"])
            for r in spark.read.parquet(report).collect()
        )
        return idx, rep

    unarmed = run("off", None)
    armed = run("on", 256)
    assert armed == unarmed
    assert unarmed[1] == [("index", 10, 1)]  # the dup was caught


def test_cc_pointer_jump_converges_in_log_rounds(spark):
    """algorithm="jump": the hash-to-min shortcut makes the min's
    reach double per round — the diameter-39 chain converges inside
    10 rounds (label propagation needs 40) to the identical single
    component."""
    nodes, pairs = _chain(spark, 40)
    out = DD.connected_components(
        nodes, pairs, id_col="doc_id", max_iter=12,
        metric_name="cc_jump_chain", algorithm="jump",
    )
    assert {r["cluster"] for r in out.collect()} == {0}
    rep = DD.last_cc_report()
    assert rep.converged and rep.iterations <= 10
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )

    release_intermediates()


def test_cc_jump_equals_label_on_star_graph(spark):
    nodes = spark.range(9).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 5)] + [(5, i) for i in range(6, 9)],
        "id_a long, id_b long",
    )
    label = sorted(
        tuple(r)
        for r in DD.connected_components(
            nodes, pairs, id_col="doc_id", algorithm="label"
        ).collect()
    )
    jump = sorted(
        tuple(r)
        for r in DD.connected_components(
            nodes, pairs, id_col="doc_id", algorithm="jump"
        ).collect()
    )
    assert jump == label
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )

    release_intermediates()


def test_cc_unknown_algorithm_rejected(spark):
    nodes, pairs = _chain(spark, 4)
    with pytest.raises(ValueError, match="unknown algorithm"):
        DD.connected_components(
            nodes, pairs, id_col="doc_id", algorithm="pregel"
        )
