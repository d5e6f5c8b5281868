"""Round-12 second-half behaviors:

1. Semantic decontamination (operators/similarity.py
   semantic_contamination_pairs / decontaminate_semantic): the
   embedding-space companion to the lexical shingle decontamination —
   paraphrased leakage with near-identical embeddings is caught, the
   corpus survivors are the complement, and the corpus-side hot-bucket
   cap passes through.
2. IVF list quality (operators/similarity.py ivf_list_quality):
   simplified silhouette + Davies-Bouldin components, hand-checked on
   a planted two-cluster geometry; assignment is ivf_assign itself.
3. Maintained-table history + time travel (sinks/parquet_lake.py
   table_history / read_table(version=) / vacuum_table(dry_run=)):
   every retained state visible (including torn commits), old versions
   readable until vacuum, vacuum previewable without deleting.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators import similarity as SIM
from gcs_parquet_dataflow_spark.operators.partitioning import (
    release_intermediates,
)
from gcs_parquet_dataflow_spark.sinks import parquet_lake as PL


def _vectors(spark, n, dim=16, seed=11, id_start=0):
    rng = random.Random(seed)
    rows = [
        (id_start + i, [round(rng.uniform(-1, 1), 6) for _ in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


# ---------------------------------------------------------------------------
# 1. semantic decontamination
# ---------------------------------------------------------------------------


def test_semantic_decontamination_catches_paraphrased_leakage(spark):
    """A benchmark built from shifted copies of every 4th corpus vector
    is caught (those corpus ids drop), unrelated corpus rows survive,
    and pairs ∪ survivors partition the corpus exactly."""
    planes = SIM.hyperplanes(n_planes=4, dim=16, seed=13)
    corpus = _vectors(spark, 60, seed=23)
    bench = (
        corpus.filter(F.col("vec_id") % 4 == 0)
        .select(
            (F.col("vec_id") + 9000).alias("vec_id"),
            F.transform("v", lambda x: x + 0.001).alias("v"),
        )
    )
    try:
        pairs = SIM.semantic_contamination_pairs(
            corpus, bench, 0.98, planes=planes, id_col="vec_id",
            vec_col="v",
        )
        got = {r["corpus_id"] for r in pairs.collect()}
        # every planted source whose shifted copy shares its LSH bucket
        # is caught; the shift is tiny so bucket flips are rare — at
        # minimum the bulk of the plants must be found
        planted = {i for i in range(60) if i % 4 == 0}
        assert got, "no contamination detected at all"
        assert got <= planted or all(
            g in planted for g in got
        ), f"false positives: {got - planted}"
        assert len(got) >= len(planted) * 0.6
        surviving = SIM.decontaminate_semantic(
            corpus, bench, 0.98, planes=planes, id_col="vec_id",
            vec_col="v",
        )
        kept = {r["vec_id"] for r in surviving.collect()}
        assert kept == set(range(60)) - got
        assert surviving.columns == corpus.columns
    finally:
        release_intermediates()


def test_semantic_decontamination_cap_passes_through(spark):
    """max_bucket_size reaches the corpus-side guard: with a degenerate
    one-bucket corpus and a cap of 1, the oversized bucket is excluded
    and nothing is flagged — the saturation-visible behavior, never an
    unbounded join."""
    planes = SIM.hyperplanes(n_planes=4, dim=16, seed=13)
    base = [round(random.Random(5).uniform(-1, 1), 6) for _ in range(16)]
    corpus = spark.createDataFrame(
        [(i, [x + i * 1e-6 for x in base]) for i in range(20)],
        "vec_id long, v array<double>",
    )
    bench = spark.createDataFrame(
        [(9000, list(base))], "vec_id long, v array<double>"
    )
    try:
        pairs = SIM.semantic_contamination_pairs(
            corpus, bench, 0.5, planes=planes, id_col="vec_id",
            vec_col="v", max_bucket_size=1,
        )
        assert pairs.count() == 0
        uncapped = SIM.semantic_contamination_pairs(
            corpus, bench, 0.5, planes=planes, id_col="vec_id",
            vec_col="v",
        )
        assert uncapped.count() == 20
    finally:
        release_intermediates()


# ---------------------------------------------------------------------------
# 2. IVF list quality
# ---------------------------------------------------------------------------


def test_ivf_list_quality_hand_checked_two_clusters(spark):
    """Two orthogonal unit centroids, points planted as exact scaled
    copies: assignment, silhouette, intra-distance, and the DB
    component all hand-computable."""
    dim = 4
    c0 = [1.0, 0.0, 0.0, 0.0]
    c1 = [0.0, 1.0, 0.0, 0.0]
    # 3 points on each axis at distances |s-1| from their centroid
    rows = []
    for i, s in enumerate([0.8, 1.0, 1.2]):
        rows.append((i, [s, 0.0, 0.0, 0.0]))
        rows.append((10 + i, [0.0, s, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["list_id"]: r
        for r in SIM.ivf_list_quality(df, cents=[c0, c1]).collect()
    }
    assert set(out) == {0, 1}
    for lid in (0, 1):
        r = out[lid]
        assert r["n_members"] == 3
        # a = |s-1| per point; b = sqrt(s^2+1); quantized micro-mean
        sils, intra = [], []
        for s in (0.8, 1.0, 1.2):
            a = round(abs(s - 1.0), 6)
            b = round(math.sqrt(s * s + 1.0), 6)
            sils.append(round((b - a) / max(a, b) * 1e6))
            intra.append(round(a * 1e6))
        assert r["mean_silhouette"] == pytest.approx(
            round(sum(sils) / (3 * 1e6), 6), abs=2e-6
        )
        assert r["mean_intra_dist"] == pytest.approx(
            round(sum(intra) / (3 * 1e6), 6), abs=2e-6
        )
        # scatter_0 == scatter_1 by symmetry; d(c0,c1) = sqrt(2)
        scatter = sum(intra) / (3 * 1e6)
        assert r["db_component"] == pytest.approx(
            round(2 * scatter / math.sqrt(2.0), 6), abs=2e-6
        )


def test_ivf_list_quality_empty_list_absent_and_boundary_negative(spark):
    """A centroid that attracts no points yields no row (both engines'
    group-by agree); a point sitting on the midline scores silhouette
    ~0 — the 'raise nprobe' signal the audit exists to surface."""
    c0 = [1.0, 0.0]
    c1 = [0.0, 1.0]
    c2 = [-1.0, 0.0]  # nothing assigned here
    rows = [
        (0, [2.0, 0.0]),
        # on the c0/c1 midline but closer to c0's direction after the
        # affinity argmax tie-break (lowest index wins)
        (1, [1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["list_id"]: r
        for r in SIM.ivf_list_quality(df, cents=[c0, c1, c2]).collect()
    }
    # both points land in list 0 (affinity ties break to the lowest
    # index): lists 1 and 2 are empty and absent
    assert set(out) == {0}
    assert out[0]["n_members"] == 2
    # with no competing populated list the DB component is undefined —
    # null, never a silently dropped row
    assert out[0]["db_component"] is None
    # midline point: a == dist([1,1], c0) == b == dist([1,1], c1) == 1
    # -> silhouette contribution 0; the axis point [2,0] has a=1,
    # b=min(sqrt(5), 3)=sqrt(5) -> positive mean
    mid_sil = 0.0
    axis_sil = (round(math.sqrt(5.0), 6) - 1.0) / round(math.sqrt(5.0), 6)
    expect = round(
        (round(mid_sil * 1e6) + round(axis_sil * 1e6)) / (2 * 1e6), 6
    )
    assert out[0]["mean_silhouette"] == pytest.approx(expect, abs=2e-6)


# ---------------------------------------------------------------------------
# 3. table history + time travel
# ---------------------------------------------------------------------------


def _write_flat(spark, path, ids):
    spark.createDataFrame(
        [(i,) for i in ids], "id long"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_table_history_and_version_time_travel(spark, tmp_path):
    base = str(tmp_path / "t")
    _write_flat(spark, base, range(10))
    # never-maintained: one flat live row
    h0 = PL.table_history(spark, base).collect()
    assert [(r["version"], r["is_live"]) for r in h0] == [(-1, True)]

    # first maintenance commit -> v1 live, flat retained
    PL.compact(spark, base)
    h1 = {r["version"]: r for r in PL.table_history(spark, base).collect()}
    assert set(h1) == {0, -1}
    assert h1[0]["is_live"] and h1[0]["committed"]
    assert not h1[-1]["is_live"]
    assert h1[0]["n_files"] >= 1 and h1[0]["bytes"] > 0

    # append through the resolved dir, then maintain again -> v1;
    # appends mutate the LIVE version, so v0's retained state is its
    # state at supersession time (range + 100)
    spark.createDataFrame([(100,)], "id long").write.mode("append").parquet(
        PL.resolve_table(spark, base)
    )
    PL.compact(spark, base)
    vs = PL.table_versions(spark, base)
    assert vs == [0, 1]
    # a post-supersession append lands only in the live v1
    spark.createDataFrame([(200,)], "id long").write.mode("append").parquet(
        PL.resolve_table(spark, base)
    )

    # time travel: v0 is the state the last maintenance superseded
    old = {r["id"] for r in PL.read_table(spark, base, version=0).collect()}
    live = {r["id"] for r in PL.read_table(spark, base).collect()}
    assert old == set(range(10)) | {100}
    assert live == set(range(10)) | {100, 200}

    # unknown / vacuumed versions fail loudly, naming what IS retained
    with pytest.raises(ValueError, match=r"version 7 .* not retained"):
        PL.read_table(spark, base, version=7)

    # dry-run previews without deleting
    doomed = PL.vacuum_table(spark, base, keep_last=1, dry_run=True)
    assert doomed == [0]
    assert PL.table_versions(spark, base) == [0, 1]
    assert PL.vacuum_table(spark, base, keep_last=1) == [0]
    with pytest.raises(ValueError, match="not retained"):
        PL.read_table(spark, base, version=0)
    assert {r["id"] for r in PL.read_table(spark, base).collect()} == live


def test_table_history_shows_torn_commit(spark, tmp_path):
    """A version dir without _SUCCESS (torn copy / in-flight rename on
    a non-atomic store) is VISIBLE with committed=false and never
    live."""
    base = str(tmp_path / "t2")
    _write_flat(spark, base, range(5))
    PL.compact(spark, base)
    # fabricate a torn v1: copy of v0 without _SUCCESS
    import shutil

    v0 = base + "__v00000000"
    v1 = base + "__v00000001"
    shutil.copytree(v0, v1)
    (tmp_path / "t2__v00000001" / "_SUCCESS").unlink()
    h = {r["version"]: r for r in PL.table_history(spark, base).collect()}
    assert not h[1]["committed"] and not h[1]["is_live"]
    assert h[0]["is_live"]
    # and the resolved read still serves v1
    assert {r["id"] for r in PL.read_table(spark, base).collect()} == set(
        range(5)
    )


def test_vacuum_dry_run_reports_flat_remnant(spark, tmp_path):
    base = str(tmp_path / "t3")
    _write_flat(spark, base, range(4))
    PL.compact(spark, base)
    # one version + flat: keep_last=1 would sweep the flat remnant only
    assert PL.vacuum_table(spark, base, keep_last=1, dry_run=True) == [-1]
    assert PL.table_exists(spark, base)
    import os

    assert os.path.exists(base)
    PL.vacuum_table(spark, base, keep_last=1)
    assert not os.path.exists(base)
    assert PL.table_exists(spark, base)


# ---------------------------------------------------------------------------
# 4. persisted-index quality audit + ops snapshots
# ---------------------------------------------------------------------------


def test_ivf_index_quality_matches_inline(spark, tmp_path):
    """The persisted index's stored _list IS the assignment, so the
    audit over the index equals ivf_list_quality over the raw corpus
    with the same centroids."""
    cents = SIM.ivf_centroids(k=4, dim=16, seed=29)
    corpus = _vectors(spark, 120, seed=31).withColumnRenamed(
        "v", "embedding"
    )
    path = str(tmp_path / "ivf")
    assert SIM.build_ivf_index(corpus, path, cents=cents) == 120
    inline = {
        r["list_id"]: r
        for r in SIM.ivf_list_quality(corpus, cents=cents).collect()
    }
    from_index = {
        r["list_id"]: r
        for r in SIM.ivf_index_quality(spark, path, cents=cents).collect()
    }
    assert set(inline) == set(from_index) and inline
    for lid, r in inline.items():
        q = from_index[lid]
        assert q["n_members"] == r["n_members"]
        assert q["mean_silhouette"] == r["mean_silhouette"]
        assert q["mean_intra_dist"] == r["mean_intra_dist"]
        assert q["db_component"] == r["db_component"]


def test_snapshot_index_quality_replay_idempotent(spark, tmp_path):
    """Batch-keyed snapshots converge under checkpoint replay: a
    re-emitted batch overwrites its own partition, and the trend query
    sees one snapshot per batch."""
    from gcs_parquet_dataflow_spark.streaming.observability import (
        read_guard_reports,
        snapshot_index_quality,
    )

    cents = SIM.ivf_centroids(k=4, dim=16, seed=29)
    corpus = _vectors(spark, 80, seed=37).withColumnRenamed(
        "v", "embedding"
    )
    path = str(tmp_path / "ivf")
    ops = str(tmp_path / "ops")
    SIM.build_ivf_index(corpus, path, cents=cents)
    n0 = snapshot_index_quality(spark, path, ops, batch_id=0, cents=cents)
    n1 = snapshot_index_quality(spark, path, ops, batch_id=1, cents=cents)
    assert n0 == n1 and n0 > 0
    # replay batch 1 -> still exactly one partition per batch
    snapshot_index_quality(spark, path, ops, batch_id=1, cents=cents)
    got = read_guard_reports(spark, ops, "ivf_quality")
    per_batch = {
        r["_batch_id"]: r["n"]
        for r in got.groupBy("_batch_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_batch == {0: n0, 1: n1}
    # unknown kinds still fail loudly
    with pytest.raises(ValueError, match="kind must be one of"):
        read_guard_reports(spark, ops, "nope")


# ---------------------------------------------------------------------------
# 5. quality-gated IVF retrain (audit -> action)
# ---------------------------------------------------------------------------


def _two_blob_corpus(spark, n_per=40, dim=8, gap=3.0, seed=41):
    """Two tight, well-separated blobs — a corpus the seeded
    pseudo-gaussian centroids were never trained for."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_per):
        rows.append((i, [gap + rng.uniform(-0.1, 0.1) for _ in range(dim)]))
        rows.append(
            (1000 + i, [-gap + rng.uniform(-0.1, 0.1) for _ in range(dim)])
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_retrain_ivf_improves_degraded_index_reader_atomically(
    spark, tmp_path
):
    cents = SIM.ivf_centroids(k=2, dim=8, seed=29)
    corpus = _two_blob_corpus(spark)
    path = str(tmp_path / "ivf")
    # non-default centroids => persist the sidecar (documented contract)
    SIM.build_ivf_index(corpus, path, cents=cents, persist_centroids=True)

    r = SIM.retrain_ivf_if_degraded(spark, path, min_mean_silhouette=0.99)
    assert r["retrained"] is True
    assert r["mean_silhouette_after"] > r["mean_silhouette_before"]
    # two far blobs against trained centroids: near-perfect separation
    assert r["mean_silhouette_after"] > 0.9

    # the commit is the versioned flip: old index retained, new live,
    # centroids stored WITH the live version
    assert PL.table_versions(spark, path) == [0]
    stored = SIM.load_ivf_centroids(spark, path)
    assert stored is not None and len(stored) == 2
    # raw flat-path read still serves the RETAINED pre-retrain index
    import os

    assert os.path.exists(path)

    # probing every list is exact regardless of centroids — proves the
    # probe reads the live version and routes by the stored table
    q = corpus.filter(F.col("vec_id") < 2)
    exact = {
        (r2["query_id"], r2["rank"]): r2["neighbor_id"]
        for r2 in SIM.brute_force_topk(corpus, q, k=3).collect()
    }
    got = {
        (r2["query_id"], r2["rank"]): r2["neighbor_id"]
        for r2 in SIM.ivf_query_index(
            spark, path, q, k=3, nprobe=2
        ).collect()
    }
    assert got == exact and got

    # healthy gate: no second retrain
    r2_ = SIM.retrain_ivf_if_degraded(spark, path, min_mean_silhouette=0.5)
    assert r2_["retrained"] is False
    assert PL.table_versions(spark, path) == [0]


def test_append_after_retrain_uses_stored_centroids_and_live_version(
    spark, tmp_path
):
    cents = SIM.ivf_centroids(k=2, dim=8, seed=29)
    corpus = _two_blob_corpus(spark)
    path = str(tmp_path / "ivf")
    SIM.build_ivf_index(corpus, path, cents=cents, persist_centroids=True)
    SIM.retrain_ivf_index(spark, path)
    stored = SIM.load_ivf_centroids(spark, path)

    # append a fresh vector near blob A without passing centroids
    newv = [3.05] * 8
    batch = spark.createDataFrame(
        [(7777, newv)], "vec_id long, embedding array<double>"
    )
    assert SIM.append_to_ivf_index(batch, path) == 1

    # it must be visible to versioned probes (landed in the live dir)
    q = spark.createDataFrame(
        [(9999, [3.06] * 8)], "vec_id long, embedding array<double>"
    )
    top = SIM.ivf_query_index(spark, path, q, k=1, nprobe=1).collect()
    assert top and top[0]["neighbor_id"] == 7777
    # and it was assigned by the STORED (trained) centroids: the
    # nprobe=1 probe reads only the list the trained assignment puts
    # blob-A vectors in, so finding it proves the routing agrees
    assert stored == SIM.load_ivf_centroids(spark, path)


def test_build_ivf_index_persist_centroids_roundtrip(spark, tmp_path):
    cents = SIM.ivf_centroids(k=3, dim=8, seed=5)
    corpus = _two_blob_corpus(spark, n_per=10)
    path = str(tmp_path / "ivf")
    SIM.build_ivf_index(corpus, path, cents=cents, persist_centroids=True)
    assert SIM.load_ivf_centroids(spark, path) == [
        [float(x) for x in c] for c in cents
    ]
    # the sidecar is invisible to data scans: plain index read has no
    # centroid rows
    assert spark.read.parquet(path).count() == 20


def test_append_to_ivf_index_is_fenced_against_inflight_retrain(
    spark, tmp_path
):
    """A direct append racing a retrain would land only in the OLD
    version (the retrain's staged rebuild already read the index) —
    readable until retention, then silently gone.  The fence turns
    that lost update into a loud ConcurrentWriterError, exactly like
    write_partitioned's streaming fence."""
    corpus = _two_blob_corpus(spark, n_per=5)
    path = str(tmp_path / "ivf")
    SIM.build_ivf_index(
        corpus, path,
        cents=SIM.ivf_centroids(k=2, dim=8, seed=29),
        persist_centroids=True,
    )
    with open(path + "__swap_lease", "w") as f:
        f.write('{"op": "ivf_retrain", "pid": 1, "acquired_unix_ms": 0}')
    batch = spark.createDataFrame(
        [(7777, [3.0] * 8)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(PL.ConcurrentWriterError):
        SIM.append_to_ivf_index(batch, path)
    # nothing landed
    assert spark.read.parquet(path).filter(
        F.col("neighbor_id") == 7777
    ).count() == 0
    PL.break_swap_lease(spark, path)
    assert SIM.append_to_ivf_index(batch, path) == 1


# ---------------------------------------------------------------------------
# 7. maintenance advisor
# ---------------------------------------------------------------------------


def test_maintenance_report_advises_and_clears(spark, tmp_path):
    """Fragmented table → 'compact'; after compact the ONE retained
    predecessor is the commit protocol's normal state (no advice at
    the default policy); history beyond the policy → 'vacuum'; after
    vacuum → healthy."""
    path = str(tmp_path / "t")
    spark.range(200).selectExpr("id AS k", "id % 5 AS g").repartition(
        12
    ).write.parquet(path)

    r = PL.maintenance_report(spark, path, max_live_files=8)
    assert r["n_files"] == 12
    assert r["small_file_ratio"] == 1.0
    assert r["actions"] == ["compact"]
    assert r["live_version"] == -1 and r["n_torn_commits"] == 0

    PL.compact(spark, path, target_file_bytes=1 << 30)
    r2 = PL.maintenance_report(spark, path, max_live_files=8)
    assert r2["actions"] == []                 # debt paid; one retained
    assert r2["live_version"] == 0             # predecessor is NORMAL
    assert r2["n_retained_versions"] == 1

    # the same state EXCEEDS a tighter policy (or: a crash between a
    # flip and its retention sweep left deep history)
    r3 = PL.maintenance_report(
        spark, path, max_live_files=8, retain_policy=1
    )
    assert r3["actions"] == ["vacuum"]

    PL.vacuum_table(spark, path, keep_last=1)
    r4 = PL.maintenance_report(
        spark, path, max_live_files=8, retain_policy=1
    )
    assert r4["actions"] == []
    assert r4["n_retained_versions"] == 0


def test_maintenance_report_flags_torn_commit_lease_and_stale_manifest(
    spark, tmp_path
):
    import os
    import shutil

    path = str(tmp_path / "t")
    spark.range(100).selectExpr("id AS k").coalesce(2).write.parquet(path)
    PL.optimize_table(spark, path, sort_cols=["k"])  # v0 + manifest
    manifest = path + "__manifest"
    frozen = str(tmp_path / "frozen_manifest")
    shutil.copytree(manifest, frozen)

    # healthy after optimize + vacuum
    PL.vacuum_table(spark, path, keep_last=1)
    assert PL.maintenance_report(spark, path)["actions"] == []

    # compact refreshes the manifest; restoring the frozen (pre-compact)
    # one constructs the stale state read_skipping degrades on
    PL.compact(spark, path, target_file_bytes=1 << 30)
    PL.vacuum_table(spark, path, keep_last=1)
    shutil.rmtree(manifest)
    shutil.copytree(frozen, manifest)
    r = PL.maintenance_report(spark, path)
    assert r["manifest_present"] and r["manifest_stale"]
    assert "refresh_manifest" in r["actions"]

    # torn sibling commit is surfaced, not inferred
    live = PL.resolve_table(spark, path)
    torn = path + "__v00000099"
    shutil.copytree(live, torn)
    os.remove(os.path.join(torn, "_SUCCESS"))
    r2 = PL.maintenance_report(spark, path)
    assert r2["n_torn_commits"] == 1
    assert "sweep_torn_commit" in r2["actions"]
    shutil.rmtree(torn)

    # held lease → investigate (live maintenance or dead holder)
    with open(path + "__swap_lease", "w") as f:
        f.write('{"op": "compact", "pid": 1, "acquired_unix_ms": 0}')
    r3 = PL.maintenance_report(spark, path)
    assert r3["lease"] is not None
    assert r3["actions"][0] == "investigate_lease"
    PL.break_swap_lease(spark, path)


def test_run_maintenance_cycle_heals_fleet_and_persists_reports(
    spark, tmp_path
):
    """advise → act → re-report over a small fleet: the fragmented
    table compacts, the torn commit is swept, the lease-held table is
    skipped untouched, and before/after rows land in the ops lake
    (queryable via read_guard_reports)."""
    import os
    import shutil

    from gcs_parquet_dataflow_spark.streaming.observability import (
        read_guard_reports,
    )

    frag = str(tmp_path / "frag")
    spark.range(200).selectExpr("id AS k").repartition(12).write.parquet(
        frag
    )
    torn_t = str(tmp_path / "torn")
    spark.range(50).selectExpr("id AS k").coalesce(1).write.parquet(torn_t)
    PL.compact(spark, torn_t, target_file_bytes=1 << 30)
    live = PL.resolve_table(spark, torn_t)
    shutil.copytree(live, torn_t + "__v00000099")
    os.remove(os.path.join(torn_t + "__v00000099", "_SUCCESS"))
    leased = str(tmp_path / "leased")
    spark.range(50).selectExpr("id AS k").repartition(9).write.parquet(
        leased
    )
    with open(leased + "__swap_lease", "w") as f:
        f.write('{"op": "compact", "pid": 1, "acquired_unix_ms": 0}')

    ops = str(tmp_path / "ops")
    res = {
        r["path"]: r
        for r in PL.run_maintenance_cycle(
            spark, [frag, torn_t, leased], max_live_files=4,
            retain_policy=1, ops_root=ops, batch_id=0,
        )
    }
    assert res[frag]["converged"] and "compact" in res[frag]["executed"]
    assert res[frag]["after"]["actions"] == []
    assert res[torn_t]["converged"]
    assert "sweep_torn_commit" in res[torn_t]["executed"]
    assert not os.path.exists(torn_t + "__v00000099")
    # lease-held: untouched, not converged, nothing executed
    assert not res[leased]["converged"]
    assert res[leased]["executed"] == []
    assert PL.maintenance_report(spark, leased)["n_files"] == 9

    rows = read_guard_reports(spark, ops, "maintenance_reports")
    assert rows.count() == 6  # 3 tables x before/after
    after_frag = rows.filter(
        (F.col("path") == frag) & (F.col("phase") == "after")
    ).first()
    assert after_frag["converged"] and after_frag["actions"] == []
    # replay the batch: content-idempotent (dynamic partition overwrite)
    PL.run_maintenance_cycle(
        spark, [frag], max_live_files=4, retain_policy=1,
        ops_root=ops, batch_id=1,
    )
    PL.break_swap_lease(spark, leased)


def test_maintenance_cycle_records_missing_tables_loudly(spark, tmp_path):
    """A table dropped between fleet listing and scan is recorded as
    missing — never a cycle-killing exception, never silently omitted;
    maintenance_report itself raises a clear error for absent paths."""
    ok = str(tmp_path / "ok")
    spark.range(10).selectExpr("id AS k").coalesce(1).write.parquet(ok)
    gone = str(tmp_path / "gone")
    res = {
        r["path"]: r
        for r in PL.run_maintenance_cycle(
            spark, [gone, ok], ops_root=str(tmp_path / "ops"), batch_id=0
        )
    }
    assert res[gone].get("missing") is True
    assert res[gone]["converged"] is False
    assert res[ok]["converged"] is True
    with pytest.raises(FileNotFoundError, match="no table at"):
        PL.maintenance_report(spark, gone)


def test_retrain_decision_persists_to_ops_lake(spark, tmp_path):
    """Both outcomes of the quality gate land in ivf_retrain_events
    (the action evidence must outlive the driver, like every guard
    report); batch-keyed replay overwrites its own partition."""
    from gcs_parquet_dataflow_spark.streaming.observability import (
        read_guard_reports,
    )

    corpus = _two_blob_corpus(spark, n_per=15)
    path = str(tmp_path / "ivf")
    SIM.build_ivf_index(
        corpus, path,
        cents=SIM.ivf_centroids(k=2, dim=8, seed=29),
        persist_centroids=True,
    )
    ops = str(tmp_path / "ops")
    r1 = SIM.retrain_ivf_if_degraded(
        spark, path, min_mean_silhouette=0.99, ops_root=ops, batch_id=0
    )
    assert r1["retrained"] is True
    r2 = SIM.retrain_ivf_if_degraded(
        spark, path, min_mean_silhouette=0.5, ops_root=ops, batch_id=1
    )
    assert r2["retrained"] is False
    events = read_guard_reports(spark, ops, "ivf_retrain_events")
    rows = {r["_batch_id"]: r for r in events.collect()}
    assert rows[0]["retrained"] is True and rows[0]["gate"] == 0.99
    assert rows[0]["mean_silhouette_after"] > rows[0][
        "mean_silhouette_before"
    ]
    assert rows[1]["retrained"] is False
    # replayed batch: content-idempotent, still 2 rows (fresh read —
    # the dynamic overwrite replaced the old partition's files)
    SIM.retrain_ivf_if_degraded(
        spark, path, min_mean_silhouette=0.5, ops_root=ops, batch_id=1
    )
    assert read_guard_reports(spark, ops, "ivf_retrain_events").count() == 2


def test_retrain_training_sample_cap_bounds_cost_not_quality(
    spark, tmp_path
):
    """Training on a content-hash SAMPLE (max_train_rows) still
    separates the two blobs near-perfectly — the quantizer needs a
    representative sample, only the re-assignment needs every row —
    and the sampled retrain is deterministic (same cap → identical
    centroids)."""
    corpus = _two_blob_corpus(spark, n_per=60)
    path = str(tmp_path / "ivf")
    SIM.build_ivf_index(
        corpus, path,
        cents=SIM.ivf_centroids(k=2, dim=8, seed=29),
        persist_centroids=True,
    )
    cents = SIM.retrain_ivf_index(spark, path, max_train_rows=30)
    q = SIM.ivf_index_quality(spark, path)
    sil = SIM._weighted_mean_silhouette(q)
    assert sil > 0.9

    # deterministic under the same cap: rebuild from scratch, retrain
    # again, identical trained centroids
    path2 = str(tmp_path / "ivf2")
    SIM.build_ivf_index(
        corpus, path2,
        cents=SIM.ivf_centroids(k=2, dim=8, seed=29),
        persist_centroids=True,
    )
    cents2 = SIM.retrain_ivf_index(spark, path2, max_train_rows=30)
    assert cents == cents2
