"""Mechanized crash-window harness (VERDICT r9 item 3): round 9 found
two non-self-healing multi-file-commit states by HAND adjudication;
this file generalizes the discipline into a parameterized sweep —
every staged-swap commit sequence × every intermediate state, each
asserted to converge to exactly the pre-crash or the post-commit
table, never a third state, under the documented recovery entry
point (recover_staged_swap and/or a re-run of the operation itself).

Staged-swap sequence (shared by all six families):

    write staging (+_SUCCESS)   → crash ⇒ ``torn``   (no _SUCCESS yet)
                                → crash ⇒ ``staged`` (dest still intact)
    delete dest                 → crash ⇒ ``deleted`` (dest absent)
    rename staging → dest       → committed

The crash states are CONSTRUCTED, not fault-injected: rename commits
are copyless, so the staging dir's content is byte-identical to the
post-commit table — running the op to completion on a clone yields
both the post content and the exact staging payload.

Also swept here: write_version's orphan-staging states, the RTBF
stream's audit _COMMITTED fence (ADVICE r9), and read_skipping's
stale-manifest degradation after an optimize_table crash."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators import incremental as INC
from gcs_parquet_dataflow_spark.sinks import parquet_lake as PL
from gcs_parquet_dataflow_spark.streaming.pipeline import (
    compact_batch_shards,
    compact_golden_log,
)


def _content(spark, path):
    df = spark.read.parquet(path)
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


# --- family registry: (suffix, setup(spark, path), op(spark, path)) ----

def _setup_upsert(spark, path):
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k long, v string, ver long"
    ).repartition(2).write.parquet(path)


def _op_upsert(spark, path):
    upd = spark.createDataFrame(
        [(2, "B", 2), (4, "d", 2)], "k long, v string, ver long"
    )
    PL.upsert(spark, path, upd, ["k"], "ver")


def _setup_table(spark, path):
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    ).repartition(8).write.parquet(path)


def _op_compact(spark, path):
    PL.compact(spark, path, target_file_bytes=1 << 30)


def _op_optimize(spark, path):
    PL.optimize_table(spark, path, sort_cols=["k"])


def _setup_shards(spark, path):
    rows = [(b, f"k{i % 3}", i + b) for b in range(4) for i in range(6)]
    spark.createDataFrame(
        rows, "_batch_id long, key string, n long"
    ).write.partitionBy("_batch_id").parquet(path)


def _op_shards(spark, path):
    compact_batch_shards(spark, path, ["key"], keep_last=1)


def _setup_golden(spark, path):
    rows = [(1, "a", 0), (2, "b", 0), (1, "a2", 1), (3, "c", 2)]
    spark.createDataFrame(
        rows, "entity_id long, name string, _batch_id long"
    ).write.partitionBy("_batch_id").parquet(path)


def _op_golden(spark, path):
    compact_golden_log(spark, path)


def _setup_cosine_index(spark, path):
    from gcs_parquet_dataflow_spark.operators import similarity as SIM

    planes = SIM.hyperplanes(n_planes=4, dim=8, seed=13)
    import random

    rng = random.Random(61)
    for b in range(4):
        rows = [
            (100 * b + i, [round(rng.uniform(-1, 1), 6) for _ in range(8)])
            for i in range(5)
        ]
        SIM.build_cosine_bucket_index(
            spark.createDataFrame(rows, "vec_id long, v array<double>"),
            path, planes=planes, id_col="vec_id", vec_col="v", batch_id=b,
        )


def _op_cosine_index(spark, path):
    from gcs_parquet_dataflow_spark.operators.similarity import (
        compact_cosine_index,
    )

    compact_cosine_index(spark, path, keep_last=1)


def _setup_bloom(spark, path):
    spark.createDataFrame(
        [(0, 5), (1, 9)], "word_idx bigint, word bigint"
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(0, 2), (2, 4)], "word_idx bigint, word bigint"
    ).write.mode("append").parquet(path)
    INC.write_bloom_meta(spark, path, 2**10, 3)


def _op_bloom(spark, path):
    INC.compact_bloom_lake(spark, path)


FAMILIES = {
    "upsert": ("__upsert_staging", _setup_upsert, _op_upsert),
    "compact": ("__compact_staging", _setup_table, _op_compact),
    "optimize": ("__optimize_staging", _setup_table, _op_optimize),
    "shards": ("__shards_compact_staging", _setup_shards, _op_shards),
    "golden_log": ("__golden_compact_staging", _setup_golden, _op_golden),
    "bloom": ("__bloom_compact_staging", _setup_bloom, _op_bloom),
    "cosine_index": (
        "__cosine_index_compact_staging",
        _setup_cosine_index,
        _op_cosine_index,
    ),
}

STATES = ["torn", "staged", "deleted"]


@pytest.mark.parametrize("state", STATES)
@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_staged_swap_crash_state_converges(spark, tmp_path, family, state):
    suffix, setup, op = FAMILIES[family]
    base = str(tmp_path / "lake")
    setup(spark, base)
    pre = _content(spark, base)

    # post content + exact staging payload, from a clone run
    clone = str(tmp_path / "clone")
    shutil.copytree(base, clone)
    op(spark, clone)
    post = _content(spark, clone)

    # construct the crash state
    staging = base + suffix
    shutil.copytree(clone, staging)
    if state == "torn":
        os.remove(os.path.join(staging, "_SUCCESS"))
    if state == "deleted":
        shutil.rmtree(base)

    # 1) the passive recovery entry point: absent dest + committed
    # staging completes the rename; anything else is a no-op
    recovered = PL.recover_staged_swap(spark, base)
    if state == "deleted":
        assert recovered
        assert _content(spark, base) == post
    else:
        assert not recovered
        assert _content(spark, base) == pre  # dest untouched

    # 2) re-running the operation converges to post from EVERY state
    # (and consumes/overwrites the staging rather than folding twice —
    # the double-count class ADVICE r9 flagged on compact_batch_shards)
    op(spark, base)
    assert _content(spark, base) == post

    # 3) idempotence: a second run stays at post, never a third state
    op(spark, base)
    assert _content(spark, base) == post


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_held_lease_blocks_maintenance_until_broken(spark, tmp_path, family):
    """Single-writer mutual exclusion (VERDICT r10 item 2): a held
    ``__swap_lease`` — another maintenance job mid-run, or a holder
    that crashed BEFORE its delete→rename (dest intact, so
    recover_staged_swap correctly leaves it) — makes every maintenance
    op raise ConcurrentWriterError holding nothing; break_swap_lease
    is the documented operator unblock, after which the op converges
    to post exactly as the crash sweep requires."""
    suffix, setup, op = FAMILIES[family]
    base = str(tmp_path / "lake")
    setup(spark, base)
    pre = _content(spark, base)

    clone = str(tmp_path / "clone")
    shutil.copytree(base, clone)
    op(spark, clone)
    post = _content(spark, clone)

    with open(base + "__swap_lease", "w") as f:
        f.write('{"op": "other", "pid": 1, "acquired_unix_ms": 0}')
    with pytest.raises(PL.ConcurrentWriterError):
        op(spark, base)
    assert _content(spark, base) == pre  # nothing touched
    assert not os.path.exists(base + suffix)  # held nothing, staged nothing

    assert PL.break_swap_lease(spark, base)
    op(spark, base)
    assert _content(spark, base) == post


def test_recover_staged_swap_clears_crashed_holders_lease(spark, tmp_path):
    """The deleted-state crash WITH the holder's lease still on disk
    (the realistic crash: every maintenance op now holds the lease
    across its delete→rename): recovery must both complete the rename
    and clear the dead holder's lease, or the healed lake would be
    permanently fenced."""
    base = str(tmp_path / "lake")
    _setup_table(spark, base)
    clone = str(tmp_path / "clone")
    shutil.copytree(base, clone)
    _op_compact(spark, clone)
    post = _content(spark, clone)

    shutil.copytree(clone, base + "__compact_staging")
    shutil.rmtree(base)
    with open(base + "__swap_lease", "w") as f:
        f.write('{"op": "compact", "pid": 1, "acquired_unix_ms": 0}')

    assert PL.recover_staged_swap(spark, base)
    assert _content(spark, base) == post
    assert PL.read_swap_lease(spark, base) is None
    _op_compact(spark, base)  # not fenced: the lease was cleared
    assert _content(spark, base) == post


def test_concurrent_append_aborts_swap_commit(spark, tmp_path):
    """Lost-update detection: an appender that bypasses the
    write_partitioned fence (raw df.write.append — e.g. a pre-r11
    writer) and lands between the maintenance read and its commit must
    ABORT the swap: the epoch re-check sees the new data files, raises
    before the delete, and the destination keeps BOTH the original
    rows and the racing append — never clobbered, never resurrected."""
    base = str(tmp_path / "lake")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).write.parquet(base)
    staging = base + "__compact_staging"
    with PL.swap_lease(spark, base, "compact") as lease:
        df = spark.read.parquet(base)
        # racing appender (unfenced): lands after the lease snapshot
        spark.createDataFrame([(3, "c")], "k long, v string").write.mode(
            "append"
        ).parquet(base)
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        with pytest.raises(PL.ConcurrentWriterError):
            lease.commit(staging)
    assert _content(spark, base) == [(1, "a"), (2, "b"), (3, "c")]
    assert os.path.exists(staging)  # result preserved for the re-run
    assert PL.read_swap_lease(spark, base) is None  # live exit released
    # the documented recovery: re-run folds the racing write in
    shutil.rmtree(staging)
    PL.compact(spark, base, target_file_bytes=1 << 30)
    assert _content(spark, base) == [(1, "a"), (2, "b"), (3, "c")]


def test_write_partitioned_is_fenced_by_swap_lease(spark, tmp_path):
    """The writer-side half of the single-writer contract: a streaming
    appender (write_partitioned — every foreachBatch side-write goes
    through it) fails LOUDLY while a maintenance lease is held on its
    target, instead of appending into a table about to be deleted and
    swapped; the foreachBatch retry after the maintenance completes
    succeeds."""
    base = str(tmp_path / "lake")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    PL.write_partitioned(df, base, [], batch_id=0)
    with PL.swap_lease(spark, base, "compact"):
        with pytest.raises(PL.ConcurrentWriterError):
            PL.write_partitioned(df, base, [], batch_id=1)
    PL.write_partitioned(df, base, [], batch_id=1)  # lease released
    assert {
        r["_batch_id"]
        for r in spark.read.parquet(base).select("_batch_id").collect()
    } == {0, 1}


def test_cross_family_maintenance_is_mutually_exclusive(spark, tmp_path):
    """The lease is per-PATH, not per-op: an upsert racing a compact on
    the same table is exactly the 100 TB overlap case — the second
    acquirer raises immediately, whichever family it is."""
    base = str(tmp_path / "lake")
    _setup_upsert(spark, base)
    pre = _content(spark, base)
    with PL.swap_lease(spark, base, "compact"):
        with pytest.raises(PL.ConcurrentWriterError):
            _op_upsert(spark, base)
    assert _content(spark, base) == pre
    _op_upsert(spark, base)  # released: proceeds normally
    assert (2, "B", 2) in _content(spark, base)


def test_bloom_swap_preserves_meta_in_every_state(spark, tmp_path):
    """The bloom fold's meta file travels INSIDE the staging dir (the
    r9 meta-first window, closed): after recovery from the deleted
    state the lake must hold words AND parameters together."""
    base = str(tmp_path / "bloom")
    _setup_bloom(spark, base)
    clone = str(tmp_path / "clone")
    shutil.copytree(base, clone)
    _op_bloom(spark, clone)
    post_meta = INC.read_bloom_meta(spark, clone)
    assert post_meta == {"m_bits": 2**10, "k": 3}

    staging = base + "__bloom_compact_staging"
    shutil.copytree(clone, staging)
    shutil.rmtree(base)
    assert PL.recover_staged_swap(spark, base)
    assert INC.read_bloom_meta(spark, base) == post_meta
    assert _content(spark, base) == _content(spark, clone)


def test_write_version_orphan_staging_states(spark, tmp_path):
    """write_version commits by a single rename into the version dir:
    a crashed writer leaves __snapshot_staging garbage which the next
    writer overwrites, and _list_versions never surfaces a dir without
    _SUCCESS — both torn-copy states are invisible to readers."""
    root = str(tmp_path / "vlake")
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    df2 = spark.createDataFrame([(2, "b")], "k long, v string")
    assert PL.write_version(spark, root, df1) == 0

    # state A: orphan staging from a crashed writer (complete payload,
    # rename never ran) — readers see only v0; next commit becomes v1
    df2.write.mode("overwrite").parquet(root + "/__snapshot_staging")
    assert PL.latest_version(spark, root) == 0
    assert PL.write_version(spark, root, df2) == 1
    assert _content(spark, root + "/v00000001") == [(2, "b")]

    # state B: torn version dir (no _SUCCESS) — never listed, reads
    # fall back to the last committed snapshot, next commit skips past
    torn = root + "/v00000002"
    shutil.copytree(root + "/v00000001", torn)
    os.remove(os.path.join(torn, "_SUCCESS"))
    assert PL.latest_version(spark, root) == 1
    assert _content(
        spark,
        root + "/v%08d" % PL.latest_version(spark, root),
    ) == [(2, "b")]


def test_upsert_stream_owner_reacquires_own_crashed_lease(spark, tmp_path):
    """The streaming self-heal: run_upsert_stream's per-batch upsert
    passes its checkpoint identity as lease owner, so a crash
    mid-upsert (own lease left behind, dest intact — the state
    recover_staged_swap correctly leaves alone) does NOT deadlock the
    restarted stream on itself; a DIFFERENT writer's lease still
    blocks it loudly."""
    base = str(tmp_path / "lake")
    _setup_upsert(spark, base)
    own = '{"op": "upsert", "pid": 1, "owner": "upsert_stream:ck0", ' \
          '"acquired_unix_ms": 0}'
    with open(base + "__swap_lease", "w") as f:
        f.write(own)
    upd = spark.createDataFrame(
        [(2, "B", 2), (4, "d", 2)], "k long, v string, ver long"
    )
    # a foreign maintenance job is still fenced
    with pytest.raises(PL.ConcurrentWriterError):
        PL.upsert(spark, base, upd, ["k"], "ver")
    with pytest.raises(PL.ConcurrentWriterError):
        PL.upsert(
            spark, base, upd, ["k"], "ver", lease_owner="upsert_stream:OTHER"
        )
    # the stream's own restart takes its crashed lease over
    rows_before, rows_after = PL.upsert(
        spark, base, upd, ["k"], "ver", lease_owner="upsert_stream:ck0"
    )
    assert (rows_before, rows_after) == (3, 4)
    assert PL.read_swap_lease(spark, base) is None  # released on exit
    assert (2, "B", 2) in _content(spark, base)


def test_write_version_concurrent_writers_each_commit_whole_snapshots(
    spark, tmp_path
):
    """Round 11: snapshot commits are safe under CONCURRENT writers —
    unique per-writer staging (no shared-staging clobber) + an
    optimistic version-id retry loop (a lost rename race re-derives
    the next free id; the local-FS rename-into-existing-dir hazard is
    detected and recovered).  Four threads commit simultaneously:
    every writer must succeed, ids must be distinct and contiguous,
    and every committed version must be exactly ONE writer's complete
    table — never a blend, never a torn dir."""
    import threading

    root = str(tmp_path / "vlake")
    PL.write_version(
        spark, root, spark.createDataFrame([(0, -1)], "k long, w long")
    )
    results: dict[int, int] = {}
    errors: list[Exception] = []

    def commit(w: int) -> None:
        try:
            df = spark.createDataFrame(
                [(i, w) for i in range(20)], "k long, w long"
            )
            results[w] = PL.write_version(spark, root, df)
        except Exception as exc:  # noqa: BLE001 — recorded for assert
            errors.append(exc)

    threads = [threading.Thread(target=commit, args=(w,)) for w in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(120)
    assert not errors, errors
    assert sorted(results.values()) == [1, 2, 3, 4]
    for w, v in results.items():
        rows = _content(spark, root + "/v%08d" % v)
        assert rows == [(i, w) for i in range(20)]  # one writer, whole
    assert PL.latest_version(spark, root) == 4


def test_write_version_nested_rename_race_recovers(spark, tmp_path):
    """The constructed worst-case interleaving: a writer's rename
    lands AFTER another writer created the same version dir, and the
    local FS moves the staging INSIDE it (rename-into-existing-dir).
    The commit loop must detect the nested dir, pull it back out, and
    commit under the next id — and the nested dir must never have
    been reader-visible (underscore prefix)."""
    root = str(tmp_path / "vlake")
    PL.write_version(
        spark, root, spark.createDataFrame([(0,)], "k long")
    )
    # construct the nested state by hand: a complete staging payload
    # moved inside an existing committed version dir
    winner = root + "/v%08d" % PL.write_version(
        spark, root, spark.createDataFrame([(1,)], "k long")
    )
    staging_name = "__snapshot_staging_9999_0"
    nested = os.path.join(winner, staging_name)
    spark.createDataFrame([(2,)], "k long").write.parquet(nested)
    # readers never see the nested payload (underscore-hidden)
    assert _content(spark, winner) == [(1,)]
    assert PL.latest_version(spark, root) == 1
    # the loser's recovery step: pull it out, commit under the next id
    fs, hroot, jvm = PL._fs_and_path(spark, root)
    out = jvm.org.apache.hadoop.fs.Path(hroot, staging_name)
    assert fs.rename(jvm.org.apache.hadoop.fs.Path(nested), out)
    vpath = jvm.org.apache.hadoop.fs.Path(hroot, "v%08d" % 2)
    assert fs.rename(out, vpath)
    assert PL.latest_version(spark, root) == 2
    assert _content(spark, root + "/v00000002") == [(2,)]


def test_vacuum_clean_staging_sweeps_orphans(spark, tmp_path):
    root = str(tmp_path / "vlake")
    for i in range(3):
        PL.write_version(
            spark, root, spark.createDataFrame([(i,)], "k long")
        )
    orphan = root + "/__snapshot_staging_1234_0"
    spark.createDataFrame([(9,)], "k long").write.parquet(orphan)
    PL.vacuum_versions(spark, root, keep_last=2)
    assert os.path.exists(orphan)  # default: untouched
    PL.vacuum_versions(spark, root, keep_last=2, clean_staging=True)
    assert not os.path.exists(orphan)
    assert PL.latest_version(spark, root) == 2


def _start_rtbf(spark, tmp_path, indir, ck_name):
    from gcs_parquet_dataflow_spark.streaming.pipeline import run_rtbf_stream

    stream = (
        spark.readStream.schema("subject_key long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir / "*"))
    )
    q = run_rtbf_stream(
        spark, stream,
        [(str(tmp_path / "users_lake"), "user_id")],
        str(tmp_path / "audit"), str(tmp_path / ck_name),
        available_now=True,
    )
    q.awaitTermination(180)


def test_rtbf_audit_marker_fence_states(spark, tmp_path):
    """ADVICE r9: the replay fence is the _COMMITTED marker, not the
    bare partition dir.  (a) marker present → a full replay (fresh
    checkpoint, same requests) skips the lake commit entirely;
    (b) torn audit partition (dir exists, marker absent — the crash
    window) → the replay RE-APPLIES: deletions are idempotent, the
    audit partition is rewritten whole, and the marker is restored —
    the compliance trail is never permanently incomplete."""
    users = str(tmp_path / "users_lake")
    PL.write_version(
        spark, users,
        spark.createDataFrame(
            [(i, f"n{i}") for i in range(10)], "user_id long, name string"
        ),
    )
    indir = tmp_path / "req"
    indir.mkdir()
    spark.createDataFrame([(3,), (7,)], "subject_key long").coalesce(
        1
    ).write.parquet(str(indir / "b0"))

    _start_rtbf(spark, tmp_path, indir, "ck0")
    assert PL.latest_version(spark, users) == 1
    audit_part = tmp_path / "audit" / "_batch_id=0"
    marker = audit_part / "_COMMITTED"
    assert marker.exists()
    audit_rows = _content(spark, str(tmp_path / "audit"))

    # (a) fenced replay: fresh checkpoint re-delivers batch 0; the
    # marker short-circuits it — no new snapshot, audit unchanged
    _start_rtbf(spark, tmp_path, indir, "ck1")
    assert PL.latest_version(spark, users) == 1
    assert _content(spark, str(tmp_path / "audit")) == audit_rows

    # (b) torn audit: drop the marker and a data file (the crash left
    # a partial partition); the replay re-applies and heals both
    marker.unlink()
    for f in audit_part.iterdir():
        if f.name.startswith("part-"):
            f.unlink()
            break
    _start_rtbf(spark, tmp_path, indir, "ck2")
    assert marker.exists()
    # the audit is whole again; the re-apply recorded the NEW snapshot
    # it committed (idempotent content, one extra identical version —
    # the documented raw-parquet trade)
    healed = spark.read.parquet(str(tmp_path / "audit"))
    assert [
        tuple(r) for r in healed.select(
            "_batch_id", "lake_root", "lake_key", "n_keys"
        ).collect()
    ] == [(0, users, "user_id", 2)]
    assert healed.select("new_version").first()[0] == 2
    assert PL.latest_version(spark, users) == 2
    assert _content(spark, users + "/v00000002") == _content(
        spark, users + "/v00000001"
    )


def test_read_skipping_falls_back_on_stale_manifest(spark, tmp_path):
    """optimize_table commits data before the manifest, so a crash
    between the two leaves a manifest whose paths were deleted by the
    rewrite.  read_skipping must detect the dead path and serve the
    exact unpruned predicate instead of failing — correct, just
    unpruned, until the next optimize heals the manifest."""
    path = str(tmp_path / "t")
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("x")
    ).repartition(4).write.parquet(path)
    res = PL.optimize_table(spark, path, sort_cols=["k"])
    stats = spark.read.parquet(res["manifest_path"])
    expect = [(k, 2 * k) for k in range(10, 41)]

    got = PL.read_skipping(spark, path, stats, "k", 10, 40)
    assert sorted(tuple(r) for r in got.select("k", "x").collect()) == expect

    # simulate the crash: data rewritten again, manifest left stale
    PL.compact(spark, path, target_file_bytes=1 << 30)
    live = {
        r["file"]
        for r in spark.range(1).sparkSession.read.parquet(path)
        .select(F.input_file_name().alias("file")).distinct().collect()
    }
    stale_files = {r["file"] for r in stats.select("file").collect()}
    assert not (stale_files & live)  # every manifest path is dead now

    got2 = PL.read_skipping(spark, path, stats, "k", 10, 40)
    assert sorted(tuple(r) for r in got2.select("k", "x").collect()) == expect
