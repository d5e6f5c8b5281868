"""Round-8 guard tests: the ADVICE r7 closures — the DP group-cap
(unit-level ε, not per-coordinate), the bloom lake's persisted
(m_bits, k) parameter fence, NULL-payload DLQ in the media decoders,
and oracle_check's --json argv bounds check."""

from __future__ import annotations

import subprocess
import sys

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r7 item 1: dp_release group_cap — a unit touching G groups was
# only protected at G·ε; group_cap bounds G and scales the noise.
# ---------------------------------------------------------------------------


def test_dp_release_group_cap_bounds_groups_and_scales_noise(spark):
    """With group_cap=G: (a) every unit contributes to at most G
    groups; (b) noise_scale = G·Δ/ε (the L1 bound, not the
    per-coordinate Δ/ε); (c) the released columns carry
    group_cap/l1_sensitivity; (d) the kept selection is deterministic
    under repartitioning."""
    from gcs_parquet_dataflow_spark.operators.privacy import (
        dp_release_counts,
    )

    # 8 units × 10 groups each — without the cap, one unit shifts 10
    # released coordinates
    df = spark.range(800).select(
        (F.col("id") % 10).cast("string").alias("g"),
        (F.col("id") % 8).cast("string").alias("unit"),
    )
    rel = dp_release_counts(
        df, ["g"], "unit", epsilon=0.5, contribution_cap=4,
        group_cap=3, include_internals=True,
    )
    rows = rel.collect()
    b = 3 * 4 / 0.5
    for r in rows:
        assert r["noise_scale"] == b
        assert r["group_cap"] == 3
        assert r["l1_sensitivity"] == 12
        assert r["sensitivity"] == 4
    # each unit appears in ≤ 3 groups after capping: total clamped mass
    # is Σ_units Σ_kept min(c, Δ) ≤ 8 units × 3 groups × Δ
    total = sum(r["clamped_count"] for r in rows)
    assert total <= 8 * 3 * 4
    # each (g,unit) cell has 10 rows → clamped at Δ=4 → exactly 8×3×4
    assert total == 8 * 3 * 4

    again = dp_release_counts(
        df.repartition(13), ["g"], "unit", epsilon=0.5,
        contribution_cap=4, group_cap=3, include_internals=True,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_dp_release_group_cap_neighbor_bound(spark):
    """The L1 neighbor bound the ε guarantee rests on: removing one
    unit entirely changes at most group_cap coordinates, each by at
    most Δ — Σ|change| ≤ group_cap·Δ = l1_sensitivity."""
    from gcs_parquet_dataflow_spark.operators.privacy import (
        dp_release_counts,
    )

    rows = [(f"g{i}", "spread") for i in range(9) for _ in range(6)] + [
        (f"g{i}", f"u{i}") for i in range(9) for _ in range(2)
    ]
    df = spark.createDataFrame(rows, "g string, unit string")

    def clamped(d):
        return {
            r["g"]: r["clamped_count"]
            for r in dp_release_counts(
                d, ["g"], "unit", epsilon=1.0, contribution_cap=4,
                group_cap=2, include_internals=True,
            ).collect()
        }

    full = clamped(df)
    wo = clamped(df.filter(F.col("unit") != "spread"))
    changes = [full[g] - wo.get(g, 0) for g in full]
    assert sum(abs(c) for c in changes) <= 2 * 4
    assert sum(1 for c in changes if c != 0) <= 2


def test_dp_release_unbounded_marks_null_group_cap(spark):
    """Without group_cap the release must SAY so: group_cap and
    l1_sensitivity are NULL (the ledger can't claim a unit-level ε),
    and the noise scale stays the per-coordinate Δ/ε."""
    from gcs_parquet_dataflow_spark.operators.privacy import (
        dp_release_counts,
        epsilon_ledger,
    )

    df = spark.createDataFrame(
        [("a", "u1"), ("a", "u2"), ("b", "u1")], "g string, unit string"
    )
    rel = dp_release_counts(df, ["g"], "unit", 0.5, 8)
    r = rel.first()
    assert r["group_cap"] is None
    assert r["l1_sensitivity"] is None
    assert r["noise_scale"] == 16.0
    led = epsilon_ledger([("r1", rel)]).first()
    assert led["group_cap"] is None


# ---------------------------------------------------------------------------
# ADVICE r7 item 2: the bloom lake's (m_bits, k) parameter fence.
# ---------------------------------------------------------------------------


def test_bloom_lake_parameter_fence(spark, tmp_path):
    """A bloom lake probed with different m_bits than it was built
    with hashes into a different bit space → silent false negatives
    (duplicates accepted forever). The persisted meta must (a) be
    written on first use, (b) trigger a rebuild with the caller's
    parameters on mismatch, and (c) keep the no-false-negative
    invariant across the parameter change: the cross-batch duplicate
    is still dropped."""
    from gcs_parquet_dataflow_spark.operators.dedup import minhash_perms
    from gcs_parquet_dataflow_spark.operators.incremental import (
        dedup_batch_against_index,
        read_bloom_meta,
    )
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )
    from gcs_parquet_dataflow_spark.operators.sketches import BLOOM_K

    perms = minhash_perms(num_perm=16, seed=7)
    idx = str(tmp_path / "idx")
    bloom = str(tmp_path / "bloom")

    def sentence(tag):
        return " ".join(f"{tag}w{j}" for j in range(12))

    b1 = spark.createDataFrame(
        [(i, sentence(f"u{i}")) for i in range(4)],
        "doc_id long, text string",
    )
    s1 = dedup_batch_against_index(
        spark, b1, "doc_id", "text", idx, perms,
        bloom_path=bloom, bloom_m_bits=2**20,
    )
    assert s1.count() == 4
    release_intermediates()
    assert read_bloom_meta(spark, bloom) == {"m_bits": 2**20, "k": BLOOM_K}

    # batch 2 probes with DIFFERENT m_bits: pre-fix this silently
    # hashed into the wrong bit space and accepted the duplicate
    b2 = spark.createDataFrame(
        [(100, sentence("u2")), (101, sentence("fresh"))],
        "doc_id long, text string",
    )
    s2 = dedup_batch_against_index(
        spark, b2, "doc_id", "text", idx, perms,
        bloom_path=bloom, bloom_m_bits=2**18,
    )
    assert sorted(r["doc_id"] for r in s2.collect()) == [101]
    release_intermediates()
    # the lake was rebuilt with the caller's parameters and re-fenced
    assert read_bloom_meta(spark, bloom) == {"m_bits": 2**18, "k": BLOOM_K}


# ---------------------------------------------------------------------------
# ADVICE r7 item 3: NULL payloads must DLQ as opaque, never fail the
# Arrow batch.
# ---------------------------------------------------------------------------


def test_null_payload_rows_dlq_not_crash(spark):
    from gcs_parquet_dataflow_spark.operators.multimodal import (
        decode_features,
        decode_uncompressed_features,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"BMxxxx")), (2, None), (3, bytearray(b"hello"))],
        "media_id long, payload binary",
    )
    got = {
        r["media_id"]: r for r in decode_uncompressed_features(df).collect()
    }
    assert got[2]["kind"] == "opaque"
    assert got[2]["width"] is None
    # truncated BMP header DLQs too; plain bytes are opaque
    assert got[1]["kind"] == "opaque"
    assert got[3]["kind"] == "opaque"

    # frame sampler: NULL payload → zero frames, batch survives
    frames = sample_frames(df).groupBy("media_id").count().collect()
    assert {r["media_id"] for r in frames} == {1, 3}

    # stub decoder: NULL decodes as empty payload
    feats = {r["media_id"]: r for r in decode_features(df).collect()}
    assert feats[2]["n_bytes"] == 0


# ---------------------------------------------------------------------------
# ADVICE r7 item 4: --json as the last argv token must be a usage
# error, not an IndexError traceback.
# ---------------------------------------------------------------------------


def test_oracle_check_json_without_path_is_usage_error():
    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/oracle_check.py", "--json"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 2
    assert "usage:" in proc.stderr
    assert "IndexError" not in proc.stderr


# ---------------------------------------------------------------------------
# VERDICT r7 item 2: knn_label_eval_ann — the scale-safe eval must run
# the IDENTICAL contract as the exact all-pairs ground-truth row.
# ---------------------------------------------------------------------------


def _write_embeddings(spark, path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(path + "/embeddings.parquet")


def test_knn_label_eval_ann_matches_exact_contract(spark, tmp_path):
    """Planted separable clusters: when the embeddings actually carry
    the label signal, the ANN eval and the exact eval must AGREE —
    every cluster-mate shares the anchor's argmax centroid list, so
    the IVF candidates contain the true neighbors and both rows report
    accuracy 1.0 with identical schema/class-weight columns."""
    from gcs_parquet_dataflow_spark.queries import CATALOG

    # 4 tight clusters of 10 in 64-dim: center = 10·e_{16k}, jitter on
    # a per-cluster off-axis so vectors are distinct but near-parallel
    rows = []
    vid = 0
    for k in range(4):
        for j in range(10):
            v = [0.0] * 64
            v[k * 16] = 10.0
            v[k * 16 + 1] = 0.001 * (j + 1)
            rows.append((vid, v, k))
            vid += 1
    sf = str(tmp_path / "planted")
    _write_embeddings(spark, sf, rows)

    exact = {
        r["label"]: r for r in CATALOG["knn_label_eval"].build(spark, sf).collect()
    }
    ann = {
        r["label"]: r
        for r in CATALOG["knn_label_eval_ann"].build(spark, sf).collect()
    }
    assert sorted(exact) == sorted(ann) == [0, 1, 2, 3]
    for k in exact:
        assert exact[k]["knn_accuracy"] == 1.0
        assert ann[k]["knn_accuracy"] == 1.0
        assert ann[k]["n_vectors"] == exact[k]["n_vectors"] == 10
        assert ann[k]["class_weight"] == exact[k]["class_weight"] == 1.0


def test_knn_label_eval_ann_close_to_exact_on_fixture(spark):
    """On the real (weak-signal) fixture labels the ANN eval must stay
    CLOSE to the exact eval — same label set, identical class weights,
    per-class accuracy within the observed ANN-vs-exact band (max
    |diff| 0.089 at sf0.001; threshold 2× that). Fixed data + seeded
    centroids → fully deterministic, not a statistical assertion."""
    from gcs_parquet_dataflow_spark.queries import CATALOG

    sf = "/root/testdata/sf0.001"
    exact = {
        r["label"]: r for r in CATALOG["knn_label_eval"].build(spark, sf).collect()
    }
    ann = {
        r["label"]: r
        for r in CATALOG["knn_label_eval_ann"].build(spark, sf).collect()
    }
    assert sorted(exact) == sorted(ann)
    for k in exact:
        assert ann[k]["n_vectors"] == exact[k]["n_vectors"]
        assert ann[k]["class_weight"] == exact[k]["class_weight"]
        assert abs(ann[k]["knn_accuracy"] - exact[k]["knn_accuracy"]) <= 0.18


# ---------------------------------------------------------------------------
# VERDICT r7 item 5: the Bloom prefilter armed on the incremental-ER
# stream — prefiltered ≡ unfiltered, all-novel batches skip the probe,
# parameter mismatches fall back instead of fabricating false negatives.
# ---------------------------------------------------------------------------


_ER_SCHEMA = "rid long, name string, city string, bal long"


def _er_batches(spark, indir):
    b0 = spark.createDataFrame(
        [(1, "Acme Corp 01", "springfield", 1000),
         (2, "ACME CORP 01", "springfield", 1005),
         (3, "Zenith Ltd 77", "metropolis", 5000)],
        _ER_SCHEMA,
    )
    b1 = spark.createDataFrame(
        [(10, "acme corp 01", "springfield", 1002),
         (11, "Nadir Inc 99", "gotham", 7000)],
        _ER_SCHEMA,
    )
    # all-novel batch: no digit key nor city shared with any entity —
    # the bloom must pass ZERO records and skip the probe entirely
    b2 = spark.createDataFrame(
        [(20, "Quark Labs 33", "atlantis", 100),
         (21, "QUARK LABS 33", "atlantis", 104)],
        _ER_SCHEMA,
    )
    indir.mkdir()
    b0.coalesce(1).write.parquet(str(indir / "b0"))
    b1.coalesce(1).write.parquet(str(indir / "b1"))
    b2.coalesce(1).write.parquet(str(indir / "b2"))


def _run_er(spark, tmp_path, indir, tag, ck, bloom=None, m_bits=2**20, **kw):
    from gcs_parquet_dataflow_spark.streaming.pipeline import (
        run_incremental_er_stream,
    )

    def norm(c):
        return F.lower(F.regexp_replace(F.col(c), "[^A-Za-z0-9]", ""))

    stream = (
        spark.readStream.schema(_ER_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir / "*"))
    )
    q = run_incremental_er_stream(
        spark, stream,
        str(tmp_path / f"members_{tag}"), str(tmp_path / f"golden_{tag}"),
        str(tmp_path / ck),
        id_col="rid", attrs=["name", "city", "bal"],
        passes=[("nm", F.regexp_replace(F.col("name"), "[^0-9]", "")),
                ("city", F.col("city"))],
        agreements=[(norm("name_a") == norm("name_b"), 50),
                    (F.col("city_a") == F.col("city_b"), 10),
                    (F.abs(F.col("bal_a") - F.col("bal_b")) <= 10, 30)],
        threshold=60,
        bloom_path=None if bloom is None else str(tmp_path / bloom),
        bloom_m_bits=m_bits,
        available_now=True,
        **kw,
    )
    q.awaitTermination(180)
    return sorted(
        (r["rid"], r["entity_id"])
        for r in spark.read.parquet(
            str(tmp_path / f"members_{tag}")
        ).collect()
    )


def test_er_stream_bloom_prefilter_equivalent(spark, tmp_path):
    """Bloom-armed ER stream ≡ unfiltered ER stream on the identical
    batch sequence (including an all-novel batch that exercises the
    skip path), the bloom lake rides batch-keyed beside the snapshot
    with (m_bits, k) stamped on every word row, and a replay under
    DIFFERENT bloom parameters falls back to the unfiltered probe —
    same final members — instead of false-negativing the cross-batch
    match."""
    indir = tmp_path / "in"
    _er_batches(spark, indir)

    plain = _run_er(spark, tmp_path, indir, "plain", "ck_plain")
    armed = _run_er(
        spark, tmp_path, indir, "armed", "ck_armed", bloom="bloom"
    )
    assert armed == plain
    # record 10 still joined entity 1 ACROSS batches through the bloom
    assert (10, 1) in armed
    # the all-novel pair resolved intra-batch as usual
    assert (20, 20) in armed and (21, 20) in armed

    words = spark.read.parquet(str(tmp_path / "bloom"))
    assert {r["m_bits"] for r in words.select("m_bits").distinct().collect()} == {2**20}
    assert {r["k"] for r in words.select("k").distinct().collect()}
    # superseded partitions are pruned after each batch (ADVICE r8):
    # only {this batch, the snapshot it consumed} survive — partition 0
    # was deleted when batch 2 landed
    batch_ids = {
        r["_batch_id"]
        for r in words.select("_batch_id").distinct().collect()
    }
    assert batch_ids == {1, 2}

    # replay with a fresh checkpoint and MISMATCHED m_bits: the fence
    # must fall back (old partitions are 2^20-stamped), converge to the
    # same members, and re-stamp its own partitions with the new params
    replay = _run_er(
        spark, tmp_path, indir, "armed", "ck_armed2", bloom="bloom",
        m_bits=2**16,
    )
    assert replay == plain
    words2 = spark.read.parquet(str(tmp_path / "bloom"))
    assert {r["m_bits"] for r in words2.select("m_bits").distinct().collect()} == {2**16}
