"""Entity-resolution suite (operators/linkage.py): blocking semantics,
hot-block guard, integer Fellegi–Sunter scoring, transitive closure,
survivorship determinism — the semantic contracts the differential
oracle rows (er_*) rely on."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators import linkage

import pytest

pytestmark = pytest.mark.fast  # driver quick-gate module (r13)


def _records(spark):
    # 1/2 are a near-pair (share name digits + city); 3 is a hot-city
    # singleton; 4/5/6 share ONLY the hot city "metropolis".
    return spark.createDataFrame(
        [
            (1, "Acme Corp 01", "springfield"),
            (2, "ACME CORP 01", "springfield"),
            (3, "Zenith Ltd 77", "metropolis"),
            (4, "Foo 10", "metropolis"),
            (5, "Bar 11", "metropolis"),
            (6, "Baz 12", "metropolis"),
        ],
        "rid long, name string, city string",
    )


def _passes():
    return [
        ("nm", F.regexp_replace(F.col("name"), "[^0-9]", "")),
        ("city", F.col("city")),
    ]


def test_blocked_candidate_pairs_counts_passes(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["n_passes"]
        for r in linkage.blocked_candidate_pairs(
            _records(spark), "rid", _passes()
        ).collect()
    }
    # 1/2 meet via BOTH passes (same digits, same city)
    assert pairs[(1, 2)] == 2
    # metropolis block contributes its C(4,2) pairs once each
    assert pairs[(3, 4)] == 1 and pairs[(4, 5)] == 1 and pairs[(5, 6)] == 1
    assert len(pairs) == 1 + 6


def test_blocked_candidate_pairs_cap_excludes_hot_block(spark):
    # cap=3 guards the 4-member metropolis city block; the nm pass and
    # small blocks are untouched, so ONLY the 1/2 pair survives.
    pairs = {
        (r["id_a"], r["id_b"]): r["n_passes"]
        for r in linkage.blocked_candidate_pairs(
            _records(spark), "rid", _passes(), max_block_size=3
        ).collect()
    }
    assert pairs == {(1, 2): 2}


def test_blocked_candidate_pairs_null_key_skips_pass(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, None, "x"), (3, None, None)],
        "rid long, name string, city string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["n_passes"]
        for r in linkage.blocked_candidate_pairs(
            df, "rid", [("nm", F.col("name")), ("city", F.col("city"))]
        ).collect()
    }
    # record 2 has no nm key but still meets 1 through the city pass;
    # record 3 has no key at all and pairs with nobody.
    assert pairs == {(1, 2): 1}


def test_fellegi_sunter_score_null_is_zero_evidence(spark):
    pairs = spark.createDataFrame(
        [(1, 2, "a", "a", 10, 12), (3, 4, "b", None, 10, 100)],
        "id_a long, id_b long, name_a string, name_b string,"
        " bal_a long, bal_b long",
    )
    out = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in linkage.fellegi_sunter_score(
            pairs,
            [
                (F.col("name_a") == F.col("name_b"), 50),
                (F.abs(F.col("bal_a") - F.col("bal_b")) <= 10, 30),
            ],
        ).collect()
    }
    assert out[(1, 2)] == 80
    # NULL name comparison contributes 0, not NULL — the whole score
    # stays defined and the balance disagreement adds nothing.
    assert out[(3, 4)] == 0


def test_entity_clusters_transitive_closure(spark):
    recs = spark.createDataFrame(
        [(i,) for i in range(1, 7)], "rid long"
    )
    matches = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    out = {
        r["rid"]: r["cluster"]
        for r in linkage.entity_clusters(recs, matches, "rid").collect()
    }
    # 1-2-3 chain closes transitively to min id 1; 4-5 to 4; 6 singleton
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_golden_records_survivorship(spark):
    labeled = spark.createDataFrame(
        [
            (2, 1, "Acme CORP", 500),
            (1, 1, "Acme Corp", 300),
            (3, 3, "Zenith", 100),
        ],
        "rid long, cluster long, name string, bal long",
    )
    out = {
        r["entity_id"]: (
            r["n_records"], r["canonical_name"], r["max_bal"]
        )
        for r in linkage.golden_records(
            labeled, "rid", canonical=("name",),
            extra_aggs=(F.max("bal").alias("max_bal"),),
        ).collect()
    }
    # canonical picks the MIN-rid member's value; max rides along
    assert out == {1: (2, "Acme Corp", 500), 3: (1, "Zenith", 100)}


def test_er_pipeline_recovers_planted_variants(spark):
    """End-to-end planted-recall on real data: every re-spelled variant
    (the er_* oracle scenario at sf0.001) must match BACK to its source
    record and ONLY to it — precision and recall both exact."""
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )
    from gcs_parquet_dataflow_spark.queries.extensions import _er_matches

    recs, matches = _er_matches(spark, "/root/testdata/sf0.001")
    got = {
        (r["id_a"], r["id_b"]) for r in matches.collect()
    }
    planted = {
        (r["rec_id"], r["rec_id"] + 1000000)
        for r in recs.filter(
            (F.col("rec_id") % 7 == 0) & (F.col("rec_id") < 1000000)
        ).collect()
    }
    release_intermediates()
    assert got == planted and len(planted) > 0


def test_em_weight_step_exact_hand_computation(spark):
    """3 pairs, 2 fields, the default one-decimal prior grid: every
    per-pair posterior is an exact integer ratio (all-agree w=0.9,
    one-agree w=0.1, none-agree w=1/730), so the supports and the
    re-estimated m/u are hand-checkable to the digit."""
    pairs = spark.createDataFrame(
        [(1, 1), (0, 0), (1, 0), ],
        "f1 long, f2 long",
    )
    out = {
        r["field"]: (
            r["support_match"], r["support_unmatch"],
            r["m_new"], r["u_new"],
        )
        for r in linkage.em_weight_step(
            pairs,
            [("f1", F.col("f1") == 1), ("f2", F.col("f2") == 1)],
        ).collect()
    }
    # wq: all-agree 900000; none-agree 1000000//730 = 1369; f1-only 100000
    sw, snw = 900000 + 1369 + 100000, 3_000_000 - (900000 + 1369 + 100000)
    assert out["f1"] == (
        1_000_000, 1_000_000,
        round(1_000_000 / sw, 6), round(1_000_000 / snw, 6),
    )
    assert out["f2"] == (
        900_000, 100_000,
        round(900_000 / sw, 6), round(100_000 / snw, 6),
    )


def test_em_weight_step_null_predicate_is_disagreement(spark):
    pairs = spark.createDataFrame(
        [(None,), ("x",)], "v string",
    )
    out = {
        r["field"]: r["support_match"]
        for r in linkage.em_weight_step(
            pairs, [("f", F.col("v") == "x")]
        ).collect()
    }
    # the NULL row contributes gamma=0: only the "x" row supports f.
    # One field, agree: A = 1*9 = 9, B = 9*1 = 9 -> w = 0.5 exactly
    # (the p=0.1 prior and the m=0.9 likelihood cancel); the NULL row
    # (disagree, w = 1/82) contributes nothing to support_match.
    assert out["f"] == 500_000


def test_blocked_pairs_between_probe_and_per_side_cap(spark):
    left = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "h"), (4, "d", "h")],
        "rid long, k string, city string",
    )
    right = spark.createDataFrame(
        [(100, "a", "z"), (101, "e", "h"), (102, "f", "h"),
         (103, "g", "h")],
        "eid long, k string, city string",
    )
    passes = [("k", F.col("k")), ("city", F.col("city"))]
    pairs = {
        (r["id_a"], r["id_b"]): r["n_passes"]
        for r in linkage.blocked_pairs_between(
            left, right, "rid", "eid", passes, max_block_size=2
        ).collect()
    }
    # k-pass: 1<->100 meet on "a"; city-pass: "h" has 2 on the left
    # (kept, cap=2) but 3 on the right (capped out) -> no city pairs
    assert pairs == {(1, 100): 1}
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in linkage.blocked_pairs_between(
            left, right, "rid", "eid", passes
        ).collect()
    }
    assert (3, 101) in uncapped and len(uncapped) == 1 + 6


def test_golden_view_min_id_attrs(spark):
    members = spark.createDataFrame(
        [(5, 1, "B", 10), (1, 1, "A", 20), (7, 7, "C", 5)],
        "rid long, entity_id long, name string, bal long",
    )
    out = {
        r["entity_id"]: (r["n_records"], r["name"], r["bal"])
        for r in linkage.golden_view(
            members, "rid", ["name", "bal"]
        ).collect()
    }
    # view carries the MIN-rid member's attrs under original names
    assert out == {1: (2, "A", 20), 7: (1, "C", 5)}


def test_recluster_members_heals_incremental_split(spark):
    """The documented incremental-ER approximation: record 3 matches
    BOTH entity 1 and entity 2 (balance within 10 of each; 1 and 2 are
    20 apart so they never matched each other), but the online stream
    joined it to one best entity, leaving a split. Offline compaction
    (recluster_members) re-runs the full pipeline over the member
    records and merges the transitive component."""
    members = spark.createDataFrame(
        [
            (1, 1, "Acme Corp 01", "x", 1000),
            (2, 2, "Beta LLC 02", "x", 1020),
            (3, 1, "Gamma Inc 03", "x", 1010),  # online best-pick: 1
        ],
        "rid long, entity_id long, name string, city string, bal long",
    )
    healed = {
        r["rid"]: r["entity_id"]
        for r in linkage.recluster_members(
            members, "rid", ["name", "city", "bal"],
            passes=[("city", F.col("city"))],
            agreements=[
                (F.col("name_a") == F.col("name_b"), 50),
                (F.col("city_a") == F.col("city_b"), 10),
                (F.abs(F.col("bal_a") - F.col("bal_b")) <= 10, 30),
            ],
            threshold=40,
        ).collect()
    }
    # matches: (1,3) and (2,3) at 40 each; (1,2) only 10 — transitive
    # closure merges all three under min id 1
    assert healed == {1: 1, 2: 1, 3: 1}


def test_phonetic_and_sorted_token_blocks(spark):
    df = spark.createDataFrame(
        [(1, "Smith Hardware"), (2, "Smyth Hardware"),
         (3, "Corp Acme"), (4, "Acme Corp"), (5, "Zeta Co")],
        "rid long, name string",
    )
    out = {
        r["rid"]: (r["sx"], r["st"])
        for r in df.select(
            "rid",
            linkage.soundex_block(F.col("name")).alias("sx"),
            linkage.sorted_token_prefix_block(F.col("name")).alias("st"),
        ).collect()
    }
    # misspelled surnames share the phonetic block
    assert out[1][0] == out[2][0]
    # token order doesn't matter for the sorted-prefix block
    assert out[3][1] == out[4][1] == "Acme Corp"
    assert out[5][1] != out[4][1]
