"""Incremental sketch-index dedup: new batches dedup against everything
previously accepted without rescanning accepted text."""

from __future__ import annotations

import pytest

from gcs_parquet_dataflow_spark.operators.dedup import minhash_perms
from gcs_parquet_dataflow_spark.operators.incremental import (
    dedup_batch_against_index,
    read_index,
)
from gcs_parquet_dataflow_spark.operators.partitioning import (
    release_intermediates,
)

PERMS = minhash_perms(num_perm=16, seed=7)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sentence(tag: str) -> str:
    # every word carries the tag so different tags share ZERO shingles —
    # collisions in the tests below are only the planted ones
    return " ".join(f"{tag}w{j}" for j in range(12))


def test_incremental_dedup_across_batches(spark, tmp_path):
    idx = str(tmp_path / "sketch_index")

    batch1 = _docs(spark, [(i, _sentence(f"b1u{i}")) for i in range(6)])
    s1 = dedup_batch_against_index(
        spark, batch1, "doc_id", "text", idx, PERMS
    )
    assert sorted(r["doc_id"] for r in s1.collect()) == [0, 1, 2, 3, 4, 5]
    release_intermediates()
    n_index_1 = read_index(spark, idx).count()
    assert n_index_1 == 6 * 8  # 16 perms / 2 rows per band

    batch2 = _docs(
        spark,
        [
            (100, _sentence("b1u3")),              # exact dup of batch1 doc 3
            (101, _sentence("b1u4") + " extra"),   # near dup of batch1 doc 4
            (102, _sentence("fresh")),             # genuinely new
            (103, "too short"),                    # < 3 tokens: no shingles
        ],
    )
    s2 = dedup_batch_against_index(
        spark, batch2, "doc_id", "text", idx, PERMS
    )
    assert sorted(r["doc_id"] for r in s2.collect()) == [102, 103]
    release_intermediates()
    # only the new sketchable doc added bands; the shingle-less one adds none
    assert read_index(spark, idx).count() == n_index_1 + 8


def test_intra_batch_duplicates_keep_min_id(spark, tmp_path):
    idx = str(tmp_path / "sketch_index2")
    batch = _docs(
        spark,
        [
            (7, _sentence("same")),
            (3, _sentence("same")),
            (9, _sentence("other")),
        ],
    )
    got = dedup_batch_against_index(spark, batch, "doc_id", "text", idx, PERMS)
    assert sorted(r["doc_id"] for r in got.collect()) == [3, 9]
    release_intermediates()
    # replaying the same content under new ids drops everything
    replay = _docs(
        spark, [(50, _sentence("same")), (51, _sentence("other"))]
    )
    again = dedup_batch_against_index(spark, replay, "doc_id", "text", idx, PERMS)
    assert again.count() == 0
    release_intermediates()


@pytest.mark.parametrize("with_bloom", [False, True])
def test_streaming_corpus_ingest_dedups_across_microbatches(
    spark, tmp_path, with_bloom
):
    import json

    from gcs_parquet_dataflow_spark.streaming.pipeline import (
        run_corpus_ingest_stream,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    # two files → maxFilesPerTrigger=1 forces two micro-batches; the
    # second file re-sends doc 1's text under a new id plus a near-dup
    f1 = [
        {"doc_id": 1, "text": _sentence("s1")},
        {"doc_id": 2, "text": _sentence("s2")},
    ]
    f2 = [
        {"doc_id": 10, "text": _sentence("s1")},             # cross-batch dup
        {"doc_id": 11, "text": _sentence("s2") + " extra"},  # cross-batch near-dup
        {"doc_id": 12, "text": _sentence("s3")},             # new
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in f1))
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in f2))

    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = run_corpus_ingest_stream(
        spark,
        stream,
        "doc_id",
        "text",
        str(tmp_path / "index"),
        str(tmp_path / "accepted"),
        str(tmp_path / "ckpt"),
        PERMS,
        bloom_path=str(tmp_path / "bloom") if with_bloom else None,
        available_now=True,
    )
    q.awaitTermination(120)
    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    assert sorted(r["doc_id"] for r in accepted.collect()) == [1, 2, 12]


def test_bucket_cap_bounds_boilerplate_batch_keeps_near_dup_drops(
    spark, tmp_path
):
    """Guard semantics (VERDICT r3 item 3 applied to the incremental
    path): a batch dominated by one boilerplate block stays bounded —
    its hot buckets are excluded from matching (so the verbatim block
    passes, exact_dedup's job) while ordinary near-dups of the accepted
    corpus are still dropped, and the index append keeps FULL bands."""
    idx = str(tmp_path / "sketch_index_cap")

    batch1 = _docs(spark, [(i, _sentence(f"a{i}")) for i in range(4)])
    s1 = dedup_batch_against_index(
        spark, batch1, "doc_id", "text", idx, PERMS, max_bucket_size=5
    )
    assert s1.count() == 4
    release_intermediates()
    assert read_index(spark, idx).count() == 4 * 8  # full bands appended

    bp = _sentence("boiler")
    batch2 = _docs(
        spark,
        [(200 + i, bp) for i in range(20)]           # one hot block
        + [(300, _sentence("a2") + " extra")],        # near-dup of accepted 2
    )
    s2 = dedup_batch_against_index(
        spark, batch2, "doc_id", "text", idx, PERMS, max_bucket_size=5
    )
    got = sorted(r["doc_id"] for r in s2.collect())
    release_intermediates()
    # the hot block's buckets (20 > cap) are excluded from matching →
    # all 20 survive this stage (exact_dedup upstream owns verbatim
    # copies); the true near-dup is still caught via the index
    assert got == list(range(200, 220))
    # uncapped behavior on the same batch: min-id of the block survives
    idx2 = str(tmp_path / "sketch_index_nocap")
    dedup_batch_against_index(spark, batch1, "doc_id", "text", idx2, PERMS)
    release_intermediates()
    s2u = dedup_batch_against_index(
        spark, batch2, "doc_id", "text", idx2, PERMS
    )
    assert sorted(r["doc_id"] for r in s2u.collect()) == [200]
    release_intermediates()
