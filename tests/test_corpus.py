"""Corpus operator tests: chunk coverage/overlap invariants, vocabulary
counts, deterministic-shuffle partitioning independence, PII scrub."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.functions import text as TX
from gcs_parquet_dataflow_spark.operators.corpus import (
    chunk_by_tokens,
    deterministic_shuffle,
    vocabulary,
)
import pytest

pytestmark = pytest.mark.fast  # driver quick-gate module (r13)


def test_chunks_cover_document_with_overlap(spark):
    words = [f"w{i}" for i in range(25)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = chunk_by_tokens(df, "doc_id", "text", chunk_size=10, overlap=2).orderBy(
        "chunk_idx"
    ).collect()
    # step 8: starts 0,8,16,24 → 4 chunks, last is the 1-token tail
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["chunk_text"].split() == words[0:10]
    assert rows[1]["chunk_text"].split() == words[8:18]   # 2-token overlap
    assert rows[3]["chunk_text"].split() == words[24:25]
    assert [r["n_tokens"] for r in rows] == [10, 10, 9, 1]
    # every token appears in at least one chunk
    seen = {w for r in rows for w in r["chunk_text"].split()}
    assert seen == set(words)


def test_chunking_skips_null_text(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id long, text string"
    )
    got = chunk_by_tokens(df, "doc_id", "text", chunk_size=2).collect()
    assert {r["doc_id"] for r in got} == {1}


def test_vocabulary_counts_and_rank(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b a c")], "doc_id long, text string"
    )
    got = {
        r["term"]: (r["term_count"], r["rank"])
        for r in vocabulary(df, "text", min_count=2, top_n=10).collect()
    }
    # a×3, b×2; c dropped by min_count
    assert got == {"a": (3, 1), "b": (2, 2)}


def test_deterministic_shuffle_is_partitioning_independent(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = deterministic_shuffle(df.repartition(1), "doc_id", n_shards=4).collect()
    b = deterministic_shuffle(df.repartition(13), "doc_id", n_shards=4).collect()
    key = lambda rows: sorted(
        (r["doc_id"], r["shuffle_shard"], r["shard_rank"]) for r in rows
    )
    assert key(a) == key(b)
    # shards are ~balanced and ranks are contiguous from 1 per shard
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r["shuffle_shard"], []).append(r["shard_rank"])
    for ranks in by_shard.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_scrub_pii_redacts_and_counts(spark):
    raw = "mail a.b+c@x.co.uk, call +1 (555) 010-9923, see https://x.io/p?q=1 end"
    df = spark.createDataFrame([(raw,)], "text string")
    counts = TX.pii_counts(F.col("text"))
    row = df.select(
        TX.scrub_pii(F.col("text")).alias("s"),
        counts["email"].alias("ne"),
        counts["phone"].alias("np"),
        counts["url"].alias("nu"),
    ).first()
    assert row["s"] == "mail <EMAIL>, call <PHONE>, see <URL> end"
    assert (row["ne"], row["np"], row["nu"]) == (1, 1, 1)


def test_violating_rows_tags_failed_rules(spark):
    from gcs_parquet_dataflow_spark.operators.quality import (
        check_constraints,
        violating_rows,
    )

    df = spark.createDataFrame(
        [(1, 10, "u1"), (2, -5, "u2"), (3, 7, None), (4, -1, None)],
        "id long, v long, u string",
    )
    rules = {
        "v_nonneg": F.col("v") >= 0,
        "u_present": F.col("u").isNotNull(),
    }
    bad = {r["id"]: sorted(r["failed_rules"]) for r in violating_rows(df, rules).collect()}
    assert bad == {2: ["v_nonneg"], 3: ["u_present"], 4: ["u_present", "v_nonneg"]}
    summary = {r["rule"]: r["n_violations"] for r in check_constraints(df, rules).collect()}
    assert summary == {"v_nonneg": 2, "u_present": 2}


def test_chunks_without_overlap_reassemble_exactly(spark):
    # property: overlap=0 chunking partitions the token stream — joining
    # the chunks back in order reproduces the original text verbatim
    import random as _r

    rng = _r.Random(11)
    rows = [
        (i, " ".join(f"t{rng.randrange(50)}" for _ in range(rng.randrange(1, 120))))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        chunk_by_tokens(df, "doc_id", "text", chunk_size=7)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda s: s.getField("chunk_text"),
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    rebuilt = {r["doc_id"]: r["rebuilt"] for r in got.collect()}
    assert rebuilt == {i: text for i, text in rows}


def test_repetition_signals_known_document(spark):
    from gcs_parquet_dataflow_spark.operators.corpus import repetition_signals

    # "a a a b" → words: 4 total, top 'a'=3, 2 distinct
    #           → bigrams: "a a","a a","a b" → 3 total, top=2, 2 distinct
    df = spark.createDataFrame([(1, "a a a b"), (2, "x")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_signals(df, "doc_id", "text").collect()}
    r1 = rows[1]
    assert r1["top_word_frac"] == 0.75
    assert r1["dup_word_frac"] == 0.5
    assert round(r1["top_bigram_frac"], 6) == round(2 / 3, 6)
    assert round(r1["dup_bigram_frac"], 6) == round(1 / 3, 6)
    # single-token doc: word fracs defined, bigram fracs NULL
    r2 = rows[2]
    assert r2["top_word_frac"] == 1.0 and r2["dup_word_frac"] == 0.0
    assert r2["top_bigram_frac"] is None and r2["dup_bigram_frac"] is None


def test_pack_greedy_assigns_every_doc_once_and_is_layout_independent(spark):
    from gcs_parquet_dataflow_spark.operators.corpus import pack_greedy_by_budget

    docs = [(i, " ".join(f"t{i}w{j}" for j in range(5 + i % 37))) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = pack_greedy_by_budget(df, "doc_id", "text", budget=64, n_buckets=4)
    rows = got.collect()
    assert len(rows) == 200 and len({r["doc_id"] for r in rows}) == 200
    # packing is a function of content only — repartitioning can't move docs
    again = pack_greedy_by_budget(
        df.repartition(13), "doc_id", "text", budget=64, n_buckets=4
    ).collect()
    assert {(r["doc_id"], r["pack_id"]) for r in again} == {
        (r["doc_id"], r["pack_id"]) for r in rows
    }
    # every pack except possibly the last slot of each bucket holds < budget
    # + one-overrun: total before last doc < budget ⇒ pack_tokens bounded by
    # budget + max_doc_tokens - 1
    max_doc = max(r["n_tokens"] for r in rows)
    per_pack = {}
    for r in rows:
        per_pack[r["pack_id"]] = per_pack.get(r["pack_id"], 0) + r["n_tokens"]
    assert all(v <= 64 + max_doc - 1 for v in per_pack.values())


def test_dedup_segments_drops_cross_doc_boilerplate_lines(spark):
    from gcs_parquet_dataflow_spark.operators.corpus import dedup_segments
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )

    banner = "accept all cookies"
    df = spark.createDataFrame(
        [
            (1, f"{banner}\nunique one\nshared footer"),
            (2, f"{banner}\nunique two\nshared footer"),
            (3, "only original material\nnothing repeated"),
            (4, f"{banner}"),  # pure boilerplate → vanishes
            (5, None),  # NULL text → vanishes
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_segments(
            df, "doc_id", "text", max_doc_freq=1, sep="\n"
        ).collect()
    }
    release_intermediates()
    assert set(out) == {1, 2, 3}
    # line order preserved, duplicated lines gone, separator restored
    assert out[1]["clean_text"] == "unique one"
    assert out[2]["clean_text"] == "unique two"
    assert out[3]["clean_text"] == "only original material\nnothing repeated"
    assert (out[1]["n_kept_segments"], out[1]["n_total_segments"]) == (1, 3)
    assert (out[3]["n_kept_segments"], out[3]["n_total_segments"]) == (2, 2)


def test_dedup_segments_token_windows_respect_max_doc_freq(spark):
    from gcs_parquet_dataflow_spark.operators.corpus import dedup_segments
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )

    common = "a b c"  # one 3-token segment shared by all three docs
    df = spark.createDataFrame(
        [(1, f"{common} x y z"), (2, f"{common} p q r"), (3, f"{common} k l m")],
        "doc_id long, text string",
    )
    # freq 3 > max_doc_freq 2 → shared window dropped everywhere
    out = {
        r["doc_id"]: r["clean_text"]
        for r in dedup_segments(
            df, "doc_id", "text", max_doc_freq=2, tokens_per_segment=3
        ).collect()
    }
    assert out == {1: "x y z", 2: "p q r", 3: "k l m"}
    # freq 3 ≤ max_doc_freq 3 → everything survives
    out3 = {
        r["doc_id"]: r["clean_text"]
        for r in dedup_segments(
            df, "doc_id", "text", max_doc_freq=3, tokens_per_segment=3
        ).collect()
    }
    release_intermediates()
    assert out3[1] == f"{common} x y z"


def test_no_python_udf_in_corpus_hygiene_plans(spark):
    """Line dedup and entropy must stay JVM-side: no BatchEvalPython/
    ArrowEvalPython anywhere in their physical plans."""
    from gcs_parquet_dataflow_spark.operators.corpus import dedup_segments
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )

    df = spark.createDataFrame(
        [(1, "a b\nc d"), (2, "a b\ne f")], "doc_id long, text string"
    )
    out = dedup_segments(df, "doc_id", "text", sep="\n")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    release_intermediates()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_canonicalize_url_known_forms(spark):
    from gcs_parquet_dataflow_spark.functions.text import canonicalize_url

    cases = [
        # tracking params stripped, host lowercased, www./slash dropped
        ("HTTPS://WWW.Example.COM/Path/?utm_source=x&utm_campaign=y",
         "https://example.com/Path"),
        # non-tracking params survive, dangling '&' cleaned
        ("http://Example.com/p?id=3&utm_medium=email&gclid=g1",
         "http://example.com/p?id=3"),
        # fragment dropped; path case preserved
        ("https://A.com/Path/Sub#section-2", "https://a.com/Path/Sub"),
        # plain URL already canonical except trailing slash
        ("https://a.com/", "https://a.com"),
        # tracking param in the middle of others
        ("https://a.com/p?a=1&fbclid=zz&b=2", "https://a.com/p?a=1&b=2"),
        # no scheme/host match → string passes through the chain intact
        ("not a url", "not a url"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [want for _, want in cases]


def test_bpe_train_learns_known_merges_and_encode_roundtrips(spark):
    """BPE on the classic Sennrich-style corpus: frequent pairs merge
    first and in a deterministic order; encoding with the learned
    merges segments words losslessly (concat of tokens == word) and
    reuses multi-char merges ('lower' → 'low' + 'er' once l+o, lo+w,
    e+r are learned)."""
    from gcs_parquet_dataflow_spark.operators.corpus import (
        bpe_encode,
        bpe_train,
    )

    corpus = spark.createDataFrame(
        [
            ("low low low low low",),
            ("lower lower",),
            ("newest newest newest newest newest newest",),
            ("wider wider wider",),
        ],
        "text string",
    )
    merges = bpe_train(corpus, "text", n_merges=10, min_freq=2)
    assert len(merges) >= 5
    pairs = [(l_, r_) for l_, r_, _ in merges]
    # weighted pair counts: (w,e) = newest×6 + lower×2 = 8 wins round 1;
    # (l,o) = low×5 + lower×2 = 7 next
    assert pairs[0] == ("w", "e") and pairs[1] == ("l", "o")
    freqs = [f for _, _, f in merges]
    assert freqs[0] == 8 and freqs[1] == 7
    # determinism: retraining gives the identical merge list
    assert merges == bpe_train(corpus, "text", n_merges=10, min_freq=2)

    enc = bpe_encode(corpus, "text", merges)
    rows = {r["text"]: r["bpe_tokens"] for r in enc.collect()}
    # lossless segmentation for every word of every doc
    for text, toks in rows.items():
        rebuilt, queue = [], list(toks)
        for w in text.split():
            acc = ""
            while acc != w:
                acc += queue.pop(0)
            rebuilt.append(acc)
        assert rebuilt == text.split()
    # the hot word became a single token
    assert "low" in rows["low low low low low"]


def test_unigram_train_encode_lossless_and_planted(spark):
    """Unigram-LM trainer (VERDICT r5 item 3): hard-EM concentrates
    mass on genuinely frequent multi-char pieces; the encoder uses the
    SAME integer scoring, round-trips losslessly (including words with
    out-of-vocab characters), and training is deterministic across
    input partitionings."""
    from gcs_parquet_dataflow_spark.operators.corpus import (
        unigram_encode,
        unigram_train,
    )

    docs = spark.createDataFrame(
        [
            (1, "abab abab cd cd abab"),
            (2, "abab cdcd qqq"),
            (3, "ab cd ab abab"),
        ],
        "doc_id long, text string",
    )
    trained = unigram_train(docs, "text", n_iters=2, min_count=2)
    by_piece = {p: (c, ppb) for p, c, ppb in trained}
    # planted: 'abab' and 'cd' dominate the final vocabulary
    assert by_piece["abab"][0] >= 5
    assert by_piece["cd"][0] >= 5
    # probabilities are exact integer ppb summing to ≤ 1e9
    assert sum(ppb for _, _, ppb in trained) <= 1_000_000_000
    # determinism: training on a repartitioned input is identical
    assert unigram_train(docs.repartition(7), "text", n_iters=2,
                         min_count=2) == trained

    enc = unigram_encode(docs, "text", trained)
    for r in enc.select("text", "unigram_tokens").collect():
        assert "".join(r["unigram_tokens"]) == r["text"].replace(" ", "")
    toks = {
        r["doc_id"]: r["unigram_tokens"]
        for r in enc.select("doc_id", "unigram_tokens").collect()
    }
    assert toks[1] == ["abab", "abab", "cd", "cd", "abab"]
    # 'qq' seeds with count 2 (two overlapping occurrences in 'qqq'),
    # so the word splits q+qq under the longest-LAST-piece tie-break
    assert toks[2][-2:] == ["q", "qq"]

    # vocab_size pruning: singles always survive; multi-char slots go
    # to the highest-expected-count pieces; encoding stays lossless
    pruned = unigram_train(
        docs, "text", n_iters=2, min_count=2, vocab_size=7
    )
    singles = {p for p, _, _ in pruned if len(p) == 1}
    multis = [p for p, _, _ in pruned if len(p) > 1]
    assert len(pruned) <= 7 and len(multis) <= 7 - len(singles)
    assert "abab" in multis or "cd" in multis  # the dominant pieces win
    enc2 = unigram_encode(docs, "text", pruned)
    for r in enc2.select("text", "unigram_tokens").collect():
        assert "".join(r["unigram_tokens"]) == r["text"].replace(" ", "")


def test_unigram_em_counts_match_manual_viterbi(spark):
    """The in-engine unrolled DP equals a hand-computed Viterbi on a
    fixture where the segmentation is non-trivial: with 'ab', 'ba' and
    singles in vocab, 'aba' must split as ab+a (longest-piece
    tie-break at the END of the backtrace, not greedy-left)."""
    from gcs_parquet_dataflow_spark.operators.corpus import (
        unigram_em_counts,
        unigram_seed_vocab,
        unigram_word_types,
    )

    # 'aba' ×4 → seed pieces include a(8+..), b, ab(4), ba(4), aba(4)
    docs = spark.createDataFrame(
        [(1, "aba aba aba aba")], "doc_id long, text string"
    )
    words = unigram_word_types(docs, "text")
    vocab = unigram_seed_vocab(words, min_count=4)
    cnts = {
        r["piece"]: r["expected_count"]
        for r in unigram_em_counts(words, vocab).collect()
    }
    # 'aba' itself is in vocab (count 4 ≥ min) → one piece per word
    assert cnts == {"aba": 4}
    # drop 'aba' from the vocab: 3-char piece excluded → must use
    # 2+1; both ab+a and a+ba have equal integer scores, and the
    # backtrace's longest-LAST-piece preference picks a+ba
    from pyspark.sql import functions as F

    vocab2 = vocab.filter(F.length("piece") <= 2)
    cnts2 = {
        r["piece"]: r["expected_count"]
        for r in unigram_em_counts(words, vocab2).collect()
    }
    assert cnts2 == {"a": 4, "ba": 4}
