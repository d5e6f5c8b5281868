"""Corpus-level training-data operators: token-window chunking,
vocabulary building, and deterministic corpus shuffling (BASELINE.json
extension surface — the operations a pretraining data pipeline runs
between cleaning and writing shards).

Scale design:

- **Chunking** is a per-row explode: no shuffle, runs in the scan stage.
  Output rows carry (doc_id, chunk_idx) so downstream dedup/splitting
  can key on either the document or the chunk.
- **Vocabulary** is one explode + hash aggregation with map-side combine
  — the shuffle carries one row per distinct term per partition. The
  top-k is a single-partition sort of the (already tiny) qualifying
  terms, standard for vocab sizes (≤ millions).
- **Deterministic shuffle** orders by a content hash — the property a
  training pipeline needs is *reproducible* global order, independent
  of input partitioning; sorting by ``hash32(key)`` gives exactly that
  (and is how you shard: ``hash % n_shards``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.functions.text import hash32, tokens


def chunk_by_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into token windows of ``chunk_size`` with
    ``overlap`` tokens shared between consecutive chunks (the training-
    window chunker). → (id_col, chunk_idx, chunk_text, n_tokens).

    Chunk i covers tokens [i*step, i*step + chunk_size) with
    step = chunk_size - overlap; the last chunk may be shorter. Pure
    Column expressions (sequence → transform → posexplode): per-row
    work, zero shuffle, codegen'd — at 100 TB this runs inside the
    scan stage of whatever pass reads the text.

    DuckDB twin (oracle): ``range(0, len(w), step)`` +
    ``array_to_string(w[s+1 : s+chunk_size], ' ')``.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    tok = tokens(F.col(text_col))
    starts = F.sequence(F.lit(0), F.greatest(F.size(tok) - 1, F.lit(0)), F.lit(step))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.slice(tok, s + 1, chunk_size).alias("toks"),
        ),
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_c"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.array_join(F.col("_c.toks"), " ").alias("chunk_text"),
            F.size(F.col("_c.toks")).cast("long").alias("n_tokens"),
        )
    )


def vocabulary(
    df: DataFrame,
    text_col: str,
    min_count: int = 1,
    top_n: int | None = None,
) -> DataFrame:
    """Corpus term frequencies: → (term, term_count[, rank]).

    One explode + groupBy (map-side combine). With ``top_n``, ranks by
    count desc with the term itself as the deterministic tie-break and
    keeps the top ``top_n`` — the vocab-building step of a tokenizer
    pipeline."""
    from pyspark.sql import Window as W

    terms = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_count"))
        .filter(F.col("term_count") >= min_count)
    )
    if top_n is None:
        return terms
    w = W.orderBy(F.desc("term_count"), F.asc("term"))
    return (
        terms.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "shuffle-v1",
    n_shards: int | None = None,
) -> DataFrame:
    """Reproducible corpus shuffle: order depends only on (salt, keys) —
    NOT on partitioning, file layout, or cluster size — so a re-run
    shards identically. Change ``salt`` to re-shuffle.

    With ``n_shards`` (the 100 TB path): → + (shuffle_shard,
    shard_rank) where shard = hash % n_shards and the rank is within
    the shard — every window is partitioned, fully parallel; shard
    files written in shard_rank order ARE the shuffled dataset.
    Without: → + (shuffle_rank), an exact GLOBAL rank — since round 5
    computed by the distributed two-pass rank
    (:func:`~gcs_parquet_dataflow_spark.operators.partitioning.global_row_number`:
    range partition, partition-local windows, broadcast offsets), not a
    single-partition window sort; ranks are identical (the (hash, key)
    order is total), so outputs are unchanged."""
    from pyspark.sql import Window as W

    # collision-safe temp hash column (ADVICE r5): a bare "_h" would
    # silently overwrite — then drop — a user column of the same name
    hcol = "__ds_h"
    if hcol in df.columns:
        raise ValueError(
            f"deterministic_shuffle: input already has a {hcol!r} column"
        )
    h = hash32(F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string")))
    if n_shards is not None:
        w = W.partitionBy("shuffle_shard").orderBy(hcol, key_col)
        return (
            df.withColumn(hcol, h)
            .withColumn("shuffle_shard", F.col(hcol) % n_shards)
            .withColumn("shard_rank", F.row_number().over(w).cast("long"))
            .drop(hcol)
        )
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        global_row_number,
    )

    return global_row_number(
        df.withColumn(hcol, h), [hcol, key_col], out="shuffle_rank"
    ).drop(hcol)


def repetition_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition quality signals per document →
    (id_col, top_word_frac, dup_word_frac, top_bigram_frac,
    dup_bigram_frac), doubles rounded to 6; bigram columns are NULL for
    single-token documents.

    Heavily repeated content (boilerplate, keyword stuffing, generated
    spam) is the classic pretraining-filter target (Gopher / MassiveText
    rules): fraction of tokens that are the single most common word,
    fraction of duplicate word occurrences (1 - distinct/total), and the
    same two over bigrams.

    Scale shape: ONE posexplode pass; bigrams come from a window lead
    partitioned by document (same pattern as dedup.with_minhash); words
    and bigrams then flow through a single tagged two-level hash
    aggregation (map-side combined), so the whole operator is
    explode → window → groupBy with no self-join and no second pass
    over the text. At 100 TB the shuffle carries one row per distinct
    (doc, gram) — bounded by document length, not corpus size.

    DuckDB twin: unnest words / ``[w[i] || ' ' || w[i+1] for i in
    range(1, len(w))]`` bigrams, same tagged aggregation.
    """
    from pyspark.sql import Window as W

    from gcs_parquet_dataflow_spark.operators.partitioning import (
        ensure_parallelism,
    )

    # single-file inputs would otherwise explode in ONE scan partition;
    # keying by id pre-aligns with the window/groupBy partitioning
    df = ensure_parallelism(df, id_col)
    tok = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("_pos", "_t")
    )
    w = W.partitionBy(id_col).orderBy("_pos")
    # lead materialized BEFORE the explode — Spark rejects window
    # expressions inside generator arguments
    nxt = F.col("_nxt")
    bigram = F.when(nxt.isNotNull(), F.concat_ws(" ", F.col("_t"), nxt))
    grams = (
        tok.withColumn("_nxt", F.lead("_t").over(w))
        .select(
            F.col(id_col),
            F.explode(
                F.array(
                    F.struct(F.lit(1).alias("k"), F.col("_t").alias("g")),
                    F.struct(F.lit(2).alias("k"), bigram.alias("g")),
                )
            ).alias("kg"),
        )
        .select(id_col, F.col("kg.k").alias("k"), F.col("kg.g").alias("g"))
        .filter(F.col("g").isNotNull())
    )
    per_gram = grams.groupBy(id_col, "k", "g").agg(F.count("*").alias("c"))
    per_kind = per_gram.groupBy(id_col, "k").agg(
        F.sum("c").alias("n"), F.max("c").alias("top"), F.count("*").alias("d")
    )
    frac_top = F.col("top").cast("double") / F.col("n")
    frac_dup = F.lit(1.0) - F.col("d").cast("double") / F.col("n")
    return per_kind.groupBy(id_col).agg(
        F.round(F.max(F.when(F.col("k") == 1, frac_top)), 6).alias("top_word_frac"),
        F.round(F.max(F.when(F.col("k") == 1, frac_dup)), 6).alias("dup_word_frac"),
        F.round(F.max(F.when(F.col("k") == 2, frac_top)), 6).alias("top_bigram_frac"),
        F.round(F.max(F.when(F.col("k") == 2, frac_dup)), 6).alias("dup_bigram_frac"),
    )


def pack_greedy_by_budget(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 256,
    n_buckets: int = 8,
) -> DataFrame:
    """Deterministic sequence packing: assign each document to a pack of
    ~``budget`` whitespace tokens → (id_col, n_tokens, pack_id).

    Semantics (the streaming-greedy rule, made order-deterministic):
    documents are laid out in ``hash32(text)`` order inside
    ``hash % n_buckets`` buckets; a document joins the pack where its
    first token lands — ``floor(running_total_before / budget)`` — so a
    pack may overrun by at most one document (exactly what sequence
    packers for fixed-context training do before truncation).

    Scale shape: the only non-map step is a window cumsum PARTITIONED BY
    bucket — raise ``n_buckets`` so each bucket's sort fits an executor
    (1000-executor rule of thumb: n_buckets ≈ 2-4× total cores). Pack
    ids are bucket-prefixed (bucket * 1e6 + slot) so buckets never
    collide and packs can be written bucket-parallel. No global sort, no
    driver state, reproducible across cluster sizes.
    """
    from pyspark.sql import Window as W

    s = df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
        hash32(F.col(text_col)).alias("_h"),
    ).withColumn("_bucket", F.col("_h") % n_buckets)
    w = (
        W.partitionBy("_bucket")
        .orderBy("_h", id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return s.select(
        id_col,
        "n_tokens",
        (
            F.col("_bucket") * 1000000
            + F.floor(before.cast("double") / budget).cast("long")
        ).alias("pack_id"),
    )


def dedup_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_doc_freq: int = 1,
    sep: str | None = None,
    tokens_per_segment: int = 10,
) -> DataFrame:
    """Line/segment-level corpus dedup (the CCNet / RefinedWeb rule):
    drop every segment whose content appears in more than
    ``max_doc_freq`` distinct documents, then rebuild each document from
    its surviving segments in original order →
    (id_col, clean_text, n_kept_segments, n_total_segments).

    Boilerplate — nav bars, cookie banners, license headers — repeats
    across pages; removing *segments* (not whole documents) is the
    standard pretraining cleanup between exact dedup and near dedup.
    Documents whose every segment is boilerplate drop out entirely.

    ``sep`` splits on a delimiter (``"\\n"`` for real web text); when
    ``sep`` is None, segments are non-overlapping ``tokens_per_segment``
    windows (the fixture's text has no newlines — the paragraph-chunker
    stand-in; reference main.py has no analog, this is extension
    surface).

    Scale shape: explode is map-side; duplicate detection is ONE hash
    aggregation on the 8-byte segment hash (map-side combined — shuffle
    carries distinct hashes, not occurrences); the resulting ban list is
    the *duplicated* minority (boilerplate is a tiny fraction of
    distinct segments), so the left-anti join broadcasts under AQE at
    any corpus size where boilerplate fits in memory — else it is a
    plain hash-partitioned anti join on the same 8-byte key. Rebuild is
    one groupBy(doc) with an array_sort on (seg_idx, text) structs.
    No self-join, nothing quadratic anywhere.
    """
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        ensure_parallelism,
        persist_intermediate,
    )

    if sep is not None:
        seg = (
            df.filter(F.col(text_col).isNotNull())
            .select(
                F.col(id_col),
                F.posexplode(F.split(F.col(text_col), sep)).alias(
                    "seg_idx", "seg_text"
                ),
            )
            .withColumn("seg_idx", F.col("seg_idx").cast("long"))
        )
        join_sep = sep
    else:
        seg = chunk_by_tokens(
            df, id_col, text_col, tokens_per_segment, overlap=0
        ).select(
            F.col(id_col),
            F.col("chunk_idx").alias("seg_idx"),
            F.col("chunk_text").alias("seg_text"),
        )
        join_sep = " "
    seg = ensure_parallelism(
        seg.filter(F.col("seg_text") != "").withColumn(
            "_seg_h", hash32(F.col("seg_text"))
        ),
        id_col,
    )
    # seg feeds three consumers (ban list, totals, rebuild): persist once
    seg = persist_intermediate(seg)
    banned = (
        seg.groupBy("_seg_h")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") > max_doc_freq)
        .select("_seg_h")
    )
    totals = seg.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_total_segments")
    )
    rebuilt = (
        seg.join(banned, "_seg_h", "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg_idx", "seg_text"))
                    ),
                    lambda s: s.seg_text,
                ),
                join_sep,
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("long").alias("n_kept_segments"),
        )
    )
    return rebuilt.join(totals, id_col).select(
        id_col, "clean_text", "n_kept_segments", "n_total_segments"
    )


# ---------------------------------------------------------------------------
# Byte-pair-encoding tokenizer training (Sennrich et al. 2016): the
# subword-vocabulary learner of the GPT/Llama tokenizer family,
# expressed over the DISTINCT-WORD table (classic BPE operates on word
# types weighted by frequency, so every iteration costs vocabulary-
# sized work regardless of corpus size — the property that makes BPE
# trainable at 100 TB: one corpus-sized pass builds the word counts,
# everything after runs on the tiny type table).
# ---------------------------------------------------------------------------


def word_type_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, word_count) over the corpus — the one corpus-sized pass
    of BPE training (one explode + map-side-combined count)."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("word_count"))
    )


def _merge_pair_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def apply_merge(syms, a, b):
        out = []
        for s, x, y in zip(syms, a, b):
            merged, i, n = [], 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == x and s[i + 1] == y:
                    merged.append(x + y)
                    i += 2
                else:
                    merged.append(s[i])
                    i += 1
            out.append(merged)
        return pd.Series(out)

    # real annotation objects (PEP-563 string hints can't resolve the
    # function-local pandas import during pandas_udf type inference)
    apply_merge.__annotations__ = {
        "syms": pd.Series, "a": pd.Series, "b": pd.Series,
        "return": pd.Series,
    }
    return pandas_udf(apply_merge, returnType="array<string>")


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 20,
    min_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges → [(left, right, pair_freq)…].

    Each round: adjacent-symbol pair frequencies over the word-type
    table (weighted by word_count; JVM-side transform+explode), argmax
    with (freq desc, left, right) as the total deterministic order, then
    one Arrow-batched pandas_udf pass applies the winning merge
    left-to-right (the per-word scan is inherently sequential — the
    documented custom-operator slow path, run on the type table only).
    Symbol arrays are eagerly localCheckpoint-ed per round so lineage
    (and the UDF chain) never re-executes.

    The first-round pair table is oracle-checked as
    ``bpe_pair_frequencies``; the iterative trainer is pytest-verified
    on a corpus with known merges (tests/test_corpus.py).
    """
    words = word_type_table(df, text_col)
    syms = words.select(
        "word",
        "word_count",
        F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))").alias(
            "sym"
        ),
    ).localCheckpoint(eager=True)
    merge_udf = _merge_pair_udf()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            syms.filter(F.size("sym") >= 2)
            .select(
                "word_count",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(sym)-2),"
                        " j -> struct(sym[j] AS l, sym[j+1] AS r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("word_count").cast("long").alias("freq"))
        )
        top = (
            pairs.orderBy(F.desc("freq"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < min_freq:
            break
        l_, r_, freq = top[0]["l"], top[0]["r"], int(top[0]["freq"])
        merges.append((l_, r_, freq))
        syms = syms.withColumn(
            "sym", merge_udf(F.col("sym"), F.lit(l_), F.lit(r_))
        ).localCheckpoint(eager=True)
    return merges


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word, the
    standard rank-greedy BPE apply (always merge the LOWEST-rank pair
    present — exactly how GPT-2-family tokenizers consume their merges
    file), as one Arrow-batched pandas_udf pass over the corpus.
    Deterministic for a fixed merge list; concatenating the output
    tokens of a word restores the word (lossless segmentation,
    asserted in tests)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {(l_, r_): i for i, (l_, r_, *_) in enumerate(merges)}

    def encode_word(w: str) -> list[str]:
        s = list(w)
        while len(s) >= 2:
            best, bi = None, -1
            for i in range(len(s) - 1):
                rk = ranks.get((s[i], s[i + 1]))
                if rk is not None and (best is None or rk < best):
                    best, bi = rk, i
            if best is None:
                break
            s[bi : bi + 2] = [s[bi] + s[bi + 1]]
        return s

    def _encode(word_arrays):
        out = []
        for words in word_arrays:
            toks: list[str] = []
            for w in words if words is not None else []:
                toks.extend(encode_word(w))
            out.append(toks)
        return pd.Series(out)

    _encode.__annotations__ = {"word_arrays": pd.Series, "return": pd.Series}
    encode = pandas_udf(_encode, returnType="array<string>")
    return df.withColumn(out_col, encode(tokens(F.col(text_col))))
