"""Lexical retrieval: BM25 scoring of documents against a term set.

The corpus-side half of classic search — given query terms, score every
document by Okapi BM25 (the default lexical baseline next to the
embedding kNN in operators/similarity.py; production retrieval stacks
run both and fuse).

Scale shape: ONE explode+groupBy shuffle builds the per-document
statistics (doc length + one conditional count per query term — the
terms are a tiny constant set, so this is a handful of codegen'd
aggregates, not a per-term job). Corpus-level stats (N, avgdl, per-term
document frequency) are a second aggregate over that per-doc table —
one row, broadcast back with a cross join. The score itself is a pure
Column expression with a FIXED addition order over terms, so results
are bit-stable across engines and partitionings (module convention:
doubles rounded to 6).

No reference analog (the reference computes no text statistics —
SURVEY §2); extension surface for corpus curation / search-quality
work over the documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.functions.text import tokens
from gcs_parquet_dataflow_spark.operators.partitioning import (
    persist_intermediate,
)

K1 = 1.2
B = 0.75


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    round_to: int = 6,
) -> DataFrame:
    """→ (id_col, bm25) for every document matching ≥1 query term.

    idf uses the Lucene/ATIRE form ln((N - df + 0.5)/(df + 0.5) + 1),
    which is non-negative even for terms in >half the corpus.
    """
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.col(text_col))).alias("_tk"),
    )
    aggs = [F.count(F.lit(1)).cast("double").alias("_dl")]
    for i, term in enumerate(terms):
        aggs.append(
            F.sum(F.when(F.col("_tk") == term, 1).otherwise(0))
            .cast("double")
            .alias(f"_tf_{i}")
        )
    per_doc = persist_intermediate(tok.groupBy("_id").agg(*aggs))

    stat_aggs = [
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    ]
    for i in range(len(terms)):
        stat_aggs.append(
            F.sum(F.when(F.col(f"_tf_{i}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"_df_{i}")
        )
    stats = per_doc.agg(*stat_aggs)

    scored = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        idf = F.log(
            (F.col("_n") - F.col(f"_df_{i}") + 0.5)
            / (F.col(f"_df_{i}") + 0.5)
            + 1.0
        )
        part = (
            idf
            * (F.col(f"_tf_{i}") * (K1 + 1.0))
            / (
                F.col(f"_tf_{i}")
                + K1 * (1.0 - B + B * F.col("_dl") / F.col("_avgdl"))
            )
        )
        score = part if score is None else score + part
    matched = sum(
        (F.col(f"_tf_{i}") for i in range(len(terms))), F.lit(0.0)
    )
    return (
        scored.filter(matched > 0)
        .select(
            F.col("_id").alias(id_col),
            F.round(score, round_to).alias("bm25"),
        )
    )


def ranked_topk(
    df: DataFrame, score_col: str, id_col: str, k: int
) -> DataFrame:
    """Top-``k`` rows by (``score_col`` desc, ``id_col`` asc) with a
    1-based ``rank`` column.

    Scale shape: the global top-k itself is distributed (Spark plans
    orderBy+limit as TakeOrderedAndProject — per-partition top-k then a
    k-row merge, never a full sort); the row_number window then runs
    over the ≤k surviving rows only, so the single-partition window is
    bounded by k, not by the corpus. Ties break by id, making the rank
    assignment engine-deterministic (score must already be rounded to
    the module's 6-digit grain).
    """
    from pyspark.sql import Window

    top = df.orderBy(F.col(score_col).desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    id_col: str,
    k: float = 60.0,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of named rankings (each: id_col + rank).

    RRF(d) = Σ_r 1/(k + rank_r(d)) — the standard score-free way to
    combine lexical (BM25) and vector (kNN) retrieval. Items absent
    from a ranking contribute 0. Output: (id_col, rank_<name>…, rrf).

    The inputs are top-k candidate lists (bounded), so the fusion join
    chain is tiny regardless of corpus size; addition order over
    rankings is fixed for engine-stable doubles.
    """
    out: DataFrame | None = None
    names = [name for name, _ in rankings]
    for name, r in rankings:
        ri = r.select(F.col(id_col), F.col("rank").alias(f"rank_{name}"))
        out = ri if out is None else out.join(ri, id_col, "full_outer")
    assert out is not None
    score = None
    for name in names:
        part = F.coalesce(
            F.lit(1.0) / (k + F.col(f"rank_{name}")), F.lit(0.0)
        )
        score = part if score is None else score + part
    return out.select(
        id_col,
        *[F.col(f"rank_{n}") for n in names],
        F.round(score, round_to).alias("rrf"),
    )
