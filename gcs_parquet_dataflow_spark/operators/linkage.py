"""Blocked fuzzy record linkage (edit-distance matching).

The classic entity-resolution problem: find records whose *names* are
nearly identical ("Acme Corp." / "Acme Corp") without comparing every
pair. All-pairs levenshtein is O(n²·len²) — never viable. The standard
answer, and the one used here, is **blocking**: an equi-join on a cheap
deterministic key (first token, soundex, sorted-token prefix …) so only
same-block pairs ever materialize, then the exact edit-distance filter
runs inside blocks only.

Scale shape at 100 TB: dedupe to distinct names first (hash aggregate
with map-side combine — names are usually far fewer than rows), then
the block equi-join shuffles each name once by block key. Cost is
Σ|block|², controlled by block-key selectivity — the same bound as the
MinHash-LSH band join in operators/dedup.py. `levenshtein` is a JVM
codegen'd builtin (no Python in the loop).

No reference analog (the reference links nothing — SURVEY §2); this is
extension surface for corpus curation (merging near-identical source /
author / domain names before mixture weighting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators.partitioning import (
    persist_intermediate,
)


def first_token_block(col: Column) -> Column:
    """Cheapest useful blocking key: the first whitespace token."""
    return F.split_part(col, F.lit(" "), F.lit(1))


def fuzzy_pairs_blocked(
    df: DataFrame,
    key_col: str,
    text_col: str,
    block: Column,
    max_dist: int,
    dedupe_names: bool = True,
) -> DataFrame:
    """Pairs of records whose ``text_col`` values are within
    ``max_dist`` edits, compared only inside equal-``block`` groups.

    With ``dedupe_names`` (default), identical strings collapse to one
    representative (min key) before pairing — exact duplicates are a
    solved problem (operators/dedup.py) and would otherwise quadratically
    inflate blocks. Output: (key_a, key_b, text_a, text_b, dist) with
    key_a < key_b.
    """
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(text_col).alias("_t"),
        block.alias("_blk"),
    )
    if dedupe_names:
        base = base.groupBy("_t", "_blk").agg(F.min("_k").alias("_k"))
    names = persist_intermediate(base)
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._k") < F.col("b._k")),
        )
        .filter(F.levenshtein(F.col("a._t"), F.col("b._t")) <= max_dist)
        .select(
            F.col("a._k").alias("key_a"),
            F.col("b._k").alias("key_b"),
            F.col("a._t").alias("text_a"),
            F.col("b._t").alias("text_b"),
            F.levenshtein(F.col("a._t"), F.col("b._t")).alias("dist"),
        )
    )


def refine_pairs_difflib(
    pairs: DataFrame,
    left_text: str = "text_a",
    right_text: str = "text_b",
    min_ratio: float = 0.9,
) -> DataFrame:
    """Exact-verify CANDIDATE pairs with difflib's Ratcliff/Obershelp
    similarity (Arrow-batched ``mapInPandas``): the two-stage near-dup
    contract — cheap sketch joins (LSH bands / blocked fuzzy keys)
    produce a candidate set orders of magnitude smaller than n², then
    the expensive Python comparator runs ONLY on that bounded set.
    Adds ``ratio`` (rounded to 6) and keeps pairs ≥ ``min_ratio``.

    Python-per-PAIR is the documented slow path, priced correctly
    here: cost scales with |candidates|, never with |corpus|²; difflib
    is deterministic so re-runs and retries are stable. Swap in any
    Python comparator (jellyfish, rapidfuzz wheels on a real cluster)
    behind the same contract."""
    import pandas as pd

    cols = pairs.columns
    schema = ", ".join(
        f"{c} {dict(pairs.dtypes)[c]}" for c in cols
    ) + ", ratio double"

    def score(batches):
        from difflib import SequenceMatcher

        for pdf in batches:
            ratios = [
                round(
                    SequenceMatcher(
                        None, a if a is not None else "",
                        b if b is not None else ""
                    ).ratio(),
                    6,
                )
                for a, b in zip(pdf[left_text], pdf[right_text])
            ]
            out = pdf.copy()
            out["ratio"] = pd.Series(ratios, index=pdf.index, dtype="float64")
            yield out[out["ratio"] >= min_ratio]

    return pairs.mapInPandas(score, schema=schema)
