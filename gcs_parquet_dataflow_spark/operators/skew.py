"""Skew-mitigation operators for 100 TB-scale aggregation.

Spark's map-side partial aggregation already absorbs hot GROUP BY keys
for decomposable aggregates (sum/count/min/max), and AQE splits skewed
JOIN partitions — those cases need no hand-tuning (SCALE.md). The gap
is **count-distinct under a hot key**: the distinct set for one key must
meet in one reducer, and a key with 10^9 distinct values OOMs it.

``salted_count_distinct`` is the standard two-phase fix: shard each
key's value space by a hash bucket (the "salt" derives from the VALUE,
so the same value always lands in the same shard — correctness does not
depend on the salt), count distinct per (key, bucket) shard, then sum
the per-shard counts. Both stages have map-side partials; per-reducer
state shrinks by the bucket factor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    buckets: int = 32,
    out: str = "n_distinct",
) -> DataFrame:
    """Exact count-distinct of ``value`` per ``keys`` via value-hash
    sharding. Equivalent to ``groupBy(keys).agg(countDistinct(value))``
    with per-reducer distinct state divided by ``buckets``."""
    v = F.col(value) if isinstance(value, str) else value
    shard = F.pmod(F.xxhash64(v), F.lit(buckets)).alias("_shard")
    per_shard = (
        df.select(*keys, v.alias("_v"), shard)
        .groupBy(*keys, "_shard")
        .agg(F.count_distinct("_v").alias("_n"))
    )
    return per_shard.groupBy(*keys).agg(F.sum("_n").cast("long").alias(out))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi-join: spread each big-side row across ``n_salts``
    sub-keys and replicate the small side once per salt, so one hot key
    becomes ``n_salts`` reducer partitions instead of one straggler.

    Use when AQE's skew-join split can't help: a single key so hot that
    even split partitions straggle, with a small side that fits
    replicated ``n_salts``× but NOT broadcast whole (else just
    broadcast). The big-side salt is derived from a row id — it spreads
    rows, it does not affect correctness (every big row joins exactly
    the one replica carrying its salt). Supports inner/left joins."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side must not duplicate)")
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    bs = big.withColumn("_salt", salt)
    ss = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return bs.join(ss, [key, "_salt"], how).drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase sum-style aggregation with an explicit random-ish salt
    (derived from a stable row expression is not required for sums —
    any spread works since + is commutative). Only needed when a single
    group's PARTIAL row count per reducer is itself the bottleneck
    (rare; map-side combine usually suffices) — provided for parity with
    the reference's AddRandomKey fan-out (main.py:296-303), which
    existed to spread its sink, not an aggregate."""
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, expr in sums.items()])
    )
    return stage1.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in sums.keys()]
    )
