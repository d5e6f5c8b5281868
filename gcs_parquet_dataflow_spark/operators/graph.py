"""Distributed graph analytics on edge-list DataFrames.

Triangle counting lives in the query surface (node-ordered edge joins,
queries/extensions.py graph_triangle_participation); this module holds
the iterative algorithms. The engine-design problem with iterative
graph math on floats is that a parallel Σ of doubles is order-dependent
— every partitioning change perturbs the last bits and the drift
compounds per iteration, which breaks replay-determinism AND
differential testing. ``pagerank_quantized`` therefore defines the
iteration in pure int64 arithmetic (micro-unit ranks, integer
division): floor(a/b) and Σ of int64 are exact and associative, so the
result is bit-identical on any cluster layout, any engine — the same
trick the embedding-centroid and OLS-trend queries use, applied to a
fixed-point iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators.partitioning import (
    persist_intermediate,
)


def pagerank_quantized(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    damping_permille: int = 850,
    iterations: int = 5,
    scale: int = 10**9,
) -> DataFrame:
    """PageRank over an UNDIRECTED edge list (each input row (u,v) is
    one edge; both directions are materialized internally), with ranks
    held in integer ``scale``-units → (node, rank_q: long).

    Per iteration, with d the damping in permille and N the number of
    connected nodes:

        out(u)   = r(u) div degree(u)                 (int64 floor)
        r'(v)    = ((1000−d)·(scale div N)) div 1000
                   + (d · Σ_{u∼v} out(u)) div 1000    (all int64)

    This is standard PageRank with every divide floored — the result
    differs from float PageRank by < |V|·iterations scale-units (a
    relative error ~1e-6 at the default scale), in exchange for exact
    determinism (see module docstring).

    Scale shape: each iteration is one key-shuffled join of the edge
    list with the |V|-sized rank table plus one hash aggregation —
    O(diameter-independent) fixed cost per iteration, the Pregel
    pattern connected_components already uses, with intermediates
    persisted so lineage stays flat.
    """
    if not 0 < damping_permille < 1000:
        raise ValueError("damping_permille must be in (0, 1000)")
    und = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).unionAll(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
    und = persist_intermediate(und)
    deg = (
        und.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .select(F.col("src").alias("node"), "degree")
    )
    deg = persist_intermediate(deg)
    n = deg.count()
    if n == 0:
        return deg.select("node", F.lit(0).cast("long").alias("rank_q"))
    r_init = scale // n
    base = ((1000 - damping_permille) * r_init) // 1000
    r = deg.select("node", F.lit(r_init).cast("long").alias("r"))
    for _ in range(iterations):
        # rank/degree tables are |V|-sized — broadcast them so the edge
        # list (the big side) never shuffles; each round is map-only
        # over edges plus one dst-keyed aggregation
        out = r.join(F.broadcast(deg), "node").select(
            "node", F.expr("r div degree").alias("o")
        )
        s = (
            und.join(F.broadcast(out), und["src"] == out["node"])
            .groupBy("dst")
            .agg(F.sum("o").cast("long").alias("s"))
            .withColumnRenamed("dst", "node")
        )
        r = (
            deg.select("node")
            .join(F.broadcast(s), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_permille} * coalesce(s, CAST(0 AS LONG)))"
                        " div 1000"
                    )
                ).cast("long").alias("r"),
            )
        )
        r = persist_intermediate(r)
    return r.select("node", F.col("r").alias("rank_q"))
