"""Scale-amplification smoke: run representative operators on 10×
(or N×) amplified copies of the fixtures — the direct local evidence
for the would-it-survive-100× question, one decade further than
scaling_probe's sf0.001→0.1 span.

Amplification preserves the workload's shape: keys are offset per copy
(so cardinalities scale with volume — joins, distincts, and near-dup
structures grow realistically) and text gets a per-copy suffix token
(so amplified documents are near-dups OF each other across copies, not
byte-identical — the LSH pair volume scales the way a real crawl's
would).

Usage: python tools/scale_smoke.py [factor]     (default 10)
Writes amplified parquet under /tmp/sgpd_scale_smoke_<factor>x/ once
(reused if present) and prints one JSON line of wall times.

MAGNITUDE probe (round-9 accumulator-overflow audit):
    python tools/scale_smoke.py --magnitude
amplifies VALUES instead of rows (two tiers: events ×1e5 for the
rows with value-scaled rounded outputs, events ×1e10 + lineitem ×1e5
for the rest) so the audited sum-of-products
accumulators (Σ cents·(100−dc)·(100+tx), Σ vc², Σ x·y, Σ yc·dur, the
windowed rev², the AQP y²) land PAST 2^63, verifies via DuckDB int128
that they really are past it (a green run in the non-overflow regime
would prove nothing), then runs the full differential gate
(tools/oracle_check.py) on every converted row: DuckDB sums exactly in
HUGEINT, Spark in DECIMAL(38,0) — the pre-audit int64 accumulators
wrap here and fail the hash.  This is the amplified twin of the two
scale-divergence bugs found to date (recursive-CTE row limit, AQP y²
wrap at sf≈4): overflow states invisible at oracle scales, made
visible locally.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def amplify(spark, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    copies = spark.range(factor).select(F.col("id").alias("_c"))

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (
        li.crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("_c") * 10_000_000).alias(
                "l_orderkey"
            ),
            (F.col("l_partkey") + F.col("_c") * 1_000_000).alias("l_partkey"),
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/lineitem.parquet")
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("_c") * 10_000_000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" copytag"), F.col("_c").cast("string")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("_c") * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("_c") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/events.parquet")
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("_c") * 10_000_000).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/embeddings.parquet")
    )


MAGNITUDE_BASE = "/root/testdata/sf0.01"
# Two tiers (round-9 lesson): the INT accumulators must cross 2^63,
# but the ROUNDED double outputs must stay below ~1e9 — round(x, 6)
# on doubles past ~2^53/1e6 differs between engines at ULP level
# (Spark rounds via BigDecimal, DuckDB via x·1e6 round-trip), which
# would report display-rounding noise as accumulator failures.  Tier A
# (events ×1e5) drives the rows whose outputs are value-scaled
# (anomaly mean/sd, bollinger bands); tier B (events ×1e10, lineitem
# ×1e5) drives the rows whose outputs are ratios/raw-hash-stable.
MAGNITUDE_DIR_A = "/tmp/sgpd_magnitude_probe_a"
MAGNITUDE_DIR_B = "/tmp/sgpd_magnitude_probe_b"
MAGNITUDE_QUERIES_A = [
    "anomaly_seasonal_zscore",
    "window_bollinger_flags",
]
MAGNITUDE_QUERIES_B = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "regression_trend_by_type",
    "time_weighted_avg",
    "rolling_corr_revenue_volume",
    "aqp_sample_sum_ci",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _write_magnitude_dir(out_dir, events_amp, lineitem_amp):
    """Single-FILE parquet (oracle_check reads '{sf}/{t}.parquet'
    verbatim); IEEE double products are engine-independent, so both
    engines then read the SAME stored amplified doubles."""
    import duckdb

    if os.path.exists(f"{out_dir}/events.parquet"):
        return
    os.makedirs(out_dir, exist_ok=True)
    amp = duckdb.connect()
    amp.execute(f"""
        COPY (SELECT * REPLACE (value * {events_amp} AS value)
              FROM read_parquet('{MAGNITUDE_BASE}/events.parquet'))
        TO '{out_dir}/events.parquet' (FORMAT PARQUET)""")
    amp.execute(f"""
        COPY (SELECT * REPLACE (l_extendedprice * {lineitem_amp}
                                AS l_extendedprice)
              FROM read_parquet('{MAGNITUDE_BASE}/lineitem.parquet'))
        TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)""")
    for t in TABLES:
        if t in ("events", "lineitem"):
            continue
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{MAGNITUDE_BASE}/{t}.parquet", dst)


def magnitude_probe() -> int:
    """Write the value-amplified dirs, prove the audited accumulators
    are past 2^63 with exact int128 arithmetic, then run the
    differential gate on the converted rows.  Returns an exit code."""
    import subprocess

    import duckdb

    _write_magnitude_dir(MAGNITUDE_DIR_A, "1e5", "1e0")
    _write_magnitude_dir(MAGNITUDE_DIR_B, "1e10", "1e5")

    # Regime proof: the probe is meaningless unless the audited sums
    # really exceed 2^63 here — compute them exactly in int128.
    con = duckdb.connect()
    checks = {
        "q1_max_group_charge": f"""
            SELECT max(s) FROM (
              SELECT sum(CAST(round(l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l_discount*100) AS BIGINT))
                         * (100 + CAST(round(l_tax*100) AS BIGINT))) AS s
              FROM read_parquet('{MAGNITUDE_DIR_B}/lineitem.parquet')
              GROUP BY l_returnflag, l_linestatus)""",
        "anomaly_max_slot_ss": f"""
            SELECT max(s) FROM (
              SELECT sum(CAST(CAST(round(value*100) AS BIGINT) AS HUGEINT)
                         * CAST(round(value*100) AS BIGINT)) AS s
              FROM read_parquet('{MAGNITUDE_DIR_A}/events.parquet')
              WHERE day(ts) <= 15 GROUP BY event_type, hour(ts))""",
        "bollinger_max_daily_sq": f"""
            SELECT max(CAST(vc AS HUGEINT) * vc) FROM (
              SELECT CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                  AS vc
              FROM read_parquet('{MAGNITUDE_DIR_A}/events.parquet')
              GROUP BY event_type, date_trunc('day', ts))""",
        "regression_max_sxy": f"""
            SELECT max(s) FROM (
              SELECT sum((CAST(floor(epoch(ts)/3600) AS BIGINT)
                          - (SELECT CAST(floor(min(epoch(ts))/3600) AS BIGINT)
                             FROM read_parquet(
                                 '{MAGNITUDE_DIR_B}/events.parquet')))
                         * CAST(round(value*100) AS BIGINT)) AS s
              FROM read_parquet('{MAGNITUDE_DIR_B}/events.parquet')
              GROUP BY event_type)""",
        "twa_total_ycdur": f"""
            SELECT sum(CAST(yc AS HUGEINT) * dur) FROM (
              SELECT CAST(round(value*100) AS BIGINT) AS yc,
                     epoch_us(lead(ts) OVER (PARTITION BY event_type
                                             ORDER BY ts, event_id))
                     - epoch_us(ts) AS dur
              FROM read_parquet('{MAGNITUDE_DIR_B}/events.parquet'))
            WHERE dur IS NOT NULL""",
    }
    int64_max = 2**63 - 1
    regime = {}
    for name, sql in checks.items():
        v = int(con.execute(sql).fetchone()[0])
        regime[name] = v
        if v <= int64_max:
            print(json.dumps({
                "magnitude_probe": "REGIME CHECK FAILED",
                "accumulator": name,
                "value": v,
                "int64_max": int64_max,
            }))
            return 1

    oracle = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "oracle_check.py"
    )
    rc = 0
    for d, qs in ((MAGNITUDE_DIR_A, MAGNITUDE_QUERIES_A),
                  (MAGNITUDE_DIR_B, MAGNITUDE_QUERIES_B)):
        proc = subprocess.run([sys.executable, oracle, d, *qs])
        rc = rc or proc.returncode
    print(json.dumps({
        "magnitude_probe": "pass" if rc == 0 else "FAIL",
        "base": MAGNITUDE_BASE,
        "amplification": {
            "tier_a": {"events.value": 1e5},
            "tier_b": {"events.value": 1e10,
                       "lineitem.l_extendedprice": 1e5},
        },
        "past_int64": {k: f"{float(v):.3e}" for k, v in regime.items()},
        "queries": {"tier_a": MAGNITUDE_QUERIES_A,
                    "tier_b": MAGNITUDE_QUERIES_B},
    }))
    return rc


def fold_cost_probe(factor: int = 10) -> int:
    """The generational-fold cost law (round 12, VERDICT r11 item 3):
    a MINOR compact_cosine_index folds only the batches that arrived
    since the last fold, so its cost must be flat as the already-folded
    base grows ``factor``× — while the INITIAL fold (which eats the big
    base batch) scales with the base, approximating what the pre-r12
    whole-index rewrite paid on EVERY run.  Prints one JSON line with
    both times at base and factor× and the minor ratio (expect ~1)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.operators import similarity as SIM
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )
    from gcs_parquet_dataflow_spark.session import get_spark

    spark = get_spark(app_name="fold_cost_probe")
    planes = SIM.hyperplanes(n_planes=6, dim=16, seed=13)

    def vectors(n: int, id_start: int):
        # executor-side synthesis (no driver materialization): a
        # deterministic pseudo-vector per id
        return spark.range(n).select(
            (F.col("id") + id_start).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda j: F.sin(F.col("id") * j + j),
            ).alias("v"),
        )

    out: dict = {"factor": factor}
    base_n = 20_000
    root = tempfile.mkdtemp(prefix="sgpd_fold_cost_")
    try:
        # warm the JVM + codegen once: the first compaction of a session
        # pays whole-stage-codegen compilation that would otherwise land
        # entirely on the BASE measurement and invert the ratio
        wpath = os.path.join(root, "warm")
        SIM.build_cosine_bucket_index(
            vectors(500, 0), wpath, planes=planes,
            id_col="vec_id", vec_col="v", batch_id=0,
        )
        SIM.build_cosine_bucket_index(
            vectors(100, 1_000_000), wpath, planes=planes,
            id_col="vec_id", vec_col="v", batch_id=1,
        )
        SIM.compact_cosine_index(spark, wpath, keep_last=1)
        release_intermediates()
        for scale, tag in ((1, "base"), (factor, "amplified")):
            path = os.path.join(root, f"idx_{tag}")
            SIM.build_cosine_bucket_index(
                vectors(base_n * scale, 0), path, planes=planes,
                id_col="vec_id", vec_col="v", batch_id=0,
            )
            SIM.build_cosine_bucket_index(
                vectors(200, 50_000_000), path, planes=planes,
                id_col="vec_id", vec_col="v", batch_id=1,
            )
            release_intermediates()
            t0 = time.monotonic()
            SIM.compact_cosine_index(spark, path, keep_last=1)
            initial_s = round(time.monotonic() - t0, 3)
            for b in (2, 3, 4):
                SIM.build_cosine_bucket_index(
                    vectors(200, 50_000_000 * b), path, planes=planes,
                    id_col="vec_id", vec_col="v", batch_id=b,
                )
            release_intermediates()
            t0 = time.monotonic()
            SIM.compact_cosine_index(spark, path, keep_last=1)
            minor_s = round(time.monotonic() - t0, 3)
            out[tag] = {
                "index_rows": base_n * scale + 800,
                "initial_fold_s": initial_s,
                "minor_fold_s": minor_s,
            }
        out["minor_ratio"] = round(
            out["amplified"]["minor_fold_s"] / out["base"]["minor_fold_s"],
            2,
        )
        out["initial_ratio"] = round(
            out["amplified"]["initial_fold_s"]
            / out["base"]["initial_fold_s"],
            2,
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    return 0


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--magnitude":
        raise SystemExit(magnitude_probe())
    if len(sys.argv) > 1 and sys.argv[1] == "--fold-cost":
        factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        raise SystemExit(fold_cost_probe(factor))
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = f"/tmp/sgpd_scale_smoke_{factor}x"

    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.operators import dedup as DD
    from gcs_parquet_dataflow_spark.operators.dedup import last_cap_report
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )
    from gcs_parquet_dataflow_spark.session import get_spark

    spark = get_spark(app_name="scale_smoke")
    try:
        if not os.path.exists(f"{out_dir}/events.parquet"):
            amplify(spark, factor, out_dir)
        if not os.path.exists(f"{out_dir}/embeddings.parquet"):
            # embeddings amplification added round 9 — an out_dir from
            # an earlier round may predate it
            copies0 = spark.range(factor).select(F.col("id").alias("_c"))
            emb0 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            (
                emb0.crossJoin(copies0)
                .select(
                    (F.col("vec_id") + F.col("_c") * 10_000_000)
                    .alias("vec_id"),
                    *[c for c in emb0.columns if c != "vec_id"],
                )
                .write.mode("overwrite")
                .parquet(f"{out_dir}/embeddings.parquet")
            )

        li = spark.read.parquet(f"{out_dir}/lineitem.parquet")
        docs = spark.read.parquet(f"{out_dir}/documents.parquet")
        ev = spark.read.parquet(f"{out_dir}/events.parquet")
        rows = {
            "lineitem": li.count(),
            "documents": docs.count(),
            "events": ev.count(),
        }

        timings = {}

        def timed(name, fn):
            t0 = time.monotonic()
            fn()
            timings[name] = round(time.monotonic() - t0, 2)
            release_intermediates()

        # q1 shape: scan + agg over the amplified fact table
        def q1():
            c = F.round(F.col("l_extendedprice") * 100).cast("long")
            li.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum(F.col("l_quantity").cast("long")),
                F.sum(c),
                F.count(F.lit(1)),
            ).collect()

        timed("q1_agg", q1)

        # fact⋈fact join on the amplified key space
        def join_heavy():
            a = li.select("l_orderkey", "l_extendedprice")
            b = li.select("l_orderkey", "l_quantity")
            a.join(b, "l_orderkey").groupBy().count().collect()

        timed("self_join", join_heavy)

        # MinHash signatures + banded candidate pairs over the
        # amplified near-dup corpus (pair volume scales with copies)
        def lsh():
            sigs = DD.with_minhash(
                docs, "doc_id", "text", DD.minhash_perms(16, seed=7)
            )
            DD.lsh_candidate_pairs(sigs, "doc_id", "sig").groupBy().count().collect()

        timed("minhash_lsh_pairs", lsh)

        # sliding-window dedup signal over the amplified corpus
        def windows():
            DD.duplicated_window_stats(docs, "doc_id", "text", k=8).groupBy().agg(
                F.sum("n_dup_windows")
            ).collect()

        timed("dup_window_stats", windows)

        # user-keyed window + rollup over amplified events
        def sess():
            from pyspark.sql import Window as W

            w = W.partitionBy("user_id").orderBy("ts", "event_id")
            ev.withColumn("rn", F.row_number().over(w)).groupBy(
                "event_type"
            ).agg(F.max("rn")).collect()

        timed("user_window", sess)

        # graph family (round-4 dials). NOTE: do NOT amplify events and
        # rebuild co-activity edges — bucket sizes grow ×factor, so the
        # Σ|bucket|² build grows ×factor² (at 10× it spilled >80 GB;
        # that densification curve is the one scaling_probe already
        # documents). The dials govern the ITERATION, so amplify the
        # EDGE LIST itself: per-copy node-id offsets give a graph with
        # ×factor nodes and edges and identical per-copy structure.
        from gcs_parquet_dataflow_spark.operators.graph import (
            pagerank_quantized,
            triangle_participation,
        )

        base_ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        b = base_ev.select(
            "user_id", "event_type", F.date_trunc("hour", "ts").alias("hb")
        ).distinct()
        x, y = b.alias("x"), b.alias("y")
        base_edges = (
            x.join(
                y,
                (F.col("x.event_type") == F.col("y.event_type"))
                & (F.col("x.hb") == F.col("y.hb"))
                & (F.col("x.user_id") < F.col("y.user_id")),
            )
            .groupBy(F.col("x.user_id").alias("u"), F.col("y.user_id").alias("v"))
            .agg(F.count(F.lit(1)).alias("_w"))
            .filter(F.col("_w") >= 3)
            .select("u", "v")
        )
        copies = spark.range(factor).select(F.col("id").alias("_c"))
        edges_df = (
            base_edges.crossJoin(copies)
            .select(
                (F.col("u") + F.col("_c") * 10_000_000).alias("u"),
                (F.col("v") + F.col("_c") * 10_000_000).alias("v"),
            )
            .persist()
        )

        def edge_build():
            rows["graph_edges"] = edges_df.count()

        timed("graph_edge_amplify", edge_build)

        def pr_bcast():
            pagerank_quantized(edges_df, broadcast_ranks=True).groupBy().agg(
                F.sum("rank_q")
            ).collect()

        timed("pagerank_iterate_bcast", pr_bcast)

        def pr_shuffle():
            pagerank_quantized(edges_df, broadcast_ranks=False).groupBy().agg(
                F.sum("rank_q")
            ).collect()

        timed("pagerank_iterate_shuffle", pr_shuffle)

        def tri_degord():
            triangle_participation(
                edges_df, "u", "v", degree_order=True
            ).groupBy().agg(F.sum("n_triangles")).collect()

        timed("triangle_degord", tri_degord)

        # hub-degree cap: round 5 proved the wedge-volume collapse
        # (40.5 s → 2.9 s at 20× with cap=250, hubs reported NULL);
        # round 6 made the cap a pure physical dial — hubs are exactly
        # counted via the bounded hub-incident wedge classes, and the
        # cap resolves itself from the degree distribution ("auto")
        def tri_capped():
            r = triangle_participation(
                edges_df, "u", "v", degree_order=True, max_degree="auto"
            )
            rows["triangle_nodes_counted"] = r.filter(
                F.col("n_triangles").isNotNull()
            ).count()
            rep = last_cap_report()
            rows["triangle_cap_report"] = rep.as_dict() if rep else None

        timed("triangle_degord_capped_auto", tri_capped)
        edges_df.unpersist()

        # the r4 negative result, closed (VERDICT r4 item 2) — and the
        # r5 negative result on top of it, closed (VERDICT r5 item 1):
        # at 20× the FIXED cap=256 saturated (every (event_type, hour)
        # bucket over the cap → 0 edges, silently). The auto cap
        # resolves against the observed bucket-size distribution, so
        # it tracks amplification: normal buckets stay in, the guard
        # reports its own saturation, and the build returns real edges
        # at every factor. Both dials recorded for the comparison.
        from gcs_parquet_dataflow_spark.operators.graph import (
            coactivity_edges,
        )

        ev_buckets = ev.select(
            "user_id",
            "event_type",
            F.date_trunc("hour", "ts").alias("hb"),
        )

        def edge_build_capped_fixed():
            rows["graph_edges_capped256_amplified"] = coactivity_edges(
                ev_buckets,
                "user_id",
                ("event_type", "hb"),
                max_bucket_size=256,
            ).count()

        timed("coactivity_edges_capped256_amplified", edge_build_capped_fixed)

        def edge_build_capped_auto():
            rows["graph_edges_capped_auto_amplified"] = coactivity_edges(
                ev_buckets,
                "user_id",
                ("event_type", "hb"),
                max_bucket_size="auto",
            ).count()
            rep = last_cap_report()
            rows["coactivity_cap_report"] = rep.as_dict() if rep else None

        timed("coactivity_edges_capped_auto_amplified", edge_build_capped_auto)

        # pair-budget dial: at 20× every bucket is ~550 users, so a
        # 2·10⁸ candidate budget is INFEASIBLE without dropping all of
        # them — the point is the guard now SAYS so (saturation=1.0 in
        # the report) instead of silently returning an empty graph
        def edge_build_budget():
            from gcs_parquet_dataflow_spark.operators.dedup import (
                PairBudgetCap,
            )

            rows["graph_edges_pair_budget_amplified"] = coactivity_edges(
                ev_buckets,
                "user_id",
                ("event_type", "hb"),
                max_bucket_size=PairBudgetCap(2 * 10**8),
            ).count()
            rep = last_cap_report()
            rows["coactivity_budget_report"] = rep.as_dict() if rep else None

        timed("coactivity_edges_pair_budget_amplified", edge_build_budget)

        # entity-resolution blocking at amplification: copies keep the
        # SAME customer name (the "one entity per crawl snapshot"
        # workload — nm blocks grow ×factor), balances and segments
        # amplify too, so every blocking pass's bucket distribution
        # shifts. The question is the same one the graph caps answered:
        # does the guard track the distribution, and does it SAY what
        # it dropped? Three dials recorded: the oracle row's fixed 32,
        # "auto", and an explicit pair budget.
        if not os.path.exists(f"{out_dir}/customer.parquet"):
            cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
            (
                cust.crossJoin(copies)
                .select(
                    (F.col("c_custkey") + F.col("_c") * 10_000_000)
                    .alias("c_custkey"),
                    "c_name",
                    "c_nationkey",
                    "c_acctbal",
                    "c_mktsegment",
                )
                .write.mode("overwrite")
                .parquet(f"{out_dir}/customer.parquet")
            )

        from gcs_parquet_dataflow_spark.operators import linkage
        from gcs_parquet_dataflow_spark.queries.extensions import (
            _er_agreements,
            _er_passes,
            _er_records,
        )

        def er_pairs(dial, tag, count_matches=False):
            recs = _er_records(spark, out_dir)
            pairs = linkage.blocked_candidate_pairs(
                recs, "rec_id", _er_passes(), max_block_size=dial,
            )
            rows[f"er_pairs_{tag}"] = pairs.count()
            # fixed int caps are LAZY (no CapReport) — don't record a
            # stale report from an earlier auto/budget application
            rep = last_cap_report() if not isinstance(dial, int) else None
            rows[f"er_cap_report_{tag}"] = rep.as_dict() if rep else None
            if count_matches:
                scored = linkage.fellegi_sunter_score(
                    linkage.pair_attributes(
                        pairs, recs, "rec_id",
                        ["name", "nation", "segment", "bal_cents"],
                    ),
                    _er_agreements(),
                )
                rows[f"er_matches_{tag}"] = scored.filter(
                    F.col("score") >= 70
                ).count()

        timed("er_blocking_fixed32", lambda: er_pairs(32, "fixed32"))
        timed(
            "er_blocking_auto",
            lambda: er_pairs("auto", "auto", count_matches=True),
        )

        def er_budget():
            from gcs_parquet_dataflow_spark.operators.dedup import (
                PairBudgetCap,
            )

            er_pairs(PairBudgetCap(10**8), "pair_budget")

        timed("er_blocking_pair_budget", er_budget)

        # native data-dependent session aggregation (round-5 surface)
        def native_sessions():
            ev.groupBy(
                F.session_window(F.col("ts"), "30 minutes"), "user_id"
            ).count().groupBy().agg(F.count(F.lit(1))).collect()

        timed("session_window_native", native_sessions)

        # the round-8 rows (VERDICT r8 item 6): the ANN-candidate path
        # over ×factor embeddings (candidates per anchor stay bounded —
        # the per-list join is the scale mechanism under test) and the
        # JPEG codec path over ×factor documents (scan-stage Python;
        # should track the data ratio, nothing quadratic)
        from gcs_parquet_dataflow_spark.queries import CATALOG

        def knn_ann_amp():
            rows["knn_label_eval_ann_rows"] = len(
                CATALOG["knn_label_eval_ann"].build(spark, out_dir).collect()
            )

        timed("knn_label_eval_ann_amplified", knn_ann_amp)

        def jpeg_amp():
            rows["media_jpeg_decode_rows"] = len(
                CATALOG["media_jpeg_decode"].build(spark, out_dir).collect()
            )

        timed("media_jpeg_decode_amplified", jpeg_amp)

        # round-10 (VERDICT r9 item 1): the cosine candidate generator's
        # hot-bucket guard at ×factor — (a) the AutoCap-armed catalog row
        # over amplified embeddings (cap must stay a no-op: buckets grow
        # ~uniformly), (b) a planted 2000-member degenerate cluster (the
        # all-identical-embedding bomb) uncapped vs capped: uncapped pays
        # the C(2000,2)≈2M-pair join, AutoCap excludes the bucket and the
        # planted twins elsewhere survive.
        from gcs_parquet_dataflow_spark.operators import similarity as SIM
        from gcs_parquet_dataflow_spark.queries.extensions import (
            COS_DUP_THRESHOLD,
            PLANES,
        )

        def cosine_capped_amp():
            rows["cosine_pairs_capped_rows"] = (
                CATALOG["dedup_embedding_cosine_pairs_capped"]
                .build(spark, out_dir)
                .count()
            )
            rep = last_cap_report()
            rows["cosine_cap_amplified"] = {
                "cap": rep.cap,
                "n_hot_buckets": rep.n_hot_buckets,
                "n_dropped_rows": rep.n_dropped_rows,
            }

        timed("dedup_embedding_cosine_pairs_capped_amplified",
              cosine_capped_amp)

        emb_amp = spark.read.parquet(f"{out_dir}/embeddings.parquet")
        dim = len(emb_amp.select("embedding").first()[0])
        bomb = spark.range(2000).select(
            (F.col("id") + 900_000_000).alias("vec_id"),
            F.array(*[F.lit(0.5)] * dim).alias("v"),
        )
        bombed = emb_amp.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ).unionByName(bomb)

        def cosine_bomb_uncapped():
            rows["cosine_bomb_uncapped_pairs"] = SIM.cosine_dup_pairs(
                bombed, COS_DUP_THRESHOLD, planes=PLANES,
                id_col="vec_id", vec_col="v",
            ).count()

        timed("cosine_bomb_uncapped", cosine_bomb_uncapped)

        def cosine_bomb_capped():
            rows["cosine_bomb_capped_pairs"] = SIM.cosine_dup_pairs(
                bombed, COS_DUP_THRESHOLD, planes=PLANES,
                id_col="vec_id", vec_col="v",
                max_bucket_size=DD.AutoCap(),
            ).count()
            rep = last_cap_report()
            rows["cosine_bomb_cap"] = {
                "cap": rep.cap,
                "n_hot_buckets": rep.n_hot_buckets,
                "n_dropped_rows": rep.n_dropped_rows,
            }

        timed("cosine_bomb_capped", cosine_bomb_capped)

        # CC iteration-dial bomb (VERDICT r10 item 4): a planted
        # pairwise near-dup CHAIN (crawl rings, templated page series)
        # has diameter O(n) — min-label propagation moves the label ONE
        # hop per round, so an unbounded loop runs O(n) shuffle rounds.
        # max_iter bounds the cost at the dial regardless of depth, and
        # the CCReport makes the truncation LOUD (converged=False,
        # changed_at_stop > 0) instead of silently over-split.
        chain_n = 50 * factor
        chain_nodes = spark.range(chain_n).select(F.col("id").alias("doc_id"))
        chain_pairs = spark.range(chain_n - 1).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )

        def cc_chain_capped():
            capped = DD.connected_components(
                chain_nodes, chain_pairs, id_col="doc_id",
                max_iter=10, metric_name="cc_chain_smoke",
            )
            rows["cc_chain_capped_clusters"] = (
                capped.select("cluster").distinct().count()
            )
            rep = DD.last_cc_report()
            rows["cc_chain_report"] = {
                "chain_n": chain_n,
                "max_iter": rep.max_iter,
                "iterations": rep.iterations,
                "converged": rep.converged,
                "changed_at_stop": rep.changed_at_stop,
            }

        timed("cc_chain_diameter_bomb_capped_at_10", cc_chain_capped)

        def cc_chain_jump():
            # the O(log diameter) alternative: full convergence on the
            # same chain in ~log2(n) rounds — the dial-free answer for
            # deep graphs (round 11)
            full = DD.connected_components(
                chain_nodes, chain_pairs, id_col="doc_id",
                max_iter=40, metric_name="cc_chain_jump_smoke",
                algorithm="jump",
            )
            rows["cc_chain_jump_clusters"] = (
                full.select("cluster").distinct().count()
            )
            rep = DD.last_cc_report()
            rows["cc_chain_jump_report"] = {
                "iterations": rep.iterations,
                "converged": rep.converged,
            }

        timed("cc_chain_jump_full_convergence", cc_chain_jump)

        def cc_chain_auto():
            # round 12: the dial-free dial — auto runs label until the
            # changed count stalls, then escalates to jump; on this
            # chain it must FULLY converge in ~2 + log2(n) rounds and
            # the report must record the escalation
            full = DD.connected_components(
                chain_nodes, chain_pairs, id_col="doc_id",
                max_iter=40, metric_name="cc_chain_auto_smoke",
                algorithm="auto",
            )
            rows["cc_chain_auto_clusters"] = (
                full.select("cluster").distinct().count()
            )
            rep = DD.last_cc_report()
            rows["cc_chain_auto_report"] = {
                "iterations": rep.iterations,
                "converged": rep.converged,
                "algorithm": rep.algorithm,
            }

        timed("cc_chain_auto_full_convergence", cc_chain_auto)

        print(
            json.dumps(
                {
                    "factor": factor,
                    "base_sf_dir": SF_DIR,
                    "rows": rows,
                    "timings_sec": timings,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
