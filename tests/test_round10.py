"""Round-10 tests: the cosine candidate generator joins the hot-bucket
guard family (VERDICT r9 item 1) — planted degenerate-embedding-cluster
bomb, cap no-op identity, AutoCap saturation report, and the
multi-table recall dial's semantic identities."""

from __future__ import annotations

import random

import pytest

from gcs_parquet_dataflow_spark.operators import similarity as SIM
from gcs_parquet_dataflow_spark.operators.dedup import (
    AutoCap,
    cap_reports,
)

DIM = 16
P1 = SIM.hyperplanes(n_planes=6, dim=DIM, seed=13)
P2 = SIM.hyperplanes(n_planes=6, dim=DIM, seed=14)
THRESHOLD = 0.98


def _mixed_corpus():
    """40-member degenerate cluster (IDENTICAL vectors — the all-zero /
    boilerplate-template case embedding_norm_audit exists to catch,
    landing in ONE bucket by construction) + 5 planted true near-dup
    twin pairs (v, v+0.01 → cos ≈ 0.999) on random distinct directions
    + 30 random background vectors (pairwise cos far below 0.98 in
    16-dim)."""
    rng = random.Random(41)
    rows = []
    base = [round(rng.uniform(-1, 1), 6) for _ in range(DIM)]
    for i in range(40):
        rows.append((i, list(base)))
    true_pairs = set()
    for j in range(5):
        v = [round(rng.uniform(-1, 1), 6) for _ in range(DIM)]
        rows.append((100 + 2 * j, v))
        rows.append((101 + 2 * j, [x + 0.01 for x in v]))
        true_pairs.add((100 + 2 * j, 101 + 2 * j))
    for i in range(30):
        rows.append((200 + i, [round(rng.uniform(-1, 1), 6) for _ in range(DIM)]))
    return rows, true_pairs


def _pairs(df, **kw):
    return {
        (r["id_a"], r["id_b"])
        for r in SIM.cosine_dup_pairs(
            df, THRESHOLD, id_col="vec_id", vec_col="v", **kw
        ).collect()
    }


def test_cosine_hot_bucket_cap_bounds_candidates_and_keeps_recall(spark):
    """The degenerate cluster alone contributes C(40,2)=780 pairs
    uncapped; with the cap armed its bucket is excluded and every
    planted true pair is still found through its own cold bucket."""
    rows, true_pairs = _mixed_corpus()
    df = spark.createDataFrame(rows, "vec_id long, v array<double>").persist()
    uncapped = _pairs(df, planes=P1)
    capped = _pairs(df, planes=P1, max_bucket_size=10)
    df.unpersist()
    assert true_pairs <= uncapped
    assert len(uncapped) >= 780 + len(true_pairs)
    assert true_pairs <= capped
    assert len(capped) < 40  # the 780 cluster pairs are gone


def test_cosine_autocap_excludes_cluster_and_reports(spark):
    """AutoCap resolves from the observed distribution so the planted
    cluster is guarded without a hand-picked cap, and the saturation
    CapReport lands.  quantile=0.9 here because the test corpus has
    only ~24 occupied buckets — at that size the single hot bucket IS
    the p99, so the default q=0.99 would track it (at fixture scale
    with hundreds of buckets the default excludes lone outliers,
    which is what the oracle rows use)."""
    rows, true_pairs = _mixed_corpus()
    df = spark.createDataFrame(rows, "vec_id long, v array<double>").persist()
    n_before = len(cap_reports())
    capped = _pairs(df, planes=P1, max_bucket_size=AutoCap(quantile=0.9))
    df.unpersist()
    reports = cap_reports()
    assert len(reports) == n_before + 1
    rep = reports[-1]
    assert rep.metric_name == "cosine_buckets"
    assert rep.n_hot_buckets >= 1
    assert rep.n_dropped_rows >= 40
    assert true_pairs <= capped
    assert len(capped) < 40


def test_cosine_cap_is_noop_without_hot_buckets(spark):
    """Fixed cap above every bucket size must not change a single pair
    or score — the invariant the *_capped oracle rows pin at fixture
    scale."""
    rows, _ = _mixed_corpus()
    df = spark.createDataFrame(
        [r for r in rows if r[0] >= 100], "vec_id long, v array<double>"
    ).persist()
    plain = sorted(
        map(tuple, SIM.cosine_dup_pairs(
            df, THRESHOLD, planes=P1, id_col="vec_id", vec_col="v"
        ).collect())
    )
    capped = sorted(
        map(tuple, SIM.cosine_dup_pairs(
            df, THRESHOLD, planes=P1, id_col="vec_id", vec_col="v",
            max_bucket_size=10,
        ).collect())
    )
    df.unpersist()
    assert plain == capped
    assert plain  # non-vacuous: the 5 twin pairs are present


def test_cosine_multitable_is_union_of_single_tables(spark):
    """plane_tables=[P1, P2] ≡ distinct(pairs(P1) ∪ pairs(P2)) — the
    dial's exact semantics, so single-table output is always a subset
    (recall is monotone in the number of tables)."""
    rows, _ = _mixed_corpus()
    df = spark.createDataFrame(rows, "vec_id long, v array<double>").persist()
    t1 = _pairs(df, planes=P1)
    t2 = _pairs(df, planes=P2)
    both = _pairs(df, plane_tables=[P1, P2])
    df.unpersist()
    assert both == t1 | t2
    assert t1 <= both and t2 <= both


def test_cosine_multitable_recovers_pair_capped_away_in_one_table(spark):
    """The recall argument for cap+multi-table composition: a true pair
    planted INSIDE the table-1 hot bucket is lost when table 1's bucket
    is capped, and recovered through table 2 whenever the pair's
    table-2 bucket is cold (near-identical vectors share buckets in
    every table, so the pair itself always co-locates — only crowd
    size differs per table).  The planted crowd is built to be hot in
    table 1 only: crowd members are spread across table-2 buckets by
    construction check, else the test corpus is regenerated."""
    rng = random.Random(43)
    # twin pair: v and v+0.01 (cos ≈ 0.999)
    v = [round(rng.uniform(-1, 1), 6) for _ in range(DIM)]
    twin = [x + 0.01 for x in v]

    def bucket(vec, planes):
        return sum(
            2 ** i
            for i, p in enumerate(planes)
            if sum(a * b for a, b in zip(vec, p)) > 0
        )

    # crowd: vectors sharing the pair's table-1 bucket but spread over
    # table-2 buckets — rejection-sample directions until 30 found
    b1 = bucket(v, P1)
    crowd = []
    while len(crowd) < 30:
        c = [round(rng.uniform(-1, 1), 6) for _ in range(DIM)]
        if bucket(c, P1) == b1:
            crowd.append(c)
    # the pair's table-2 bucket must be cold (< cap) for recovery
    b2 = bucket(v, P2)
    n_same_b2 = sum(1 for c in crowd if bucket(c, P2) == b2)
    assert n_same_b2 < 8, "corpus degenerate in table 2 too; reseed"
    rows = [(0, v), (1, twin)] + [(10 + i, c) for i, c in enumerate(crowd)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>").persist()
    single = _pairs(df, planes=P1, max_bucket_size=10)
    multi = _pairs(df, plane_tables=[P1, P2], max_bucket_size=10)
    df.unpersist()
    assert (0, 1) not in single  # capped away with only table 1
    assert (0, 1) in multi  # recovered through table 2


def test_cosine_planes_and_plane_tables_are_exclusive(spark):
    import pytest

    df = spark.createDataFrame([(0, [0.1] * DIM)], "vec_id long, v array<double>")
    with pytest.raises(ValueError):
        SIM.cosine_dup_pairs(
            df, THRESHOLD, planes=P1, plane_tables=[P1, P2],
            id_col="vec_id", vec_col="v",
        )


# ---------------------------------------------------------------------------
# N-dimensional Z-order (VERDICT r9 item 4)
# ---------------------------------------------------------------------------


def test_zorder_key_n_is_a_bijection_on_the_3d_bit_domain(spark):
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.sinks.parquet_lake import zorder_key_n

    # 4-bit × 3 dims: all 4096 (x, y, w) points → 4096 distinct z
    # values covering exactly [0, 4096)
    grid = spark.range(4096).select(
        (F.col("id") % 16).alias("x"),
        ((F.col("id") / 16) % 16).cast("long").alias("y"),
        (F.col("id") / 256).cast("long").alias("w"),
    )
    z = grid.select(
        zorder_key_n([F.col("x"), F.col("y"), F.col("w")], 4).alias("z")
    )
    stats = z.agg(
        F.count_distinct("z").alias("d"),
        F.min("z").alias("lo"),
        F.max("z").alias("hi"),
    ).first()
    assert (stats["d"], stats["lo"], stats["hi"]) == (4096, 0, 4095)


def test_zorder_key_two_column_wrapper_is_unchanged(spark):
    """zorder_key(x, y) must produce the exact historical bit layout
    (x → even positions, y → odd) now that it wraps zorder_key_n —
    the 2-D oracle row pins this against DuckDB too."""
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.sinks.parquet_lake import zorder_key

    df = spark.createDataFrame([(3, 5)], "x long, y long")
    got = df.select(zorder_key(F.col("x"), F.col("y"), 6).alias("z")).first()["z"]
    expect = sum(
        (((3 >> i) & 1) << (2 * i)) + (((5 >> i) & 1) << (2 * i + 1))
        for i in range(6)
    )
    assert got == expect


def test_zorder_key_n_rejects_bit_budget_overflow(spark):
    import pytest
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.sinks.parquet_lake import zorder_key_n

    with pytest.raises(ValueError):
        zorder_key_n([F.lit(1)] * 4, 16)  # 64 > 63


def test_zordered_write_clusters_all_three_dimensions(spark, tmp_path):
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.sinks.parquet_lake import write_zordered

    path = str(tmp_path / "z3")
    n = 1 << 12  # full 16×16×16 grid
    df = spark.range(n).select(
        (F.col("id") % 16).alias("x"),
        ((F.col("id") / 16) % 16).cast("long").alias("y"),
        (F.col("id") / 256).cast("long").alias("w"),
    )
    write_zordered(df, path, ["x", "y", "w"], bits=4, n_files=8)
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    assert len(files) == 8
    # every file's (x, y, w) bounding BOX must cover far less than the
    # full 4096-cell cube — and no single dimension may span its whole
    # domain in every file (that is what a 1-D sort layout does)
    vols, spans = [], {"x": [], "y": [], "w": []}
    for f in files:
        t_ = pq.read_table(f)
        dims = {}
        for c in ("x", "y", "w"):
            vals = t_.column(c).to_pylist()
            dims[c] = max(vals) - min(vals) + 1
            spans[c].append(dims[c])
        vols.append(dims["x"] * dims["y"] * dims["w"])
    assert sum(vols) / len(vols) < 2048  # ≪ 4096; octants would be 512
    for c in ("x", "y", "w"):
        assert min(spans[c]) < 16  # each dimension prunes somewhere


def test_optimize_table_zorder_by_prunes_every_dimension(spark, tmp_path):
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.sinks import parquet_lake as PL

    path = str(tmp_path / "t")
    n = 1 << 12
    spark.range(n).select(
        (F.col("id") % 16).alias("x"),
        ((F.col("id") / 16) % 16).cast("long").alias("y"),
        (F.col("id") / 256).cast("long").alias("w"),
    ).repartition(4).write.parquet(path)
    res = PL.optimize_table(
        spark, path, zorder_by=["x", "y", "w"], target_file_bytes=1024
    )
    assert res["files_after"] > 4  # enough files for pruning to mean much
    stats = spark.read.parquet(res["manifest_path"])
    n_files = stats.count()
    for c in ("x", "y", "w"):
        hits = stats.filter(
            (F.col(f"max_{c}") >= 3) & (F.col(f"min_{c}") <= 5)
        ).count()
        assert hits < n_files  # the manifest prunes on EVERY dimension
        # and the pruned read is exact
        got = PL.read_skipping(spark, path, stats, c, 3, 5)
        assert got.count() == 3 * 256  # 3 slabs of the 16³ cube

    import pytest

    with pytest.raises(ValueError):
        PL.optimize_table(spark, path, sort_cols=["x"], zorder_by=["y"])


# ---------------------------------------------------------------------------
# Streaming maintenance lifecycle (VERDICT r9 item 5): one lake, the
# full ops composition — versioned CDC stream → between-epoch compact +
# optimize → bloom side-lake fold → streaming RTBF erasure → vacuum →
# stale duplicate batch → fenced replays.
# ---------------------------------------------------------------------------


def test_streaming_maintenance_lifecycle(spark, tmp_path):
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.operators import incremental as INC
    from gcs_parquet_dataflow_spark.operators.sketches import bloom_build
    from gcs_parquet_dataflow_spark.sinks import parquet_lake as PL
    from gcs_parquet_dataflow_spark.streaming.pipeline import (
        run_rtbf_stream,
        run_upsert_stream,
    )

    root = str(tmp_path / "lake")
    cdc = tmp_path / "cdc"
    cdc.mkdir()
    bloom = str(tmp_path / "bloom")

    def cdc_file(name, rows):
        spark.createDataFrame(
            rows, "k long, v string, ver long"
        ).coalesce(1).write.parquet(str(cdc / name))

    def run_cdc(ck="ck_cdc"):
        stream = (
            spark.readStream.schema("k long, v string, ver long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(cdc / "*"))
        )
        q = run_upsert_stream(
            spark, stream, root, ["k"], "ver", str(tmp_path / ck),
            versioned=True, available_now=True,
        )
        q.awaitTermination(180)

    def current():
        return {
            r["k"]: (r["v"], r["ver"])
            for r in PL.read_version(spark, root).collect()
        }

    # --- CDC epoch 1: init batch + update batch → v0, v1 -------------
    cdc_file("b0", [(k, f"v1_{k}", 1) for k in range(10)])
    cdc_file("b1", [(2, "v2_2", 2), (3, "v2_3", 2), (10, "v1_10", 1)])
    run_cdc()
    assert PL.latest_version(spark, root) == 1
    expect = {k: (f"v1_{k}", 1) for k in range(10)}
    expect.update({2: ("v2_2", 2), 3: ("v2_3", 2), 10: ("v1_10", 1)})
    assert current() == expect

    # --- between-epoch layout maintenance on the CURRENT snapshot ----
    vdir = root + "/v%08d" % PL.latest_version(spark, root)
    PL.compact(spark, vdir, target_file_bytes=1 << 30)
    res = PL.optimize_table(spark, vdir, sort_cols=["k"])
    assert res["n_rows"] == 11
    assert PL.latest_version(spark, root) == 1  # maintenance is invisible
    assert current() == expect

    # --- bloom side-lake: per-epoch seen-key appends ------------------
    keys1 = PL.read_version(spark, root).select(
        F.col("k").cast("string").alias("_w")
    )
    bloom_build(keys1, "_w", m_bits=2**10, k=3).write.mode(
        "append"
    ).parquet(bloom)
    INC.write_bloom_meta(spark, bloom, 2**10, 3)

    # --- CDC epoch 2 on the SAME checkpoint → v2 ----------------------
    cdc_file("b2", [(0, "v3_0", 3)])
    run_cdc()
    assert PL.latest_version(spark, root) == 2
    expect[0] = ("v3_0", 3)
    assert current() == expect

    # second bloom append, then fold — the OR-merge must be exact
    bloom_build(
        spark.createDataFrame([("0",)], "_w string"), "_w",
        m_bits=2**10, k=3,
    ).write.mode("append").parquet(bloom)
    pre_fold = sorted(
        tuple(r) for r in INC.read_bloom(spark, bloom).collect()
    )
    INC.compact_bloom_lake(spark, bloom)
    assert sorted(
        tuple(r) for r in INC.read_bloom(spark, bloom).collect()
    ) == pre_fold
    assert INC.read_bloom_meta(spark, bloom) == {"m_bits": 2**10, "k": 3}

    # --- streaming RTBF: erase subject 3 → v3 + audited ---------------
    req = tmp_path / "req"
    req.mkdir()
    spark.createDataFrame([(3,)], "subject_key long").coalesce(
        1
    ).write.parquet(str(req / "r0"))
    rstream = (
        spark.readStream.schema("subject_key long")
        .parquet(str(req / "*"))
    )
    q = run_rtbf_stream(
        spark, rstream, [(root, "k")],
        str(tmp_path / "audit"), str(tmp_path / "ck_rtbf"),
        available_now=True,
    )
    q.awaitTermination(180)
    assert PL.latest_version(spark, root) == 3
    del expect[3]
    assert current() == expect
    assert (tmp_path / "audit" / "_batch_id=0" / "_COMMITTED").exists()
    audit = spark.read.parquet(str(tmp_path / "audit"))
    assert [
        tuple(r) for r in audit.select(
            "lake_root", "lake_key", "n_keys", "new_version"
        ).collect()
    ] == [(root, "k", 1, 3)]

    # --- vacuum: retention window drops v0, survivors stay readable ---
    assert PL.vacuum_versions(spark, root, keep_last=3) == [0]
    import pytest

    with pytest.raises(FileNotFoundError):
        PL.read_version(spark, root, 0)
    assert {
        r["k"] for r in PL.read_version(spark, root, 2).collect()
    } == set(range(11))  # history: v2 still holds the erased subject
    assert current() == expect

    # --- stale duplicate batch: late re-delivery of b2's content ------
    cdc_file("b3", [(0, "v3_0", 3)])
    run_cdc()
    # content-idempotent: one extra identical snapshot, erasure intact
    assert PL.latest_version(spark, root) == 4
    assert current() == expect
    assert 3 not in current()

    # --- fenced replays: same checkpoints re-commit NOTHING -----------
    run_cdc()  # no new files
    q = run_rtbf_stream(
        spark,
        spark.readStream.schema("subject_key long").parquet(str(req / "*")),
        [(root, "k")],
        str(tmp_path / "audit"), str(tmp_path / "ck_rtbf"),
        available_now=True,
    )
    q.awaitTermination(180)
    assert PL.latest_version(spark, root) == 4
    assert current() == expect


# ---------------------------------------------------------------------------
# Accumulator-overflow guard (VERDICT r9 item 7): mechanize the audit's
# conversion rule so new long-cast sum-of-product code can't land
# without the overflow-regime proof.
# ---------------------------------------------------------------------------

# Every site below is in the round-9 audit (SCALE.md "accumulator-
# overflow audit" bounds table): proven exact under 2^63 at the 100 TB
# design point, or integer-by-construction (classifier training).  A
# NEW (file, function) here means a NEW long-cast sum-of-products
# accumulator: either prove its bound and add it (with a SCALE.md
# bounds row + a run of `python tools/scale_smoke.py --magnitude`), or
# convert it to DECIMAL(38,0) like q1/q14 — never just extend the list.
_AUDITED_LONG_PRODUCT_SUMS = {
    ("gcs_parquet_dataflow_spark/operators/classifier.py",
     "_train_on_feats"): 2,
    ("gcs_parquet_dataflow_spark/operators/classifier.py",
     "classifier_scores"): 1,
    ("gcs_parquet_dataflow_spark/operators/classifier.py",
     "gradient_at_zero"): 1,
    ("gcs_parquet_dataflow_spark/operators/classifier.py",
     "langid_predict"): 1,
    ("gcs_parquet_dataflow_spark/operators/classifier.py",
     "margin_scores"): 1,
    ("gcs_parquet_dataflow_spark/plans/incremental_recipe.py",
     "batch_source_stats"): 1,
    ("gcs_parquet_dataflow_spark/queries/extensions.py",
     "dedup_semantic_keep_centroid_closest"): 1,
    ("gcs_parquet_dataflow_spark/queries/extensions.py",
     "pareto_abc_parts"): 1,
    ("gcs_parquet_dataflow_spark/queries/extensions.py",
     "supplier_concentration_hhi"): 1,
}


def _scan_long_product_sums():
    """AST scan of the package for ``F.sum(<expr with *>).cast("long")``
    — the exact accumulator shape that silently wraps past 2^63 at
    100 TB magnitudes (the class the r9 audit was built to catch)."""
    import ast
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    pkg = os.path.join(root, "gcs_parquet_dataflow_spark")

    def has_mult(node):
        return any(
            isinstance(n, ast.BinOp) and isinstance(n.op, ast.Mult)
            for n in ast.walk(node)
        )

    found = {}
    for dirpath, _, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path, encoding="utf-8") as fh:
                tree = ast.parse(fh.read())
            funcs = [
                (n.lineno, n.end_lineno, n.name)
                for n in ast.walk(tree)
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            ]

            def enclosing(lineno):
                best = None
                for lo, hi, name in funcs:
                    if lo <= lineno <= hi and (best is None or lo > best[0]):
                        best = (lo, name)
                return best[1] if best else "<module>"

            for n in ast.walk(tree):
                if not (
                    isinstance(n, ast.Call)
                    and isinstance(n.func, ast.Attribute)
                    and n.func.attr == "cast"
                    and n.args
                    and isinstance(n.args[0], ast.Constant)
                    and str(n.args[0].value).lower() in ("long", "bigint")
                ):
                    continue
                v = n.func.value
                if (
                    isinstance(v, ast.Call)
                    and isinstance(v.func, ast.Attribute)
                    and v.func.attr == "sum"
                    and v.args
                    and has_mult(v.args[0])
                ):
                    key = (
                        os.path.relpath(path, root),
                        enclosing(n.lineno),
                    )
                    found[key] = found.get(key, 0) + 1
    return found


@pytest.mark.fast  # AST overflow-audit guard, driver quick gate (r13)
def test_no_unaudited_long_product_sum_accumulators():
    found = _scan_long_product_sums()
    new = {
        k: v for k, v in found.items()
        if v > _AUDITED_LONG_PRODUCT_SUMS.get(k, 0)
    }
    assert not new, (
        f"unaudited long-cast sum-of-product accumulator(s): {new} — "
        "prove the 2^63 bound (SCALE.md bounds table + "
        "tools/scale_smoke.py --magnitude) or convert to DECIMAL(38,0)"
    )
    # and the list never rots: every audited entry still exists
    gone = {
        k for k in _AUDITED_LONG_PRODUCT_SUMS
        if k not in found
    }
    assert not gone, f"audited sites no longer present — prune: {gone}"


# ---------------------------------------------------------------------------
# Hilbert layout key (the Morton locality upgrade; sinks/hilbert.py)
# ---------------------------------------------------------------------------


def test_hilbert_python_reference_bijection_and_adjacency():
    """The defining Hilbert property, exhaustively: over the FULL
    2-D 6-bit (4096-cell) and 3-D 4-bit domains the index is a
    bijection onto [0, 2^(n·bits)) AND every consecutive index step
    moves exactly one coordinate by exactly 1 — Morton fails this at
    every power-of-two boundary."""
    import itertools

    from gcs_parquet_dataflow_spark.sinks.hilbert import hilbert_index_py

    for n, bits in [(2, 6), (3, 4)]:
        size = 1 << bits
        inv = {}
        for coords in itertools.product(range(size), repeat=n):
            inv[hilbert_index_py(list(coords), bits)] = coords
        assert len(inv) == size**n
        assert min(inv) == 0 and max(inv) == size**n - 1
        assert all(
            sum(abs(a - b) for a, b in zip(inv[h], inv[h + 1])) == 1
            for h in range(size**n - 1)
        )


def test_hilbert_spark_matches_python_on_full_3d_domain(spark):
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.sinks.hilbert import (
        hilbert_index_py,
        with_hilbert_key,
    )

    g = spark.range(4096).select(
        (F.col("id") % 16).alias("x"),
        ((F.col("id") / 16) % 16).cast("long").alias("y"),
        (F.col("id") / 256).cast("long").alias("w"),
    )
    rows = with_hilbert_key(g, ["x", "y", "w"], bits=4, out="h").collect()
    assert all(
        hilbert_index_py([r["x"], r["y"], r["w"]], 4) == r["h"] for r in rows
    )


def test_hilbert_beats_morton_on_file_bounding_boxes(spark, tmp_path):
    """The point of the upgrade, measured: same grid, same file count —
    the summed per-file bounding-box area of the Hilbert layout must
    beat Morton's (contiguous runs vs quadrant hops)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.sinks.hilbert import (
        write_hilbert_clustered,
    )
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import write_zordered

    df = spark.range(1 << 12).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )

    def total_area(path):
        area = 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            t_ = pq.read_table(os.path.join(path, f))
            xs = t_.column("x").to_pylist()
            ys = t_.column("y").to_pylist()
            area += (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
        return area

    hp, zp = str(tmp_path / "hil"), str(tmp_path / "mor")
    write_hilbert_clustered(df, hp, ["x", "y"], bits=6, n_files=8)
    write_zordered(df, zp, "x", "y", bits=6, n_files=8)
    a_h, a_z = total_area(hp), total_area(zp)
    assert spark.read.parquet(hp).count() == 1 << 12
    assert a_h <= a_z  # never worse
    assert a_h < (1 << 12) * 2  # and genuinely clustered


def test_hilbert_bit_budget_guard(spark):
    import pytest
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.sinks.hilbert import with_hilbert_key

    df = spark.range(1).select(
        F.col("id").alias("a"), F.col("id").alias("b"),
        F.col("id").alias("c"), F.col("id").alias("d"),
    )
    with pytest.raises(ValueError):
        with_hilbert_key(df, ["a", "b", "c", "d"], bits=16)


def test_optimize_table_hilbert_curve_dial(spark, tmp_path):
    """optimize_table(zorder_by=…, curve="hilbert") lays the table out
    along the rank-bucketed Hilbert curve — same API, same manifest,
    tighter locality; content preserved exactly and the manifest prunes
    on every dimension, like the Morton path."""
    import pytest
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.sinks import parquet_lake as PL

    path = str(tmp_path / "t")
    spark.range(1 << 12).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    ).repartition(4).write.parquet(path)
    before = sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )
    res = PL.optimize_table(
        spark, path, zorder_by=["x", "y"], curve="hilbert",
        target_file_bytes=1024,
    )
    assert sorted(
        tuple(r) for r in PL.read_table(spark, path).collect()
    ) == before
    stats = spark.read.parquet(res["manifest_path"])
    n_files = stats.count()
    assert n_files > 4
    for c in ("x", "y"):
        hits = stats.filter(
            (F.col(f"max_{c}") >= 10) & (F.col(f"min_{c}") <= 20)
        ).count()
        assert hits < n_files

    with pytest.raises(ValueError):
        PL.optimize_table(spark, path, zorder_by=["x"], curve="peano")


# ---------------------------------------------------------------------------
# Incremental embedding dedup: batch-vs-corpus + the persisted index
# ---------------------------------------------------------------------------


def _batch_and_corpus(spark):
    rows, true_pairs = _mixed_corpus()
    corpus = spark.createDataFrame(
        [r for r in rows if r[0] >= 100], "vec_id long, v array<double>"
    )
    # batch: shifted copies of three corpus vectors + one novel vector
    src = {r[0]: r[1] for r in rows}
    batch_rows = [
        (1000 + i, [x + 0.01 for x in src[100 + 2 * i]]) for i in range(3)
    ] + [(1999, [float(i % 7 - 3) for i in range(DIM)])]
    batch = spark.createDataFrame(batch_rows, "vec_id long, v array<double>")
    expected = {(1000 + i, 100 + 2 * i) for i in range(3)} | {
        (1000 + i, 101 + 2 * i) for i in range(3)
    }
    return batch, corpus, expected


def test_cosine_batch_pairs_finds_cross_dupes_only(spark):
    batch, corpus, expected = _batch_and_corpus(spark)
    got = {
        (r["batch_id"], r["corpus_id"])
        for r in SIM.cosine_batch_pairs(
            batch, corpus, THRESHOLD, planes=P1,
            id_col="vec_id", vec_col="v", max_bucket_size=256,
        ).collect()
    }
    assert expected <= got
    assert all(b >= 1000 and c < 1000 for b, c in got)  # never intra-side
    assert not any(b == 1999 for b, _ in got)  # the novel vector is clean


def test_cosine_index_probe_equals_inline_form(spark, tmp_path):
    """build_cosine_bucket_index + cosine_batch_against_index must
    reproduce cosine_batch_pairs exactly over the same corpus — the
    IVF-index test strategy applied to the cosine family."""
    batch, corpus, _ = _batch_and_corpus(spark)
    inline = sorted(
        tuple(r)
        for r in SIM.cosine_batch_pairs(
            batch, corpus, THRESHOLD, planes=P1, id_col="vec_id", vec_col="v"
        ).collect()
    )
    path = str(tmp_path / "cidx")
    n = SIM.build_cosine_bucket_index(
        corpus, path, planes=P1, id_col="vec_id", vec_col="v"
    )
    assert n == corpus.count()
    probed = SIM.cosine_batch_against_index(
        spark, path, batch, THRESHOLD, planes=P1,
        id_col="vec_id", vec_col="v",
    )
    assert sorted(tuple(r) for r in probed.collect()) == inline
    # the probe scan is partition-pruned on the index's bucket layout
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "_bucket" in plan


def test_cosine_index_batched_append_is_replay_idempotent(spark, tmp_path):
    """batch_id-keyed index appends use dynamic partition overwrite:
    replaying an ingest batch overwrites its own contribution instead
    of duplicating candidates."""
    from pyspark.sql import functions as F

    batch, corpus, expected = _batch_and_corpus(spark)
    half1 = corpus.filter(F.col("vec_id") % 2 == 0)
    half2 = corpus.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "cidx")
    SIM.build_cosine_bucket_index(
        half1, path, planes=P1, id_col="vec_id", vec_col="v", batch_id=0
    )
    SIM.build_cosine_bucket_index(
        half2, path, planes=P1, id_col="vec_id", vec_col="v", batch_id=1
    )
    full = sorted(
        tuple(r)
        for r in SIM.cosine_batch_against_index(
            spark, path, batch, THRESHOLD, planes=P1,
            id_col="vec_id", vec_col="v",
        ).collect()
    )
    # replay batch 1: same content lands in the same partition
    SIM.build_cosine_bucket_index(
        half2, path, planes=P1, id_col="vec_id", vec_col="v", batch_id=1
    )
    replay = sorted(
        tuple(r)
        for r in SIM.cosine_batch_against_index(
            spark, path, batch, THRESHOLD, planes=P1,
            id_col="vec_id", vec_col="v",
        ).collect()
    )
    assert replay == full
    got = {(b, c) for b, c, _ in full}
    assert expected <= got


def test_embedding_dedup_stream_and_replay_convergence(spark, tmp_path):
    """The streaming deployment: intra-batch collapse + fenced index
    probe + batch-keyed commits.  A FULL replay (fresh checkpoint, same
    files) must converge to the identical index and report — the
    exclude-own-batch fence is what makes the dedup decision a pure
    function of prior state."""
    import random as _rnd

    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.streaming.pipeline import (
        run_embedding_dedup_stream,
    )

    rng = _rnd.Random(51)

    def vec():
        return [round(rng.uniform(-1, 1), 6) for _ in range(DIM)]

    v1, v2, v3, v11, v12 = vec(), vec(), vec(), vec(), vec()
    indir = tmp_path / "vecs"
    indir.mkdir()
    spark.createDataFrame(
        [(1, v1), (2, v2), (3, v3)], "vec_id long, v array<double>"
    ).coalesce(1).write.parquet(str(indir / "f0"))
    spark.createDataFrame(
        [
            (10, [x + 0.01 for x in v1]),   # dup of indexed 1
            (11, v11),                       # novel
            (12, v12),                       # novel, intra-kept
            (13, [x + 0.01 for x in v12]),  # intra dup of 12
        ],
        "vec_id long, v array<double>",
    ).coalesce(1).write.parquet(str(indir / "f1"))

    index = str(tmp_path / "cindex")
    report = str(tmp_path / "report")

    def run(ck):
        stream = (
            spark.readStream.schema("vec_id long, v array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(indir / "*"))
        )
        q = run_embedding_dedup_stream(
            spark, stream, index, report, str(tmp_path / ck),
            threshold=THRESHOLD, planes=P1, id_col="vec_id", vec_col="v",
            available_now=True,
        )
        q.awaitTermination(180)

    run("ck0")
    idx = spark.read.parquet(index)
    assert {r["corpus_id"] for r in idx.collect()} == {1, 2, 3, 11, 12}
    rep = {
        (r["kind"], r["dup_id"], r["kept_id"])
        for r in spark.read.parquet(report).collect()
    }
    assert rep == {("intra", 13, 12), ("index", 10, 1)}
    idx_rows = sorted(
        (r["corpus_id"], r["_batch_id"]) for r in idx.collect()
    )

    # full replay on a FRESH checkpoint: identical index and report
    run("ck1")
    idx2 = spark.read.parquet(index)
    assert sorted(
        (r["corpus_id"], r["_batch_id"]) for r in idx2.collect()
    ) == idx_rows
    assert {
        (r["kind"], r["dup_id"], r["kept_id"])
        for r in spark.read.parquet(report).collect()
    } == rep

    # restart on the SAME checkpoint: nothing re-processes
    run("ck0")
    assert sorted(
        (r["corpus_id"], r["_batch_id"])
        for r in spark.read.parquet(index).collect()
    ) == idx_rows


def test_compact_cosine_index_is_invisible_to_probes(spark, tmp_path):
    """Folding old batch partitions must not change a single probe
    decision: same pairs before and after, keep_last partitions intact
    (the replay fence still finds them), keep_last<1 rejected."""
    import pytest
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.operators.similarity import (
        compact_cosine_index,
    )

    batch, corpus, _ = _batch_and_corpus(spark)
    path = str(tmp_path / "cidx")
    rows = corpus.collect()
    for b in range(4):
        chunk = spark.createDataFrame(
            [r for i, r in enumerate(rows) if i % 4 == b],
            "vec_id long, v array<double>",
        )
        SIM.build_cosine_bucket_index(
            chunk, path, planes=P1, id_col="vec_id", vec_col="v", batch_id=b
        )
    before = sorted(
        tuple(r)
        for r in SIM.cosine_batch_against_index(
            spark, path, batch, THRESHOLD, planes=P1,
            id_col="vec_id", vec_col="v",
        ).collect()
    )
    compact_cosine_index(spark, path, keep_last=2)
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import read_table
    ids = {
        r["_batch_id"]
        for r in read_table(spark, path).select("_batch_id").distinct().collect()
    }
    # r12 generational fold: 0+1 move to a committed fold generation,
    # the newest two shard batches stay untouched (the replay fence's
    # keep_last contract)
    assert ids == {2, 3}
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import resolve_table
    marked, _ = SIM._fold_state(
        spark, resolve_table(spark, SIM._folded_root(path))
    )
    assert sorted(marked) == [0] and marked[0] == [0, 1]
    after = sorted(
        tuple(r)
        for r in SIM.cosine_batch_against_index(
            spark, path, batch, THRESHOLD, planes=P1,
            id_col="vec_id", vec_col="v",
        ).collect()
    )
    assert after == before
    # partition levels preserved on BOTH tables: the probe's pruning
    # interface survives the fold
    assert "_t" in read_table(spark, path).columns
    assert "_bucket" in read_table(spark, path).columns
    folded_rows = SIM._committed_fold_rows(spark, path)
    assert folded_rows is not None
    assert {"_t", "_bucket"} <= set(folded_rows.columns)
    with pytest.raises(ValueError):
        compact_cosine_index(spark, path, keep_last=0)
