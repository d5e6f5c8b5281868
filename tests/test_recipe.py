"""Recipe-compiler tests: compiled(recipe) must equal the manual
composition of the underlying operators, and malformed recipes must
fail at compile time (before any job runs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.catalog import load_table
from gcs_parquet_dataflow_spark.functions import text as TX
from gcs_parquet_dataflow_spark.operators import dedup as DD
from gcs_parquet_dataflow_spark.operators.sampling import hash_split
from gcs_parquet_dataflow_spark.plans.recipe import (
    RecipeError,
    compile_recipe,
    load_recipe,
)

pytestmark = pytest.mark.fast  # driver quick-gate module (r13)


RECIPE_JSON = """
[
  {"op": "length_gate", "min_chars": 20},
  {"op": "quality_gate", "min_score": 0.3},
  {"op": "dedup_exact"},
  {"op": "dedup_minhash", "num_perm": 16, "seed": 7},
  {"op": "pii_scrub"},
  {"op": "token_stats"},
  {"op": "split", "fractions": {"train": 0.9, "val": 0.1}}
]
"""


def test_compiled_recipe_equals_manual_composition(spark):
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = compile_recipe(d, load_recipe(RECIPE_JSON))

    # the same stages, composed by hand from the operators themselves
    m = d.filter(F.length("text") >= 20)
    m = m.filter(TX.quality_score(F.col("text")) >= 0.3)
    m = DD.exact_dedup(m, ["text"], "doc_id")
    sigs = DD.with_minhash(m, "doc_id", "text", DD.minhash_perms(16, seed=7))
    losers = (
        DD.lsh_candidate_pairs(sigs, "doc_id", "sig")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    m = m.join(losers, "doc_id", "left_anti")
    m = m.withColumn("text", TX.scrub_pii(F.col("text")))
    m = m.withColumn("n_tokens", TX.token_count(F.col("text")))
    m = hash_split(
        m, F.col("doc_id").cast("string"), {"train": 0.9, "val": 0.1}
    )

    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, m.collect()))
    assert a == b and len(a) > 100
    assert got.columns == m.columns


def test_recipe_validation_fails_fast(spark):
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(RecipeError, match="unknown op"):
        compile_recipe(d, [{"op": "summon_gpu"}])
    with pytest.raises(RecipeError, match="missing param"):
        compile_recipe(d, [{"op": "quality_gate"}])
    with pytest.raises(RecipeError, match="missing 'op'"):
        compile_recipe(d, [{"min_chars": 5}])
    with pytest.raises(RecipeError, match="JSON list"):
        load_recipe('{"op": "split"}')


def test_recipe_scan_stages_fuse_into_one_python_free_plan(spark):
    """The scan-stage subset (gates, scrub, stats, split) compiles to a
    single Python-free codegen pass — no joins, no shuffles."""
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = compile_recipe(
        d,
        [
            {"op": "html_extract"},
            {"op": "length_gate", "min_chars": 10},
            {"op": "quality_gate", "min_score": 0.2},
            {"op": "pii_scrub"},
            {"op": "token_stats"},
            {"op": "sample", "fraction": 0.5},
            {"op": "split", "fractions": {"train": 0.8, "val": 0.2}},
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Exchange", "Join"):
        assert bad not in plan, bad


def test_streamable_recipe_matches_batch_and_rejects_corpus_stages(
    spark, tmp_path
):
    """Batch/stream parity: the same streamable recipe over the same
    docs produces identical rows whether run in batch or as micro-
    batches; corpus-level stages are rejected before the stream
    starts."""
    from gcs_parquet_dataflow_spark.catalog import load_table
    from gcs_parquet_dataflow_spark.plans.recipe import (
        compile_recipe,
        run_recipe_stream,
        validate_streamable,
    )

    recipe = [
        {"op": "length_gate", "min_chars": 30},
        {"op": "pii_scrub"},
        {"op": "token_stats"},
        {"op": "split", "fractions": {"train": 0.9, "val": 0.1}},
    ]
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    indir = tmp_path / "in"
    indir.mkdir()
    d.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(indir / "b0")
    )
    d.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(indir / "b1")
    )
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir / "*"))
    )
    q = run_recipe_stream(
        stream, recipe, str(tmp_path / "out"), str(tmp_path / "ck"),
        available_now=True,
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(str(tmp_path / "out")).drop("_batch_id")
    batch = compile_recipe(d, recipe)
    assert sorted(map(tuple, streamed.select(*batch.columns).collect())) == \
        sorted(map(tuple, batch.collect()))

    with pytest.raises(Exception, match="not streamable"):
        validate_streamable(recipe + [{"op": "dedup_minhash"}])


def test_encoding_gate_and_curriculum_stages(spark):
    """Round-5 stages: the encoding gate drops exactly the damaged
    docs; curriculum_annotate adds deterministic stage + shuffle-key
    columns; both run per micro-batch (streamable set)."""
    from pyspark.sql import functions as F

    from gcs_parquet_dataflow_spark.plans.recipe import (
        STREAMABLE_STAGES,
        compile_recipe,
    )

    df = spark.createDataFrame(
        [
            (1, "clean text with enough words here"),
            (2, "lossy decode � inside"),
            (3, "double decoded cafÃ© here"),
            (4, "another clean document text"),
        ],
        "doc_id long, text string",
    )
    out = compile_recipe(
        df,
        [
            {"op": "encoding_gate"},
            {"op": "curriculum_annotate", "hi": 0.9, "lo": 0.2},
        ],
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 4}  # 2 (U+FFFD) and 3 (mojibake) gated
    for r in rows.values():
        assert r["stage"] in (1, 2, 3)
        assert isinstance(r["shuffle_key"], int)
    # deterministic: same input -> same shuffle keys
    again = {r["doc_id"]: r["shuffle_key"] for r in out.collect()}
    assert {k: v["shuffle_key"] for k, v in rows.items()} == again
    assert "encoding_gate" in STREAMABLE_STAGES
    assert "curriculum_annotate" in STREAMABLE_STAGES


def test_gopher_and_c4_stages_compose(spark):
    """The canonical-filter stages compose in a recipe and match the
    manual operator calls (the recipe compiler's core guarantee)."""
    from gcs_parquet_dataflow_spark.functions.text import (
        gopher_quality_flags,
    )
    from gcs_parquet_dataflow_spark.plans.recipe import compile_recipe
    from pyspark.sql import functions as F

    good = (
        "the quick brown fox jumps over the lazy dog and that is fine "
        * 5
    ).strip()
    docs = spark.createDataFrame(
        [
            (1, good + " to be of use here today with more words added."),
            (2, "tiny doc"),
            (3, good + " ##################### lots of hash spam"),
        ],
        "doc_id long, text string",
    )
    out = compile_recipe(docs, [{"op": "gopher_gate"}])
    got = sorted(r["doc_id"] for r in out.collect())
    want = sorted(
        r["doc_id"]
        for r in docs.filter(
            gopher_quality_flags(F.col("text")).getField("pass_gopher")
        ).collect()
    )
    assert got == want and got == [1]

    c4docs = spark.createDataFrame(
        [
            (1, "A good first sentence lives here.\nmenu\n"
                "A second proper sentence follows along.\n"
                "A third one completes the page now."),
            (2, "short\nlines\nonly"),
        ],
        "doc_id long, text string",
    )
    out2 = compile_recipe(c4docs, [{"op": "c4_line_clean"}]).collect()
    assert [r["doc_id"] for r in out2] == [1]
    assert "menu" not in out2[0]["text"]
    # streamability declared (pure per-row stages)
    from gcs_parquet_dataflow_spark.plans.recipe import validate_streamable

    validate_streamable(
        [{"op": "gopher_gate"}, {"op": "c4_line_clean"}]
    )


def test_capstone_recipe_equals_training_data_pipeline_v5(spark):
    """VERDICT r5 item 6: the declarative layer covers the engine's
    own flagship — the v5 scheduling chain (encoding gate → token
    stats → quality → curriculum → epoch allocation → top-50
    manifest), expressed as ONE recipe JSON, must produce EXACTLY the
    training_data_pipeline_v5 catalog row's output on the same
    planted input."""
    import json as _json

    from gcs_parquet_dataflow_spark.plans.recipe import (
        compile_recipe,
        load_recipe,
    )
    from gcs_parquet_dataflow_spark.queries.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    expected = sorted(
        tuple(r) for r in CATALOG["training_data_pipeline_v5"]
        .build(spark, sf).collect()
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    # the same planted mojibake injection the catalog row applies
    injected = docs.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 17 == 0,
            F.concat(F.col("text"), F.lit(" cafÃ© na�ve")),
        ).otherwise(F.col("text")).alias("text"),
    )
    recipe = load_recipe(_json.dumps([
        {"op": "encoding_gate"},
        {"op": "token_stats", "out": "n_tokens"},
        {"op": "quality_annotate", "out": "quality"},
        {"op": "curriculum_annotate", "hi": 0.75, "lo": 0.5,
         "out": "stage", "shuffle_out": "shuffle_key"},
        {"op": "epoch_allocation", "max_extra": 3, "out": "epochs"},
        {"op": "manifest", "top_k": 50, "out": "position"},
    ]))
    got = sorted(
        tuple(r)
        for r in compile_recipe(injected, recipe)
        .select(
            "position",
            "doc_id",
            "source",
            F.col("stage").cast("long").alias("stage"),
            "quality",
            "n_tokens",
            F.col("epochs").cast("long").alias("epochs"),
        )
        .collect()
    )
    assert got == expected


def test_capstone_recipe_file_compiles_and_runs(spark):
    """The shipped recipes/full_curation_v1.json (the full v4+v5
    chain: extract → decontaminate → gates → curriculum → allocation →
    DISTRIBUTED manifest) compiles and runs end-to-end; positions are
    a dense 1..N and benchmark members are gone."""
    import os

    from gcs_parquet_dataflow_spark.plans.recipe import (
        compile_recipe,
        load_recipe,
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "recipes",
        "full_curation_v1.json",
    )
    with open(path) as f:
        recipe = load_recipe(f.read())
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("text").isNotNull())
    out = compile_recipe(docs, recipe)
    rows = out.select("doc_id", "position", "stage", "epochs").collect()
    assert rows
    positions = sorted(r["position"] for r in rows)
    assert positions == list(range(1, len(rows) + 1))
    assert all(r["doc_id"] % 17 != 0 for r in rows)  # decontaminated
    assert {r["stage"] for r in rows} <= {1, 2, 3}
    assert all(1 <= r["epochs"] <= 4 for r in rows)


def test_quota_per_key_stage_equals_operator(spark):
    """The quota_per_key stage ≡ the operator composed by hand, and
    the cap actually binds (≤ n rows per key, deterministic pick)."""
    from gcs_parquet_dataflow_spark.functions.text import hash32
    from gcs_parquet_dataflow_spark.operators.sampling import quota_per_key

    d = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("text").isNotNull()
    )
    got = compile_recipe(
        d, [{"op": "quota_per_key", "key": "source", "n": 7}]
    )
    want = quota_per_key(
        d, ["source"], 7, [hash32(F.col("text")), F.col("doc_id")]
    )
    a = sorted(r["doc_id"] for r in got.collect())
    b = sorted(r["doc_id"] for r in want.collect())
    assert a == b and len(a) > 0
    per_key = got.groupBy("source").count().collect()
    assert all(r["count"] <= 7 for r in per_key)


def test_decontaminate_semantic_stage_equals_operator(spark):
    """The decontaminate_semantic stage (r12) ≡ the similarity
    operator composed by hand — on a frame carrying an embedding
    column, with the benchmark selected out of the corpus itself
    (members drop at cosine 1 by construction) and via a parquet
    path."""
    from gcs_parquet_dataflow_spark.operators import similarity as SIM
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    try:
        recipe = [
            {
                "op": "decontaminate_semantic",
                "benchmark_filter": "doc_id % 7 = 0",
                "threshold": 0.98,
                "n_planes": 8,
                "dim": 64,
                "max_bucket_size": 256,
            }
        ]
        got = compile_recipe(e, recipe)
        planes = SIM.hyperplanes(n_planes=8, dim=64, seed=13)
        bench = e.filter(F.expr("doc_id % 7 = 0")).select(
            "doc_id", "embedding"
        )
        manual = SIM.decontaminate_semantic(
            e, bench, 0.98, planes=planes, id_col="doc_id",
            vec_col="embedding", max_bucket_size=256,
        )
        a = sorted(r["doc_id"] for r in got.collect())
        b = sorted(r["doc_id"] for r in manual.collect())
        assert a == b and len(a) > 0
        # members of the in-corpus benchmark dropped themselves
        assert all(i % 7 != 0 for i in a)

        # and the parquet-path form agrees with the filter form
        import tempfile, os

        with tempfile.TemporaryDirectory() as td:
            bp = os.path.join(td, "bench")
            bench.write.parquet(bp)
            got_path = compile_recipe(
                e,
                [
                    {
                        "op": "decontaminate_semantic",
                        "benchmark_path": bp,
                        "max_bucket_size": 256,
                    }
                ],
            )
            assert sorted(r["doc_id"] for r in got_path.collect()) == a

        # missing benchmark fails at stage-compile time
        with pytest.raises(RecipeError, match="decontaminate_semantic"):
            compile_recipe(e, [{"op": "decontaminate_semantic"}])
    finally:
        release_intermediates()
