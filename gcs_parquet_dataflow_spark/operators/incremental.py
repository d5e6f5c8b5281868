"""Batch-incremental near-dup dedup against a PERSISTED sketch index —
the operational pattern for continuously-ingested training corpora:
every arriving batch must dedup against everything already accepted
without ever rescanning the accepted corpus text.

The index is a parquet lake table of MinHash LSH bands
(band INT, key ARRAY<BIGINT>, _id BIGINT), partitioned by ``band``.
Matching is the same band-content equi-join as
``dedup.lsh_candidate_pairs`` — a new document collides with an
accepted one iff a whole band matches, so an arriving batch of b docs
costs one scan of the index bucket-joined against b×n_bands rows, never
a text-level comparison.

Scale shape at 100 TB of accepted corpus:

- The index holds sketches, not text: 8 rows × ~40 bytes per accepted
  doc (~0.3% of a 100 KB doc) — billions of docs fit in a few TB of
  parquet.
- The batch side is small; Spark broadcasts it against the index scan,
  so the per-batch cost is one index read + no shuffle of the index.
  Partitioning by ``band`` keeps each join bucket a pruned directory.
- Appends are append-mode parquet writes of the surviving batch's own
  band rows; no rewrite of the index ever happens. Run
  ``sinks.parquet_lake.compact`` on the index periodically like any
  streaming-written lake table.

Reference parity note: the reference (danakock/GCS-Parquet-Dataflow)
has no dedup surface at all — this extends the engine per the
training-data brief (BASELINE.json extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcs_parquet_dataflow_spark.operators.dedup import (
    cap_hot_buckets,
    minhash_bands,
    with_minhash,
)
from gcs_parquet_dataflow_spark.operators.partitioning import (
    persist_intermediate,
)

INDEX_SCHEMA = "band INT, key ARRAY<BIGINT>, _id BIGINT"


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence check — so a MISSING table is distinguishable
    from a transient read error. A bare try/except around the read
    would turn an I/O blip into an empty index/bloom and silently
    disable dedup for the batch (code-review finding, round 7)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def read_index(spark: SparkSession, path: str) -> DataFrame:
    """The current band index; empty-but-typed when nothing is accepted
    yet (first batch bootstraps the table). Real read errors propagate
    — only a provably-absent path maps to the empty index."""
    if not _path_exists(spark, path):
        return spark.createDataFrame([], INDEX_SCHEMA)
    return spark.read.parquet(path)


def _band_key_str(df: DataFrame) -> "F.Column":
    """Canonical string form of a (band, key-array) index entry, the
    bloom-filter insertion/probe key: ``band:k0,k1``. transform() over
    a rows_per_band-length array is a short-array lambda, not a
    per-token path."""
    return F.concat_ws(
        ":",
        F.col("band").cast("string"),
        F.concat_ws(
            ",", F.transform(F.col("key"), lambda x: x.cast("string"))
        ),
    )


_BLOOM_META_FILE = "_bloom_meta.json"


def _bloom_meta_path(spark: SparkSession, path: str):
    """Meta file inside the lake's CURRENT resolved dir — after a
    versioned compact_bloom_lake commit the meta travels with each
    committed version (it is written into the staging dir), so reads
    and the first-batch meta write must resolve the same dir the word
    rows live in."""
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import resolve_table

    jvm = spark._jvm
    return jvm.org.apache.hadoop.fs.Path(
        resolve_table(spark, path) + "/" + _BLOOM_META_FILE
    )


def write_bloom_meta(
    spark: SparkSession, path: str, m_bits: int, k: int
) -> None:
    """Persist the bloom lake's (m_bits, k) alongside the word rows
    (``_``-prefixed, so parquet readers skip it).  The hash space is a
    FUNCTION of these parameters: probing a lake with different ones
    silently yields false negatives — duplicates accepted forever while
    same-parameter tests stay green (ADVICE r7).  The meta file makes
    the parameters part of the lake, validated on every probe."""
    import json as _json

    p = _bloom_meta_path(spark, path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(
            _json.dumps({"m_bits": int(m_bits), "k": int(k)}).encode()
        ))
    finally:
        out.close()


def bloom_lake_has_words(spark: SparkSession, path: str) -> bool:
    """True iff the bloom lake directory holds at least one parquet
    word file.  A dir that exists but carries only ``_bloom_meta.json``
    (a crash between a legacy meta-first write and the word append, or
    an interrupted manual copy) would pass ``_path_exists`` and the
    parameter fence yet fail ``read_bloom`` with "unable to infer
    schema" on EVERY later batch — not self-healing.  The fence calls
    this and routes that state to rebuild_bloom_from_index instead."""
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import resolve_table

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        resolve_table(spark, path) + "/part-*"
    )
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    matches = fs.globStatus(p)
    return matches is not None and len(matches) > 0


def read_bloom_meta(spark: SparkSession, path: str) -> dict | None:
    """(m_bits, k) the lake was built with, or None for a legacy lake
    written before the meta file existed (or a not-yet-created lake)."""
    import json as _json

    p = _bloom_meta_path(spark, path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        raw = bytes(stream.readAllBytes())
    finally:
        stream.close()
    meta = _json.loads(raw.decode())
    return {"m_bits": int(meta["m_bits"]), "k": int(meta["k"])}


def read_bloom(spark: SparkSession, path: str) -> DataFrame:
    """The index's bloom side-table, OR-merged on read: the lake holds
    append-only (word_idx, word) rows — one append per accepted batch —
    and this groupBy/bit_or collapses them to ≤ ⌈m/63⌉ current words
    (bloom_merge semantics: OR is associative, so append-then-merge ≡
    rebuild). Empty-but-typed when the lake is provably absent; real
    read errors propagate (a transient failure must never masquerade
    as an empty filter — that would silently disable index dedup)."""
    from gcs_parquet_dataflow_spark.operators.sketches import bloom_merge
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
        read_table,
        table_exists,
    )

    if not table_exists(spark, path):
        return spark.createDataFrame([], "word_idx BIGINT, word BIGINT")
    return bloom_merge([read_table(spark, path)])


def compact_bloom_lake(spark: SparkSession, path: str) -> None:
    """Offline fold for the incremental-dedup bloom lake: the lake
    accumulates one (word_idx, word) append per accepted batch and
    ``read_bloom`` OR-merges them all on EVERY probe — after ~1e5
    batches that is 1e5 × ⌈m_bits/63⌉ rows re-merged per probe.  OR is
    associative, so folding the appends into the ≤ ⌈m_bits/63⌉ current
    words is exact (the bloom_merge_equivalence oracle row's
    guarantee).

    Crash safety (tightened per ADVICE r9): the fold is staged-and-
    renamed with the ``__bloom_compact_staging`` suffix REGISTERED in
    ``parquet_lake._SWAP_SUFFIXES``, so the delete→rename window heals
    by completing the rename (``recover_staged_swap``, called here and
    by the ``dedup_batch_against_index`` fence) instead of a full
    O(index) ``rebuild_bloom_from_index`` — and the orphaned staging
    dir is consumed rather than leaked.  The (m_bits, k) meta file is
    written INTO the staging before the swap, so no intermediate state
    exists where the lake has words but no meta.  A failed rename
    raises instead of silently leaving the lake absent.  Never an
    intermediate state that silently drops words (a partial bloom
    means false negatives — duplicates accepted forever).  Run between
    stream/batch runs, like ``compact_batch_shards``."""
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
        recover_staged_swap,
        swap_lease,
    )

    from gcs_parquet_dataflow_spark.sinks.parquet_lake import table_exists

    recover_staged_swap(spark, path)
    if not table_exists(spark, path):
        return
    with swap_lease(spark, path, "compact_bloom_lake") as lease:
        meta = read_bloom_meta(spark, path)
        folded = read_bloom(spark, path).localCheckpoint(eager=True)
        staging = path.rstrip("/") + "__bloom_compact_staging"
        folded.write.mode("overwrite").parquet(staging)
        if meta is not None:
            # meta travels inside the staging dir: the swap commits words
            # and parameters together, atomically w.r.t. the rename
            write_bloom_meta(spark, staging, meta["m_bits"], meta["k"])
        lease.commit(staging)


def rebuild_bloom_from_index(
    spark: SparkSession,
    index_path: str,
    bloom_path: str,
    m_bits: int = 2**20,
    k: int | None = None,
) -> None:
    """Bootstrap (or repair) the bloom side-lake from the FULL index —
    the completeness invariant the prefilter's no-false-negative
    argument rests on: every index entry must be in the bloom. Called
    automatically by dedup_batch_against_index when the bloom lake is
    absent but the index is not (a pipeline arming bloom_path after
    history already accumulated), and when the lake's persisted
    (m_bits, k) don't match the caller's — probing across parameters
    hashes into a different bit space and fabricates false negatives.
    Also the manual repair if a bloom append is ever lost. One full
    index scan — the cost the prefilter then saves on every subsequent
    all-novel batch. Writes the (m_bits, k) meta file with the lake."""
    from gcs_parquet_dataflow_spark.operators.sketches import (
        BLOOM_K,
        bloom_build,
    )

    from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
        rewrite_table,
        table_versions,
    )

    k = BLOOM_K if k is None else k
    idx = read_index(spark, index_path)
    built = bloom_build(
        idx.withColumn("_bk", _band_key_str(idx)), "_bk",
        m_bits=m_bits, k=k,
    )
    if not table_versions(spark, bloom_path):
        # flat (or absent) lake: plain overwrite, exactly the legacy
        # bootstrap — no version machinery until maintenance starts
        built.write.mode("overwrite").parquet(bloom_path)
        write_bloom_meta(spark, bloom_path, m_bits, k)
        return

    # versioned lake (a compact_bloom_lake ran at least once): an
    # in-place overwrite of the resolved version dir would tear the
    # committed version under concurrent readers — rebuild through the
    # same reader-atomic version flip as every maintenance commit,
    # with the meta written INTO the staging (words + parameters
    # commit together, the r9 invariant)
    def _write(staging: str) -> None:
        built.write.mode("overwrite").parquet(staging)
        # staging has no versions, so the meta path resolves to it
        write_bloom_meta(spark, staging, m_bits, k)

    rewrite_table(
        spark, bloom_path, _write, "rebuild_bloom_from_index",
        staging_suffix="__bloom_rebuild_staging",
    )


def dedup_batch_against_index(
    spark: SparkSession,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    perms: list[tuple[int, int]],
    k: int = 3,
    rows_per_band: int = 2,
    max_bucket_size: int | None = None,
    bloom_path: str | None = None,
    bloom_m_bits: int = 2**20,
) -> DataFrame:
    """Dedup ``batch`` against the accepted corpus AND itself, then
    append the survivors' bands to the index. Returns the surviving
    rows of ``batch`` (all original columns).

    Drop rule (conservative-greedy, the standard incremental choice):
    a document is dropped if any band collides with the index, or with
    a SMALLER id in the same batch — so of an intra-batch duplicate
    group the min id survives; chains (a~b~c with a<b<c but a!~c) drop
    the whole tail, trading a little recall of borderline docs for a
    single-pass rule with no iterative clustering.

    Documents with fewer than ``k`` tokens have no shingles, therefore
    no bands: they always survive and add nothing to the index
    (matching ``with_minhash``'s drop-out semantics).

    ``max_bucket_size`` arms the hot-bucket guard on the MATCH side
    only (``dedup.cap_hot_buckets`` over the batch's band table —
    bounds the intra-batch Σ|bucket|² self-join against a boilerplate
    batch); the index APPEND always writes the full band rows so the
    index stays complete for uncapped consumers. A mass-duplicated
    batch (every member in hot buckets) then passes the near-dup
    stage — run ``exact_dedup`` upstream for verbatim copies, as the
    pipeline recipes do.

    ``bloom_path`` arms the Bloom prefilter (EQUIVALENT results, less
    index I/O): a (word_idx, word) side-lake holds a bloom of every
    accepted index entry's band:key string (appended per batch,
    OR-merged on read). Arriving probes that fail the bloom provably
    cannot collide with the index (no false negatives), so only
    bloom-passing probes join the index scan — and a batch with ZERO
    passing probes (the common all-novel case) skips even OPENING the
    index (no file listing, no scan). At 100 TB: the bloom is ⌈m/63⌉
    words (a 2^30-bit filter ≈ 136 MB) against an index of billions of
    band rows; sizing rule ~12 bits per accepted index entry for ~1%
    false-probe rate.

    Completeness invariant (the no-false-negative argument needs EVERY
    index entry in the bloom): if the bloom lake is absent while the
    index is not — a pipeline arming bloom_path after history already
    accumulated — the bloom is bootstrapped from the full index first
    (rebuild_bloom_from_index); and the per-batch bloom append is
    written BEFORE the index append, so a crash between the two leaves
    the bloom a superset of the index (false positives only — safe),
    never a subset. Equivalence with the unfiltered path is pinned by
    tests/test_round7.py::test_bloom_prefilter_equivalent_dedup.
    """
    from gcs_parquet_dataflow_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    sigs = with_minhash(batch, id_col, text_col, perms, k=k, out="sig")
    bands = persist_intermediate(minhash_bands(sigs, id_col, "sig", rows_per_band))
    probe = bands
    if max_bucket_size is not None:
        probe = persist_intermediate(
            cap_hot_buckets(
                bands, ["band", "key"], max_bucket_size,
                metric_name="incremental_bands",
            )
        )

    index_probe = probe
    skip_index = False
    if bloom_path is not None:
        from gcs_parquet_dataflow_spark.operators.sketches import BLOOM_K
        from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
            recover_staged_swap,
        )

        # a crashed compact_bloom_lake swap leaves the lake absent with
        # the fold (words + meta) in staging — completing the rename
        # here costs one exists-check and avoids the O(index) rebuild
        # the absent-lake branch would otherwise run
        from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
            table_exists,
        )

        recover_staged_swap(spark, bloom_path)
        if not table_exists(spark, bloom_path):
            if _path_exists(spark, index_path):
                rebuild_bloom_from_index(
                    spark, index_path, bloom_path,
                    m_bits=bloom_m_bits, k=BLOOM_K,
                )
        else:
            # parameter fence (ADVICE r7): probing a lake built with
            # different (m_bits, k) hashes into a different bit space →
            # silent false negatives, duplicates accepted forever.
            # Legacy lake (no meta) or mismatch → rebuild from the
            # index with the CALLER's parameters, restoring the
            # completeness invariant, then record them.  A dir with
            # meta but NO word parquet (legacy meta-first crash state,
            # ADVICE r8) also rebuilds — read_bloom would otherwise
            # fail unrecoverably on it.
            meta = read_bloom_meta(spark, bloom_path)
            if meta is None or meta != {
                "m_bits": int(bloom_m_bits), "k": int(BLOOM_K)
            } or not bloom_lake_has_words(spark, bloom_path):
                rebuild_bloom_from_index(
                    spark, index_path, bloom_path,
                    m_bits=bloom_m_bits, k=BLOOM_K,
                )
        bloom = read_bloom(spark, bloom_path)
        keyed = probe.withColumn("_bk", _band_key_str(probe))
        passed = bloom_probe(
            keyed.select("band", "key", "_id", "_bk"),
            bloom,
            "_bk",
            m_bits=bloom_m_bits,
        )
        index_probe = persist_intermediate(
            passed.filter(F.col("bloom_pass")).drop("bloom_pass", "_bk")
        )
        # all-novel fast path: nothing can collide -> don't read the index
        skip_index = index_probe.limit(1).count() == 0

    if skip_index:
        # type-exact empty relation derived from the probe plan itself —
        # Catalyst prunes it, and the index is never listed or scanned
        vs_index = probe.select(F.col("_id").alias(id_col)).limit(0)
    else:
        index = read_index(spark, index_path)
        vs_index = (
            F.broadcast(index_probe)
            .join(index.select("band", "key"), ["band", "key"], "left_semi")
            .select(F.col("_id").alias(id_col))
            .distinct()
        )

    l, r = probe.alias("l"), probe.alias("r")
    vs_batch = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l._id") > F.col("r._id")),
            "left_semi",
        )
        .select(F.col("_id").alias(id_col))
        .distinct()
    )

    # Freeze the drop DECISION before any write — and persist() is NOT
    # a freeze here: everything below appends to index_path/bloom_path,
    # and Spark's recacheByPath actively RE-materializes any cached plan
    # that references a written path with a fresh file listing, so a
    # persisted dropped set silently absorbs THIS batch's own appended
    # bands and self-collides every survivor (observed both as the
    # partially-materialized probe finishing after the appends and as a
    # persisted+counted set being recached). localCheckpoint cuts the
    # lineage to the paths entirely; the set is ≤|batch| ids.
    dropped = (
        vs_index.unionByName(vs_batch).distinct().localCheckpoint(eager=True)
    )
    survivors = batch.join(dropped, id_col, "left_anti")

    new_rows = bands.join(
        dropped.withColumnRenamed(id_col, "_id"), "_id", "left_anti"
    ).select("band", "key", "_id")
    if bloom_path is not None:
        # two actions consume new_rows (bloom write + index write) —
        # persist so the second never re-runs the dedup joins
        new_rows = persist_intermediate(new_rows)
        # bloom BEFORE index: a crash between the writes leaves the
        # bloom a superset (extra false positives, still correct);
        # index-first would leave un-bloomed index entries = permanent
        # false negatives. Readers OR-merge, so append ≡ rebuild.
        from gcs_parquet_dataflow_spark.operators.sketches import BLOOM_K
        from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
            resolve_table,
        )

        # append into the RESOLVED dir: after the first versioned
        # compact/rebuild the flat path is a retained stale copy, and
        # words appended there would be invisible to read_bloom —
        # false negatives, duplicates accepted forever
        bloom_build(
            new_rows.withColumn("_bk", _band_key_str(new_rows)),
            "_bk",
            m_bits=bloom_m_bits,
        ).write.mode("append").parquet(resolve_table(spark, bloom_path))
        # meta AFTER the word append (ADVICE r8): a meta-FIRST write on
        # the lake's first batch opened a non-self-healing crash window
        # — a directory holding only _bloom_meta.json passes the
        # exists + parameter-fence checks, then read_bloom's parquet
        # read fails ("unable to infer schema") on every later batch
        # until manual repair.  Words-then-meta leaves the crash window
        # at meta=None, which the fence already repairs via
        # rebuild_bloom_from_index (same parquet-then-meta order that
        # function uses).  Idempotent: only the first batch writes it.
        if read_bloom_meta(spark, bloom_path) is None:
            write_bloom_meta(spark, bloom_path, bloom_m_bits, BLOOM_K)
    new_rows.write.mode("append").partitionBy("band").parquet(index_path)
    return survivors


# ---------------------------------------------------------------------------
# Generic incremental-maintenance building blocks: snapshot diff (CDC
# read / change-data-feed between two materialized states) and partial-
# aggregate merge (incremental rollup maintenance without rescans).
# ---------------------------------------------------------------------------


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Change rows between two snapshots of the same keyed table →
    (keys…, change_type ∈ {insert, delete, update}, old_<c>…, new_<c>…).

    The change-data-feed read for a lake without a transaction log:
    one full-outer equi-join on the key (both sides shuffle-partitioned
    by the same key — co-located at any scale), null-safe column
    comparison, unchanged rows dropped. Feed the output to
    ``parquet_lake.upsert``-style appliers or downstream incremental
    consumers. Pair with ``parquet_lake.read_version`` to diff two
    committed snapshot versions (tests/test_parquet_lake.py).
    """
    non = [c for c in old.columns if c not in keys]
    if old.columns != new.columns:
        raise ValueError("snapshot schemas differ")
    o = old.select(
        *keys,
        F.lit(1).alias("_po"),
        *[F.col(c).alias(f"old_{c}") for c in non],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("_pn"),
        *[F.col(c).alias(f"new_{c}") for c in non],
    )
    j = o.join(n, keys, "full_outer")
    changed = F.lit(False)
    for c in non:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    ct = (
        F.when(F.col("_pn").isNull(), F.lit("delete"))
        .when(F.col("_po").isNull(), F.lit("insert"))
        .when(changed, F.lit("update"))
    )
    return (
        j.withColumn("change_type", ct)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[f"old_{c}" for c in non],
            *[f"new_{c}" for c in non],
        )
    )


def merge_partial_aggs(
    parts: list[DataFrame],
    keys: list[str],
    count_col: str = "n",
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """Combine per-shard partial aggregates (counts + sums) into the
    rollup of the union — incremental materialized-aggregate
    maintenance: when a new partition of raw data lands, aggregate ONLY
    the new partition and merge it with the stored rollup; the old raw
    data is never rescanned. Counts and sums are the mergeable carriers
    — averages/rates are recovered at read time (sum/n), exactly, which
    is why the stored state holds sums, never averages."""
    if not parts:
        raise ValueError("no partial aggregates to merge")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    sums = sum_cols or [
        c for c in u.columns if c not in keys and c != count_col
    ]
    return u.groupBy(*keys).agg(
        F.sum(count_col).cast("long").alias(count_col),
        *[F.sum(c).cast("long").alias(c) for c in sums],
    )
