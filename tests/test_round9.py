"""Round-9 guard tests.

1. ADVICE r8 (medium): the bloom lake's meta file is written AFTER the
   word append, and a legacy meta-only directory (the old meta-first
   crash window) self-heals via rebuild instead of failing every batch.
2. VERDICT r8 item 2: the baseline-JPEG test debt — encoder on-wire
   spec conformance against hand-computed Huffman arithmetic, the
   AC/general-content and ZRL/EOB paths, restart-interval streams, and
   malformed-payload DLQ.  These are the tests media_jpeg_decode's
   docstring promises, so a matched encoder/decoder bug pair cannot
   cancel invisibly.
3. ADVICE r8 (low): superseded ER-stream bloom partitions are pruned
   (asserted inside test_round8's equivalence test, which pins the
   surviving-partition set).
4. VERDICT r8 item 1 (the accumulator-overflow audit): expression-level
   pins proving every DECIMAL(38,0)-converted sum-of-products exact
   past 2^63 (*_past_int64), incl. the operand-cast-vs-product-cast
   distinction and cm_join_size's decimal estimate.
5. VERDICT r8 item 5: run_aqp_stream ≡ the batch aqp_sample_sum_ci row
   across arbitrary batch splits; checkpoint restarts reprocess
   nothing.
6. ADVICE r8 closure: the DP noisy-threshold release (key-set
   membership decided by the protecting noise; values of survivors
   untouched).
7. Round-9 state-lake lifecycle: ER golden-snapshot pruning,
   golden_mode='log' equivalence + compact_golden_log,
   compact_batch_shards (AQP end-to-end, decimal dtype survival,
   key-only distinct fold, heavy-hitter end-to-end),
   compact_bloom_lake fold invisibility.
8. run_rtbf_stream: streaming erasure propagation across versioned
   lakes with the audit-partition replay fence.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r8 (medium): bloom meta ordering + legacy crash-state self-heal.
# ---------------------------------------------------------------------------


def _sentence(tag):
    return " ".join(f"{tag}w{j}" for j in range(12))


def test_bloom_lake_words_and_meta_both_land_on_first_batch(spark, tmp_path):
    """A clean first armed batch leaves the lake complete: word parquet
    AND the (m_bits, k) meta file both present (words are written
    first, so every crash state is self-healing — see next test)."""
    from gcs_parquet_dataflow_spark.operators.dedup import minhash_perms
    from gcs_parquet_dataflow_spark.operators.incremental import (
        bloom_lake_has_words,
        dedup_batch_against_index,
        read_bloom_meta,
    )
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )
    from gcs_parquet_dataflow_spark.operators.sketches import BLOOM_K

    perms = minhash_perms(num_perm=16, seed=7)
    idx, bloom = str(tmp_path / "idx"), str(tmp_path / "bloom")
    b1 = spark.createDataFrame(
        [(i, _sentence(f"u{i}")) for i in range(3)],
        "doc_id long, text string",
    )
    s1 = dedup_batch_against_index(
        spark, b1, "doc_id", "text", idx, perms,
        bloom_path=bloom, bloom_m_bits=2**20,
    )
    assert s1.count() == 3
    release_intermediates()
    assert bloom_lake_has_words(spark, bloom)
    assert read_bloom_meta(spark, bloom) == {"m_bits": 2**20, "k": BLOOM_K}


def test_bloom_meta_only_dir_self_heals(spark, tmp_path):
    """The legacy meta-FIRST crash window (ADVICE r8): a bloom dir
    holding only _bloom_meta.json passes the exists check and the
    parameter fence, and read_bloom's parquet read then failed on
    every subsequent batch — not self-healing.  The fence must now
    detect the word-less lake, rebuild from the index, and still drop
    the cross-batch duplicate."""
    from gcs_parquet_dataflow_spark.operators.dedup import minhash_perms
    from gcs_parquet_dataflow_spark.operators.incremental import (
        bloom_lake_has_words,
        dedup_batch_against_index,
        write_bloom_meta,
    )
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )
    from gcs_parquet_dataflow_spark.operators.sketches import BLOOM_K

    perms = minhash_perms(num_perm=16, seed=7)
    idx, bloom = str(tmp_path / "idx"), str(tmp_path / "bloom")

    # history accumulates WITHOUT the prefilter armed
    b1 = spark.createDataFrame(
        [(i, _sentence(f"u{i}")) for i in range(4)],
        "doc_id long, text string",
    )
    s1 = dedup_batch_against_index(spark, b1, "doc_id", "text", idx, perms)
    assert s1.count() == 4
    release_intermediates()

    # simulate the legacy crash: meta lands, word parquet never did —
    # parameters MATCH the caller's, so the old fence saw nothing wrong
    write_bloom_meta(spark, bloom, 2**20, BLOOM_K)
    assert not bloom_lake_has_words(spark, bloom)

    # duplicate of doc 2 + one fresh doc: the armed batch must not
    # crash, must rebuild the bloom from the index, and must drop the
    # duplicate (completeness restored, no false negative)
    b2 = spark.createDataFrame(
        [(100, _sentence("u2")), (101, _sentence("fresh"))],
        "doc_id long, text string",
    )
    s2 = dedup_batch_against_index(
        spark, b2, "doc_id", "text", idx, perms,
        bloom_path=bloom, bloom_m_bits=2**20,
    )
    assert sorted(r["doc_id"] for r in s2.collect()) == [101]
    release_intermediates()
    assert bloom_lake_has_words(spark, bloom)


# ---------------------------------------------------------------------------
# VERDICT r8 item 2(a): encoder spec-conformance — the on-wire entropy
# bytes of known blocks vs Huffman/magnitude arithmetic computed HERE,
# independently of _jpeg_encode_block/_BitWriter.
# ---------------------------------------------------------------------------


class _SpecBits:
    """Test-local bit accumulator: JPEG spec arithmetic only (MSB-first,
    0xFF byte stuffing, 1-padding at flush) — deliberately independent
    of the package's _BitWriter."""

    def __init__(self):
        self.bits = ""

    def put(self, length, value):
        self.bits += format(value, "b").zfill(length)[-length:]

    def tobytes(self):
        s = self.bits + "1" * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(s), 8):
            b = int(s[i : i + 8], 2)
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


def _spec_dc_code(category):
    # encoder DC table: symbols 0..11, ALL at code length 5, canonical
    # order ⇒ code value == symbol value
    return 5, category


def _spec_ac_code(run, size):
    # encoder AC table: [EOB, ZRL, (r,s) for r in 0..15, s in 1..10],
    # ALL at code length 8, canonical ⇒ code value == list index
    if (run, size) == (0, 0):
        return 8, 0
    if (run, size) == (15, 0):
        return 8, 1
    return 8, 2 + run * 10 + (size - 1)


def _spec_magnitude(v):
    size = 0
    a = abs(v)
    while a:
        size += 1
        a >>= 1
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _entropy_section(payload: bytes) -> bytes:
    """Entropy bytes between the SOS header and EOI."""
    i = payload.index(b"\xff\xda")
    size = struct.unpack_from(">H", payload, i + 2)[0]
    assert payload[-2:] == b"\xff\xd9"
    return payload[i + 2 + size : -2]


def test_jpeg_encoder_onwire_spec_conformance():
    """Two-block grayscale (16×8, v=130 then v=126): the encoder's
    on-wire entropy bytes must equal the hand-computed spec stream —
    DC category 2 with magnitude bits '10', then a NEGATIVE diff in
    one's-complement form (category 3, bits 011), each followed by EOB,
    padded with 1s.  Pins canonical code assignment, the magnitude-bit
    convention for negatives, DC prediction across blocks, and flush
    padding — independently of the decoder."""
    from gcs_parquet_dataflow_spark.operators.multimodal import (
        encode_baseline_jpeg,
    )

    y = np.empty((8, 16), dtype=np.int64)
    y[:, :8] = 130
    y[:, 8:] = 126
    payload = encode_baseline_jpeg(y)  # q_dc=8 → quant DC = v − 128

    spec = _SpecBits()
    # block 1: DC quant 2, pred 0 → diff +2 → category 2, bits '10'
    size, bits = _spec_magnitude(2)
    assert (size, bits) == (2, 2)
    spec.put(*_spec_dc_code(size))
    spec.put(size, bits)
    spec.put(*_spec_ac_code(0, 0))  # constant block → EOB immediately
    # block 2: DC quant −2, pred 2 → diff −4 → category 3, bits
    # −4 + (1<<3) − 1 = 3 = '011' (spec one's-complement form)
    size, bits = _spec_magnitude(-4)
    assert (size, bits) == (3, 3)
    spec.put(*_spec_dc_code(size))
    spec.put(size, bits)
    spec.put(*_spec_ac_code(0, 0))

    assert _entropy_section(payload) == spec.tobytes()


def test_jpeg_encode_block_zrl_and_ac_runs():
    """The AC path's edge shapes, against independent spec arithmetic:
    a 19-zero run must emit ZRL(16) + (run=3, size) — never a bare
    run > 15 — and a trailing zero tail must emit EOB; a block whose
    LAST coefficient is nonzero must emit no EOB."""
    from gcs_parquet_dataflow_spark.operators.multimodal import (
        _BitWriter,
        _jpeg_encode_block,
    )

    # coeffs: DC 5, then 19 zeros, AC +3 at index 20, zero tail
    coeffs = [5] + [0] * 19 + [3] + [0] * 43
    bw = _BitWriter()
    pred = _jpeg_encode_block(bw, coeffs, 0)
    assert pred == 5

    spec = _SpecBits()
    size, bits = _spec_magnitude(5)  # DC diff +5 → category 3, '101'
    spec.put(*_spec_dc_code(size))
    spec.put(size, bits)
    spec.put(*_spec_ac_code(15, 0))  # ZRL eats 16 zeros
    size, bits = _spec_magnitude(3)  # remaining run 3, value 3 → size 2
    spec.put(*_spec_ac_code(3, size))
    spec.put(size, bits)
    spec.put(*_spec_ac_code(0, 0))  # EOB for the tail
    assert bw.flush() == spec.tobytes()

    # last coefficient nonzero → no EOB on the wire
    coeffs2 = [0] * 63 + [-1]
    bw2 = _BitWriter()
    _jpeg_encode_block(bw2, coeffs2, 0)
    spec2 = _SpecBits()
    spec2.put(*_spec_dc_code(0))  # DC diff 0 → category 0, no bits
    spec2.put(*_spec_ac_code(15, 0))  # 62 zeros = 3×ZRL + run 14
    spec2.put(*_spec_ac_code(15, 0))
    spec2.put(*_spec_ac_code(15, 0))
    size, bits = _spec_magnitude(-1)  # → category 1, bits 0
    spec2.put(*_spec_ac_code(14, size))
    spec2.put(size, bits)
    assert bw2.flush() == spec2.tobytes()


# ---------------------------------------------------------------------------
# VERDICT r8 item 2(b): encode→decode round-trips OUTSIDE the lossless
# DC corner — non-constant content with a quantization-error bound, the
# color paths, and a restart-interval stream.
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_nonconstant_grayscale_error_bound():
    """General-content round-trip: deterministic non-constant 16×16
    grayscale exercises real AC coefficients through FDCT → quant →
    Huffman → decode → IDCT.  Reconstruction error is bounded by
    quantization: each coefficient is off by ≤ q/2 (q_ac=16, q_dc=8)
    and the IDCT is orthonormal, so per-pixel error stays small; the
    bound here (≤ q_ac) is ~2× the observed max for this fixture —
    deterministic, not statistical."""
    from gcs_parquet_dataflow_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_baseline_jpeg,
    )

    i, j = np.mgrid[0:16, 0:16]
    y = ((3 * i + 5 * j) * 7 + 11) % 200 + 20  # in-gamut, non-constant
    px = decode_jpeg_pixels(encode_baseline_jpeg(y))
    assert px.shape == (16, 16)
    err = np.abs(px.astype(np.int64) - y)
    assert err.max() <= 16
    assert err.mean() <= 6


def test_jpeg_roundtrip_color_444_and_420():
    """4:4:4 non-constant color round-trips within the quantization
    bound in YCbCr space; 4:2:0 with 16×16-constant tiles reconstructs
    the oracle row's closed form EXACTLY (the lossless corner, now
    pinned at unit level too)."""
    from gcs_parquet_dataflow_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_baseline_jpeg,
    )

    i, j = np.mgrid[0:16, 0:16]
    yp = 40 + 3 * i + 5 * j  # smooth in-gamut ramp (max 160)
    cb = np.full((16, 16), 120, dtype=np.int64)
    cr = np.full((16, 16), 132, dtype=np.int64)
    rgb = decode_jpeg_pixels(encode_baseline_jpeg(yp, cb, cr))
    assert rgb.shape == (16, 16, 3)
    # invert the decoder's fixed-point color transform back to Y and
    # compare against the encoder input (chroma constant → exact)
    wide = rgb.astype(np.int64)  # uint8 would wrap under the weights
    y_back = (
        299 * wide[:, :, 0] + 587 * wide[:, :, 1] + 114 * wide[:, :, 2]
    ) / 1000.0
    assert np.abs(y_back - yp).max() <= 18

    # 4:2:0 lossless corner: constant 16×16 tile
    yv, cbv, crv = 100, 110, 140
    y2 = np.full((16, 16), yv, dtype=np.int64)
    cb2 = np.full((16, 16), cbv, dtype=np.int64)
    cr2 = np.full((16, 16), crv, dtype=np.int64)
    rgb2 = decode_jpeg_pixels(
        encode_baseline_jpeg(y2, cb2, cr2, subsample=True)
    )
    exp_r = (1000 * yv + 1402 * (crv - 128) + 500) // 1000
    exp_g = (1000 * yv - 344 * (cbv - 128) - 714 * (crv - 128) + 500) // 1000
    exp_b = (1000 * yv + 1772 * (cbv - 128) + 500) // 1000
    assert (rgb2[:, :, 0] == exp_r).all()
    assert (rgb2[:, :, 1] == exp_g).all()
    assert (rgb2[:, :, 2] == exp_b).all()


def test_jpeg_restart_interval_stream():
    """DRI/RSTn handling: a hand-assembled two-MCU grayscale stream
    with restart interval 1 — entropy segments split at RST0, DC
    predictor reset per segment — must decode both blocks exactly
    (each is constant, the lossless corner)."""
    from gcs_parquet_dataflow_spark.operators.multimodal import (
        _BitWriter,
        _JPEG_AC_COUNTS,
        _JPEG_AC_SYMS,
        _JPEG_DC_COUNTS,
        _JPEG_DC_SYMS,
        _dht_segment,
        _jpeg_encode_block,
        _jpeg_quant_table,
        decode_jpeg_pixels,
    )

    def seg(marker, body):
        return marker + struct.pack(">H", len(body) + 2) + body

    q = _jpeg_quant_table(8, 16)
    dqt = seg(b"\xff\xdb", bytes([0]) + bytes(int(x) for x in q))
    sof = seg(
        b"\xff\xc0", struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    )
    dht = _dht_segment(0, 0, _JPEG_DC_COUNTS, _JPEG_DC_SYMS) + _dht_segment(
        1, 0, _JPEG_AC_COUNTS, _JPEG_AC_SYMS
    )
    dri = seg(b"\xff\xdd", struct.pack(">H", 1))
    sos = seg(b"\xff\xda", bytes([1, 1, 0x00, 0, 63, 0]))
    # constant block value v ⇒ quantized DC = v − 128 at q_dc = 8;
    # pred is 0 at the start of EVERY restart segment
    bw1 = _BitWriter()
    _jpeg_encode_block(bw1, [12] + [0] * 63, 0)  # v = 140
    bw2 = _BitWriter()
    _jpeg_encode_block(bw2, [-28] + [0] * 63, 0)  # v = 100
    payload = (
        b"\xff\xd8" + dqt + sof + dht + dri + sos
        + bw1.flush() + b"\xff\xd0" + bw2.flush() + b"\xff\xd9"
    )
    px = decode_jpeg_pixels(payload)
    assert px.shape == (8, 16)
    assert (px[:, :8] == 140).all()
    assert (px[:, 8:] == 100).all()


# ---------------------------------------------------------------------------
# VERDICT r8 item 2(c): malformed payloads DLQ as kind='opaque' — the
# batch survives; the decoder itself raises ValueError, never crashes
# the interpreter or allocates a forged-SOF's worth of memory.
# ---------------------------------------------------------------------------


def _valid_jpeg():
    from gcs_parquet_dataflow_spark.operators.multimodal import (
        encode_baseline_jpeg,
    )

    return encode_baseline_jpeg(np.full((16, 16), 130, dtype=np.int64))


def test_jpeg_malformed_payloads_raise_valueerror():
    from gcs_parquet_dataflow_spark.operators.multimodal import (
        decode_jpeg_pixels,
    )

    valid = _valid_jpeg()
    sof_at = valid.index(b"\xff\xc0")

    truncated = valid[: len(valid) * 3 // 5]
    with pytest.raises(ValueError):
        decode_jpeg_pixels(truncated)

    # forged SOF claiming 65535×65535: must fence, not allocate ~12 GB
    forged = bytearray(valid)
    struct.pack_into(">HH", forged, sof_at + 5, 65535, 65535)
    with pytest.raises(ValueError, match="exceed decoder limit"):
        decode_jpeg_pixels(bytes(forged))

    progressive = valid[:sof_at] + b"\xff\xc2" + valid[sof_at + 2 :]
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_pixels(progressive)


def test_jpeg_malformed_payloads_dlq_in_dispatch(spark):
    """Through the Arrow-batched dispatch: corrupt JPEG streams row out
    as kind='opaque' with NULL features while the valid payload in the
    SAME batch decodes — the DLQ-not-crash discipline at the mapInPandas
    level (r8's test covered only a NULL payload)."""
    from gcs_parquet_dataflow_spark.operators.multimodal import (
        decode_uncompressed_features,
    )

    valid = _valid_jpeg()
    sof_at = valid.index(b"\xff\xc0")
    forged = bytearray(valid)
    struct.pack_into(">HH", forged, sof_at + 5, 65535, 65535)
    progressive = valid[:sof_at] + b"\xff\xc2" + valid[sof_at + 2 :]
    rows = [
        (1, bytearray(valid)),
        (2, bytearray(valid[: len(valid) * 3 // 5])),
        (3, forged),
        (4, bytearray(progressive)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r for r in decode_uncompressed_features(df).collect()
    }
    assert got[1]["kind"] == "jpeg"
    assert got[1]["width"] == 16 and got[1]["height"] == 16
    for mid in (2, 3, 4):
        assert got[mid]["kind"] == "opaque"
        assert got[mid]["width"] is None
        assert got[mid]["sum_r"] is None


# ---------------------------------------------------------------------------
# VERDICT r8 item 1 (carried from r7): the accumulator-overflow audit.
# Expression-level pins for every converted accumulator family, in the
# style of test_aqp_variance_accumulator_exact_past_int64 — each proves
# the DECIMAL(38,0) form exact against Python integers PAST 2^63 and
# documents that the old int64 form really wraps there.  The
# query-level differential twin is tools/scale_smoke.py --magnitude.
# ---------------------------------------------------------------------------


@pytest.mark.overflow
def test_revenue_product_sum_exact_past_int64(spark):
    """The q1/q5 family: Σ ep·(100−dc)·(100+tx) — per-row products fit
    int64 but the group sum does not at 100 TB.  Three rows of forged
    billion-dollar cents push the sum past 2^63; the decimal
    accumulator must equal exact Python arithmetic, the long one must
    wrap."""
    ep, dc, tx = 400_000_000_000_000, 5, 7  # ep·95·107 ≈ 4.07e18/row
    df = spark.createDataFrame([(ep, dc, tx)] * 3, "ep long, dc long, tx long")
    prod = F.col("ep") * (100 - F.col("dc")) * (100 + F.col("tx"))
    exact = 3 * ep * (100 - dc) * (100 + tx)
    assert exact > 2**63
    dec = df.agg(F.sum(prod.cast("decimal(38,0)")).alias("s")).first()["s"]
    assert int(dec) == exact
    wrapped = df.agg(F.sum(prod).alias("s")).first()["s"]
    assert wrapped != exact


@pytest.mark.overflow
def test_operand_cast_square_sum_exact_past_int64(spark):
    """The vc²/rev²/y² family (anomaly, bollinger, rolling_corr, AQP):
    once the value itself passes ~3e9, the PER-ROW square wraps int64 —
    the cast must happen before the multiply.  v=4e9 → v² = 1.6e19 >
    2^63 in a single row."""
    v = 4_000_000_000
    df = spark.createDataFrame([(v,), (v,)], "v long")
    dec = df.agg(
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("s")
    ).first()["s"]
    assert int(dec) == 2 * v * v  # 3.2e19, exact
    # product-then-cast is NOT equivalent here: the long product has
    # already wrapped before the cast sees it
    late = df.agg(
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("s")
    ).first()["s"]
    assert int(late) != 2 * v * v


@pytest.mark.overflow
def test_regression_cross_terms_exact_past_int64(spark):
    """The closed-form slope's cross terms n·Σxy − Σx·Σy (regression_
    trend_by_type): with decimal product sums the full numerator stays
    exact even when Σx·Σy alone exceeds 2^63."""
    rows = [(10**5, 10**13)] * 4  # x·y = 1e18/row (fits int64)
    df = spark.createDataFrame(rows, "x long, y long")
    s = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    got = s.select(
        (
            F.col("n") * F.col("sxy")
            - F.col("sx").cast("decimal(38,0)") * F.col("sy")
        ).alias("num")
    ).first()["num"]
    n, sx, sy, sxy = 4, 4 * 10**5, 4 * 10**13, 4 * 10**18
    assert sx * sy > 2**63  # the term the old long form wrapped on
    assert int(got) == n * sxy - sx * sy  # exactly 0 here, exactly


@pytest.mark.overflow
def test_cm_join_size_exact_past_int64(spark):
    """cm_join_size (operators/sketches.py): a single hot bucket with
    n ≈ 4e9 on both sides makes the per-bucket product 1.6e19 > 2^63 —
    the estimate must come back as the exact DECIMAL, never a wrapped
    long (the skew bomb the estimator exists to warn about)."""
    from gcs_parquet_dataflow_spark.operators.sketches import cm_join_size

    n = 4_000_000_000
    rows = [(0, 0, n), (0, 1, 3), (1, 0, n), (1, 1, 5)]
    sk = spark.createDataFrame(rows, "d long, b long, n long")
    est = cm_join_size(sk, sk).first()["est_join_size"]
    expected = min(n * n + 9, n * n + 25)
    assert expected > 2**63
    assert int(est) == expected


@pytest.mark.overflow
def test_exact_join_size_sum_of_squares_past_int64(spark):
    """The Σc² exact side of sketch_join_size_estimate: one hot key
    with c = 4e9 events — Σc² must survive in DECIMAL(38,0)."""
    c = 4_000_000_000
    df = spark.createDataFrame([(c,), (7,), (11,)], "c long")
    got = df.agg(
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s")
    ).first()["s"]
    assert int(got) == c * c + 49 + 121
    assert int(got) > 2**63


# ---------------------------------------------------------------------------
# VERDICT r8 item 5 (carried from r7 item 7): the streaming AQP surface —
# merged per-batch sampled-sum shards must equal the batch AQP row.
# ---------------------------------------------------------------------------


def test_aqp_stream_matches_batch_row(spark, tmp_path):
    """run_aqp_stream over sf0.001 lineitem split into 3 arbitrary
    micro-batches: the final merged report must equal the batch
    aqp_sample_sum_ci row's estimate columns EXACTLY (the salted-hash
    sample membership is row-deterministic, and the shard sums are
    linear, so batch boundaries cannot change the estimate), shards
    stay batch-keyed (replay-idempotency key), and a restart with the
    same checkpoint reprocesses nothing."""
    from gcs_parquet_dataflow_spark.queries import CATALOG
    from gcs_parquet_dataflow_spark.queries.catalog import cents
    from gcs_parquet_dataflow_spark.streaming.pipeline import run_aqp_stream

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    indir = tmp_path / "in"
    indir.mkdir()
    for part in range(3):
        li.filter(F.col("l_orderkey") % 3 == part).coalesce(1).write.parquet(
            str(indir / f"b{part}")
        )

    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("#"),
        F.col("l_linenumber").cast("string"),
        F.lit("#aqp"),
    )

    def start(ck):
        stream = (
            spark.readStream.schema(li.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(indir / "*"))
        )
        q = run_aqp_stream(
            spark, stream, "l_returnflag", key,
            cents(F.col("l_extendedprice")),
            str(tmp_path / "shards"), str(tmp_path / "report"),
            str(tmp_path / ck), pct=5, available_now=True,
        )
        q.awaitTermination(180)

    start("ck")
    shards = spark.read.parquet(str(tmp_path / "shards"))
    assert shards.select("_batch_id").distinct().count() == 3

    reports = spark.read.parquet(str(tmp_path / "report"))
    last = reports.agg(F.max("_batch_id")).collect()[0][0]
    final = {
        r["l_returnflag"]: r
        for r in reports.filter(F.col("_batch_id") == last).collect()
    }

    batch = {
        r["l_returnflag"]: r
        for r in CATALOG["aqp_sample_sum_ci"].build(spark, sf).collect()
    }
    assert sorted(final) == sorted(batch)
    for k, b in batch.items():
        s = final[k]
        assert s["n_sample"] == b["n_sample"]
        assert s["est_rows"] == b["est_rows"]
        assert s["est_sum_cents"] == b["est_sum_cents"]
        assert s["ci95_cents"] == b["ci95_cents"]

    # restart on the same checkpoint: nothing new to process, the
    # cumulative state is untouched
    start("ck")
    shards2 = spark.read.parquet(str(tmp_path / "shards"))
    assert shards2.select("_batch_id").distinct().count() == 3
    assert shards2.count() == shards.count()


def test_aqp_stream_rejects_non_divisor_pct():
    from gcs_parquet_dataflow_spark.streaming.pipeline import run_aqp_stream

    with pytest.raises(ValueError, match="divide 100"):
        run_aqp_stream(
            None, None, "g", None, None, "s", "r", "c", pct=3,
        )


# ---------------------------------------------------------------------------
# ADVICE r8 closure: noisy-threshold DP release — key-set stability.
# ---------------------------------------------------------------------------


def test_dp_threshold_release_key_set_from_noisy_counts(spark):
    """With threshold τ: (a) exactly the groups whose NOISY released
    count clears τ are emitted (same filter both engines run); (b) the
    τ column rides on every row; (c) τ=None keeps the full key set and
    schema unchanged; (d) the released values of surviving groups are
    identical with and without the threshold (thresholding never
    perturbs values, only membership)."""
    from gcs_parquet_dataflow_spark.operators.privacy import (
        dp_release_counts,
    )

    rows = [(f"g{i}", f"u{j}") for i in range(6) for j in range(2 + 3 * i)]
    df = spark.createDataFrame(rows, "g string, unit string")
    full = dp_release_counts(df, ["g"], "unit", 1.0, 4, group_cap=2)
    base = {r["g"]: r["released"] for r in full.collect()}
    tau = sorted(base.values())[2]  # drops exactly the bottom three
    th = dp_release_counts(
        df, ["g"], "unit", 1.0, 4, group_cap=2, threshold=tau
    )
    got = {r["g"]: r for r in th.collect()}
    assert sorted(got) == sorted(g for g, v in base.items() if v > tau)
    assert len(got) == 3
    for g, r in got.items():
        assert r["threshold"] == tau
        assert r["released"] == base[g]
    assert "threshold" not in full.columns


# ---------------------------------------------------------------------------
# Round 9: golden-snapshot pruning in the ER stream (the |entities|-sized
# twin of the ADVICE r8 bloom prune).
# ---------------------------------------------------------------------------


def test_er_stream_golden_snapshots_pruned(spark, tmp_path):
    """Default run: the snapshot lake holds only {newest, consumed} —
    superseded |entities|-sized versions are reaped; members (the
    durable record) keep every batch.  keep_golden_history=True
    preserves all snapshot versions, with identical resolution."""
    from test_round8 import _er_batches, _run_er

    indir = tmp_path / "in"
    _er_batches(spark, indir)

    members = _run_er(spark, tmp_path, indir, "pruned", "ck_p")
    golden = spark.read.parquet(str(tmp_path / "golden_pruned"))
    ids = {
        r["_batch_id"]
        for r in golden.select("_batch_id").distinct().collect()
    }
    assert ids == {1, 2}
    mem_ids = {
        r["_batch_id"]
        for r in spark.read.parquet(str(tmp_path / "members_pruned"))
        .select("_batch_id").distinct().collect()
    }
    assert mem_ids == {0, 1, 2}

    kept = _run_er(
        spark, tmp_path, indir, "hist", "ck_h", keep_golden_history=True
    )
    assert kept == members  # pruning never changes resolution
    golden_h = spark.read.parquet(str(tmp_path / "golden_hist"))
    ids_h = {
        r["_batch_id"]
        for r in golden_h.select("_batch_id").distinct().collect()
    }
    assert ids_h == {0, 1, 2}


def test_er_stream_golden_log_mode_equivalent(spark, tmp_path):
    """golden_mode='log' ≡ snapshot mode on the same batch sequence
    (members identical, folded golden view identical), each log
    partition holds ONLY the entities its batch touched (the
    |batch|-proportional write), the bloom-armed log stream matches
    too, and compact_golden_log folds the log to one partition with
    the identical view."""
    from gcs_parquet_dataflow_spark.streaming.pipeline import (
        compact_golden_log,
    )
    from test_round8 import _er_batches, _run_er

    indir = tmp_path / "in"
    _er_batches(spark, indir)

    plain = _run_er(spark, tmp_path, indir, "snapm", "ck_sm")
    logm = _run_er(
        spark, tmp_path, indir, "logm", "ck_lm", golden_mode="log"
    )
    assert logm == plain

    glog = spark.read.parquet(str(tmp_path / "golden_logm"))
    per_batch = {
        b: sorted(
            r["entity_id"]
            for r in glog.filter(F.col("_batch_id") == b).collect()
        )
        for b in (0, 1, 2)
    }
    # b0 creates {1, 3}; b1 touches 1 (absorbs rec 10) + creates 11 —
    # entity 3 is NOT rewritten; b2 is all-novel → only {20}
    assert per_batch[0] == [1, 3]
    assert per_batch[1] == [1, 11]
    assert per_batch[2] == [20]

    def fold(df):
        from pyspark.sql import Window as W

        w = W.partitionBy("entity_id").orderBy(F.col("_batch_id").desc())
        cols = [c for c in df.columns if c != "_batch_id"]
        return sorted(
            tuple(r[c] for c in sorted(cols))
            for r in df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*cols)
            .collect()
        )

    gsnap = spark.read.parquet(str(tmp_path / "golden_snapm"))
    latest = gsnap.agg(F.max("_batch_id")).collect()[0][0]
    snap_view = sorted(
        tuple(r[c] for c in sorted(c2 for c2 in gsnap.columns
                                   if c2 != "_batch_id"))
        for r in gsnap.filter(F.col("_batch_id") == latest)
        .drop("_batch_id").collect()
    )
    assert fold(glog) == snap_view

    # bloom-armed log stream: same members
    armed = _run_er(
        spark, tmp_path, indir, "logb", "ck_lb", bloom="bloomlog",
        golden_mode="log",
    )
    assert armed == plain

    # offline compaction: one partition left, identical folded view
    compact_golden_log(spark, str(tmp_path / "golden_logm"))
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import read_table
    after = read_table(spark, str(tmp_path / "golden_logm"))
    assert {
        r["_batch_id"]
        for r in after.select("_batch_id").distinct().collect()
    } == {2}
    assert fold(after) == snap_view


# ---------------------------------------------------------------------------
# Round 9: additive shard-lake compaction (AQP sampled sums, count-min
# shards) — fold is exact under sum linearity, replays stay safe.
# ---------------------------------------------------------------------------


def test_compact_batch_shards_aqp_end_to_end(spark, tmp_path):
    """Stream 3 batches → compact shards (keep newest) → stream a 4th:
    the final merged report must equal the batch aqp_sample_sum_ci row
    over ALL the data — compaction is invisible to the estimate, the
    lake shrinks to {folded, kept, new}."""
    from gcs_parquet_dataflow_spark.queries import CATALOG
    from gcs_parquet_dataflow_spark.queries.catalog import cents
    from gcs_parquet_dataflow_spark.streaming.pipeline import (
        compact_batch_shards,
        run_aqp_stream,
    )

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    indir = tmp_path / "in"
    indir.mkdir()
    for part in range(3):
        li.filter(F.col("l_orderkey") % 4 == part).coalesce(1).write.parquet(
            str(indir / f"b{part}")
        )

    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("#"),
        F.col("l_linenumber").cast("string"),
        F.lit("#aqp"),
    )

    def start():
        stream = (
            spark.readStream.schema(li.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(indir / "*"))
        )
        q = run_aqp_stream(
            spark, stream, "l_returnflag", key,
            cents(F.col("l_extendedprice")),
            str(tmp_path / "shards"), str(tmp_path / "report"),
            str(tmp_path / "ck"), pct=5, available_now=True,
        )
        q.awaitTermination(180)

    start()
    shards_path = str(tmp_path / "shards")
    compact_batch_shards(spark, shards_path, ["l_returnflag"], keep_last=1)
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import read_table
    ids = {
        r["_batch_id"]
        for r in read_table(spark, shards_path)
        .select("_batch_id").distinct().collect()
    }
    assert ids == {0, 2}  # 0+1 folded under 0, newest kept

    # 4th batch arrives AFTER compaction; same checkpoint continues
    li.filter(F.col("l_orderkey") % 4 == 3).coalesce(1).write.parquet(
        str(indir / "b3")
    )
    start()

    reports = spark.read.parquet(str(tmp_path / "report"))
    last = reports.agg(F.max("_batch_id")).collect()[0][0]
    final = {
        r["l_returnflag"]: r
        for r in reports.filter(F.col("_batch_id") == last).collect()
    }
    batch = {
        r["l_returnflag"]: r
        for r in CATALOG["aqp_sample_sum_ci"].build(spark, sf).collect()
    }
    assert sorted(final) == sorted(batch)
    for k, b in batch.items():
        s = final[k]
        assert s["n_sample"] == b["n_sample"]
        assert s["est_sum_cents"] == b["est_sum_cents"]
        assert s["ci95_cents"] == b["ci95_cents"]


def test_compact_batch_shards_dtype_and_key_only(spark, tmp_path):
    """(a) DECIMAL(38,0) shard columns survive folding (the long cast
    that merge_partial_aggs applies would wrap them — pin with a sum
    past 2^63); (b) key-only feeds fold by DISTINCT; (c) fewer than 2
    foldable partitions is a no-op."""
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
        write_partitioned,
    )
    from gcs_parquet_dataflow_spark.streaming.pipeline import (
        compact_batch_shards,
    )

    big = 5_000_000_000_000_000_000  # 5e18; 2 shards sum past 2^63
    lake = str(tmp_path / "shards")
    for b in range(4):
        df = spark.createDataFrame(
            [("g", 10)], "k string, n long"
        ).select(
            "k",
            F.col("n").cast("long").alias("n"),
            F.lit(big).cast("decimal(38,0)").alias("d"),
        )
        write_partitioned(df, lake, [], batch_id=b, coalesce_files=1)
    compact_batch_shards(spark, lake, ["k"], keep_last=2)
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import read_table
    out = read_table(spark, lake)
    ids = {r["_batch_id"] for r in out.select("_batch_id").distinct().collect()}
    assert ids == {0, 2, 3}
    folded = out.filter(F.col("_batch_id") == 0).first()
    assert folded["n"] == 20
    assert int(folded["d"]) == 2 * big  # 1e19 > 2^63, exact
    assert dict(out.dtypes)["d"] == "decimal(38,0)"
    total = out.agg(F.sum("n").alias("s")).first()["s"]
    assert total == 40  # cumulative sums unchanged by compaction

    keys = str(tmp_path / "cands")
    for b in range(3):
        df = spark.createDataFrame([(f"k{b}",), ("shared",)], "key string")
        write_partitioned(df, keys, [], batch_id=b, coalesce_files=1)
    compact_batch_shards(spark, keys, ["key"], keep_last=1)
    out2 = read_table(spark, keys)
    assert {
        r["_batch_id"] for r in out2.select("_batch_id").distinct().collect()
    } == {0, 2}
    folded_keys = sorted(
        r["key"] for r in out2.filter(F.col("_batch_id") == 0).collect()
    )
    assert folded_keys == ["k0", "k1", "shared"]  # distinct, not summed

    # no-op guard: nothing old enough to fold
    compact_batch_shards(spark, keys, ["key"], keep_last=5)
    assert out2.count() == read_table(spark, keys).count()


def test_compact_bloom_lake_fold_is_invisible(spark, tmp_path):
    """Fold the per-batch bloom appends into the current words: the
    (m_bits, k) meta survives, the file count collapses, and the next
    armed batch behaves identically — cross-batch duplicate still
    dropped, fresh doc still accepted."""
    from gcs_parquet_dataflow_spark.operators.dedup import minhash_perms
    from gcs_parquet_dataflow_spark.operators.incremental import (
        bloom_lake_has_words,
        compact_bloom_lake,
        dedup_batch_against_index,
        read_bloom,
        read_bloom_meta,
    )
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        release_intermediates,
    )
    from gcs_parquet_dataflow_spark.operators.sketches import BLOOM_K

    perms = minhash_perms(num_perm=16, seed=7)
    idx, bloom = str(tmp_path / "idx"), str(tmp_path / "bloom")
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + i, _sentence(f"b{b}d{i}")) for i in range(3)],
            "doc_id long, text string",
        )
        s = dedup_batch_against_index(
            spark, df, "doc_id", "text", idx, perms,
            bloom_path=bloom, bloom_m_bits=2**20,
        )
        assert s.count() == 3
        release_intermediates()

    before = sorted(
        (r["word_idx"], r["word"])
        for r in read_bloom(spark, bloom).collect()
    )
    compact_bloom_lake(spark, bloom)
    assert bloom_lake_has_words(spark, bloom)
    assert read_bloom_meta(spark, bloom) == {"m_bits": 2**20, "k": BLOOM_K}
    after = sorted(
        (r["word_idx"], r["word"])
        for r in read_bloom(spark, bloom).collect()
    )
    assert after == before  # OR-fold is exact

    dup = spark.createDataFrame(
        [(100, _sentence("b1d2")), (101, _sentence("fresh"))],
        "doc_id long, text string",
    )
    s = dedup_batch_against_index(
        spark, dup, "doc_id", "text", idx, perms,
        bloom_path=bloom, bloom_m_bits=2**20,
    )
    assert sorted(r["doc_id"] for r in s.collect()) == [101]
    release_intermediates()


def test_compact_batch_shards_heavy_hitter_end_to_end(spark, tmp_path):
    """Count-min shards + candidate feed: three batches with a planted
    heavy key, fold the two oldest shard partitions, stream a fourth
    batch on the same checkpoint — the cumulative estimate for the
    heavy key is unchanged by the fold (counter linearity) and the
    candidate feed still carries every fold-era key."""
    from gcs_parquet_dataflow_spark.streaming.pipeline import (
        compact_batch_shards,
        run_heavy_hitter_stream,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    batches = [
        [("hot",)] * 40 + [(f"k{i}",) for i in range(10)],
        [("hot",)] * 25 + [("warm",)] * 20,
        [("hot",)] * 10 + [(f"j{i}",) for i in range(15)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "key string").coalesce(1).write.parquet(
            str(indir / f"b{i}")
        )
    paths = dict(
        sketch_path=str(tmp_path / "sk"),
        candidates_path=str(tmp_path / "cand"),
        report_path=str(tmp_path / "rep"),
    )

    def start():
        stream = (
            spark.readStream.schema("key string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(indir / "*"))
        )
        q = run_heavy_hitter_stream(
            spark, stream, "key", checkpoint_dir=str(tmp_path / "ck"),
            available_now=True, **paths
        )
        q.awaitTermination(180)

    start()
    merged_before = sorted(
        map(tuple, spark.read.parquet(paths["sketch_path"])
            .groupBy("d", "b").agg(F.sum("n").alias("n")).collect())
    )
    compact_batch_shards(spark, paths["sketch_path"], ["d", "b"],
                         keep_last=1)
    compact_batch_shards(spark, paths["candidates_path"], ["key"],
                         keep_last=1)
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import read_table
    merged_after = sorted(
        map(tuple, read_table(spark, paths["sketch_path"])
            .groupBy("d", "b").agg(F.sum("n").alias("n")).collect())
    )
    assert merged_after == merged_before  # fold invisible to the sum
    cands = {
        r["key"]
        for r in read_table(spark, paths["candidates_path"]).collect()
    }
    assert {"hot", "warm"} <= cands

    # fourth batch on the same checkpoint, post-compaction
    spark.createDataFrame(
        [("hot",)] * 5 + [("late",)] * 30, "key string"
    ).coalesce(1).write.parquet(str(indir / "b3"))
    start()
    rep = spark.read.parquet(paths["report_path"])
    last = rep.filter(
        F.col("_batch_id") == rep.agg(F.max("_batch_id")).first()[0]
    )
    by_key = {r["key"]: r["n_cm"] for r in last.collect()}
    assert by_key["hot"] >= 80  # 40+25+10+5 — fold-era counts intact
    assert by_key["late"] >= 30


# ---------------------------------------------------------------------------
# Round 9: streaming right-to-be-forgotten propagation.
# ---------------------------------------------------------------------------


def test_rtbf_stream_propagates_deletes_with_audit(spark, tmp_path):
    """Two request batches against two versioned lakes with different
    key columns: deleted subjects vanish from every lake's LATEST
    snapshot (prior versions keep them — the vacuum contract), the
    audit trail records (lake, n_keys, new_version) per batch, and a
    restart on the same checkpoint commits nothing new (the audit
    partition is the replay fence)."""
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
        latest_version,
        read_version,
        write_version,
    )
    from gcs_parquet_dataflow_spark.streaming.pipeline import (
        run_rtbf_stream,
    )

    users = str(tmp_path / "users_lake")
    events = str(tmp_path / "events_lake")
    write_version(
        spark,
        users,
        spark.createDataFrame(
            [(i, f"name{i}") for i in range(10)], "user_id long, name string"
        ),
    )
    write_version(
        spark,
        events,
        spark.createDataFrame(
            [(100 + i, i % 10) for i in range(30)], "event_id long, uid long"
        ),
    )

    indir = tmp_path / "req"
    indir.mkdir()
    spark.createDataFrame([(3,), (7,)], "subject_key long").coalesce(
        1
    ).write.parquet(str(indir / "b0"))
    spark.createDataFrame([(5,)], "subject_key long").coalesce(
        1
    ).write.parquet(str(indir / "b1"))

    def start():
        stream = (
            spark.readStream.schema("subject_key long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(indir / "*"))
        )
        q = run_rtbf_stream(
            spark, stream,
            [(users, "user_id"), (events, "uid")],
            str(tmp_path / "audit"), str(tmp_path / "ck"),
            available_now=True,
        )
        q.awaitTermination(180)

    start()
    u = {r["user_id"] for r in read_version(spark, users).collect()}
    assert u == set(range(10)) - {3, 7, 5}
    ev_uids = {r["uid"] for r in read_version(spark, events).collect()}
    assert ev_uids == set(range(10)) - {3, 7, 5}
    # history intact until vacuum: v0 still has everyone
    assert {
        r["user_id"] for r in read_version(spark, users, 0).collect()
    } == set(range(10))

    audit = spark.read.parquet(str(tmp_path / "audit"))
    got = {
        (r["_batch_id"], r["lake_root"], r["n_keys"], r["new_version"])
        for r in audit.collect()
    }
    assert (0, users, 2, 1) in got and (0, events, 2, 1) in got
    assert (1, users, 1, 2) in got and (1, events, 1, 2) in got

    # restart, same checkpoint: fence skips everything — no new versions
    v_users, v_events = latest_version(spark, users), latest_version(
        spark, events
    )
    start()
    assert latest_version(spark, users) == v_users
    assert latest_version(spark, events) == v_events


def test_rtbf_stream_uninitialized_lake_and_keep_last_guard(spark, tmp_path):
    """(a) A registered lake with no committed snapshot yet must not
    fail the request batch: the erasure is vacuously satisfied and
    audited with a NULL version; (b) compact_batch_shards rejects a
    replay-unsafe keep_last."""
    import pytest as _pt

    from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
        read_version,
        write_version,
    )
    from gcs_parquet_dataflow_spark.streaming.pipeline import (
        compact_batch_shards,
        run_rtbf_stream,
    )

    live = str(tmp_path / "live_lake")
    empty = str(tmp_path / "empty_lake")  # registered, never written
    write_version(
        spark,
        live,
        spark.createDataFrame([(1,), (2,), (3,)], "user_id long"),
    )
    indir = tmp_path / "req"
    indir.mkdir()
    spark.createDataFrame([(2,)], "subject_key long").coalesce(
        1
    ).write.parquet(str(indir / "b0"))
    stream = (
        spark.readStream.schema("subject_key long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir / "*"))
    )
    q = run_rtbf_stream(
        spark, stream, [(live, "user_id"), (empty, "user_id")],
        str(tmp_path / "audit"), str(tmp_path / "ck"),
        available_now=True,
    )
    q.awaitTermination(120)
    assert {
        r["user_id"] for r in read_version(spark, live).collect()
    } == {1, 3}
    audit = {
        r["lake_root"]: r["new_version"]
        for r in spark.read.parquet(str(tmp_path / "audit")).collect()
    }
    assert audit[live] == 1
    assert audit[empty] is None

    with _pt.raises(ValueError, match="keep_last"):
        compact_batch_shards(spark, str(tmp_path / "x"), ["k"], keep_last=0)


# ---------------------------------------------------------------------------
# Round 9: upsert's delete→rename crash window must self-heal — an
# absent dest with a complete staging is a crashed COMMIT, not a fresh
# lake.
# ---------------------------------------------------------------------------


def test_upsert_crash_window_recovery(spark, tmp_path):
    """Simulate a crash between upsert's delete and rename (dest
    absent, complete merged table in staging): (a) the next direct
    upsert completes the interrupted commit BEFORE applying its own
    update; (b) run_upsert_stream does the same instead of
    re-initializing the lake from one batch (the silent-data-loss
    path); (c) a staging dir without _SUCCESS never qualifies."""
    import shutil

    from gcs_parquet_dataflow_spark.sinks.parquet_lake import (
        recover_staged_swap,
        upsert,
    )
    from gcs_parquet_dataflow_spark.streaming.pipeline import (
        run_upsert_stream,
    )

    lake = str(tmp_path / "lake")
    staging = lake + "__upsert_staging"

    def crash_state():
        # the state a PRE-r12 upsert left when it died after
        # fs.delete(dest): staging holds the COMPLETE merged table,
        # dest is gone.  Also sweep any sibling version dirs a prior
        # (r12, versioned) upsert in this test created — a true legacy
        # lake has none, and their presence would make the resolver
        # (correctly) ignore the constructed flat crash state
        import glob

        spark.createDataFrame(
            [(1, 2, "a2"), (2, 1, "b")], "k long, v long, s string"
        ).coalesce(1).write.mode("overwrite").parquet(staging)
        shutil.rmtree(lake, ignore_errors=True)
        for d in glob.glob(lake + "__v*"):
            shutil.rmtree(d, ignore_errors=True)

    # (a) direct upsert self-heals, then applies its update
    crash_state()
    upsert(
        spark, lake,
        spark.createDataFrame([(3, 1, "c")], "k long, v long, s string"),
        ["k"], "v",
    )
    from gcs_parquet_dataflow_spark.sinks.parquet_lake import read_table
    got = {r["k"]: (r["v"], r["s"]) for r in read_table(spark, lake).collect()}
    assert got == {1: (2, "a2"), 2: (1, "b"), 3: (1, "c")}

    # (b) the streaming CDC apply: pre-fix this branch saw "no lake"
    # and initialized from the batch alone, losing rows 1 and 2
    crash_state()
    indir = tmp_path / "updates"
    indir.mkdir()
    spark.createDataFrame(
        [(2, 5, "b5")], "k long, v long, s string"
    ).coalesce(1).write.parquet(str(indir / "u0"))
    stream = (
        spark.readStream.schema("k long, v long, s string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir / "*"))
    )
    q = run_upsert_stream(
        spark, stream, lake, ["k"], "v", str(tmp_path / "ck"),
        available_now=True,
    )
    q.awaitTermination(120)
    got = {r["k"]: (r["v"], r["s"]) for r in read_table(spark, lake).collect()}
    assert got == {1: (2, "a2"), 2: (5, "b5")}

    # (c) torn staging (no _SUCCESS) never masquerades as a commit
    shutil.rmtree(lake)
    spark.createDataFrame(
        [(9, 9, "x")], "k long, v long, s string"
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    (__import__("pathlib").Path(staging) / "_SUCCESS").unlink()
    assert recover_staged_swap(spark, lake) is False
