"""Multimodal column plumbing (BASELINE.json extension): image/audio/
video payloads as opaque ``binary`` columns with typed metadata, plus
decode / feature-extract stages as Arrow-batched ``mapInPandas`` UDFs.

The container has no image/audio libraries, so the actual codec work is
STUBBED (``decode_image`` raises NotImplementedError; the deterministic
fake below computes real byte-level features instead). Everything
Spark-side is real and tested: the media schema, the mapInPandas batch
shape, partition-parallel execution, and metadata extraction — swap the
stub body for PIL/ffmpeg on a real cluster and nothing else changes.

Scale notes: payload bytes never shuffle (metadata projections prune the
binary column before any join/agg); decode runs in the scan stage with
Arrow batch transfer, the canonical 100 TB pattern for heavy per-row
Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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
    """Real image decode — requires PIL/opencv, absent in this container."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "swap this body for PIL.Image.open on a real cluster"
    )


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


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the payload column.

    ``mapInPandas`` receives pandas batches (payload as Python bytes),
    applies the (stubbed) decoder per element, and yields the typed
    feature frame — the exact plumbing a real decoder plugs into.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            decoded = [fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "content_md5": [
                        hashlib.md5(bytes(p)).hexdigest() for p in payloads
                    ],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "first_byte": [d[2] for d in decoded],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=DECODED_SCHEMA
    )
