"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The reference harvests images out-of-band (harvester/image_harvest.py:
content-type checks :67-102, md5 dedup cache :196-257); here the whole
multimodal path is in-engine: binary payload + typed metadata struct,
processed by Arrow-batched pandas UDFs over ``mapInPandas``.

The actual codec work (image decode, resampling, frame extraction) needs
libraries this container doesn't ship (Pillow/ffmpeg), so the decode kernel
is STUBBED — ``decode_stub_features`` produces deterministic fake features
from the payload bytes so the Spark-side plumbing (schema, partitioning,
UDF signature, Arrow batch shape) is real and tested, and a real decoder
drops in by replacing one function. Attempting ``decode_real`` raises
NotImplementedError by design.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mime", StringType()),          # image/png, audio/wav, ...
    StructField("payload", BinaryType()),        # opaque bytes
    StructField("width", IntegerType()),         # typed metadata
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mime", StringType()),
    StructField("payload_sha256", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("features", ArrayType(FloatType())),  # fixed-dim embedding
])

FEATURE_DIM = 16


def make_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media rows (binary payloads) for tests/bench."""
    rng = np.random.default_rng(seed)
    mimes = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]
    rows = []
    for i in range(n):
        payload = rng.bytes(64 + int(rng.integers(0, 256)))
        m = mimes[i % len(mimes)]
        rows.append((i, m, bytearray(payload),
                     int(rng.integers(16, 4096)) if m.startswith("image") else None,
                     int(rng.integers(16, 4096)) if m.startswith("image") else None,
                     int(rng.integers(100, 10_000)) if not m.startswith("image") else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_real(payload: bytes, mime: str) -> np.ndarray:
    """Real decode kernel — requires media libraries not in this container."""
    raise NotImplementedError(
        "image/audio decode libraries are not available in this environment; "
        "swap in Pillow/librosa/ffmpeg here on a real cluster")


def decode_stub_features(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic fake feature vector: FEATURE_DIM floats derived from
    the sha256 of the payload — a stand-in with the same shape/dtype a real
    encoder would produce."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[:FEATURE_DIM * 4],
                        dtype=np.uint32).astype(np.float64)
    return ((raw % 10_000) / 10_000.0).astype(np.float32)


def extract_features(media: DataFrame, *, use_stub: bool = True) -> DataFrame:
    """media table → per-item feature rows, Arrow-batched.

    The UDF processes whole Arrow batches; per-item work is the decode
    kernel itself (unavoidably per-payload — codecs are not columnar)."""
    kernel = decode_stub_features if use_stub else decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            feats = [kernel(p, m) for p, m in zip(payloads, pdf["mime"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "mime": pdf["mime"],
                "payload_sha256": [hashlib.sha256(p).hexdigest()
                                   for p in payloads],
                "n_bytes": [len(p) for p in payloads],
                "features": feats,
            })

    return media.select("media_id", "mime", "payload").mapInPandas(
        run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  *, use_stub: bool = True) -> DataFrame:
    """Image resize plumbing: filters to image/*, maps payload→payload.
    Stub 'resize' = identity payload + updated metadata (real kernel would
    re-encode); demonstrates binary-in/binary-out UDF shape."""
    imgs = media.filter(F.col("mime").startswith("image/"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if not use_stub:
                decode_real(b"", "")
            out = pdf.copy()
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out

    return imgs.mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  *, use_stub: bool = True) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    (row-explode shape a real ffmpeg kernel would produce)."""
    vids = media.filter(F.col("mime").startswith("video/"))
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("frame_sha256", StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if not use_stub:
                    decode_real(bytes(r.payload), r.mime)
                n_frames = max(1, int((r.duration_ms or 0) // every_ms))
                for fi in range(n_frames):
                    fake = hashlib.sha256(bytes(r.payload)
                                          + fi.to_bytes(4, "big")).hexdigest()
                    rows.append((int(r.media_id), fi, fi * every_ms, fake))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                                  "ts_ms", "frame_sha256"])

    return vids.mapInPandas(run, schema)
