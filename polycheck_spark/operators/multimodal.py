"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata. The Spark-side
plumbing — schemas, Arrow batch shapes, ``mapInPandas`` signatures,
partitioning — is real and tested; the actual codec step is STUBBED because
no image/audio libraries exist in this container:

* ``decode_media(..., strict=True)`` raises NotImplementedError at call time
  (the documented production hook — plug Pillow/ffmpeg there);
* ``strict=False`` substitutes a deterministic fake decode (byte-histogram
  features) so downstream feature plumbing is exercisable end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"<htm", "text/html"),
    (b"<!do", "text/html"),
]


def media_metadata(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Typed metadata for a binary column — pure Column exprs (no UDF):
    byte length, sha256 digest, magic-byte sniffed type.

    Sniffing compares HEX of the byte prefix (never decodes): arbitrary
    binary (PNG/JPEG/...) must not hit a UTF-8 decoder, which throws under
    ANSI mode on malformed sequences."""
    p = F.col(payload_col)
    sniff = F.lower(F.hex(F.substring(p, 1, 4)))
    mt = F.lit("application/octet-stream")
    for magic, label in reversed(_MAGIC):
        probe = magic.hex().lower()
        mt = F.when(sniff.startswith(probe), F.lit(label)).otherwise(mt)
    return df.withColumn("media_bytes", F.length(p)) \
             .withColumn("media_sha", F.sha2(p, 256)) \
             .withColumn("media_type", mt)


N_FEATURES = 16
_FEAT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("media_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def decode_media(df: DataFrame, *, payload_col: str = "html",
                 key_col: str = "url", strict: bool = True) -> DataFrame:
    """Decode + feature-extract media payloads via ``mapInPandas``.

    strict=True: raises NotImplementedError when executed (codec libs absent
    in this environment — wire a real decoder here in production).
    strict=False: deterministic fake decode — 16-bin byte histogram, L1
    normalized — preserving batch shape, schema and determinism guarantees.
    """
    def _decode(batches):
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "install Pillow/ffmpeg and replace _fake_features")
            payloads = pdf[payload_col]
            feats = [_fake_features(bytes(b)) for b in payloads]
            yield pd.DataFrame({
                "url": pdf[key_col],
                "media_bytes": [len(bytes(b)) for b in payloads],
                "features": feats,
            })

    return df.mapInPandas(_decode, schema=_FEAT_SCHEMA)


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in 'decode': 16-bin byte histogram, L1-normalized."""
    if not payload:
        return [0.0] * N_FEATURES
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32).tolist()


def frame_sample_plan(df: DataFrame, *, every_n: int = 10,
                      payload_col: str = "html", key_col: str = "url") -> DataFrame:
    """Frame-sampling plumbing: emit (url, frame_idx) rows for every_n-th
    'frame' — index arithmetic is real; frame decode is the stub above."""
    n_frames = (F.length(F.col(payload_col)) / F.lit(1024)).cast("int") + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(F.col(key_col).alias("url"), F.explode(idx).alias("frame_idx"))
