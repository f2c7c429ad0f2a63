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
    (b"<htm", "text/html"),
    (b"<HTM", "text/html"),
    (b"<!do", "text/html"),
    (b"<!DO", "text/html"),
]
# RIFF is a container: the subtype lives in bytes 9-12
_RIFF = b"RIFF"
_RIFF_SUBTYPES = [
    (b"WAVE", "audio/wav"),
    (b"WEBP", "image/webp"),
    (b"AVI ", "video/x-msvideo"),
]
_FALLBACK = "application/octet-stream"


def media_metadata(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Typed metadata for a binary column — pure Column exprs (no UDF):
    byte length, sha256 digest, magic-byte sniffed type.

    Sniffing compares HEX of the byte prefix (never decodes): arbitrary
    binary (PNG/JPEG/...) must not hit a UTF-8 decoder, which throws under
    ANSI mode on malformed sequences.  Text prefixes are probed in both
    common cases; RIFF containers dispatch on bytes 9-12 (WAVE/WEBP/AVI)."""
    p = F.col(payload_col)
    sniff = F.lower(F.hex(F.substring(p, 1, 4)))
    sub = F.lower(F.hex(F.substring(p, 9, 4)))
    mt = F.lit(_FALLBACK)
    for magic, label in reversed(_MAGIC):
        mt = F.when(sniff.startswith(magic.hex()), F.lit(label)).otherwise(mt)
    riff_mt = F.lit(_FALLBACK)
    for sub_magic, label in _RIFF_SUBTYPES:
        riff_mt = F.when(sub == sub_magic.hex(), F.lit(label)).otherwise(riff_mt)
    mt = F.when(sniff.startswith(_RIFF.hex()), riff_mt).otherwise(mt)
    return df.withColumn("media_bytes", F.length(p)) \
             .withColumn("media_sha", F.sha2(p, 256)) \
             .withColumn("media_type", mt)


def media_type_sql(hex_expr: str) -> str:
    """DuckDB twin of the sniff above, over a LOWERCASE hex-string expression
    (prefix probes + RIFF subtype at hex chars 17-24)."""
    riff_cases = " ".join(
        f"WHEN substr({hex_expr}, 17, 8) = '{s.hex()}' THEN '{label}'"
        for s, label in _RIFF_SUBTYPES)
    probe_cases = " ".join(
        f"WHEN substr({hex_expr}, 1, {len(m.hex())}) = '{m.hex()}' THEN '{label}'"
        for m, label in _MAGIC)
    return (f"(CASE WHEN substr({hex_expr}, 1, 8) = '{_RIFF.hex()}' THEN "
            f"(CASE {riff_cases} ELSE '{_FALLBACK}' END) "
            f"{probe_cases} ELSE '{_FALLBACK}' END)")


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
