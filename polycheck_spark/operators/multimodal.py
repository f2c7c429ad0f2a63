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


# --- header-level dimension extraction ---------------------------------------
# Real metadata with zero codec dependencies: PNG IHDR and GIF logical-screen
# sizes are fixed-offset byte arithmetic (pure Column exprs over the hex
# transcript), JPEG SOF dimensions need a segment walk (vectorized Arrow
# batch).  This is the decode-free slice of multimodal metadata a 100-TB
# media pipeline can always afford — the codec stub below stays the hook for
# everything deeper.

_PNG_MAGIC_HEX = b"\x89PNG\r\n\x1a\n".hex()           # bytes 1-8
_GIF_VERSIONS_HEX = [b"GIF87a".hex(), b"GIF89a".hex()]  # bytes 1-6
_JPEG_MAGIC_HEX = b"\xff\xd8\xff".hex()
_IHDR_HEX = b"IHDR".hex()
# SOF markers that carry frame dimensions (baseline/extended/progressive)
_JPEG_SOF_MARKERS = (0xC0, 0xC1, 0xC2)


def _be_hex_int(hx, pos: int, nbytes: int):
    """Big-endian integer from hex chars [pos, pos + 2*nbytes)."""
    return F.conv(F.substring(hx, pos, 2 * nbytes), 16, 10).cast("long")


def _le16_hex_int(hx, pos: int):
    """Little-endian u16: swap the two hex byte pairs before converting."""
    return F.conv(F.concat(F.substring(hx, pos + 2, 2),
                           F.substring(hx, pos, 2)), 16, 10).cast("long")


@F.pandas_udf(T.ArrayType(T.LongType()))
def _jpeg_dims_udf(payload: pd.Series) -> pd.Series:
    """[width, height] from the first SOF0/SOF1/SOF2 segment, else None.

    Walks the segment chain (marker FF xx + big-endian length that counts
    itself but not the marker) — SOF offset varies with preceding APP/COM
    segments, so unlike PNG/GIF this is not fixed-offset arithmetic.  Runs
    per Arrow batch; non-JPEG rows exit on the first two bytes."""
    out = []
    for b in payload:
        dims = None
        if b is not None:
            b = bytes(b)
            if b[:3] == b"\xff\xd8\xff":
                i = 2
                while i + 4 <= len(b) and b[i] == 0xFF:
                    marker = b[i + 1]
                    if 0xD0 <= marker <= 0xD9:   # standalone (RSTn/SOI/EOI)
                        i += 2
                        continue
                    seg_len = int.from_bytes(b[i + 2:i + 4], "big")
                    if seg_len < 2:
                        break
                    if marker in _JPEG_SOF_MARKERS:
                        if i + 9 <= len(b):
                            h = int.from_bytes(b[i + 5:i + 7], "big")
                            w = int.from_bytes(b[i + 7:i + 9], "big")
                            dims = [w, h]
                        break
                    i += 2 + seg_len
        out.append(dims)
    return pd.Series(out, dtype=object)


def media_dims(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Adds ``media_w``/``media_h`` (LONG, NULL when not parseable):

    * PNG — IHDR width/height, big-endian u32 at bytes 17-24 (gated on the
      8-byte magic AND the 'IHDR' chunk tag at bytes 13-16);
    * GIF — logical-screen width/height, little-endian u16 at bytes 7-10
      (gated on the full GIF87a/GIF89a version magic);
    * JPEG — first SOF0/1/2 frame header via the Arrow segment walk.

    PNG/GIF are pure Column expressions over ONE hex transcript (never a
    UTF-8 decode — payloads are arbitrary binary) and are oracle-checkable
    hex arithmetic; the JPEG walk is pytest-pinned and differentially
    checked against a fixed-offset oracle on synthesized payloads."""
    p = F.col(payload_col)
    hx = F.lower(F.hex(F.substring(p, 1, 32)))   # headers live in 32 bytes
    is_png = (hx.startswith(_PNG_MAGIC_HEX)
              & (F.substring(hx, 25, 8) == F.lit(_IHDR_HEX)))
    is_gif = (F.substring(hx, 1, 12) == _GIF_VERSIONS_HEX[0]) | (
        F.substring(hx, 1, 12) == _GIF_VERSIONS_HEX[1])
    is_jpeg = hx.startswith(_JPEG_MAGIC_HEX)
    jd = _jpeg_dims_udf(p)
    w = (F.when(is_png, _be_hex_int(hx, 33, 4))
          .when(is_gif, _le16_hex_int(hx, 13))
          .when(is_jpeg, F.element_at(jd, 1)))
    h = (F.when(is_png, _be_hex_int(hx, 41, 4))
          .when(is_gif, _le16_hex_int(hx, 17))
          .when(is_jpeg, F.element_at(jd, 2)))
    return df.withColumn("media_w", w).withColumn("media_h", h)


def media_dims_sql(hex_expr: str, jpeg_sof_pos_expr: str | None = None) -> tuple[str, str]:
    """DuckDB twins of the PNG/GIF dimension arithmetic over a LOWERCASE hex
    transcript: (media_w_sql, media_h_sql).  ``jpeg_sof_pos_expr``: 1-based
    hex position of the SOF marker for synthesized JPEG corpora whose
    segment layout is formula-known (the generic Spark walk is checked
    against this fixed-offset oracle); None leaves JPEG dims NULL."""
    png = (f"substr({hex_expr}, 1, 16) = '{_PNG_MAGIC_HEX}' "
           f"AND substr({hex_expr}, 25, 8) = '{_IHDR_HEX}'")
    gif = (f"substr({hex_expr}, 1, 12) IN ('{_GIF_VERSIONS_HEX[0]}', "
           f"'{_GIF_VERSIONS_HEX[1]}')")
    def be(pos, nbytes):
        return f"CAST(('0x' || substr({hex_expr}, {pos}, {2 * nbytes})) AS BIGINT)"
    def le16(pos):
        return (f"CAST(('0x' || substr({hex_expr}, {pos} + 2, 2) || "
                f"substr({hex_expr}, {pos}, 2)) AS BIGINT)")
    jw = jh = "NULL"
    if jpeg_sof_pos_expr is not None:
        # SOF segment: marker(2B) len(2B) precision(1B) height(2B) width(2B)
        sof = f"({jpeg_sof_pos_expr})"
        jh = f"CAST(('0x' || substr({hex_expr}, {sof} + 10, 4)) AS BIGINT)"
        jw = f"CAST(('0x' || substr({hex_expr}, {sof} + 14, 4)) AS BIGINT)"
    jpeg = f"substr({hex_expr}, 1, 6) = '{_JPEG_MAGIC_HEX}'"
    w = (f"CASE WHEN {png} THEN {be(33, 4)} WHEN {gif} THEN {le16(13)} "
         f"WHEN {jpeg} THEN {jw} ELSE NULL END")
    h = (f"CASE WHEN {png} THEN {be(41, 4)} WHEN {gif} THEN {le16(17)} "
         f"WHEN {jpeg} THEN {jh} ELSE NULL END")
    return w, h


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
