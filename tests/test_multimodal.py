"""Multimodal binary-column plumbing tests (decode itself is stubbed)."""

import pytest
from pyspark.sql import functions as F

from polycheck_spark.data import synth
from polycheck_spark.operators import multimodal as M


def test_media_metadata_columns(spark):
    pages = synth.generate_pages(spark, 50)
    meta = M.media_metadata(pages)
    rows = meta.select("url", "media_bytes", "media_sha", "media_type").collect()
    assert all(r["media_bytes"] > 0 for r in rows)
    assert all(len(r["media_sha"]) == 64 for r in rows)
    assert all(r["media_type"] == "text/html" for r in rows)  # generator emits <html>


def test_media_sniffer_magic_dispatch(spark):
    """Case-variant text prefixes and RIFF container subtypes (bytes 9-12)."""
    cases = [
        (b"\x89PNG\r\n\x1a\nrest", "image/png"),
        (b"\xff\xd8\xff\xe0body", "image/jpeg"),
        (b"GIF89a...", "image/gif"),
        (b"<html><body>", "text/html"),
        (b"<HTML><BODY>", "text/html"),
        (b"<!doctype html>", "text/html"),
        (b"<!DOCTYPE HTML>", "text/html"),
        (b"RIFF\x10\x00\x00\x00WAVEfmt ", "audio/wav"),
        (b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image/webp"),
        (b"RIFF\x10\x00\x00\x00AVI LIST", "video/x-msvideo"),
        (b"RIFF\x10\x00\x00\x00XXXX....", "application/octet-stream"),
        (b"plain bytes", "application/octet-stream"),
    ]
    df = spark.createDataFrame([(i, bytearray(b)) for i, (b, _) in enumerate(cases)],
                               "i int, payload binary")
    got = {r["i"]: r["media_type"]
           for r in M.media_metadata(df, payload_col="payload").collect()}
    for i, (_, expected) in enumerate(cases):
        assert got[i] == expected, (i, cases[i], got[i])


def _png(w, h):
    import struct
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00")


def _gif(w, h, ver=b"89a"):
    import struct
    return b"GIF" + ver + struct.pack("<HH", w, h) + b"\xf7\x00\x00"


def _jpeg(w, h, app_pad=7, marker=0xC0, with_sof=True):
    import struct
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + app_pad) + b"\x00" * app_pad
    sof = (bytes([0xFF, marker]) + struct.pack(">H", 17) + b"\x08"
           + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9)
    return b"\xff\xd8" + app0 + app1 + (sof if with_sof else b"")


def test_media_dims_goldens(spark):
    """Header-level width/height: PNG IHDR (BE u32), GIF logical screen
    (LE u16, both versions), JPEG SOF0/SOF2 behind variable-length APP
    segments; non-media and truncated headers yield NULLs — all real byte
    arithmetic, no codec."""
    cases = [
        (_png(800, 600), (800, 600)),
        (_png(1, 4_000_000), (1, 4_000_000)),          # >u16 dims exercise u32
        (_gif(320, 200, b"87a"), (320, 200)),
        (_gif(0x1234, 77), (0x1234, 77)),
        (_jpeg(640, 480), (640, 480)),                  # SOF0, short APP1
        (_jpeg(31, 9999, app_pad=29, marker=0xC2), (31, 9999)),  # SOF2, long APP1
        (_jpeg(5, 5, with_sof=False), (None, None)),    # no SOF segment
        (b"\x89PNG\r\n\x1a\nXXXXYYYY", (None, None)),   # magic but no IHDR
        (b"GIF8" + b"a3f1b2", (None, None)),            # versionless GIF8 prefix
        (b"<html><body>hello</body>", (None, None)),
    ]
    df = spark.createDataFrame([(i, bytearray(b)) for i, (b, _) in enumerate(cases)],
                               "i int, payload binary")
    got = {r["i"]: (r["media_w"], r["media_h"])
           for r in M.media_dims(df, payload_col="payload").collect()}
    for i, (_, expected) in enumerate(cases):
        assert got[i] == expected, (i, cases[i], got[i])


def test_media_dims_sql_twin_matches(spark):
    """The DuckDB hex-arithmetic twin must agree with the Spark parse on
    PNG/GIF (fixed-offset) and on JPEG via the fixed-offset oracle for a
    formula-known segment layout (generic walk vs computed SOF position)."""
    import duckdb
    payloads = [_png(12, 34), _gif(56, 78), _gif(9, 10, b"87a"),
                _jpeg(111, 222, app_pad=5), b"plain text bytes"]
    # jpeg SOF hex position for THIS layout: 2 + 18 + (4 + 5) bytes before it
    sof_pos = 2 * (2 + 18 + 4 + 5) + 1
    df = spark.createDataFrame([(i, bytearray(b)) for i, b in enumerate(payloads)],
                               "i int, payload binary")
    got = sorted((r["i"], r["media_w"], r["media_h"])
                 for r in M.media_dims(df, payload_col="payload").collect())
    w_sql, h_sql = M.media_dims_sql("hx", jpeg_sof_pos_expr=str(sof_pos))
    con = duckdb.connect()
    hex_rows = ", ".join(f"({i}, '{b.hex()}')" for i, b in enumerate(payloads))
    exp = sorted(con.execute(
        f"SELECT i, {w_sql} AS w, {h_sql} AS h "
        f"FROM (SELECT * FROM (VALUES {hex_rows}) t(i, hx))").fetchall())
    assert got == exp


def test_decode_media_strict_raises(spark):
    pages = synth.generate_pages(spark, 5)
    with pytest.raises(Exception) as ei:
        M.decode_media(pages, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "codecs" in str(ei.value)


def test_decode_media_fake_features_deterministic(spark):
    pages = synth.generate_pages(spark, 40)
    a = {r["url"]: (r["media_bytes"], tuple(r["features"]))
         for r in M.decode_media(pages, strict=False).collect()}
    b = {r["url"]: (r["media_bytes"], tuple(r["features"]))
         for r in M.decode_media(synth.generate_pages(spark, 40, partitions=7),
                                 strict=False).collect()}
    assert a == b
    for nbytes, feats in a.values():
        assert len(feats) == M.N_FEATURES
        assert abs(sum(feats) - 1.0) < 1e-3
        assert nbytes > 0


def test_frame_sample_plan(spark):
    pages = synth.generate_pages(spark, 10)
    plan = M.frame_sample_plan(pages, every_n=2)
    rows = plan.groupBy("url").agg(F.collect_list("frame_idx").alias("idx")).collect()
    for r in rows:
        assert sorted(r["idx"]) == r["idx"]
        assert all(i % 2 == 0 for i in r["idx"])
