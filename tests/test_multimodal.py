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
