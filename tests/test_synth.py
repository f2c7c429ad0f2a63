"""Determinism invariants of the synthetic pages generator."""

from pyspark.sql import functions as F

from polycheck_spark.data import synth


def test_pages_deterministic_across_partitionings(spark):
    """Same url -> byte-identical text/html/lang/warc_ts for any parallelism."""
    a = synth.geocoded_pages(spark, 500, partitions=1)
    b = synth.geocoded_pages(spark, 500, partitions=7)

    def digest(df):
        return {r["url"]: (r["th"], r["hh"], r["lang"], r["warc_ts"], r["lon"], r["lat"])
                for r in df.select(
                    "url", F.sha2(F.col("text"), 256).alias("th"),
                    F.sha2(F.col("html"), 256).alias("hh"),
                    "lang", "warc_ts", "lon", "lat").collect()}

    assert digest(a) == digest(b)


def test_pages_schema_matches_input_hint(spark):
    df = synth.generate_pages(spark, 10)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
        ("text", "string"), ("lang", "string"),
    ]


def test_hot_spot_mixture_present(spark):
    """~20% of pages land within 0.01 deg of a hot center (skew is real)."""
    df = synth.geocoded_pages(spark, 2000)
    conds = [
        (F.abs(F.col("lon") - c[0]) < 0.01) & (F.abs(F.col("lat") - c[1]) < 0.01)
        for c in synth.HOT_CENTERS
    ]
    hot_cond = conds[0]
    for c in conds[1:]:
        hot_cond = hot_cond | c
    frac = df.filter(hot_cond).count() / 2000.0
    assert 0.1 < frac < 0.3


def test_html_embeds_text_bytes(spark):
    rows = synth.generate_pages(spark, 20).collect()
    for r in rows:
        assert r["text"].encode("utf-8") in bytes(r["html"])


def test_source_format_roundtrip(spark, sf_dir, tmp_path):
    """Source breadth: the same table round-trips through JSON lines (full
    rows, arbitrary text) and CSV (scalar columns) without value drift."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200).localCheckpoint()
    ref = sorted((r["doc_id"], r["text"], r["lang"]) for r in docs.collect())

    jdir = str(tmp_path / "docs_json")
    docs.write.mode("overwrite").json(jdir)
    back_j = spark.read.json(jdir)
    got_j = sorted((r["doc_id"], r["text"], r["lang"]) for r in back_j.collect())
    assert got_j == ref

    cdir = str(tmp_path / "docs_csv")
    docs.select("doc_id", "lang").write.mode("overwrite") \
        .option("header", True).csv(cdir)
    back_c = spark.read.option("header", True).option("inferSchema", True).csv(cdir)
    got_c = sorted((r["doc_id"], r["lang"]) for r in back_c.collect())
    assert got_c == sorted((r["doc_id"], r["lang"]) for r in docs.collect())
