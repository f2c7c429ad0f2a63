"""Structured Streaming: batch-equivalence of the incremental pipelines."""

import pytest
from pyspark.sql import functions as F

from polycheck_spark.data import synth
from polycheck_spark.data.polygons import default_query_layer
from polycheck_spark.operators import pip_join as PJ
from polycheck_spark.streaming import pipeline as SP


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    """Pages written as several parquet files (stream input chunks)."""
    d = str(tmp_path_factory.mktemp("pages_src"))
    for i in range(3):
        synth.generate_pages(spark, 3000).filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i) \
            .write.mode("append").parquet(d)
    return d


def test_stream_pip_join_equals_batch(spark, source_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    layer = default_query_layer()
    q = SP.stream_pip_join(spark, source_dir, layer, out, ckpt)
    q.awaitTermination(300)

    got = sorted((r["url"], r["polygon_id"])
                 for r in spark.read.parquet(out).collect())

    pages = spark.read.parquet(source_dir)
    lon, lat = synth.geocode_url_cols(F.col("url"))
    pts = pages.withColumn("lon", lon).withColumn("lat", lat)
    exp = sorted((r["url"], r["polygon_id"])
                 for r in PJ.pip_join(spark, pts, layer)
                 .select("url", "polygon_id").collect())
    assert got == exp and len(got) > 0


def test_stream_resume_processes_only_new_files(spark, source_dir, tmp_path):
    """Restarting the stream after new files arrive appends only their rows
    (streaming checkpoint = exactly-once per input file)."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    layer = default_query_layer()
    SP.stream_pip_join(spark, source_dir, layer, out, ckpt).awaitTermination(300)
    n1 = spark.read.parquet(out).count()

    # restart with no new input: nothing is reprocessed
    SP.stream_pip_join(spark, source_dir, layer, out, ckpt).awaitTermination(300)
    assert spark.read.parquet(out).count() == n1


def test_stream_dedup_windowed_across_batches(spark, tmp_path):
    """Stateful streaming dedup: a text seen in an earlier micro-batch is
    dropped in later ones; exactly one representative per distinct text."""
    import time as _time
    src = str(tmp_path / "dup_src")
    base = synth.generate_pages(spark, 400)
    # file 1: originals; file 2: the SAME texts under different urls + fresh ones
    base.coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.2)
    dup = base.limit(150).withColumn("url", F.concat(F.col("url"), F.lit("?dup=1")))
    fresh = synth.generate_pages(spark, 500).filter(F.xxhash64("url") % 5 == 0) \
        .withColumn("text", F.concat(F.lit("fresh "), F.col("text")))
    dup.unionByName(fresh).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    SP.stream_dedup_windowed(spark, src, out_dir=out, checkpoint_dir=ckpt) \
        .awaitTermination(300)

    got = spark.read.parquet(out).select("url", "text_md5").collect()
    md5s = [r["text_md5"] for r in got]
    assert len(md5s) == len(set(md5s)), "a digest was emitted twice"
    n_distinct = (spark.read.parquet(src)
                  .select(F.md5("text")).distinct().count())
    assert len(md5s) == n_distinct
    # duplicated texts keep their batch-1 representative (no '?dup=1' url
    # may appear: its text was already seen in the earlier file)
    assert not any(r["url"].endswith("?dup=1") for r in got)


def test_stream_dedup_state_is_bounded(spark, tmp_path):
    """Sliding-window state cap: with max_state_per_shard=4 and one shard,
    recent duplicates are dropped while duplicates of EVICTED digests
    re-emit — i.e. state size plateaus at the cap instead of growing."""
    import time as _time
    src = str(tmp_path / "cap_src")
    rows1 = [(f"u{i}", f"text number {i}") for i in range(10)]
    spark.createDataFrame(rows1, "url string, text string") \
        .withColumn("warc_ts", F.current_timestamp()) \
        .withColumn("html", F.col("text").cast("binary")) \
        .select("url", "warc_ts", "html", "text", F.lit("en").alias("lang")) \
        .coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.2)
    # insertion order within a batch is (md5, url)-sorted, so the cap keeps
    # the 4 digest-largest texts of batch 1 — compute survivors explicitly
    import hashlib
    by_md5 = sorted(range(10), key=lambda i: hashlib.md5(
        f"text number {i}".encode()).hexdigest())
    evicted, kept = by_md5[:6], by_md5[6:]
    probe = [evicted[0], evicted[1], kept[-2], kept[-1]]
    rows2 = [(f"r{i}", f"text number {i}") for i in probe]
    spark.createDataFrame(rows2, "url string, text string") \
        .withColumn("warc_ts", F.current_timestamp()) \
        .withColumn("html", F.col("text").cast("binary")) \
        .select("url", "warc_ts", "html", "text", F.lit("en").alias("lang")) \
        .coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "cap_out")
    ckpt = str(tmp_path / "cap_ckpt")
    SP.stream_dedup_windowed(spark, src, out_dir=out, checkpoint_dir=ckpt,
                          n_shards=1, max_state_per_shard=4) \
        .awaitTermination(300)
    got = {r["url"] for r in spark.read.parquet(out).collect()}
    assert {f"u{i}" for i in range(10)} <= got                    # batch 1 all distinct
    assert {f"r{i}" for i in probe[:2]} <= got                    # evicted digests re-emit
    assert not ({f"r{i}" for i in probe[2:]} & got)               # kept digests still dedup


def test_stream_tile_counts_watermark_semantics(spark, tmp_path):
    """With time-ordered input files nothing arrives late, so every window the
    watermark released must match the batch count exactly; windows newer than
    the final watermark stay unemitted (append-mode contract)."""
    import time as _time
    source_dir = str(tmp_path / "ordered_src")
    pages_all = synth.generate_pages(spark, 9000).localCheckpoint()
    bounds = pages_all.agg(F.min("warc_ts"), F.max("warc_ts")).collect()[0]
    lo, hi = bounds[0], bounds[1]
    import datetime as _dt
    span = (hi - lo) / 3
    for i in range(3):
        upper = lo + span * (i + 1) if i < 2 else hi + _dt.timedelta(seconds=1)
        chunk = pages_all.filter(
            (F.col("warc_ts") >= F.lit(lo + span * i))
            & (F.col("warc_ts") < F.lit(upper))
        )
        chunk.coalesce(1).write.mode("append").parquet(source_dir)
        _time.sleep(1.2)  # distinct mtimes -> files stream oldest-first

    out = str(tmp_path / "tiles")
    ckpt = str(tmp_path / "tiles_ckpt")
    q = SP.stream_tile_counts(spark, source_dir, res=3, window="1 hour",
                              watermark="1 hour", out_dir=out, checkpoint_dir=ckpt)
    q.awaitTermination(300)
    got = {(r["window_start"], r["cell_id"]): r["n_pages"]
           for r in spark.read.parquet(out).collect()}
    assert got, "watermark must have released at least the early windows"

    # batch equivalent, restricted to windows the watermark released
    pages = spark.read.parquet(source_dir)
    lon, lat = synth.geocode_url_cols(F.col("url"))
    from polycheck_spark.geo import cells as C
    tiled = (pages.withColumn("lon", lon).withColumn("lat", lat)
             .withColumn("cell_id", C.cell_id_col(F.col("lon"), F.col("lat"), 3)))
    max_ts = tiled.agg(F.max("warc_ts")).collect()[0][0]
    exp_all = (tiled.groupBy(F.window("warc_ts", "1 hour").alias("w"), "cell_id")
               .agg(F.count(F.lit(1)).alias("n"))
               .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"),
                       "cell_id", "n").collect())
    import datetime
    wm = max_ts - datetime.timedelta(hours=1)
    exp = {(r["ws"], r["cell_id"]): r["n"] for r in exp_all if r["we"] <= wm}
    assert got == exp


def test_stream_tile_counts_replay_is_exactly_once(spark, tmp_path):
    """The parquet file-sink's commit log must make restarts exactly-once:
    re-running on the same checkpoint (no new input) emits nothing, and a
    restart that DOES process new input never re-emits an already-released
    window — no duplicate (window_start, cell_id) keys ever appear."""
    import time as _time
    import datetime as _dt
    source_dir = str(tmp_path / "replay_src")
    pages_all = synth.generate_pages(spark, 9000).localCheckpoint()
    bounds = pages_all.agg(F.min("warc_ts"), F.max("warc_ts")).collect()[0]
    lo, hi = bounds[0], bounds[1]
    span = (hi - lo) / 3
    chunks = []
    for i in range(3):
        upper = lo + span * (i + 1) if i < 2 else hi + _dt.timedelta(seconds=1)
        chunks.append(pages_all.filter(
            (F.col("warc_ts") >= F.lit(lo + span * i))
            & (F.col("warc_ts") < F.lit(upper))))

    out = str(tmp_path / "replay_tiles")
    ckpt = str(tmp_path / "replay_ckpt")

    def run():
        SP.stream_tile_counts(spark, source_dir, res=3, window="1 hour",
                              watermark="1 hour", out_dir=out,
                              checkpoint_dir=ckpt).awaitTermination(300)

    def keys():
        rows = spark.read.parquet(out).collect()
        return [(r["window_start"], r["cell_id"]) for r in rows]

    # phase 1: first two files, stream "killed" after completing them
    chunks[0].coalesce(1).write.mode("append").parquet(source_dir)
    _time.sleep(1.2)
    chunks[1].coalesce(1).write.mode("append").parquet(source_dir)
    run()
    k1 = keys()
    assert len(k1) == len(set(k1)) and k1, "phase-1 output has duplicate windows"

    # phase 2: rerun with NO new input — nothing may be re-emitted
    run()
    assert sorted(keys()) == sorted(k1)

    # phase 3: third file arrives, restart from the same checkpoint — new
    # windows append, released ones appear exactly once across the restart
    _time.sleep(1.2)
    chunks[2].coalesce(1).write.mode("append").parquet(source_dir)
    run()
    k3 = keys()
    assert len(k3) == len(set(k3)), "restart re-emitted an existing window"
    assert set(k1) <= set(k3) and len(k3) > len(k1)


def test_stream_dedup_against_corpus_equals_batch_join(spark, tmp_path):
    """Bloom-prefiltered stream-vs-frozen-corpus dedup is LOSSLESS: the
    union of micro-batch verdicts equals the plain batch left join (misses
    skip the join, false positives are re-verified)."""
    src = str(tmp_path / "cc_src")
    base = synth.generate_pages(spark, 600)
    # stream files: thirds by url hash; corpus: every even-id page's text
    for i in range(3):
        base.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i) \
            .write.mode("append").parquet(src)
    corpus_dir = str(tmp_path / "corpus_digests")
    corpus = base.filter(F.pmod(F.xxhash64("text"), F.lit(2)) == 0) \
        .select(F.md5(F.col("text")).alias("digest")).distinct()
    corpus.write.parquet(corpus_dir)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = SP.stream_dedup_against_corpus(
        spark, src, corpus_digest_dir=corpus_dir, out_dir=out,
        checkpoint_dir=ckpt, m_bits=1 << 12, k=3)  # small bitmap: FPs likely
    q.awaitTermination(300)

    got = sorted(map(tuple, spark.read.parquet(out)
                     .select("url", "digest", "status").collect()))
    pages = spark.read.parquet(src).select(
        "url", F.md5(F.col("text")).alias("digest"))
    exp = sorted(map(tuple, pages.join(
        spark.read.parquet(corpus_dir).withColumn("__s", F.lit(True)),
        "digest", "left")
        .select("url", "digest",
                F.when(F.col("__s").isNotNull(), "dup_of_corpus")
                .otherwise("new").alias("status")).collect()))
    assert got == exp and len(got) == 600
    statuses = {t[2] for t in got}
    assert statuses == {"new", "dup_of_corpus"}


def test_stream_dwell_segments_spans_batches(spark, tmp_path):
    """A dwell run OPEN at a micro-batch boundary must keep accumulating in
    the next batch (one segment, not two), closed segments must equal the
    batch operator's non-final segments, and per-user state is one tuple."""
    import time as _time
    from datetime import datetime
    from polycheck_spark.operators.temporal import dwell_segments

    def ts(m):
        return datetime(2024, 1, 1, 0, m)

    # user 7: A(0-3) B(4-12, SPANS the file boundary at minute 10) A(13-15)
    # user 8: one cell throughout -> only an open segment, nothing emitted
    rows1 = ([(m, 7, ts(m), 2, 2) for m in range(0, 4)]
             + [(100 + m, 7, ts(m), 5, 1) for m in range(4, 10)]
             + [(200 + m, 8, ts(m), 0, 0) for m in range(0, 10)])
    rows2 = ([(100 + m, 7, ts(m), 5, 1) for m in range(10, 13)]
             + [(300 + m, 7, ts(m), 2, 2) for m in range(13, 16)]
             + [(200 + m, 8, ts(m), 0, 0) for m in range(10, 16)])
    schema = "event_id long, user_id long, ts timestamp, ix long, iy long"
    src = str(tmp_path / "traj_src")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    _time.sleep(1.2)
    spark.createDataFrame(rows2, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    out = str(tmp_path / "dwell_out")
    ckpt = str(tmp_path / "dwell_ckpt")
    SP.stream_dwell_segments(spark, src, out_dir=out, checkpoint_dir=ckpt) \
        .awaitTermination(300)

    got = sorted(tuple(r) for r in spark.read.parquet(out)
                 .select("user_id", "seg_no", "ix", "iy", "n_events",
                         "enter_ms", "leave_ms", "dwell_ms").collect())
    # batch reference on the union, minus each user's final (open) segment
    allev = spark.createDataFrame(rows1 + rows2, schema)
    batch = dwell_segments(allev)
    last = batch.groupBy("user_id").agg(F.max("seg_no").alias("seg_no"))
    exp = sorted(tuple(r) for r in batch.join(last, ["user_id", "seg_no"],
                                              "left_anti")
                 .select("user_id", "seg_no", "ix", "iy", "n_events",
                         "enter_ms", "leave_ms", "dwell_ms").collect())
    assert got == exp and len(got) == 2          # user 7's A-run and B-run
    spans = {r[1]: r for r in got}
    assert spans[2][4] == 9                      # B-run: 6 + 3 events, ONE segment
    assert spans[2][7] == 8 * 60_000             # minute 4 -> minute 12


def test_stream_od_flows_equals_batch_exactly(spark, tmp_path):
    """A move that STRADDLES the micro-batch boundary (last event of batch 1
    in cell B, first event of batch 2 in cell A) must be emitted, and the
    rolled-up stream output must equal the batch od_flows operator on the
    full history EXACTLY (moves close instantly, so nothing stays open)."""
    import time as _time
    from datetime import datetime
    from polycheck_spark.operators.temporal import od_flows

    def ts(m):
        return datetime(2024, 1, 1, 0, m)

    # user 7: A A B | A A  -> moves A->B (in-batch), B->A (straddles)
    # user 8: A | B B      -> move A->B (straddles)
    # user 9: C | C        -> no move (stay across the boundary)
    rows1 = ([(m, 7, ts(m), 2, 2) for m in (0, 1)] + [(2, 7, ts(2), 5, 1)]
             + [(10, 8, ts(0), 2, 2)]
             + [(20, 9, ts(0), 8, 8)])
    rows2 = ([(m, 7, ts(m), 2, 2) for m in (3, 4)]
             + [(11 + m, 8, ts(1 + m), 5, 1) for m in (0, 1)]
             + [(21, 9, ts(1), 8, 8)])
    schema = "event_id long, user_id long, ts timestamp, ix long, iy long"
    src = str(tmp_path / "od_src")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    _time.sleep(1.2)
    spark.createDataFrame(rows2, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    out = str(tmp_path / "od_out")
    ckpt = str(tmp_path / "od_ckpt")
    SP.stream_od_flows(spark, src, out_dir=out, checkpoint_dir=ckpt) \
        .awaitTermination(300)

    moves = spark.read.parquet(out)
    got = sorted(tuple(r) for r in moves
                 .groupBy("src_ix", "src_iy", "dst_ix", "dst_iy")
                 .agg(F.count(F.lit(1)).alias("n_moves"),
                      F.countDistinct("user_id").alias("n_users"))
                 .collect())
    exp = sorted(tuple(r) for r in
                 od_flows(spark.createDataFrame(rows1 + rows2, schema))
                 .collect())
    assert got == exp and len(got) == 2
    # the straddling B->A move carries the batch-2 arrival timestamp
    back = {(r["src_ix"], r["src_iy"], r["dst_ix"], r["dst_iy"]): r["move_ms"]
            for r in moves.filter(F.col("user_id") == 7).collect()}
    epoch_2024 = 1_704_067_200_000          # 2024-01-01T00:00Z
    assert back[(5, 1, 2, 2)] == epoch_2024 + 3 * 60_000
