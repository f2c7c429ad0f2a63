"""Structured Streaming surface.

The reference has no streaming semantics (SURVEY.md §2: no watermarks,
windows, or state), so this module is the engine-level incremental path:

* :func:`stream_pip_join` — ``readStream`` over a pages directory ->
  ``foreachBatch`` reusing the *identical* batch ``pip_join``.  foreachBatch
  is the right shape here: the join's build side is broadcast and stateless,
  so each micro-batch is exactly the batch operator.  foreachBatch itself is
  at-least-once, so the sink write is made idempotent (each batch overwrites
  its own ``batch_id=N`` directory) — replayed batches converge instead of
  duplicating.
* :func:`stream_tile_counts` — event-time windowed aggregation: pages per
  (time window, coarse tile) with a watermark bounding late-data state.

Both run with ``trigger(availableNow=True)`` in tests — the batch-equivalent
guarantee is asserted against the batch operators on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from polycheck_spark.geo import cells as C
from polycheck_spark.operators import pip_join as PJ

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def read_pages_stream(spark: SparkSession, source_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def stream_pip_join(spark: SparkSession, source_dir: str, layer: list[dict],
                    out_dir: str, checkpoint_dir: str, *,
                    available_now: bool = True):
    """Incremental PIP join: each micro-batch runs the batch operator and
    appends (url, polygon_id, cell_id, text_sha) to the sink."""
    from polycheck_spark.data.synth import geocode_url_cols

    stream = read_pages_stream(spark, source_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        lon, lat = geocode_url_cols(F.col("url"))
        pts = batch_df.withColumn("lon", lon).withColumn("lat", lat)
        joined = PJ.pip_join(spark, pts, layer)
        # idempotent per-batch write: a micro-batch retried after a partial
        # write overwrites its own batch_id directory, so replays cannot
        # duplicate rows (foreachBatch alone is only at-least-once)
        (joined.select("url", "polygon_id", "cell_id", "lon", "lat",
                       F.sha2(F.col("text"), 256).alias("text_sha"))
         .write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}"))

    writer = (stream.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


DEDUP_OUT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("text_md5", T.StringType()),
])
_DEDUP_STATE_SCHEMA = T.StructType([
    T.StructField("seen", T.ArrayType(T.StringType())),
])


DEDUP_DIGEST_CHARS = 16  # 64-bit truncated digests in state (half the bytes)


def stream_dedup_windowed(spark: SparkSession, source_dir: str, *,
                          out_dir: str, checkpoint_dir: str,
                          n_shards: int = 64, available_now: bool = True,
                          max_files_per_trigger: int | None = 1,
                          max_state_per_shard: int = 2_000_000):
    """Cross-batch text dedup with SLIDING-WINDOW semantics: custom stateful
    operator via ``applyInPandasWithState``.

    Named for what it guarantees (a review finding): state holds truncated
    digests under a FIFO cap, so (a) a 64-bit collision can drop a
    non-duplicate (~n^2/2^64 per shard) and (b) a duplicate arriving after
    its digest's eviction is re-emitted.  Within the window the dedup is
    exact.  For strict exact semantics set ``max_state_per_shard`` to a
    value the executors' state store can hold and accept unbounded growth —
    at the 10^12-document design point that is NOT this operator's contract
    (use the batch ``exact_duplicates`` pass for global exactness).

    Texts are sharded by an md5 prefix; each shard's state holds the digests
    already emitted, so a page whose text appeared in an earlier micro-batch
    is dropped. Within a batch the (md5, url)-smallest row wins — output is
    deterministic for a fixed file order.

    State bound (the 10^12-document contract): state holds TRUNCATED digests
    (``DEDUP_DIGEST_CHARS`` hex chars = 64 bits; collision odds ~n^2/2^64 per
    shard) in insertion order, capped at ``max_state_per_shard`` entries —
    beyond the cap the OLDEST digests are evicted, giving sliding-window
    dedup semantics: a duplicate arriving after its digest's eviction is
    re-emitted. Total state <= n_shards * cap * 16 bytes, a constant —
    independent of stream length.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = read_pages_stream(spark, source_dir, max_files_per_trigger)
    keyed = (stream
             .withColumn("text_md5", F.md5(F.col("text")))
             .withColumn("shard",
                         F.pmod(F.conv(F.substring("text_md5", 1, 4), 16, 10)
                                .cast("long"), F.lit(n_shards)))
             .select("shard", "url", "text_md5"))

    def dedup(key, pdfs, state):
        import pandas as pd
        # truncate on load too: state written by an earlier full-digest
        # version migrates transparently instead of never matching again
        order = ([e[:DEDUP_DIGEST_CHARS] for e in state.get[0]]
                 if state.exists else [])
        seen = set(order)
        # materialize ALL chunks before sorting: the (md5, url)-smallest row
        # must win across the whole micro-batch, not per Arrow chunk
        rows = [(m, u) for pdf in pdfs for m, u in zip(pdf["text_md5"], pdf["url"])]
        out_urls, out_md5 = [], []
        for md5, url in sorted(rows):
            d = md5[:DEDUP_DIGEST_CHARS]
            if d not in seen:
                seen.add(d)
                order.append(d)
                out_urls.append(url)
                out_md5.append(md5)
        if len(order) > max_state_per_shard:
            order = order[-max_state_per_shard:]  # evict oldest (FIFO)
        state.update((order,))
        yield pd.DataFrame({"url": out_urls, "text_md5": out_md5})

    deduped = keyed.groupBy("shard").applyInPandasWithState(
        dedup, DEDUP_OUT_SCHEMA, _DEDUP_STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    writer = (deduped.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_against_corpus(spark: SparkSession, source_dir: str, *,
                                corpus_digest_dir: str, out_dir: str,
                                checkpoint_dir: str,
                                m_bits: int = 1 << 20, k: int = 5,
                                available_now: bool = True,
                                max_files_per_trigger: int | None = 1):
    """Continuous-ingestion dedup of a crawl stream against a FROZEN corpus:
    per page, ``status`` is ``dup_of_corpus`` iff its text digest is in the
    corpus digest index, else ``new``.

    The scale contract is the point: the corpus index is 10^12 rows, the
    micro-batch is thousands — joining every batch against the index would
    re-shuffle (or at best re-probe) the giant side every few seconds.
    Instead the Bloom bitmap over the index is built ONCE at stream start
    (:func:`~polycheck_spark.operators.bloom.bloom_build` — m/64-word
    shuffle, never corpus-sized) and eagerly pinned; each micro-batch then
    probes it MAP-SIDE (one-row broadcast, zero batch shuffle) and only the
    maybe-present fraction — a few percent at realistic inter-crawl dup
    rates — pays the exact digest join that makes the verdict lossless
    (misses are guaranteed absent; bloom false positives are re-verified,
    so output equals the unfiltered join bit-for-bit).

    In-stream (batch-to-batch) duplicates are out of scope here — that is
    :func:`stream_dedup_windowed`'s stateful contract; composing the two
    gives the full incremental pipeline.  Sink writes are idempotent
    per-batch directories, same replay-convergence rationale as
    :func:`stream_pip_join`.
    """
    from polycheck_spark.operators.bloom import bloom_build, bloom_might_contain

    corpus = spark.read.parquet(corpus_digest_dir).select("digest").distinct()
    # build + pin the bitmap once; every micro-batch reuses the materialized
    # one-row frame instead of re-scanning the corpus
    bloom = bloom_build(corpus, "digest", m_bits=m_bits, k=k).localCheckpoint()

    stream = read_pages_stream(spark, source_dir, max_files_per_trigger)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = batch_df.select("url", F.md5(F.col("text")).alias("digest"))
        probed = bloom_might_contain(batch, "digest", bloom,
                                     m_bits=m_bits, k=k)
        hits = (probed.filter(F.col("bloom_hit"))
                .join(corpus.withColumn("__seen", F.lit(True)),
                      "digest", "left"))
        misses = (probed.filter(~F.col("bloom_hit"))
                  .withColumn("__seen", F.lit(None).cast("boolean")))
        verdicts = (hits.select("url", "digest", "__seen")
                    .unionByName(misses.select("url", "digest", "__seen"))
                    .select("url", "digest",
                            F.when(F.col("__seen").isNotNull(),
                                   "dup_of_corpus")
                            .otherwise("new").alias("status")))
        verdicts.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}")

    writer = (stream.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_tile_counts(spark: SparkSession, source_dir: str, *,
                       res: int = 4, window: str = "1 hour",
                       watermark: str = "2 hours",
                       out_dir: str, checkpoint_dir: str,
                       available_now: bool = True,
                       max_files_per_trigger: int | None = 1):
    """Watermarked event-time aggregation: page counts per (window, tile).

    State is bounded by the watermark: tiles stop accepting pages once
    event time passes ``watermark`` behind the max seen — the standard
    late-data contract for an append-mode windowed aggregate.
    """
    from polycheck_spark.data.synth import geocode_url_cols

    # window results emit on the micro-batch AFTER the watermark passes them,
    # so bounded replays must span several batches (one file per trigger)
    stream = read_pages_stream(spark, source_dir, max_files_per_trigger)
    lon, lat = geocode_url_cols(F.col("url"))
    tiled = C.with_cell_id(stream.withColumn("lon", lon).withColumn("lat", lat),
                           F.col("lon"), F.col("lat"), res) \
        .withWatermark("warc_ts", watermark)
    counts = (tiled.groupBy(F.window("warc_ts", window).alias("w"), "cell_id")
              .agg(F.count(F.lit(1)).alias("n_pages"))
              .select(F.col("w.start").alias("window_start"),
                      F.col("w.end").alias("window_end"),
                      "cell_id", "n_pages"))
    writer = (counts.writeStream.outputMode("append")
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- streaming stay-point detection -------------------------------------------

TRAJ_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("ix", T.LongType()),
    T.StructField("iy", T.LongType()),
])

DWELL_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("seg_no", T.LongType()),
    T.StructField("ix", T.LongType()),
    T.StructField("iy", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("enter_ms", T.LongType()),
    T.StructField("leave_ms", T.LongType()),
    T.StructField("dwell_ms", T.LongType()),
])

# the ONE open segment per user: cell, running count, enter/leave, seg_no
_DWELL_STATE_SCHEMA = T.StructType([
    T.StructField("ix", T.LongType()),
    T.StructField("iy", T.LongType()),
    T.StructField("seg_no", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("enter_ms", T.LongType()),
    T.StructField("leave_ms", T.LongType()),
])


def stream_dwell_segments(spark: SparkSession, source_dir: str, *,
                          out_dir: str, checkpoint_dir: str,
                          available_now: bool = True,
                          max_files_per_trigger: int | None = 1):
    """Streaming twin of :func:`polycheck_spark.operators.temporal.
    dwell_segments`: stay-point detection where a dwell segment may SPAN
    micro-batches — the live-trajectory shape a batch gaps-and-islands
    rewrite cannot give you, because the run that is open when a batch
    ends must keep accumulating when the next batch arrives.

    State per user is exactly ONE open segment (cell, count, enter/leave
    millis, running seg_no) — O(1) per user, O(|users|) total, independent
    of stream length (contrast the windowed dedup above, whose state is
    capped but data-dependent).  A segment is emitted when it CLOSES (the
    user moves to a different cell); the final open segment of each user
    is never emitted by an unbounded stream — batch-equivalence is
    therefore asserted against the batch operator's non-final segments,
    and seg_no numbering matches the batch operator exactly.

    Ordering contract (same class as the windowed dedup's file-order
    determinism): per user, events must arrive in event-time order ACROSS
    micro-batches — the file source's lexicographic file order is the
    arrival order, and each micro-batch is sorted by (ts, event_id)
    internally.  A cross-batch out-of-order event would open a spurious
    segment; feeding from a log that is append-ordered per user (the
    usual tracker shape) satisfies the contract.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(TRAJ_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (reader.parquet(source_dir)
              .withColumn("ms", F.unix_millis(F.col("ts").cast("timestamp")))
              .select("user_id", "event_id", "ms", "ix", "iy"))

    def walk(key, pdfs, state):
        import pandas as pd
        if state.exists:
            cur = list(state.get)          # [ix, iy, seg_no, n, enter, leave]
        else:
            cur = None
        rows = [(m, e, x, y) for pdf in pdfs
                for m, e, x, y in zip(pdf["ms"], pdf["event_id"],
                                      pdf["ix"], pdf["iy"])]
        out = []
        uid = key[0]
        for ms, _eid, ix, iy in sorted(rows):
            ms, ix, iy = int(ms), int(ix), int(iy)
            if cur is not None and ix == cur[0] and iy == cur[1]:
                cur[3] += 1
                cur[5] = ms
            else:
                if cur is not None:
                    out.append((uid, cur[2], cur[0], cur[1], cur[3],
                                cur[4], cur[5], cur[5] - cur[4]))
                seg_no = 1 if cur is None else cur[2] + 1
                cur = [ix, iy, seg_no, 1, ms, ms]
        if cur is not None:
            state.update(tuple(cur))
        yield pd.DataFrame(
            out, columns=["user_id", "seg_no", "ix", "iy", "n_events",
                          "enter_ms", "leave_ms", "dwell_ms"])

    segs = stream.groupBy("user_id").applyInPandasWithState(
        walk, DWELL_OUT_SCHEMA, _DWELL_STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            batch_df.write.mode("overwrite").parquet(
                f"{out_dir}/batch_id={batch_id}")

    writer = (segs.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


OD_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("src_ix", T.LongType()),
    T.StructField("src_iy", T.LongType()),
    T.StructField("dst_ix", T.LongType()),
    T.StructField("dst_iy", T.LongType()),
    T.StructField("move_ms", T.LongType()),
])

_OD_STATE_SCHEMA = T.StructType([
    T.StructField("ix", T.LongType()),
    T.StructField("iy", T.LongType()),
])


def stream_od_flows(spark: SparkSession, source_dir: str, *,
                    out_dir: str, checkpoint_dir: str,
                    available_now: bool = True,
                    max_files_per_trigger: int | None = 1):
    """Streaming twin of :func:`polycheck_spark.operators.temporal.
    od_flows`: live origin-destination movement detection where a move may
    straddle a micro-batch boundary (last event of batch k in cell A, first
    event of batch k+1 in cell B — the batch rewrite would never pair
    them).

    State per user is exactly the LAST SEEN CELL — two longs, O(1) per
    user, stream-length-independent.  One row is emitted per MOVE (entity,
    src cell, dst cell, move timestamp); the flow matrix is a plain batch
    rollup over the emitted moves, and because every move CLOSES the
    instant its destination event arrives (unlike a dwell segment, which
    stays open), the rolled-up stream output equals the batch operator on
    the full history EXACTLY — no final-open-row exclusion needed.

    Ordering contract: identical to :func:`stream_dwell_segments` — per
    user, events arrive in event-time order across micro-batches (file
    order = arrival order) and each batch is sorted by (ts, event_id)
    internally.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(TRAJ_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (reader.parquet(source_dir)
              .withColumn("ms", F.unix_millis(F.col("ts").cast("timestamp")))
              .select("user_id", "event_id", "ms", "ix", "iy"))

    def walk(key, pdfs, state):
        import pandas as pd
        cur = list(state.get) if state.exists else None   # [ix, iy]
        rows = [(m, e, x, y) for pdf in pdfs
                for m, e, x, y in zip(pdf["ms"], pdf["event_id"],
                                      pdf["ix"], pdf["iy"])]
        out = []
        uid = key[0]
        for ms, _eid, ix, iy in sorted(rows):
            ms, ix, iy = int(ms), int(ix), int(iy)
            if cur is not None and (ix != cur[0] or iy != cur[1]):
                out.append((uid, cur[0], cur[1], ix, iy, ms))
            cur = [ix, iy]
        if cur is not None:
            state.update(tuple(cur))
        yield pd.DataFrame(
            out, columns=["user_id", "src_ix", "src_iy",
                          "dst_ix", "dst_iy", "move_ms"])

    moves = stream.groupBy("user_id").applyInPandasWithState(
        walk, OD_OUT_SCHEMA, _OD_STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            batch_df.write.mode("overwrite").parquet(
                f"{out_dir}/batch_id={batch_id}")

    writer = (moves.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
