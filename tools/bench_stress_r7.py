"""Large-input stress evidence for the late round-7 operator family.

The driver's correctness gate runs these at sf0.01 (500 docs) and bench.py
at sf0.1; this harness runs them at 100-1000x those volumes on synthetic
inputs (same deterministic generator style as tools/bench_stress.py) so the
scale claims in BENCH/BASELINE.md are measured, not argued:

* tile_smooth      — 24 M arithmetic-geocoded points, res 10 (1 M-cell grid);
                     invariant: the smoothed relation's own-count column sums
                     back to exactly the input row count (no point lost or
                     double-counted by the 9-way scatter).
* frontier         — 10 M candidate URLs over 200 k hosts, every 3rd row a
                     canonical variant (query-string / www. noise); invariant:
                     per-host slots are dense 0..n-1 (max slot == count-1
                     for every host) and variants collapse exactly.
* dwell_segments   — 24 M events, 50 k users, per-day cell teleports;
                     invariant: segment n_events sums back to the input count.
* quality_classify — 6 M docs; map-side only (the plan has no doc-keyed
                     exchange), so throughput ~ scan speed.

Usage: python tools/bench_stress_r7.py  -> one JSON line + BENCH/stress_r7.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from polycheck_spark.session import get_spark
    from polycheck_spark.data import synth
    from polycheck_spark.geo import cells as C
    from polycheck_spark.operators import pip_join as PJ
    from polycheck_spark.operators import temporal as TP
    from polycheck_spark.operators import text as TX
    from polycheck_spark.operators import web as W

    spark = get_spark("stress_r7", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": cpus}

    # --- tile_smooth: 24M points at res 10 -----------------------------------
    n_pts = 24_000_000
    lon, lat = synth.geocode_arith_cols(F.col("id"))
    pts = spark.range(0, n_pts, 1, cpus * 4).select(
        lon.alias("lon"), lat.alias("lat"))
    t0 = time.time()
    sm = PJ.tile_smooth(pts, 10)
    agg = sm.agg(F.count(F.lit(1)).alias("cells"),
                 F.sum("n_docs").alias("mass"),
                 F.max("n_docs_3x3").alias("peak")).collect()[0]
    dt = time.time() - t0
    assert int(agg["mass"]) == n_pts, (agg["mass"], n_pts)
    out["tile_smooth_24m"] = {
        "points": n_pts, "res": 10, "occupied_cells": int(agg["cells"]),
        "peak_3x3": int(agg["peak"]), "own_mass_exact": True,
        "sec": round(dt, 2), "pts_per_sec": round(n_pts / dt)}

    # --- frontier: 10M urls over 200k hosts -----------------------------------
    n_urls = 10_000_000
    base = F.concat(F.lit("http://h"),
                    (F.col("id") % F.lit(200_000)).cast("string"),
                    F.lit(".example.com/p/"),
                    (F.col("id") % F.lit(3_000_000)).cast("string"))
    url = (F.when(F.col("id") % 3 == 1, F.concat(base, F.lit("?utm=x")))
           .when(F.col("id") % 3 == 2,
                 F.regexp_replace(base, "http://", "http://www."))
           .otherwise(base))
    pages = spark.range(0, n_urls, 1, cpus * 4).select(
        F.col("id").alias("doc_id"), url.alias("url"),
        (F.col("id") % F.lit(1000)).alias("priority"))
    t0 = time.time()
    fr = W.frontier_schedule(pages)
    per_host = fr.groupBy("host").agg(
        F.count(F.lit(1)).alias("n"), F.max("slot").alias("mx"))
    bad = per_host.filter(F.col("mx") != F.col("n") - 1).count()
    tot = fr.count()
    dt = time.time() - t0
    assert bad == 0
    out["frontier_10m"] = {
        "urls": n_urls, "hosts": 200_000, "scheduled": int(tot),
        "slots_dense": True, "sec": round(dt, 2),
        "urls_per_sec": round(n_urls / dt)}

    # --- dwell_segments: 24M events, 50k users --------------------------------
    n_ev = 24_000_000
    ev = spark.range(0, n_ev, 1, cpus * 4).selectExpr(
        "id AS event_id", "id % 50000 AS user_id",
        "timestamp_millis((id * 2654435761) % 31536000000) AS ts")
    day = F.floor(F.unix_millis(F.col("ts").cast("timestamp"))
                  / F.lit(86_400_000))
    lon, lat = synth.geocode_arith_cols(
        F.col("user_id") * F.lit(7919) + day)
    ix, iy = C.ixiy_cols(lon, lat, 2)
    traj = ev.select("event_id", "user_id", "ts",
                     ix.alias("ix"), iy.alias("iy"))
    t0 = time.time()
    seg = TP.dwell_segments(traj)
    agg = seg.agg(F.count(F.lit(1)).alias("segs"),
                  F.sum("n_events").alias("ev_mass"),
                  F.max("dwell_ms").alias("max_dwell")).collect()[0]
    dt = time.time() - t0
    assert int(agg["ev_mass"]) == n_ev
    out["dwell_segments_24m"] = {
        "events": n_ev, "users": 50_000, "segments": int(agg["segs"]),
        "event_mass_exact": True, "max_dwell_ms": int(agg["max_dwell"]),
        "sec": round(dt, 2), "events_per_sec": round(n_ev / dt)}

    # --- quality_classify: 6M docs --------------------------------------------
    n_docs = 6_000_000
    docs = spark.range(0, n_docs, 1, cpus * 4).selectExpr(
        "id AS doc_id",
        "concat('the quick w', CAST(id % 997 AS STRING), "
        "' and of to in a is ', repeat('tok ', CAST(id % 50 AS INT))) AS text",
        "CASE id % 5 WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr' "
        "WHEN 3 THEN 'zh' ELSE 'xx' END AS lang")
    t0 = time.time()
    q = TX.quality_classify(docs)
    agg = q.agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("keep").cast("long")).alias("kept")).collect()[0]
    dt = time.time() - t0
    assert int(agg["n"]) == n_docs
    out["quality_classify_6m"] = {
        "docs": n_docs, "kept": int(agg["kept"]),
        "sec": round(dt, 2), "docs_per_sec": round(n_docs / dt)}

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "stress_r7.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
