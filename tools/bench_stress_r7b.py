"""Large-input stress evidence for the latest round-7 operators
(hotspot_regions, od_flows) — same protocol as tools/bench_stress_r7.py:
100-1000x the driver-gate volumes on deterministic synthetic inputs, with
closed-form invariants so the scale claims are measured, not argued.

* hotspot_regions — 24 M points at res 10 (1 M-cell grid): ids < 20 M are
                    blob mass (2000 16x8-cell blobs on a 22x16 pitch, so
                    blobs never touch; per blob cell exactly 78-79 points),
                    ids >= 20 M are noise (multiplicative-bijection scatter,
                    provably <= 4 points per noise cell — ceil(4M / 2^20)).
                    With gate 40: every blob cell is hot, no noise-only
                    cell can be, so regions == 2000, region cells ==
                    2000*128, and region mass is >= the 20 M planted points
                    (noise may land inside hot cells) and <= all points.
* od_flows        — 24 M events, 50 k users, per-day cell teleports (the
                    dwell trajectory shape at res 6).  Cross-check against
                    dwell_segments on the identical trajectory:
                    moves == segments - users (every segment after a
                    user's first opens with exactly one move).

Usage: python tools/bench_stress_r7b.py -> one JSON line + BENCH/stress_r7b.json
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

    spark = get_spark("stress_r7b", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": cpus}

    # --- hotspot_regions: 24M points, res 10, 2000 planted blobs -------------
    n_pts, res, n_blobs, gate = 24_000_000, 10, 2000, 40
    n_blob_pts = 20_000_000
    d = F.col("id")
    # blob branch (id < 20M): blob b = id % 2000, within-blob offset
    # o = id div 2000 in [0, 10000) -> dx = o % 16, dy = (o div 16) % 8;
    # every (b, dx, dy) cell receives floor/ceil(10000/128) = 78-79 points.
    # Blob anchors sit on a 46 x 44 grid with 22x16 pitch: 16x8 blocks with
    # >= 6-cell gaps, so no two blobs are 8-adjacent.
    b = F.pmod(d, F.lit(n_blobs))
    o = F.expr(f"id div {n_blobs}")
    ax = F.pmod(b, F.lit(46)) * 22 + F.pmod(o, F.lit(16))
    ay = F.expr(f"(id % {n_blobs}) div 46") * 16 \
        + F.pmod(F.expr("(id div 2000) div 16"), F.lit(8))
    # noise branch (id >= 20M): j = id - 20M in [0, 4M); an odd
    # multiplicative constant is a bijection mod 2^20, so a cell's noise
    # count is |{j < 4M : j % 2^20 == r}| <= ceil(4M / 2^20) = 4 < gate.
    j = d - F.lit(n_blob_pts)
    h = F.pmod(j * 2654435761, F.lit(1 << 20))
    nx = F.pmod(h, F.lit(1024))
    ny = (h / 1024).cast("long")
    ixp = F.when(d < n_blob_pts, ax).otherwise(nx).cast("double")
    iyp = F.when(d < n_blob_pts, ay).otherwise(ny).cast("double")
    n = 1 << res
    pts = spark.range(0, n_pts, 1, cpus * 4).select(
        (F.lit(-180.0) + (ixp + F.lit(0.5)) * F.lit(360.0 / n)).alias("lon"),
        (F.lit(-90.0) + (iyp + F.lit(0.5)) * F.lit(180.0 / n)).alias("lat"))
    t0 = time.time()
    reg = PJ.hotspot_regions(pts, res, gate)
    agg = reg.agg(F.count(F.lit(1)).alias("regions"),
                  F.sum("n_docs").alias("mass"),
                  F.sum("n_cells").alias("cells")).collect()[0]
    dt = time.time() - t0
    assert agg["regions"] == n_blobs, agg
    assert agg["cells"] == n_blobs * 128, agg
    assert n_blob_pts <= agg["mass"] <= n_pts, agg
    out["hotspot_regions"] = {
        "points": n_pts, "res": res, "min_count": gate,
        "regions": int(agg["regions"]), "region_cells": int(agg["cells"]),
        "region_mass": int(agg["mass"]), "sec": round(dt, 2),
        "pts_per_sec": round(n_pts / dt)}

    # --- od_flows: 24M events, 50k users, per-day teleport trajectory --------
    n_ev, n_users, res_od = 24_000_000, 50_000, 6
    e = F.col("id")
    user = F.pmod(e, F.lit(n_users))
    day = F.expr(f"id div {n_users * 8}")  # ~8 events per user-day
    lon, lat = synth.geocode_arith_cols(user * 7919 + day)
    ix, iy = C.ixiy_cols(lon, lat, res_od)
    ev = spark.range(0, n_ev, 1, cpus * 4).select(
        e.alias("event_id"), user.alias("user_id"),
        F.timestamp_millis((e * 1000).cast("long")).alias("ts"),
        ix.alias("ix"), iy.alias("iy"))
    t0 = time.time()
    flows = TP.od_flows(ev)
    fa = flows.agg(F.count(F.lit(1)).alias("pairs"),
                   F.sum("n_moves").alias("moves")).collect()[0]
    dt = time.time() - t0
    # cross-check: every dwell segment after a user's first opens with one
    # move, so moves == segments - users (same trajectory, same ordering)
    segs = TP.dwell_segments(ev).count()
    assert fa["moves"] == segs - n_users, (fa["moves"], segs)
    out["od_flows"] = {
        "events": n_ev, "users": n_users, "od_pairs": int(fa["pairs"]),
        "moves": int(fa["moves"]), "sec": round(dt, 2),
        "events_per_sec": round(n_ev / dt)}

    print(json.dumps(out))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", "stress_r7b.json"), "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
