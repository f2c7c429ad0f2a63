"""Interleaved A/B of knn_join storage designs at sf0.1 (one process).

Variants:
  r5      — current operator (per-round caches, eager final localCheckpoint)
  r4ref   — round-4 shape: lazy return, caches left alive until after the
            caller's action, then unpersisted (the historical 1.05 s row;
            NOT leak-clean — reference only)
  roundck — per-round eager checkpoints of the small outputs (done part +
            remaining), topk cache dropped as soon as both consumers are
            materialized; lazy union return over checkpointed parts

Usage: python tools/ab_knn.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import DataFrame, functions as F

import __spark_entry__ as E
from polycheck_spark.geo import cells as C
from polycheck_spark.operators.knn import _candidates, _topk, auto_res
from polycheck_spark.session import get_spark

K = 5
MOD = 17


def canary() -> float:
    from polycheck_spark.data.polygons import GOLDEN_POLYGONS
    from polycheck_spark.geo.kernel import contains
    dots = np.linspace(-8, 8, 1000)
    xs, ys = np.meshgrid(dots, dots, indexing="xy")
    pts = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float32)
    t0 = time.time()
    contains(GOLDEN_POLYGONS["star8"], pts)
    return len(pts) / (time.time() - t0) / 1e6


def _loop(queries, t_indexed, q0cols, k, res, caches, checkpoint_rounds):
    """Shared ring loop; returns (done_parts, remaining)."""
    cell_extent = 180.0 / (1 << res)
    remaining = queries
    done_parts = []
    ring = 4
    n = 1 << res
    prev_r_eff = 0
    for _ in range(4):
        r_eff = min(ring, n, 64)
        if r_eff == prev_r_eff:
            break
        prev_r_eff = r_eff
        topk = (_topk(_candidates(remaining, t_indexed, r_eff, res), k)
                .select("query_id", "target_id", "dist2", "rank"))
        guarantee = (r_eff - 1) * cell_extent if r_eff > 1 else 0.0
        if not checkpoint_rounds:
            topk = topk.cache()
            caches.append(topk)
        else:
            topk = topk.cache()
        stats = topk.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("found"), F.max("dist2").alias("worst"))
        satisfied_ids = stats.filter(
            (F.col("found") >= k) & (F.col("worst") <= F.lit(guarantee ** 2)))\
            .select("query_id")
        if 2 * r_eff >= n - 1:
            full_cover = F.lit(r_eff) >= F.greatest(
                F.col("qix"), F.lit(n - 1) - F.col("qix"),
                F.col("qiy"), F.lit(n - 1) - F.col("qiy"))
            satisfied_ids = satisfied_ids.unionAll(
                remaining.filter(full_cover).select("query_id")).distinct()
        if checkpoint_rounds == 2:
            satisfied_ids = satisfied_ids.cache()
        done = topk.join(satisfied_ids, "query_id", "left_semi") \
                   .select("query_id", "target_id", "dist2", "rank")
        new_remaining = remaining.join(satisfied_ids, "query_id", "left_anti")
        if checkpoint_rounds:
            done = done.localCheckpoint()
            new_remaining = new_remaining.localCheckpoint()
            topk.unpersist()
            if checkpoint_rounds == 2:
                satisfied_ids.unpersist()
        else:
            new_remaining = new_remaining.cache()
            caches.append(new_remaining)
        done_parts.append(done)
        remaining = new_remaining
        if r_eff >= n or remaining.isEmpty():
            remaining = None
            break
        ring *= 2
    assert remaining is None or remaining.isEmpty(), "fallback hit — enlarge rounds"
    return done_parts


def run_variant(spark, sf_dir, variant) -> float:
    pts = E._docs_points(spark, sf_dir)
    queries = pts.filter(F.col("doc_id") % MOD == 0)
    t0w = time.time()
    if variant == "r5":
        from polycheck_spark.operators.knn import knn_join
        out = knn_join(queries, pts, K, query_id="doc_id", target_id="doc_id")
        n = out.count()
    else:
        nt = pts.count()
        res = auto_res(nt, K)
        q0 = queries.select(F.col("doc_id").alias("query_id"),
                            F.col("lon").alias("qlon"), F.col("lat").alias("qlat"))
        qix, qiy = C.ixiy_cols(F.col("qlon"), F.col("qlat"), res)
        q0 = q0.withColumn("qix", qix).withColumn("qiy", qiy)
        t0 = pts.select(F.col("doc_id").alias("target_id"),
                        F.col("lon").alias("tlon"), F.col("lat").alias("tlat"))
        caches: list[DataFrame] = []
        if variant == "r4ref":
            t_indexed = C.with_cell_id(t0, F.col("tlon"), F.col("tlat"), res).cache()
            caches.append(t_indexed)
            parts = _loop(q0, t_indexed, None, K, res, caches, False)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionAll(p)
            n = out.count()
            for c in caches:
                c.unpersist()
        elif variant in ("roundck", "roundck2"):
            t_indexed = C.with_cell_id(t0, F.col("tlon"), F.col("tlat"), res).cache()
            parts = _loop(q0, t_indexed, None, K, res, [],
                          2 if variant == "roundck2" else True)
            t_indexed.unpersist()
            out = parts[0]
            for p in parts[1:]:
                out = out.unionAll(p)
            n = out.count()
        else:
            raise ValueError(variant)
    dt = time.time() - t0w
    return dt, n


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_knn", master="local[32]", shuffle_partitions=32)
    variants = ["r5", "r4ref", "roundck", "roundck2"]
    # warm the IO/codegen path once
    run_variant(spark, sf_dir, "r4ref")
    times = {v: [] for v in variants}
    counts = {}
    for rep in range(reps):
        for v in variants:
            dt, n = run_variant(spark, sf_dir, v)
            times[v].append(dt)
            counts[v] = n
            print(f"rep{rep} {v}: {dt:.3f}s rows={n}", flush=True)
    print("canary_mpts:", round(canary(), 1))
    assert len(set(counts.values())) == 1, counts
    for v in variants:
        print(f"{v}: best={min(times[v]):.3f} med={sorted(times[v])[len(times[v])//2]:.3f}")


if __name__ == "__main__":
    main()
