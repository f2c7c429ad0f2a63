"""Benchmark harness (driver contract).

Prints ONE JSON line:
    {"metric": ..., "value": <seconds>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "pip_docs_per_sec": ..., "kernel_pip_pts_per_sec": ..., "cpus": ...}

Headline: the flagship PIP spatial join — geocode -> Z-order tile -> cell
equi-join -> bbox refine -> exact float32 winding kernel — over
BENCH_PAGES synthetic Common-Crawl-style pages (pure column arithmetic
generation; no disk read so the number measures the join pipeline).
Secondary: representative operator queries from __spark_entry__ at
$SPARK_GRAFT_SF_DIR, and the reference's own kernel workload
(10^6 points x star8 polygon; BASELINE.md rows 1-3) on one core.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Janino compile failures (64 KB method limit and friends) make Spark fall
# back to interpreted execution: results stay correct, rc stays 0, and the
# only evidence is an ERROR stack in the JVM log — which is how round 6's
# robots_filter regression shipped silently.  The bench must treat that as
# a named failure, not noise.
_CODEGEN_FAILURE_MARKERS = (
    "InternalCompilerException",
    "CompileException",
    "grows beyond 64 KB",
    "Failed to compile the generated Java code",
)


def codegen_failures(text: str) -> list[str]:
    """Lines in captured JVM output that indicate a whole-stage-codegen
    compile failure (and therefore an interpreted-execution fallback)."""
    return [ln for ln in text.splitlines()
            if any(m in ln for m in _CODEGEN_FAILURE_MARKERS)]


def _run_wrapped() -> int:
    """Re-exec this script capturing combined stdout+stderr (the JVM logs
    to the inherited stderr in local mode), scan for codegen failures, and
    only then re-emit the inner run's JSON line.  A plan that lost codegen
    exits 3 with the offending lines instead of silently reporting rc 0."""
    env = dict(os.environ, BENCH_INNER="1")
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                          env=env, capture_output=True, text=True)
    failures = codegen_failures(proc.stdout + proc.stderr)
    sys.stderr.write(proc.stderr[-4000:])
    if proc.returncode != 0:
        sys.stdout.write(proc.stdout)
        return proc.returncode
    if failures:
        print("BENCH FAILURE: whole-stage codegen fell back to interpreted "
              "execution during the run:", file=sys.stderr)
        for ln in failures[:10]:
            print(f"  {ln}", file=sys.stderr)
        return 3
    sys.stdout.write(proc.stdout)
    return 0


def bench_kernel_pip() -> float:
    """Reference workload: 10^6-point meshgrid vs star8 (examples/polytest.py)."""
    from polycheck_spark.geo.kernel import contains
    from polycheck_spark.data.polygons import GOLDEN_POLYGONS
    dots = np.linspace(-8, 8, 1000)
    xs, ys = np.meshgrid(dots, dots, indexing="xy")
    pts = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float32)
    poly = GOLDEN_POLYGONS["star8"]
    contains(poly, pts[:1000])  # warm
    t0 = time.time()
    res = contains(poly, pts)
    dt = time.time() - t0
    assert 0 < res.sum() < len(pts)
    return len(pts) / dt


def bench_pip_join(spark, num_pages: int) -> tuple[float, int]:
    from pyspark.sql import functions as F
    from polycheck_spark.data import synth
    from polycheck_spark.data.polygons import default_query_layer
    from polycheck_spark.operators import pip_join as PJ
    pages = synth.generate_pages(spark, num_pages).select("url")
    lon, lat = synth.geocode_url_cols(F.col("url"))
    pts = pages.withColumn("lon", lon).withColumn("lat", lat)
    layer = default_query_layer()
    PJ.pip_join(spark, pts.limit(100_000), layer).count()  # warm: JIT + workers
    best, n = None, 0
    for _ in range(2):  # best-of-2: the sandbox host is noisy
        t0 = time.time()
        n = PJ.pip_join(spark, pts, layer).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, n


def bench_faux_scan(spark, num_rays: int) -> tuple[float, int]:
    """Distributed faux-scan march (O7): num_rays rays, lockstep-vectorized
    per Arrow batch (line_range_batch), golden triangle+square layer."""
    import math
    from pyspark.sql import functions as F
    from polycheck_spark.data.polygons import GOLDEN_POLYGONS
    from polycheck_spark.operators.scan import faux_scan_df
    polys = [GOLDEN_POLYGONS["triangle"], GOLDEN_POLYGONS["square2"]]
    ainc = 2.0 * math.pi / num_rays
    args = (polys, (0.0, 0.0), 0.0, ainc, num_rays, 10.0, 0.1)
    faux_scan_df(spark, polys, (0.0, 0.0), 0.0, 0.01, 10_000, 10.0, 0.1).count()  # warm
    best, hits = None, 0
    for _ in range(2):
        t0 = time.time()
        hits = faux_scan_df(spark, *args) \
            .filter(F.col("hit_polygon") != 0x7FFFFFFF).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, hits


def bench_sensor_coverage(spark, hw: int = 256, n_sensors: int = 8) -> tuple[float, int]:
    """Sensor coverage map (O5+O8): hw x hw grid x n_sensors pair walks
    through the lockstep sum-walk kernel, union combine. Best of 3 runs
    (the first pays whole-stage codegen for the trig gates)."""
    import math
    from polycheck_spark.operators.visibility import sensor_visibility_df
    rng = np.random.RandomState(3)
    g = np.zeros((hw, hw), dtype=np.float32)
    m = rng.rand(hw, hw) < 0.05
    g[m] = rng.rand(m.sum()).astype(np.float32)
    sensors = [(i, float(rng.randint(0, hw)), float(rng.randint(0, hw)),
                float(hw) * 0.3, float(rng.uniform(-3, 3)), 2 * math.pi)
               for i in range(n_sensors)]
    sdf = spark.createDataFrame(
        sensors,
        "sensor_id int, x double, y double, range double, direction double, fov double")
    best = None
    for _ in range(3):  # first run = codegen warmup
        t0 = time.time()
        _, comb = sensor_visibility_df(spark, g, sdf, "union")
        n = comb.count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    assert n == hw * hw
    return best, hw * hw * n_sensors


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_pages = int(os.environ.get("BENCH_PAGES", "2000000"))

    from polycheck_spark.session import get_spark
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}

    # headline: spatial-join throughput
    pip_sec, pip_rows = bench_pip_join(spark, num_pages)
    queries["pip_join_pages"] = round(pip_sec, 3)
    docs_per_sec = num_pages / pip_sec

    # reference kernel workload (single core, BASELINE.md comparison)
    kernel_pps = bench_kernel_pip()

    # faux scan at 10^6 rays (judge bar: vectorized march at >= 1M rays)
    num_rays = int(os.environ.get("BENCH_RAYS", "1000000"))
    scan_sec, scan_hits = bench_faux_scan(spark, num_rays)
    queries["faux_scan_1m"] = round(scan_sec, 3)
    scan_rays_per_sec = num_rays / scan_sec

    # sensor coverage map: 524k (sensor, cell) sum walks + union combine
    cov_sec, cov_pairs = bench_sensor_coverage(spark)
    queries["sensor_coverage_256"] = round(cov_sec, 3)
    sensor_pairs_per_sec = cov_pairs / cov_sec

    # representative operator queries on the sf tables
    import __spark_entry__ as E
    qs = E.queries()
    # best-of-2 per row: the shared host shows one-off ~30 s CPU-steal
    # stalls that land on a random query (observed: ann_cosine 2.5 s and
    # 34 s in back-to-back suites at similar canary) — a single-shot
    # number can't tell a regression from a stall
    for name in ["pip_join", "pip_join_distributed", "tile_assignment",
                 "tile_rollup", "knn", "range_join", "minhash_lsh", "simhash",
                 "ann_cosine", "ann_cosine_fast", "ann_lsh", "ann_lsh_fast", "ann_ivf",
                 "ann_ivf_fast", "ann_quant", "ann_quant_fast", "near_dup",
                 "near_dup_fast",
                 "agg_lineitem", "events_sessionize", "events_cube",
                 "vocab_topk", "doc_top_terms", "simhash_pairs",
                 "simhash_pairs_wide", "media_dimensions", "boilerplate_strip",
                 "url_dedup", "c4_pipeline",
                 "html_extract", "decontaminate", "dedup_verified_clusters",
                 "pii_redact", "repetition_signals", "pagerank_hosts",
                 "pack_chunks", "domain_filter", "web_pipeline",
                 "incremental_dedup", "tile_rank", "search_topk",
                 "robots_filter", "unigram_quality",
                 "media_decode", "image_near_dup", "audio_features",
                 "events_asof", "line_dedup", "lang_mix", "quality_topq",
                 "duplicate_spans",
                 "bloom_inc_dedup", "containment", "common_ngrams",
                 "dedup_survivors", "interval_overlap", "oov_rate",
                 "sample_exact_k", "leakfree_split",
                 "frontier", "tile_smooth", "dwell_segments",
                 "quality_classify", "hotspot_regions", "od_flows"]:
        best = None
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)

    total = sum(queries.values())
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "bench_suite_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "pip_docs_per_sec": round(docs_per_sec),
        "pip_join_rows": pip_rows,
        "bench_pages": num_pages,
        "kernel_pip_pts_per_sec": round(kernel_pps),
        "scan_rays_per_sec": round(scan_rays_per_sec),
        "scan_hits": scan_hits,
        "sensor_pairs_per_sec": round(sensor_pairs_per_sec),
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER") == "1":
        main()
    else:
        sys.exit(_run_wrapped())
