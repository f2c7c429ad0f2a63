"""Secondary-workload scaling evidence: the MULTIMODAL family at two
parallelism levels (same protocol as bench_scaling.py / bench_scaling_text.py
— this one demonstrates the round-7 codec-free decode + perceptual-hash
operators scale like the rest of the engine).

Workload per level: synthesize binary media payloads by formula (the
media_decode driver corpus: BMP / PGM / WAV / raw in rotation) -> real
codec-free decode (mapInPandas, NumPy parsers) -> dHash over the image
slice -> banded Hamming pair join — Arrow-pass-dominated with one
pair-join shuffle, the shape of an image-dedup stage at corpus scale.

Protocol: identical input, separate JVMs at local[N] and local[4N],
best-of-REPEATS, plus the half-input marginal throughput to cancel fixed
per-job setup.  Writes BENCH/scaling_media.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DOCS = int(os.environ.get("SCALING_MEDIA_DOCS", "4000000"))
REPEATS = int(os.environ.get("SCALING_MEDIA_REPEATS", "2"))
PRIMARY = (2, 8)


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F
    from polycheck_spark.session import get_spark
    from polycheck_spark.operators.dedup import hamming_near_pairs
    from polycheck_spark.operators.multimodal import (decode_media_basic,
                                                      image_dhash)
    import __spark_entry__ as E

    spark = get_spark(f"scaling_media_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(n_docs: int):
        # fixed partition count across levels: the comparison must vary
        # only the executor-thread count, not the task granularity
        docs = (spark.range(0, n_docs, numPartitions=64)
                .select(F.col("id").alias("doc_id"),
                        E._media_decode_payload_col().alias("payload")))
        # dHash input: the 9x8 grouped-perturbation image corpus (the
        # media_decode corpus' PGMs sit below the dHash grid) at 1/8 the
        # volume — a CONTIGUOUS id range, so the 8-member perturbation
        # groups stay intact and the pair join finds real near-dup mass
        imgs = (spark.range(0, n_docs // 8, numPartitions=64)
                .select(F.col("id").alias("doc_id"),
                        E._image_corpus_payload_col().alias("payload")))
        t0 = time.time()
        stats = decode_media_basic(docs)
        n_decoded = stats.filter(F.col("fmt") != "unknown").count()
        sig = image_dhash(imgs)
        n_pairs = hamming_near_pairs(
            sig, max_hamming=3, id_col="doc_id", hash_col="dhash",
            bits=64, max_band_freq=64).count()
        return time.time() - t0, n_decoded, n_pairs

    run_once(50_000)  # warm-up: codegen, python workers
    t_full = t_half = None
    dec = pairs = 0
    for _ in range(REPEATS):
        dt, dec, pairs = run_once(DOCS)
        t_full = dt if t_full is None else min(t_full, dt)
        dt_h, _, _ = run_once(DOCS // 2)
        t_half = dt_h if t_half is None else min(t_half, dt_h)
    marginal = (round((DOCS - DOCS // 2) / (t_full - t_half))
                if t_full > t_half else None)
    print(json.dumps({"cpus": cpus, "docs": DOCS, "sec": round(t_full, 3),
                      "sec_half": round(t_half, 3), "decoded": dec,
                      "near_dup_pairs": pairs,
                      "docs_per_sec": round(DOCS / t_full),
                      "marginal_docs_per_sec": marginal}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    results = {}
    for cpus in PRIMARY:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True, text=True, check=True, cwd=REPO)
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(line, flush=True)

    lo, hi = PRIMARY

    def eff(key="docs_per_sec"):
        a, b = results[lo].get(key), results[hi].get(key)
        if not a or not b:
            return None
        return round((b / a) / (hi / lo), 3)

    summary = {
        "workload": f"media decode + dHash near-dup, {DOCS} docs",
        "levels": results,
        "primary_pair": list(PRIMARY),
        "scaling_efficiency": eff(),
        "scaling_efficiency_marginal": eff("marginal_docs_per_sec"),
        "target": 0.8,
        "pass": (eff() or 0) >= 0.8,
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH", "scaling_media.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
