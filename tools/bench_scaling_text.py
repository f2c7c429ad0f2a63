"""Secondary-workload scaling evidence: the TEXT-cleaning pipeline at two
parallelism levels (same protocol as bench_scaling.py, which measures the
spatial join — this one demonstrates the round-6 web/text operator family
scales the same way).

Workload per level: synthesize pages -> PII redaction (3 regex counts + 3
replaces) -> Gopher repetition signals on the redacted text -> exact-dedup
survivor count — map-dominated with one digest groupBy, the shape of the
web_pipeline driver query at corpus scale.

Protocol: identical input, separate JVMs at local[N] and local[4N],
best-of-REPEATS, plus the half-input marginal throughput to cancel fixed
per-job setup.  Writes BENCH/scaling_text.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PAGES = 3_000_000
REPEATS = 2
PRIMARY = (2, 8)


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F
    from polycheck_spark.session import get_spark
    from polycheck_spark.data import synth
    from polycheck_spark.operators import pii as P
    from polycheck_spark.operators import text as TX

    spark = get_spark(f"scaling_text_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(n_pages: int):
        pages = (synth.generate_pages(spark, n_pages, partitions=cpus * 4)
                 .select(F.xxhash64("url").alias("doc_id"), "text"))
        t0 = time.time()
        red = P.redact_pii(pages)
        rep = TX.repetition_signals(
            red.select("doc_id", F.col("clean_text").alias("text")))
        n = (red.join(rep.select("doc_id", "repetitive"), "doc_id")
             .filter(~F.col("repetitive"))
             .groupBy(F.md5("clean_text")).agg(F.min("doc_id"))
             .count())
        return time.time() - t0, n

    run_once(100_000)  # warm-up: codegen, python workers
    t_full = t_half = None
    rows = 0
    for _ in range(REPEATS):
        dt, rows = run_once(PAGES)
        t_full = dt if t_full is None else min(t_full, dt)
        dt_h, _ = run_once(PAGES // 2)
        t_half = dt_h if t_half is None else min(t_half, dt_h)
    marginal = (round((PAGES - PAGES // 2) / (t_full - t_half))
                if t_full > t_half else None)
    print(json.dumps({"cpus": cpus, "pages": PAGES, "sec": round(t_full, 3),
                      "sec_half": round(t_half, 3), "survivors": rows,
                      "docs_per_sec": round(PAGES / t_full),
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
        "workload": f"text cleaning (PII redact + repetition + exact dedup), {PAGES} pages",
        "levels": results,
        "primary_pair": list(PRIMARY),
        "scaling_efficiency": eff(),
        "scaling_efficiency_marginal": eff("marginal_docs_per_sec"),
        "target": 0.8,
        "pass": (eff() or 0) >= 0.8,
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH", "scaling_text.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
