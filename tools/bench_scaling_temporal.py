"""Secondary-workload scaling evidence: the round-7 operator additions
(as-of temporal join + corpus line dedup) at two parallelism levels —
same protocol as bench_scaling.py / bench_scaling_text.py.

Workload per level:
  1. as-of join 24M synthetic events to their per-user snapshot stream
     (every 7th event) — the union-tag window carry-forward: one hash
     shuffle on user_id + per-key sort, then an aggregate that forces
     every matched row (non-null snaps + total age).
  2. corpus line dedup over 2.4M synthetic docs whose ~6 lines are drawn
     from a 4k-line pool (heavy cross-doc duplication — the worst case
     for the canonical-line join) — keep-first-occurrence + reassembly,
     forced by total kept-line mass.

Protocol: identical input, separate JVMs at local[N] and local[4N],
best-of-REPEATS, plus half-input marginal throughput to cancel fixed
per-job setup.  Writes BENCH/scaling_temporal.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
EVENTS = 24_000_000
DOCS = 2_400_000
REPEATS = 2
PRIMARY = (2, 8)


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F
    from polycheck_spark.session import get_spark
    from polycheck_spark.operators.temporal import asof_join
    from polycheck_spark.operators.dedup import line_dedup_corpus

    spark = get_spark(f"scaling_temporal_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(n_events: int, n_docs: int):
        ev = (spark.range(0, n_events, 1, cpus * 4)
              .selectExpr("id AS event_id", "id % 50000 AS user_id",
                          "timestamp_millis((id * 2654435761) % 31536000000) AS ts"))
        docs = (spark.range(0, n_docs, 1, cpus * 4)
                .selectExpr(
                    "id AS doc_id",
                    "concat_ws(chr(10), "
                    " 'l' || CAST((id * 7919) % 4096 AS STRING),"
                    " 'l' || CAST((id * 104729) % 4096 AS STRING),"
                    " 'l' || CAST((id * 1299709) % 4096 AS STRING),"
                    " 'u' || CAST(id AS STRING),"
                    " 'l' || CAST((id * 15485863) % 4096 AS STRING),"
                    " CASE WHEN id % 3 = 0 THEN '' ELSE 'v' || CAST(id AS STRING) END"
                    ") AS text"))
        t0 = time.time()
        snaps = (ev.filter(F.col("event_id") % 7 == 0)
                 .groupBy("user_id", "ts")
                 .agg(F.min("event_id").alias("snap_id")))
        j = asof_join(ev, snaps, on=["user_id"], left_ts="ts",
                      right_ts="ts", value_cols=["snap_id"])
        a = j.agg(F.count("snap_id").alias("matched"),
                  F.sum(F.unix_millis(F.col("ts").cast("timestamp"))
                        - F.unix_millis(F.col("asof_ts").cast("timestamp")))
                  .alias("age_mass")).collect()[0]
        t_asof = time.time() - t0
        t1 = time.time()
        d = (line_dedup_corpus(docs)
             .agg(F.sum("n_lines_kept").alias("kept")).collect()[0])
        t_dedup = time.time() - t1
        return t_asof, t_dedup, int(a["matched"]), int(d["kept"])

    run_once(200_000, 40_000)  # warm-up: codegen, python workers
    tot = ta = td = t_half = None
    checks = None
    for _ in range(REPEATS):
        a, d, m, k = run_once(EVENTS, DOCS)
        if tot is None or a + d < tot:
            tot, ta, td = a + d, a, d
        checks = (m, k)
        ah, dh, _, _ = run_once(EVENTS // 2, DOCS // 2)
        t_half = ah + dh if t_half is None else min(t_half, ah + dh)
    units = EVENTS + DOCS
    marginal = (round((units - units // 2) / (tot - t_half))
                if tot > t_half else None)
    print(json.dumps({
        "cpus": cpus, "events": EVENTS, "docs": DOCS,
        "sec": round(tot, 3), "sec_asof": round(ta, 3),
        "sec_line_dedup": round(td, 3), "sec_half": round(t_half, 3),
        "matched": checks[0], "kept_lines": checks[1],
        "rows_per_sec": round(units / tot),
        "marginal_rows_per_sec": marginal}))
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
    # determinism cross-check between the two levels: identical inputs must
    # produce identical matched/kept counts regardless of parallelism
    assert results[lo]["matched"] == results[hi]["matched"]
    assert results[lo]["kept_lines"] == results[hi]["kept_lines"]

    def eff(key="rows_per_sec"):
        a, b = results[lo].get(key), results[hi].get(key)
        if not a or not b:
            return None
        return round((b / a) / (hi / lo), 3)

    summary = {
        "workload": (f"as-of join ({EVENTS} events) + corpus line dedup "
                     f"({DOCS} docs)"),
        "levels": results,
        "primary_pair": list(PRIMARY),
        "scaling_efficiency": eff(),
        "scaling_efficiency_marginal": eff("marginal_rows_per_sec"),
        "target": 0.8,
        "pass": (eff() or 0) >= 0.8,
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH", "scaling_temporal.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
