"""Secondary-workload scaling evidence: the WEB-GRAPH family at three
parallelism levels (same protocol as bench_scaling.py and its text /
temporal / media siblings — this one demonstrates the iterative-shuffle
worst case scales like the rest of the engine).

Workload per level: synthesize linked pages by Column formula (the
host_links driver corpus shape, host universe scaled to ``DOCS // 5`` so
the edge relation is corpus-sized, not toy-sized) -> href extraction ->
host link graph (explode + one pair-keyed shuffle) -> fixed-point integer
PageRank for ``ITERS`` power-iteration rounds (per-round join + groupBy
shuffle + eager localCheckpoint).  PageRank is the engine's only
iterative multi-shuffle operator, so this is the family where serial
per-round overhead would show up first.

Protocol: identical input, identical partition count, separate JVMs at
local[2] / local[8] / local[32] (primary pair 2->8; secondary 8->32
reported against the same-window machine calibration), best-of-REPEATS, plus the half-input marginal
throughput to cancel fixed per-job setup.  Output identity across levels
is asserted via (n_edges, n_hosts, sum-of-rank checksum) — the integer
fixed-point contract makes the checksum bit-exact regardless of
parallelism.  Writes BENCH/scaling_graph.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DOCS = int(os.environ.get("SCALING_GRAPH_DOCS", "12000000"))
ITERS = int(os.environ.get("SCALING_GRAPH_ITERS", "5"))
REPEATS = int(os.environ.get("SCALING_GRAPH_REPEATS", "2"))
PARTITIONS = 64  # fixed across levels: vary threads only, never task grain
PRIMARY = (2, 8)
SECONDARY = (8, 32)


def _linked_pages_col(spark, n_docs: int, n_hosts: int):
    """The host_links driver corpus shape (__spark_entry__._linked_pages)
    over spark.range: every page links to 2-3 other hosts via coprime
    multiplicative formulas, so the host-pair relation stays dense and
    mostly distinct — the extraction shuffle sees corpus-scale key mass."""
    from pyspark.sql import functions as F

    d = F.col("doc_id")

    def site(expr):
        return F.concat(F.lit("site"), expr.cast("string"),
                        F.lit(".example.com"))

    url = F.concat(F.lit("http://"), site(F.pmod(d, F.lit(n_hosts))),
                   F.lit("/p/"), d.cast("string"))
    l1 = F.concat(F.lit('<a href="http://'),
                  site(F.pmod(d * 31 + 7, F.lit(n_hosts))),
                  F.lit('/x">a</a>'))
    l2 = F.concat(F.lit('<a href="https://www.'),
                  site(F.pmod(d * 17 + 3, F.lit(n_hosts))),
                  F.lit('/y?z=1">b</a>'))
    l3 = F.when(F.pmod(d, F.lit(7)) == 0,
                F.concat(F.lit('<a href="http://'),
                         site(F.pmod(d * 5 + 11, F.lit(n_hosts))),
                         F.lit('/z">c</a>'))).otherwise(F.lit(""))
    html = F.concat(F.lit('<html><body><a href="/rel">r</a>'), l1, l2, l3,
                    F.lit("</body></html>"))
    return (spark.range(0, n_docs, numPartitions=PARTITIONS)
            .select(F.col("id").alias("doc_id"), url.alias("url"),
                    html.alias("html")))


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F
    from polycheck_spark.session import get_spark
    from polycheck_spark.operators import graph as G

    spark = get_spark(f"scaling_graph_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(n_docs: int):
        pages = _linked_pages_col(spark, n_docs, max(n_docs // 5, 97))
        t0 = time.time()
        edges = G.host_link_graph(pages).localCheckpoint()
        n_edges = edges.count()
        ranks = G.pagerank(edges, iters=ITERS)
        row = ranks.agg(F.count(F.lit(1)).alias("n"),
                        F.sum("pr").alias("mass")).collect()[0]
        return time.time() - t0, n_edges, int(row["n"]), int(row["mass"])

    run_once(100_000)  # warm-up: codegen, shuffle service, JIT
    t_full = t_half = None
    stats = None
    for _ in range(REPEATS):
        dt, *stats = run_once(DOCS)
        t_full = dt if t_full is None else min(t_full, dt)
        dt_h, *_ = run_once(DOCS // 2)
        t_half = dt_h if t_half is None else min(t_half, dt_h)
    marginal = (round((DOCS - DOCS // 2) / (t_full - t_half))
                if t_full > t_half else None)
    n_edges, n_hosts, mass = stats
    print(json.dumps({"cpus": cpus, "docs": DOCS, "iters": ITERS,
                      "sec": round(t_full, 3), "sec_half": round(t_half, 3),
                      "n_edges": n_edges, "n_hosts": n_hosts,
                      "rank_mass": mass,
                      "docs_per_sec": round(DOCS / t_full),
                      "marginal_docs_per_sec": marginal}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    results = {}
    for cpus in sorted(set(PRIMARY) | set(SECONDARY)):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True, text=True, check=True, cwd=REPO)
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(line, flush=True)
    from bench_scaling import calibrate
    cal = calibrate()
    print(json.dumps(cal), flush=True)

    for key in ("n_edges", "n_hosts", "rank_mass"):
        vals = {results[c][key] for c in results}
        assert len(vals) == 1, f"output diverged across levels: {key}"

    def eff(pair, key="docs_per_sec"):
        lo, hi = pair
        a, b = results[lo].get(key), results[hi].get(key)
        if not a or not b:
            return None  # marginal invalid at one level (timing inversion)
        return round((b / a) / (hi / lo), 3)

    raw_eff = eff(PRIMARY)
    marg_eff = eff(PRIMARY, "marginal_docs_per_sec")
    summary = {
        "workload": (f"link extraction + host graph + {ITERS}-round integer "
                     f"PageRank, {DOCS} pages, "
                     f"{results[PRIMARY[0]]['n_hosts']} hosts"),
        "levels": results,
        "primary_pair": list(PRIMARY),
        "scaling_efficiency": raw_eff,
        "scaling_efficiency_marginal": marg_eff,
        "secondary_pair": list(SECONDARY),
        "secondary_scaling_efficiency": eff(SECONDARY),
        "secondary_scaling_efficiency_marginal":
            eff(SECONDARY, "marginal_docs_per_sec"),
        "machine_calibration": cal,
        "target": 0.8,
        # same verdict rule as bench_scaling.py: raw decides; a valid
        # marginal can rescue a raw reading depressed by fixed setup,
        # but never below 0.6 raw
        "pass": raw_eff >= 0.8 or (marg_eff is not None and marg_eff >= 0.8
                                   and raw_eff >= 0.6),
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH", "scaling_graph.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
