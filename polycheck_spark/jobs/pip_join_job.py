"""Resumable PIP-join job: spark-submit entry point.

    spark-submit --py-files polycheck_spark.zip polycheck_spark/jobs/pip_join_job.py \
        --pages 1000000 --buckets 16 --out /tmp/pip_out

Write-once-read-pruned: the source is scanned ONCE and materialized
partitioned by a url-hash bucket id; each bucket's pipeline then runs over a
partition-pruned read of its own directory (the 100 TB analog: one pass over
the source table, never n_buckets rescans).  Each bucket commits atomically
(lineage marker), so a killed job resumes from the last finished bucket —
staging itself is marker-guarded the same way.  Deterministic inputs plus
deterministic bucket assignment give exactly-once output.
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import functions as F

from polycheck_spark.data import synth
from polycheck_spark.data.polygons import default_query_layer
from polycheck_spark.io.tables import CheckpointedWriter
from polycheck_spark.operators import pip_join as PJ

STAGE = "pages"


def run_job(spark, num_pages: int, n_buckets: int, out_dir: str,
            fail_on=None) -> dict:
    layer = default_query_layer()
    writer = CheckpointedWriter(out_dir)

    # stage 0 (once): ONE scan of the source, written partitioned by bucket.
    # bucket is provably non-nullable (pmod of a hash) so the partition
    # filter below prunes directories instead of re-evaluating expressions.
    staged_dir = os.path.join(out_dir, "_staged_pages")
    stage_params = {"pages": num_pages, "buckets": n_buckets, "path": staged_dir}
    # markers are only valid for the SAME job parameters: a resume with a
    # different page/bucket count over stale staged data or stale bucket
    # markers would silently return the old job's rows. Order matters — the
    # old marker is tombstoned BEFORE the overwrite so a crash mid-overwrite
    # reads as "never staged", and the whole bucket lineage is invalidated
    # with it (bucket markers are parameter-insensitive).
    if writer.staged_record(STAGE) != stage_params:
        writer.clear_stage(STAGE)
        writer.reset_lineage()
        pages = synth.geocoded_pages(spark, num_pages)
        (pages.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int"))
         .write.mode("overwrite").partitionBy("bucket").parquet(staged_dir))
        writer.mark_staged(STAGE, stage_params)

    def build_bucket(k: int):
        bucket = (spark.read.parquet(staged_dir)
                  .filter(F.col("bucket") == k).drop("bucket"))
        joined = PJ.pip_join(spark, bucket, layer)
        return joined.select("url", "polygon_id", "cell_id", "lon", "lat",
                             F.sha2(F.col("text"), 256).alias("text_sha"))

    result = writer.run(list(range(n_buckets)), build_bucket, fail_on=fail_on)
    snapshot = writer.commit_snapshot()
    return {"run": result, "snapshot": snapshot}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    from polycheck_spark.session import get_spark
    spark = get_spark("pip_join_job")
    out = run_job(spark, args.pages, args.buckets, args.out)
    print(out["snapshot"])


if __name__ == "__main__":
    main()
