"""Resumable embedding near-dup job: spark-submit entry point.

    spark-submit --py-files dist/polycheck_spark.zip polycheck_spark/jobs/near_dup_job.py \
        --vecs 200000 --buckets 8 --out /tmp/near_dup_out

The third pipeline on the checkpoint layer (cf. pip_join_job.py,
dedup_job.py): the 100-TB embedding-dedup shape — LSH bucketing -> per-bucket
candidate pairs + exact rescore -> connected components -> survivors — made
kill-resumable at its expensive stage.

Resume granularity is the CANDIDATE-PAIR stage, which dominates the cost
(per-bucket self-joins + exact cosine rescoring of every candidate).  Work
buckets are groups of LSH buckets (``lsh_bucket % n_buckets``), and the key
property making per-bucket work globally exact is the same disjointness the
query path relies on: a vector has exactly ONE exact bucket, and a pair
(a, b) is emitted only where a's exact bucket meets one of b's multiprobe
buckets — so each pair belongs to exactly one work bucket and the union of
bucket outputs is the exact global pair set, no cross-bucket coordination,
no dedup pass.  A killed job resumes from the last committed bucket with
identical final output (pinned by tests/test_resume.py).

The staged table carries each vector on its exact row plus one row per
multiprobe bucket — n_planes + 1 rows per vector in total (n_planes scales
~log2(N/16) with the corpus, so ~15x staging at the default 100k vectors).
That is the self-contained-bucket trade: staging amplification for
embarrassingly parallel bucket jobs that never rescan the source; at 100 TB
the alternative — ids-only staging + a by-id vector fetch per bucket —
trades that storage for one bucketed join per work bucket, same checkpoint
shape.

The closing CC + survivor stage is one cheap pass over the PAIRS (orders of
magnitude smaller than the corpus) and reruns idempotently on resume —
deterministic input, deterministic output, overwrite semantics.

Reference: the reference engine has no dedup pipeline (its polycheck.py is
a kernel library); this is the LLM-data-pipeline surface the brief adds.
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import functions as F

from polycheck_spark.data import synth
from polycheck_spark.io.tables import CheckpointedWriter
from polycheck_spark.operators import similarity as SIM
from polycheck_spark.operators.dedup import connected_components

STAGE = "emb_by_bucket"
DUP_OFFSET = 10_000_000


TARGET_BUCKET_POP = 16


def run_job(spark, num_vecs: int, n_buckets: int, out_dir: str,
            dim: int = 16, dup_mod: int = 20,
            threshold: tuple[int, int] = (3, 5),
            n_planes: int | None = None, fail_on=None) -> dict:
    """Synthesizes embeddings with injected near-duplicates (every
    ``vec_id % dup_mod == 0`` vector re-appears at ``vec_id + DUP_OFFSET``
    with element 0 shifted +0.25), then finds near-dup pairs resumably and
    collapses them to survivors.  Returns run stats + snapshot + survivor
    count.

    ``n_planes`` defaults to ~log2(N / TARGET_BUCKET_POP): per-bucket
    candidate cost is quadratic in bucket population, so the plane count
    must GROW with the corpus to hold population constant — the fixed
    8-plane setting the oracle queries pin degrades quadratically past
    ~10^5 uniform vectors (measured: 100k vectors x 8 planes = ~190M
    candidate pairs; x13 planes = ~10M).  More planes trade recall per
    probe (each extra plane adds a sign-flip chance the 1-bit multiprobe
    must absorb) — the standard LSH tuning surface, exercised by the
    kill-resume test at both settings."""
    if num_vecs > DUP_OFFSET:
        # injected-copy ids are originals + DUP_OFFSET; a corpus reaching
        # the offset would collide real and injected ids (ambiguous a<b
        # pairs, corrupt CC) with no error — refuse instead
        raise ValueError(f"num_vecs must be <= {DUP_OFFSET} (injected-id offset)")
    writer = CheckpointedWriter(out_dir)
    if n_planes is None:
        n_planes = max(8, (max(2, num_vecs // TARGET_BUCKET_POP) - 1).bit_length())

    def corpus():
        return synth.inject_perturbed_copies(
            synth.generate_embeddings(spark, num_vecs, dim),
            dim, dup_mod, DUP_OFFSET)

    staged_dir = os.path.join(out_dir, "_staged_emb")
    # threshold included although staging doesn't depend on it: bucket
    # completion markers are parameter-insensitive, so a resume with a
    # changed threshold against old lineage would mix bucket outputs
    # rescored under different thresholds — the mismatch resets lineage
    stage_params = {"vecs": num_vecs, "buckets": n_buckets, "dim": dim,
                    "dup_mod": dup_mod, "planes": n_planes,
                    "threshold": list(threshold),
                    "path": staged_dir}
    if writer.staged_record(STAGE) != stage_params:
        writer.clear_stage(STAGE)
        writer.reset_lineage()
        both = corpus().withColumn(
            "bucket", SIM.bucket_key_col(F.col("embedding"), dim,
                                         n_planes=n_planes))
        # exact side: one row per vector, keyed by its own bucket;
        # probe side: bucket + n_planes one-bit flips (the multiprobe set)
        exact = both.select("vec_id", "bucket", "embedding",
                            F.lit("e").alias("side"))
        probes = F.array(F.col("bucket"),
                         *[F.col("bucket").bitwiseXOR(F.lit(1 << p))
                           for p in range(n_planes)])
        probe = both.select("vec_id", F.explode(probes).alias("bucket"),
                            "embedding", F.lit("p").alias("side"))
        (exact.unionByName(probe)
         .withColumn("wb", F.pmod(F.col("bucket"), F.lit(n_buckets)).cast("int"))
         .write.mode("overwrite").partitionBy("wb").parquet(staged_dir))
        writer.mark_staged(STAGE, stage_params)

    num, den = threshold

    def rescore(batches):
        # vectorized exact rescore (shared np_guarded_cosine kernel): one
        # einsum per Arrow batch instead of the interpreted HOF fold — the
        # rescore dominates per-bucket cost (candidate counts are quadratic
        # in bucket population) and the job has no SQL oracle to stay
        # fold-bit-exact for; each pair's cosine depends only on its own
        # values, so the keep-set is deterministic under any batching
        import numpy as np
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.array(list(pdf["avec"]), dtype=np.float64)
            b = np.array(list(pdf["bvec"]), dtype=np.float64)
            yield pdf.loc[SIM.np_guarded_cosine(a, b) * den >= num, ["a", "b"]]

    def build_bucket(k: int):
        part = spark.read.parquet(staged_dir).filter(F.col("wb") == k).drop("wb")
        e = part.filter(F.col("side") == "e").select(
            F.col("vec_id").alias("a"), "bucket",
            F.col("embedding").alias("avec"))
        p = part.filter(F.col("side") == "p").select(
            F.col("vec_id").alias("b"), "bucket",
            F.col("embedding").alias("bvec"))
        cand = e.join(p, "bucket").filter(F.col("a") < F.col("b"))
        return cand.select("a", "b", "avec", "bvec") \
                   .mapInPandas(rescore, "a long, b long")

    result = writer.run(list(range(n_buckets)), build_bucket, fail_on=fail_on)
    snapshot = writer.commit_snapshot()

    # closing stage: pairs -> clusters -> survivors.  Input (the committed
    # pair set) is deterministic, so the overwrite is idempotent on resume.
    # CC runs over the PAIR ENDPOINTS only — O(pairs) vertices, not the
    # corpus: a vector in no pair is trivially its own cluster, so the
    # survivor set is the corpus minus the non-representative endpoints
    # (one anti-join over the corpus; the iterative rounds never touch it).
    pairs = writer.read_output(spark)
    endpoints = (pairs.select(F.col("a").alias("id"))
                 .unionByName(pairs.select(F.col("b").alias("id")))
                 .distinct())
    labels = connected_components(endpoints, pairs, id_col="id")
    non_survivors = labels.filter(F.col("cluster_id") != F.col("id")).select("id")
    survivors = (corpus().select(F.col("vec_id").alias("id"))
                 .join(non_survivors, "id", "left_anti"))
    surv_dir = os.path.join(out_dir, "survivors")
    survivors.write.mode("overwrite").parquet(surv_dir)
    n_survivors = spark.read.parquet(surv_dir).count()
    return {"run": result, "snapshot": snapshot,
            "n_pairs": snapshot["total_rows"], "n_survivors": n_survivors,
            "survivors_path": surv_dir}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vecs", type=int, default=100_000)
    ap.add_argument("--buckets", type=int, default=8)
    # dim 64: cosine noise between random vectors has std ~1/sqrt(dim), so
    # the 0.6 threshold sits at ~4.8 sigma — a realistic sparse near-dup
    # regime; at dim 16 it is only 2.4 sigma and a uniform corpus contains
    # MILLIONS of organic above-threshold pairs (measured: 3.4M at 100k
    # vectors), which is a threshold-calibration artifact, not a workload
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    from polycheck_spark.session import get_spark
    spark = get_spark("near_dup_job")
    out = run_job(spark, args.vecs, args.buckets, args.out, dim=args.dim)
    print({"snapshot": out["snapshot"], "n_pairs": out["n_pairs"],
           "n_survivors": out["n_survivors"]})


if __name__ == "__main__":
    main()
