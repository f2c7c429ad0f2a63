"""SparkSession factory with engine defaults.

Tuned for the engine's workload shape: Arrow-batched pandas UDFs, AQE with
skew-join splitting, and shuffle partition counts sized for local[N] testing
(on a real cluster, set spark.sql.shuffle.partitions ~ 2-3x total cores and
spark.sql.files.maxPartitionBytes to 128-256 MiB; see BENCH/BASELINE.md).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # large Arrow batches: the PIP kernel is vectorized over the whole batch,
    # so per-batch Python/IPC overhead amortizes (6 MB/batch at 3 columns)
    "spark.sql.execution.arrow.maxRecordsPerBatch": "262144",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "polycheck_spark", master: str | None = None,
              shuffle_partitions: int | None = None, **extra) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    b = SparkSession.builder.appName(app_name).master(master)
    for k, v in {**ENGINE_CONFS,
                 "spark.sql.shuffle.partitions": str(shuffle_partitions),
                 **extra}.items():
        b = b.config(k, v)
    return b.getOrCreate()


def spread(df):
    """Round-robin repartition to the session's shuffle-partition count —
    the knob every harness already sets (the bench contract sizes it to
    the core count; the scaling harnesses pin it across parallelism levels
    so task grain never varies with worker count).  Used by the map-heavy
    operators whose source reads as 1-2 parquet splits: without it a
    mapInPandas stage runs on as many cores as there are input splits.
    Row placement never affects results — every consumer is
    batching-invariant (per-batch top-k supersets, per-row transforms,
    key-grouped aggregations downstream)."""
    spark = df.sparkSession
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        # already parallel enough — an exchange here would only move bytes
        # (measured: +33 s on the 16M-vector scaling workload, whose input
        # is synthesized at full width)
        return df
    return df.repartition(n)
