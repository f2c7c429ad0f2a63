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
