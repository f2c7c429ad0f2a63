"""Bucketed-table support: co-located joins without a shuffle.

At 100 TB the pages table is written ONCE, joined MANY times.  Writing it
bucketed by ``cell_id`` (Z-order tile) means every later cell-keyed
equi-join / aggregation reads pre-partitioned data: Catalyst sees the
bucketing and drops the Exchange on the bucketed side entirely.

Spark bucketing requires the session catalog (``saveAsTable``); local tests
use a temp warehouse. On a cluster this is the standard Hive-compatible
layout, and the same table written by the checkpointed job (io/tables.py)
can be registered bucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(df: DataFrame, table: str, *, buckets: int,
                   key: str = "cell_id", sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key``."""
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join_cellcounts(spark: SparkSession, table: str) -> DataFrame:
    """Per-cell counts over a bucketed table — aggregation without exchange
    (bucketing satisfies the hash-partitioning requirement)."""
    return spark.table(table).groupBy("cell_id").agg(F.count(F.lit(1)).alias("n"))


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a SHUFFLE exchange (test helper).
    BroadcastExchange doesn't count — it moves the small side, not the data."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "ShuffleExchange" in plan
