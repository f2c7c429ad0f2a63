"""Bucketed tables: the cell-keyed aggregation runs with NO shuffle."""

import pytest
from pyspark.sql import functions as F

from polycheck_spark.data import synth
from polycheck_spark.io.bucketing import (
    bucketed_join_cellcounts, plan_has_exchange, write_bucketed,
)
from polycheck_spark.operators.pip_join import assign_tiles


@pytest.fixture(scope="module")
def bucketed_table(spark, tmp_path_factory):
    spark.sql("DROP TABLE IF EXISTS pages_bucketed")
    pages = assign_tiles(synth.geocoded_pages(spark, 5000), res=6) \
        .select("url", "lon", "lat", "cell_id")
    write_bucketed(pages, "pages_bucketed", buckets=8)
    yield "pages_bucketed"
    spark.sql("DROP TABLE IF EXISTS pages_bucketed")


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_table):
    agg = bucketed_join_cellcounts(spark, bucketed_table)
    assert not plan_has_exchange(agg), agg._jdf.queryExecution().executedPlan().toString()
    # and an unbucketed equivalent DOES shuffle (sanity of the helper)
    plain = assign_tiles(synth.geocoded_pages(spark, 5000), res=6) \
        .groupBy("cell_id").count()
    assert plan_has_exchange(plain)


def test_bucketed_counts_match_plain(spark, bucketed_table):
    got = {r["cell_id"]: r["n"] for r in bucketed_join_cellcounts(spark, bucketed_table).collect()}
    exp_df = assign_tiles(synth.geocoded_pages(spark, 5000), res=6) \
        .groupBy("cell_id").agg(F.count(F.lit(1)).alias("n"))
    exp = {r["cell_id"]: r["n"] for r in exp_df.collect()}
    assert got == exp


def test_bucketed_self_join_single_side_exchange_free(spark, bucketed_table):
    """Join of two bucketed reads on the bucket key: no exchange on either side."""
    a = spark.table(bucketed_table).groupBy("cell_id").count()
    b = spark.table(bucketed_table).groupBy("cell_id").agg(F.max("url").alias("mx"))
    j = a.join(b, "cell_id")
    assert not plan_has_exchange(j), j._jdf.queryExecution().executedPlan().toString()
