"""Cell-ring kNN vs brute-force oracle."""

import duckdb
import pytest
from pyspark.sql import functions as F

from polycheck_spark.data import synth
from polycheck_spark.operators.knn import knn_join, knn_sql_oracle


def _brute_force_duckdb(sf_dir, k, qfilter):
    lon_sql, lat_sql = synth.geocode_arith_sql("doc_id")
    cte = (f"SELECT doc_id, {lon_sql} AS lon, {lat_sql} AS lat "
           f"FROM read_parquet('{sf_dir}/documents.parquet')")
    return sorted(duckdb.sql(knn_sql_oracle(cte, qfilter, k)).fetchall())


@pytest.mark.parametrize("k,res", [(5, 6), (3, 10)])
def test_knn_matches_bruteforce(spark, sf_dir, k, res):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lon, lat = synth.geocode_arith_cols(F.col("doc_id"))
    pts = docs.select("doc_id", lon.alias("lon"), lat.alias("lat")).localCheckpoint()
    queries = pts.filter(F.col("doc_id") % 17 == 0)
    got = knn_join(queries, pts, k, res=res, query_id="doc_id", target_id="doc_id")
    got_rows = sorted((r["query_id"], r["target_id"], r["rank"])
                      for r in got.select("query_id", "target_id", "rank").collect())
    exp = _brute_force_duckdb(sf_dir, k, "doc_id % 17 = 0")
    assert got_rows == exp


def test_knn_pathological_res_stays_bounded(spark, sf_dir):
    """A res far too fine for the data (every ring round fails) must NOT fall
    back to an unbounded cross join: with a tiny pair budget the coarse-res
    retry path completes and the result is still brute-force exact."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lon, lat = synth.geocode_arith_cols(F.col("doc_id"))
    pts = docs.select("doc_id", lon.alias("lon"), lat.alias("lat")).localCheckpoint()
    queries = pts.filter(F.col("doc_id") % 17 == 0)
    got = knn_join(queries, pts, 5, res=14, max_rounds=1, max_cross_pairs=10,
                   query_id="doc_id", target_id="doc_id")
    got_rows = sorted((r["query_id"], r["target_id"], r["rank"])
                      for r in got.select("query_id", "target_id", "rank").collect())
    exp = _brute_force_duckdb(sf_dir, 5, "doc_id % 17 = 0")
    assert got_rows == exp


def test_knn_budget_raises_at_floor(spark, sf_dir):
    """max_rounds=0 at res=2 leaves everything to the fallback; an exceeded
    budget must raise instead of cross-joining."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lon, lat = synth.geocode_arith_cols(F.col("doc_id"))
    pts = docs.select("doc_id", lon.alias("lon"), lat.alias("lat"))
    queries = pts.limit(5)
    with pytest.raises(ValueError, match="max_cross_pairs"):
        knn_join(queries, pts, 3, res=2, max_rounds=0, max_cross_pairs=1,
                 query_id="doc_id", target_id="doc_id").collect()


def test_knn_every_query_gets_k(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lon, lat = synth.geocode_arith_cols(F.col("doc_id"))
    pts = docs.select("doc_id", lon.alias("lon"), lat.alias("lat"))
    queries = pts.limit(20)
    got = knn_join(queries, pts, 4, res=8, query_id="doc_id", target_id="doc_id")
    counts = got.groupBy("query_id").count().collect()
    assert len(counts) == 20
    assert all(r["count"] == 4 for r in counts)
