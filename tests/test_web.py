"""URL canonicalization / url-dedup / host-stats operators vs DuckDB twins."""

import duckdb
from pyspark.sql import functions as F

from polycheck_spark.operators import web as W


def test_canonical_url_goldens(spark):
    cases = [
        ("http://www.Example.COM/Path/page?utm=1#frag", "example.com/Path/page"),
        ("https://example.com/Path/page", "example.com/Path/page"),
        ("http://EXAMPLE.com/Path/page/", "example.com/Path/page"),
        ("https://www.example.com/Path/page///", "example.com/Path/page"),
        ("example.com/a", "example.com/a"),          # schemeless passthrough
        ("http://example.com", "example.com"),        # bare host
        ("http://example.com/?q=1", "example.com"),   # root + query
        ("http://wwwx.example.com/a", "wwwx.example.com/a"),  # www. only as prefix+dot
        ("http://example.com/CaseKeptPath", "example.com/CaseKeptPath"),
        # query/fragment on a path-less URL must not leak into the host
        ("http://Example.com?utm=1", "example.com"),
        ("http://example.com#frag", "example.com"),
        # '://' inside a query param: split at the FIRST occurrence
        ("http://example.com/r?to=https://other.com/x", "example.com/r"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i int, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", W.canonical_url_col(F.col("url")).alias("c")).collect()}
    for i, (_, expected) in enumerate(cases):
        assert got[i] == expected, (cases[i], got[i])
    # cross-engine: identical canonical forms from the SQL twin
    con = duckdb.connect()
    rows = ", ".join(f"({i}, '{u}')" for i, (u, _) in enumerate(cases))
    exp = dict(con.execute(
        f"SELECT i, {W.canonical_url_sql('url')} FROM (VALUES {rows}) t(i, url)"
    ).fetchall())
    assert got == exp


def test_url_dedup_and_host_stats_match_oracle(spark, tmp_path):
    rows = []
    for i in range(200):
        scheme = "https://" if i % 3 == 0 else "http://"
        host = ["www.sitea.com", "WWW.SITEA.COM", "sitea.com",
                "siteb.org"][i % 4]
        q = f"?ref={i % 5}" if i % 2 == 0 else ""
        rows.append((i, f"{scheme}{host}/p/{i % 9}{q}"))
    pages = spark.createDataFrame(rows, "doc_id long, url string")
    path = str(tmp_path / "urls.parquet")
    pages.coalesce(1).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW urls AS SELECT * FROM read_parquet('{path}/*.parquet')")

    got = sorted(tuple(r) for r in W.url_dedup_groups(pages).collect())
    exp = sorted(con.execute(W.url_dedup_groups_sql("urls")).fetchall())
    assert got == exp and got
    # the three sitea spellings collapse: each (path) group holds variants
    assert any(g[0].startswith("sitea.com/") and g[1] >= 10 for g in got)

    goth = sorted(tuple(r) for r in W.host_stats(pages).collect())
    exph = sorted(con.execute(W.host_stats_sql("urls")).fetchall())
    assert goth == exph
    hosts = {h for h, _, _ in goth}
    assert hosts == {"sitea.com", "siteb.org"}
    for _, n_fetches, n_canonical in goth:
        assert n_canonical <= n_fetches
