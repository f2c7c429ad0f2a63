"""Simulate the driver's correctness gate locally.

Runs every ``queries()`` entry at the given sf dir and compares row count,
column names, and an order-insensitive value multiset against ``oracle_sql()``
in DuckDB.  Usage: python tools/selfcheck.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import decimal
import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as E

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # every value becomes a ("tag", ...) tuple so rows stay totally ordered
    # even when a column mixes NULLs with values (CUBE subtotals)
    if v is None:
        return ("_null",)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", f"{v:.12g}")
    if isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, str):
        return ("s", v)
    return ("o", str(v))


#: DuckDB output types the driver's hasher represents differently from
#: Spark even when every value is equal (int128 sums from un-cast
#: SUM(BIGINT) were the round-6 regression).  An oracle must never emit one.
BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")


def lint_oracle_types(con, sql, spark_schema=None):
    """Lint one oracle's *output types* without executing it.

    Returns a list of error strings.  HUGEINT/UHUGEINT columns are always
    errors (cast the aggregate to BIGINT).  When ``spark_schema`` is given,
    a DECIMAL oracle column whose same-named Spark column is not DecimalType
    is also an error — both classes make the driver's type-sensitive hash
    diverge on value-identical results.
    """
    rel = con.sql(sql)
    errs = []
    spark_is_dec = None
    if spark_schema is not None:
        from pyspark.sql.types import DecimalType
        spark_is_dec = {f.name: isinstance(f.dataType, DecimalType)
                        for f in spark_schema.fields}
    for cname, ctype in zip(rel.columns, rel.types):
        t = str(ctype).upper()
        if any(b in t for b in BAD_ORACLE_TYPES):
            errs.append(f"{cname}: oracle type {t} (cast the SUM to BIGINT)")
        elif (t.startswith("DECIMAL") and spark_is_dec is not None
              and not spark_is_dec.get(cname, False)):
            errs.append(f"{cname}: oracle {t} but Spark column is not decimal")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from polycheck_spark.session import get_spark
    spark = get_spark("selfcheck", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            rows = df.collect()
            cols = df.columns
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            lint = lint_oracle_types(con, oracles[name], df.schema)
            if lint:
                failures.append(name)
                print(f"FAIL {name}: oracle type lint: {lint}")
                continue
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: oracle error {type(ex).__name__}: {ex}")
            continue
        if sorted(cols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL {name}: columns {cols} vs oracle {ocols}")
            continue
        if len(rows) != len(orows):
            failures.append(name)
            print(f"FAIL {name}: {len(rows)} rows vs oracle {len(orows)}")
            continue
        order = [cols.index(c) for c in sorted(cols)]
        oorder = [ocols.index(c) for c in sorted(ocols)]
        got = sorted(tuple(norm(r[i]) for i in order) for r in rows)
        exp = sorted(tuple(norm(r[i]) for i in oorder) for r in orows)
        if got != exp:
            bad = next(i for i in range(len(got)) if got[i] != exp[i])
            failures.append(name)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:\n"
                  f"     got {got[bad]}\n     exp {exp[bad]}")
            continue
        print(f"ok   {name}: {len(rows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
