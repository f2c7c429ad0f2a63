"""Oracle output-type lint — driver-hash parity guard.

The driver's value hash is type/representation-sensitive: DuckDB types an
un-cast ``SUM(BIGINT)`` as HUGEINT (int128), which hash-diverges from
Spark's BIGINT even when every value matches (the round-6 regression on
pii_profile / tile_rank / web_pipeline).  This suite runs
``tools.selfcheck.lint_oracle_types`` over EVERY registered oracle so the
class is structurally impossible to ship, and proves the lint bites on a
planted un-cast SUM.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from tools.selfcheck import TABLES, lint_oracle_types


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{sf_dir}/{t}.parquet')")
    yield c
    c.close()


def test_planted_uncast_sum_fails_lint(con):
    sql = "SELECT SUM(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)"
    errs = lint_oracle_types(con, sql)
    assert errs and "HUGEINT" in errs[0]


def test_planted_cast_sum_passes_lint(con):
    sql = ("SELECT CAST(SUM(x) AS BIGINT) AS s "
           "FROM (SELECT CAST(1 AS BIGINT) AS x)")
    assert lint_oracle_types(con, sql) == []


def test_decimal_mismatch_fails_with_spark_schema(con):
    from pyspark.sql.types import LongType, StructField, StructType
    sql = "SELECT CAST(1 AS DECIMAL(12,2)) AS s"
    schema = StructType([StructField("s", LongType())])
    errs = lint_oracle_types(con, sql, schema)
    assert errs and "DECIMAL" in errs[0]


def test_every_registered_oracle_is_lint_clean(con):
    """No oracle may emit HUGEINT/UHUGEINT.  Type resolution only — the
    relations are never executed, so this is cheap even over all entries."""
    bad = {}
    for name, sql in E.oracle_sql().items():
        errs = lint_oracle_types(con, sql)
        if errs:
            bad[name] = errs
    assert not bad, f"oracles emit driver-hash-unsafe types: {bad}"
