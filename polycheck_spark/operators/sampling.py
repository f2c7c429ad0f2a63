"""Deterministic hash-based sampling.

Training-data pipelines need samples that are (a) reproducible across runs
and engines, (b) stable under repartitioning, and (c) stratifiable — none of
which ``df.sample()`` gives (it is seed+partition-layout dependent).  Here
membership is a pure function of the row key: md5(salt:key) -> 32-bit int ->
keep iff ``hash % den < num``.  That is a Bernoulli(num/den) sample under
the random-oracle model, identical in Spark and DuckDB, and trivially
distributed (a map-side filter — no shuffle at any scale; Catalyst pushes it
into the scan's filter stage).

``stratified_sample`` takes per-stratum rational rates joined in as a small
broadcast table — per-class balancing (e.g. downsample 'en', keep all 'got')
without a shuffle on the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket(key_col, salt: str, den: int):
    """Uniform bucket in [0, den): first 8 md5 hex digits of 'salt:key' —
    the same md5-int scheme every LSH path uses (engine-parity proven)."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), key_col.cast("string"))), 1, 8),
        16, 10).cast("long")
    return F.pmod(h, F.lit(den))


def _sq(value: str) -> str:
    """SQL single-quote escape for interpolated salt/stratum literals — the
    Spark side takes any string through F.lit, so the emitters must too
    (a salt like "it's" previously produced a broken oracle query)."""
    return value.replace("'", "''")


def _bucket_sql(key_expr: str, salt: str, den: int) -> str:
    return (f"(CAST('0x' || substr(md5('{_sq(salt)}:' || CAST({key_expr} AS VARCHAR)), 1, 8) "
            f"AS BIGINT) % {den})")


def sample_hash(df: DataFrame, key_col: str, rate: tuple[int, int], *,
                salt: str = "s0") -> DataFrame:
    """Keep each row with probability num/den, deterministically by key.
    Different ``salt`` values give independent samples (e.g. train/held-out
    splits: same den, disjoint bucket ranges via distinct salts or
    complementary filters)."""
    num, den = rate
    if not 0 <= num <= den:
        raise ValueError("need 0 <= num <= den")
    return df.filter(_bucket(F.col(key_col), salt, den) < num)


def sample_hash_sql(table: str, key_expr: str, rate: tuple[int, int],
                    salt: str = "s0") -> str:
    num, den = rate
    return f"SELECT * FROM {table} WHERE {_bucket_sql(key_expr, salt, den)} < {num}"


def stratified_sample(df: DataFrame, key_col: str, stratum_col: str,
                      rates: dict[str, tuple[int, int]], *,
                      default_rate: tuple[int, int] = (0, 1),
                      salt: str = "s0") -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps rate[s] of its
    rows (``default_rate`` for unlisted strata).  The rates ride a literal
    CASE expression (a handful of strata) — zero joins, zero shuffles; for
    thousands of strata switch to a broadcast-join rates table, same
    semantics."""
    num_c = F.lit(default_rate[0])
    den_c = F.lit(default_rate[1])
    for s, (num, den) in sorted(rates.items()):
        if not 0 <= num <= den:
            raise ValueError(f"bad rate for stratum {s!r}")
        cond = F.col(stratum_col) == s
        num_c = F.when(cond, F.lit(num)).otherwise(num_c)
        den_c = F.when(cond, F.lit(den)).otherwise(den_c)
    # common-denominator compare: bucket over a fixed modulus, scale the
    # threshold — hash % (den) < num requires per-stratum modulus; instead
    # use hash % LCM-free form: (hash % den) < num evaluated with the
    # stratum's own den via pmod on a Column modulus
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))), 1, 8),
        16, 10).cast("long")
    return df.filter(F.pmod(h, den_c) < num_c)


def stratified_sample_sql(table: str, key_expr: str, stratum_col: str,
                          rates: dict[str, tuple[int, int]],
                          default_rate: tuple[int, int] = (0, 1),
                          salt: str = "s0") -> str:
    num_c = str(default_rate[0])
    den_c = str(default_rate[1])
    for s, (num, den) in sorted(rates.items()):
        num_c = f"CASE WHEN {stratum_col} = '{_sq(s)}' THEN {num} ELSE {num_c} END"
        den_c = f"CASE WHEN {stratum_col} = '{_sq(s)}' THEN {den} ELSE {den_c} END"
    h = (f"CAST('0x' || substr(md5('{_sq(salt)}:' || CAST({key_expr} AS VARCHAR)), 1, 8) "
         f"AS BIGINT)")
    return f"SELECT * FROM {table} WHERE ({h} % ({den_c})) < ({num_c})"
