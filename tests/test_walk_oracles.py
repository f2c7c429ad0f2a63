"""Randomized DuckDB-vs-kernel differentials for the walk-oracle generators.

The driver's correctness gate only exercises the FIXED golden instances; these
tests re-derive the recursive-CTE oracles on randomized grids/pairs each run
so edits to polycheck_spark/data/walk_oracles.py cannot silently diverge from
the scalar kernels (no Spark needed — pure DuckDB vs NumPy)."""

import math

import duckdb
import numpy as np
import pytest

from polycheck_spark.data import walk_oracles as WO
from polycheck_spark.data.polygons import GOLDEN_POLYGONS
from polycheck_spark.geo import kernel as K


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _grid(seed, h, w, density=0.3):
    rng = np.random.RandomState(seed)
    g = np.zeros((h, w), dtype=np.float32)
    m = rng.rand(h, w) < density
    g[m] = rng.rand(m.sum()).astype(np.float32)
    return rng, g


def test_bresenham_oracles_match_kernel(con):
    h, w = 8, 9
    rng, grid = _grid(42, h, w)
    n = 80
    pairs_in = list(zip(rng.randint(0, w, n), rng.randint(0, h, n),
                        rng.randint(0, w, n), rng.randint(0, h, n)))
    pairs_mix = list(zip(rng.randint(-2, w + 2, n), rng.randint(-2, h + 2, n),
                         rng.randint(-2, w + 2, n), rng.randint(-2, h + 2, n)))
    for mode, pairs, mr in [("product", pairs_in, 0), ("product", pairs_in, 4),
                            ("sum", pairs_mix, 0)]:
        rows = con.execute(WO.bresenham_oracle_sql(grid, pairs, mode, mr)).fetchall()
        got = {(r[0], r[1], r[2], r[3]): np.float32(r[4]) for r in rows}
        for (a, b, c, d) in pairs:
            exp = np.float32(
                K.line_observation(grid, int(a), int(b), int(c), int(d), mr)
                if mode == "product"
                else K.line_observation_sum(grid, int(a), int(b), int(c), int(d)))
            assert got[(a, b, c, d)] == exp, (mode, mr, (a, b, c, d))


def test_dda_oracles_match_kernel(con):
    h, w = 7, 8
    rng, grid = _grid(7, h, w)
    ox, oy, res = -1.5, 0.25, 0.5
    n = 80

    def f32s(a):
        return [float(np.float32(v)) for v in a]

    pairs = list(zip(f32s(rng.uniform(-2.5, 3.0, n)), f32s(rng.uniform(-0.5, 4.5, n)),
                     f32s(rng.uniform(-2.5, 3.0, n)), f32s(rng.uniform(-0.5, 4.5, n))))
    for mode, mr in [("product", 0.0), ("product", 2.0), ("sum", 0.0), ("sum", 2.5)]:
        rows = con.execute(
            WO.dda_oracle_sql(grid, (ox, oy), res, pairs, mode, mr)).fetchall()
        got = {(r[0], r[1], r[2], r[3]): np.float32(r[4]) for r in rows}
        for (a, b, c, d) in pairs:
            exp = np.float32(
                K.line_real_observation(grid, h, w, ox, oy, res, a, b, c, d, mr)
                if mode == "product"
                else K.line_real_observation_sum(grid, h, w, ox, oy, res, a, b, c, d, mr))
            assert got[(a, b, c, d)] == exp, (mode, mr, (a, b, c, d))


def test_faux_scan_oracle_matches_kernel(con):
    polys = [GOLDEN_POLYGONS["triangle"], GOLDEN_POLYGONS["square2"]]
    exp_r, exp_h = K.faux_scan(polys, (0.0, 0.0), 0.0, math.pi / 180.0, 180, 10.0, 0.1)
    rows = con.execute(WO.faux_scan_oracle_sql(
        polys, (0.0, 0.0), 0.0, math.pi / 180.0, 180, 10.0, 0.1)).fetchall()
    got_r = np.array([r[1] for r in rows], dtype=np.float32)
    got_h = np.array([r[2] for r in rows], dtype=np.int64)
    assert np.array_equal(got_r, exp_r)
    assert np.array_equal(got_h, exp_h.astype(np.int64))


def test_sensor_oracles_match_local_pipeline(con):
    """Full-FOV randomized sensors: oracle vs the local kernel pipeline.

    The combine differs from Spark's log-space formula by <= 1 float32 ulp
    on adversarial occupancies, so this differential compares against the
    direct-product local combine with a 1-ulp tolerance; the EXACT Spark
    parity is what selfcheck's golden instances pin down."""
    from polycheck_spark.operators.visibility import sensor_visibility_local
    rng, grid = _grid(5, 7, 8)
    sensors = [(i, float(rng.randint(0, 8)), float(rng.randint(0, 7)),
                float(rng.choice([0.0, 3.0, 20.0])), float(rng.uniform(-3, 3)),
                2 * math.pi) for i in range(4)]
    sarr = np.array([s[1:] for s in sensors], dtype=np.float32)
    for combine in ("union", "product"):
        _, comb = sensor_visibility_local(grid, sarr, combine)
        sql = WO.sensor_grid_oracle_sql(grid, sensors, combine)
        for ex, ey, p in con.execute(sql).fetchall():
            exp = comb[ey, ex]
            assert abs(np.float32(p) - exp) <= abs(np.spacing(exp)), \
                (combine, ex, ey, p, exp)
