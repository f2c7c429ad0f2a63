"""Golden-fixture tests for the NumPy kernels (no Spark).

Fixtures are reproduced from the reference's own tests (FIXTURES.md §A):
star-polygon 200x200 grid, curated unit-square points, Bresenham endpoint
exclusion, sensor closed-form cases, union/product combine formulas.
"""

import math

import numpy as np
import pytest

from polycheck_spark.geo import kernel as K
from polycheck_spark.data.polygons import GOLDEN_POLYGONS


# --- reference oracle (tests/test_contains.py:9-27, reimplemented) ----------

def _oracle_contains(polygon, point):
    wn = 0
    poly = np.asarray(polygon, dtype=np.float32)
    point = np.asarray(point, dtype=np.float32)
    for idx in range(len(poly)):
        ep1, ep2 = poly[idx], poly[(idx + 1) % len(poly)]
        diff = ep2 - ep1
        side = diff[0] * (point[1] - ep1[1]) - (point[0] - ep1[0]) * diff[1]
        if ep1[1] <= point[1]:
            if ep2[1] > point[1] and side > 0:
                wn += 1
        elif ep2[1] <= point[1] and side < 0:
            wn -= 1
    return wn != 0


def test_contains_star_grid_exact():
    """tests/test_contains.py:54-97 — exact match, no boundary excuse."""
    polygon = GOLDEN_POLYGONS["star8"]
    dots = np.linspace(-8, 8, 200)
    xs, ys = np.meshgrid(dots, dots, indexing="xy")
    points = np.stack([xs.ravel(), ys.ravel()], axis=1)
    expected = np.array([_oracle_contains(polygon, p) for p in points])
    got = K.contains(polygon, points).astype(bool)
    assert np.array_equal(got, expected)
    assert expected.sum() > 0  # the star actually contains points


def test_contains_unit_square_curated():
    """tests/test_comparison.py:64-77 — curated in/out/boundary points."""
    square = GOLDEN_POLYGONS["unit_square"]
    pts = [(0.5, 0.5), (1.5, 0.5), (0.0, 0.0), (0.25, 0.75), (-0.1, 0.5), (0.999, 0.999)]
    got = K.contains(square, np.array(pts)).astype(bool).tolist()
    expected = [_oracle_contains(square, p) for p in pts]
    assert got == expected
    # corner (0,0) is inside under the strict/non-strict crossing rules:
    # the upward edge (1,0)->(1,1) counts (side=1>0), nothing cancels it.
    assert got == [True, False, True, True, False, True]


def test_contains_csr_matches_per_polygon():
    layers = [GOLDEN_POLYGONS["star8"], GOLDEN_POLYGONS["unit_square"],
              GOLDEN_POLYGONS["triangle"]]
    verts, offsets = K.pack_polygons_csr(layers)
    pts = np.array([(0.5, 0.5)] * 3 + [(2.5, 2.4)] * 3 + [(0.0, 0.2)] * 3)
    idx = np.array([0, 1, 2, 0, 1, 2, 0, 1, 2])
    got = K.contains_csr(verts, offsets, idx, pts)
    for i in range(9):
        exp = K.contains(layers[idx[i]], pts[i:i + 1])[0]
        assert got[i] == exp


def test_bresenham_endpoint_excluded():
    """tests/test_bresenham_endpoint.py:6-32 — target occupancy must not
    affect its own visibility."""
    for occ in (1.0, 0.5):
        grid = np.zeros((3, 3), dtype=np.float32)
        grid[1, 2] = occ
        assert K.line_observation(grid, 0, 1, 2, 1) == pytest.approx(1.0)


def test_line_observation_blocking():
    grid = np.zeros((10, 10), dtype=np.float32)
    grid[5, 5] = 1.0
    # straight ray through the wall: fully blocked
    assert K.line_observation(grid, 5, 0, 5, 9) == 0.0
    # partial block multiplies transmittance (start and end cells excluded)
    grid2 = np.zeros((10, 10), dtype=np.float32)
    grid2[5, 4] = 0.25
    grid2[5, 6] = 0.5
    assert K.line_observation(grid2, 3, 5, 8, 5) == pytest.approx(0.75 * 0.5)


def test_line_observation_sum_destination_excluded():
    """tests/test_sensor_visibility.py:152-171 — clear = 1 - (0.2 + 0.3)."""
    grid = np.zeros((5, 5), dtype=np.float32)
    grid[2, 1] = 0.2
    grid[2, 2] = 0.3
    for target_occ in (0.0, 1.0):
        grid[2, 4] = target_occ
        got = K.line_observation_sum(grid, 0, 2, 4, 2)
        assert got == pytest.approx(0.5, abs=1e-6)


def test_real_observation_matches_grid_on_unit_res():
    grid = np.zeros((8, 8), dtype=np.float32)
    grid[3, 3] = 0.5
    grid[3, 4] = 0.5
    v = K.line_real_observation(grid, 8, 8, 0.0, 0.0, 1.0, 0.5, 3.5, 7.5, 3.5)
    assert v == pytest.approx(0.25, abs=1e-6)
    s = K.line_real_observation_sum(grid, 8, 8, 0.0, 0.0, 1.0, 0.5, 3.5, 7.5, 3.5, 20.0)
    assert s == pytest.approx(0.0, abs=1e-6)  # 0.5+0.5 blocks fully


def test_real_observation_max_range():
    grid = np.zeros((8, 8), dtype=np.float32)
    assert K.line_real_observation(grid, 8, 8, 0, 0, 1.0, 0.5, 0.5, 7.5, 7.5, 2.0) == 0.0
    assert K.line_real_observation(grid, 8, 8, 0, 0, 1.0, 0.5, 0.5, 7.5, 7.5, 0.0) == 1.0


def test_sensor_zero_range_own_cell_only():
    """tests/test_sensor_visibility.py:74-105."""
    grid = np.full((7, 7), 0.25, dtype=np.float32)
    sensors = np.array([[3.0, 4.0, 0.0, 0.8, math.pi]], dtype=np.float32)
    per = np.zeros((1, 7, 7), dtype=np.float32)
    for ey in range(7):
        for ex in range(7):
            per[0, ey, ex] = K.sensor_cell_observation(grid, sensors[0], ex, ey)
    expected = np.zeros((7, 7), dtype=np.float32)
    expected[4, 3] = 1.0
    assert np.array_equal(per[0], expected)
    mask = K.sensor_coverage_mask(7, 7, sensors)
    assert mask[0].sum() == 1 and mask[0, 4, 3]


def test_sensor_fov_masks_match_formula():
    """tests/test_sensor_visibility.py:108-124 — coverage equals the
    range-AND-fov NumPy formula."""
    sensors = np.array([
        [4.0, 4.0, 1.0, 0.0, 2 * math.pi],
        [4.0, 4.0, 2.25, math.pi / 2, math.pi],
        [4.0, 4.0, 3.0, -math.pi / 4, math.pi / 2],
    ], dtype=np.float32)
    mask = K.sensor_coverage_mask(9, 9, sensors)
    yy, xx = np.meshgrid(np.arange(9, dtype=np.float64), np.arange(9, dtype=np.float64), indexing="ij")
    for i, (sx, sy, rng, d, fov) in enumerate(sensors):
        dx, dy = xx - sx, yy - sy
        dist = np.sqrt(dx * dx + dy * dy)
        exp = dist <= rng + 1e-6
        if 0.0 < fov < 2 * math.pi - 1e-6:
            delta = np.abs(K.wrap_to_pi(np.arctan2(dy, dx) - float(d)))
            exp &= (dist <= 1e-8) | (delta <= 0.5 * float(fov) + 1e-6)
        assert np.array_equal(mask[i], exp), i


def test_union_combine_formula():
    """tests/test_sensor_visibility.py:174-194 — union = 1 - (1-p0)(1-p1)."""
    per = np.array([[[0.6]], [[0.5]]], dtype=np.float32)
    cov = np.ones((2, 1, 1), dtype=bool)
    out = K.combine_sensor_observations(per, cov, "union")
    assert out[0, 0] == pytest.approx(0.8, abs=1e-6)


def test_product_combine_noncovering_neutral():
    """tests/test_sensor_visibility.py:197-216."""
    per = np.array([[[0.7]], [[0.0]]], dtype=np.float32)
    cov = np.array([[[True]], [[False]]])
    out = K.combine_sensor_observations(per, cov, "product")
    assert out[0, 0] == pytest.approx(0.7, abs=1e-6)
    # nothing covers -> 0
    out2 = K.combine_sensor_observations(per, np.zeros((2, 1, 1), bool), "product")
    assert out2[0, 0] == 0.0


def test_faux_scan_triangle_square():
    """tests/test_comparison.py:194-223 layout; analytic entry distances."""
    polys = [GOLDEN_POLYGONS["triangle"], GOLDEN_POLYGONS["square2"]]
    ranges, hits = K.faux_scan(polys, (0.0, 0.0), 0.0, math.pi / 180.0, 90, 10.0, 0.1)
    assert ranges.shape == (90,) and hits.shape == (90,)
    # ray at 45 deg passes through the triangle (entry at (2,2), dist 2*sqrt(2))
    r45 = ranges[45]
    assert r45 == pytest.approx(2 * math.sqrt(2), abs=0.15)
    assert hits[45] == 0
    # ray at ~18 deg hits square2 (entry where x=4 at y=4*tan(18deg)~1.3)
    deg = math.degrees(math.atan2(1.5, 4.5))
    idx = round(deg)
    assert hits[idx] == 1
    assert ranges[idx] == pytest.approx(math.hypot(4.0, 4.0 * math.tan(math.radians(idx))), abs=0.15)
    # rays that hit nothing report -1 / INT32_MAX
    assert ranges[89] == -1.0 and hits[89] == 0x7FFFFFFF


def test_faux_scan_empty_layer():
    ranges, hits = K.faux_scan([], (0, 0), 0.0, 0.1, 10, 5.0, 0.1)
    assert (ranges == -1.0).all() and (hits == 0x7FFFFFFF).all()


def test_visibility_stability_transition():
    """tests/test_visibility_stability.py:73-142 — observer sliding past a
    solid block sees the target as 1 -> 0 -> 1 with no flicker."""
    grid = np.zeros((30, 30), dtype=np.float32)
    grid[13:17, 13:17] = 1.0
    target = (15, 1)  # above the block; observer slides along y=25 below it
    states = []
    for x in range(1, 29):
        v = K.line_observation(grid, x, 25, target[0], target[1])
        states.append(1 if v > 0.5 else 0)
    # collapse runs: must be exactly [1, 0, 1]
    runs = [s for i, s in enumerate(states) if i == 0 or states[i - 1] != s]
    assert runs == [1, 0, 1], states


def test_visibility_stability_transition_real_regime():
    """tests/test_visibility_stability.py real-coordinate half: the observer
    slides in SUB-CELL steps (200 samples, res 0.1 world units per cell)
    past a solid block — transmittance must transition cleanly 1 -> 0 -> 1
    with no flicker despite the DDA entering cells at varying offsets."""
    grid = np.zeros((30, 30), dtype=np.float32)
    grid[13:17, 13:17] = 1.0
    origin, res = (0.0, 0.0), 0.1
    # world coords: grid spans [0, 3.0)^2; block = [1.3, 1.7) on both axes
    ty, oy = 0.15, 2.55  # target above the block, observer path below it
    states = []
    for i in range(200):
        ox = 0.12 + i * (2.76 / 199)  # sub-cell stride, never on a cell edge
        v = K.line_real_observation(grid, 30, 30, origin[0], origin[1], res,
                                    ox, oy, 1.55, ty)
        states.append(1 if v > 0.5 else 0)
    runs = [s for i, s in enumerate(states) if i == 0 or states[i - 1] != s]
    assert runs == [1, 0, 1], runs
