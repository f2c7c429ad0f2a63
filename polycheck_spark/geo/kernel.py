"""Reference-exact NumPy kernels (the trust anchor of the engine).

Every distributed operator in polycheck_spark reduces, per Arrow batch, to one
of these pure-NumPy functions.  Semantics are bit-for-bit aligned with the
reference implementation (idlebear/polycheck):

* winding-number point-in-polygon: /root/reference/polycheck/polycheck.py:203-247
  and the pure-Python oracle /root/reference/tests/test_contains.py:14-27
* Bresenham transmittance walk:    /root/reference/polycheck/polycheck.py:375-432
* Bresenham sum-blocking walk:     /root/reference/polycheck/polycheck.py:434-490
* Amanatides-Woo DDA (product):    /root/reference/polycheck/polycheck.py:249-372
* Amanatides-Woo DDA (sum):        /root/reference/polycheck/polycheck.py:492-602
* sensor FOV gate:                 /root/reference/polycheck/polycheck.py:157-179
* sensor coverage masks:           /root/reference/polycheck/polycheck.py:1072-1145
* union/product sensor combine:    /root/reference/polycheck/polycheck.py:1148-1161
* faux laser scan march:           /root/reference/polycheck/polycheck.py:604-630

All scalar state uses float32 exactly where the reference does (the CUDA
kernels are float32; a few accumulators are C ``double`` — noted inline).
"""

from __future__ import annotations

import math

import numpy as np

FLT_EPSILON = np.float32(1.1920928955078125e-07)  # FLT_EPSILON, matches <cfloat>
TWO_PI = 2.0 * math.pi


# ---------------------------------------------------------------------------
# scalar helpers
# ---------------------------------------------------------------------------

def is_zero_f32(f) -> bool:
    """CUDA ``is_zero``: |f| <= FLT_EPSILON (polycheck.py:128-131)."""
    return -FLT_EPSILON <= f <= FLT_EPSILON


def wrap_to_pi(angle):
    """Wrap angle to (-pi, pi]; NumPy twin of polycheck.py:1061-1062."""
    return (angle + np.pi) % TWO_PI - np.pi


def epsilon_round(value: float) -> int:
    """Round-if-within-2e-6 else C-style truncation (polycheck.py:1065-1069)."""
    rounded = np.rint(value)
    if np.abs(value - rounded) < 2e-6:
        return int(rounded)
    return int(value)


def clamp01(value):
    return np.minimum(1.0, np.maximum(0.0, value))


# ---------------------------------------------------------------------------
# point-in-polygon (winding number, nonzero rule) — vectorized over points
# ---------------------------------------------------------------------------

def contains(polygon: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Winding-number PIP for one polygon against N points.

    Float32 semantics identical to the reference oracle
    (/root/reference/tests/test_contains.py:14-27): an upward crossing counts
    iff ``v1y <= py and v2y > py and side > 0`` (strict), a downward crossing
    iff ``v1y > py and v2y <= py and side < 0`` (strict), where
    ``side = (v2x-v1x)*(py-v1y) - (px-v1x)*(v2y-v1y)``.  Inside <=> wn != 0.

    Vectorized over the point axis: O(V) NumPy passes for N points.

    Args:
        polygon: (V, 2) array-like; implicit closing edge V-1 -> 0.
        points:  (N, 2) array-like.

    Returns:
        (N,) float32 array of {0.0, 1.0}.
    """
    poly = np.asarray(polygon, dtype=np.float32).reshape(-1, 2)
    pts = np.asarray(points, dtype=np.float32).reshape(-1, 2)
    n = len(pts)
    out = np.empty(n, dtype=np.float32)
    v1 = poly
    v2 = np.roll(poly, -1, axis=0)

    # Chunked so per-edge temporaries stay L2-resident: the winding loop is
    # bandwidth-bound when run over the whole point array at once, and DRAM
    # bandwidth is the shared resource that kills multi-core scaling.
    CHUNK = 16384
    scr = np.empty(min(n, CHUNK), dtype=np.float32)   # side accumulator
    t = np.empty(min(n, CHUNK), dtype=np.float32)     # temp
    wn = np.empty(min(n, CHUNK), dtype=np.int32)
    mask = np.empty(min(n, CHUNK), dtype=bool)
    m2 = np.empty(min(n, CHUNK), dtype=bool)
    for lo in range(0, n, CHUNK):
        hi = min(lo + CHUNK, n)
        c = hi - lo
        px = pts[lo:hi, 0]
        py = pts[lo:hi, 1]
        wn_c = wn[:c]
        wn_c[:] = 0
        for (v1x, v1y), (v2x, v2y) in zip(v1, v2):
            side = scr[:c]
            tmp = t[:c]
            # side = (v2x-v1x)*(py-v1y) - (px-v1x)*(v2y-v1y), float32, no FMA
            np.subtract(py, v1y, out=side)
            side *= (v2x - v1x)
            np.subtract(px, v1x, out=tmp)
            tmp *= (v2y - v1y)
            side -= tmp
            up = mask[:c]
            dn = m2[:c]
            if v1y <= v2y:
                # possible upward crossing: v1y <= py < v2y and side > 0
                np.greater_equal(py, v1y, out=up)
                np.less(py, v2y, out=dn)
                up &= dn
                np.greater(side, 0, out=dn)
                up &= dn
                wn_c += up
            else:
                # possible downward crossing: v2y <= py < v1y and side < 0
                np.greater_equal(py, v2y, out=up)
                np.less(py, v1y, out=dn)
                up &= dn
                np.less(side, 0, out=dn)
                up &= dn
                wn_c -= up
        np.not_equal(wn_c, 0, out=mask[:c])
        out[lo:hi] = mask[:c]
    return out


def pack_polygons_csr(polygons) -> tuple[np.ndarray, np.ndarray]:
    """Ragged polygon list -> (flat (sumV,2) float32 vertices, (P+1,) int64 offsets).

    Same CSR layout as the reference packer (polycheck.py:1341-1354), but
    offsets are vertex counts kept as int64 for NumPy slicing.
    """
    verts = []
    offsets = [0]
    total = 0
    for poly in polygons:
        arr = np.asarray(poly, dtype=np.float32).reshape(-1, 2)
        verts.append(arr)
        total += len(arr)
        offsets.append(total)
    if verts:
        flat = np.concatenate(verts, axis=0)
    else:
        flat = np.zeros((0, 2), dtype=np.float32)
    return flat, np.asarray(offsets, dtype=np.int64)


def contains_csr(
    csr_vertices: np.ndarray,
    csr_offsets: np.ndarray,
    poly_index: np.ndarray,
    points: np.ndarray,
) -> np.ndarray:
    """PIP over (point, polygon) pairs given CSR-packed polygons.

    ``poly_index[i]`` selects the polygon for ``points[i]``.  Pairs are grouped
    by polygon so each distinct polygon runs one vectorized `contains` pass.

    Returns (N,) float32 {0,1}.
    """
    pts = np.asarray(points, dtype=np.float32).reshape(-1, 2)
    poly_index = np.asarray(poly_index, dtype=np.int64)
    out = np.zeros(len(pts), dtype=np.float32)
    if len(pts) == 0:
        return out
    order = np.argsort(poly_index, kind="stable")
    sorted_idx = poly_index[order]
    bounds = np.flatnonzero(np.diff(sorted_idx)) + 1
    for grp in np.split(order, bounds):
        p = int(poly_index[grp[0]])
        lo, hi = csr_offsets[p], csr_offsets[p + 1]
        out[grp] = contains(csr_vertices[lo:hi], pts[grp])
    return out


# ---------------------------------------------------------------------------
# Bresenham walks (integer grid)
# ---------------------------------------------------------------------------

def line_observation(data: np.ndarray, sx: int, sy: int, ex: int, ey: int,
                     max_range: int = 0) -> float:
    """Transmittance along a Bresenham ray, endpoint excluded.

    Mirrors the CUDA walk at polycheck.py:375-432: the running observation is
    a C ``double`` (``auto observation = 1.0``); early exit when it drops
    below 2*FLT_EPSILON; ``max_range`` counts steps (0 = unlimited).
    No grid-bounds checks (reference has none on this path).
    """
    if sx == ex and sy == ey:
        return 1.0
    dx = abs(sx - ex)
    step_x = 1 if sx < ex else -1
    dy = -abs(sy - ey)
    step_y = 1 if sy < ey else -1
    error = dx + dy
    steps = 0
    observation = 1.0  # double, as in the reference
    eps2 = float(FLT_EPSILON) * 2.0
    while True:
        if sx == ex and sy == ey:
            break
        e2 = 2 * error
        if e2 >= dy:
            if sx == ex:
                break
            error += dy
            sx += step_x
        if e2 <= dx:
            if sy == ey:
                break
            error += dx
            sy += step_y
        if sx == ex and sy == ey:
            break
        steps += 1
        if max_range > 0 and steps > max_range:
            observation = 0.0
            break
        observation *= 1.0 - float(data[sy, sx])
        if observation < eps2:
            observation = 0.0
            break
    return observation


def line_observation_sum(data: np.ndarray, sx: int, sy: int, ex: int, ey: int) -> float:
    """Sum-blocking clear probability along a Bresenham ray (polycheck.py:434-490).

    Bounds-checked; destination excluded from the blocking sum; early-out at
    blocked_sum >= 1.  ``blocked_sum`` accumulates in float32 like the CUDA
    ``auto blocked_sum = 0.0f``.
    """
    height, width = data.shape
    if sx < 0 or sx >= width or sy < 0 or sy >= height:
        return 0.0
    if ex < 0 or ex >= width or ey < 0 or ey >= height:
        return 0.0
    if sx == ex and sy == ey:
        return 1.0
    dx = abs(sx - ex)
    step_x = 1 if sx < ex else -1
    dy = -abs(sy - ey)
    step_y = 1 if sy < ey else -1
    error = dx + dy
    blocked = np.float32(0.0)
    while True:
        if sx == ex and sy == ey:
            break
        e2 = 2 * error
        if e2 >= dy:
            if sx == ex:
                break
            error += dy
            sx += step_x
        if e2 <= dx:
            if sy == ey:
                break
            error += dx
            sy += step_y
        if sx == ex and sy == ey:
            break
        if sx < 0 or sx >= width or sy < 0 or sy >= height:
            return 0.0
        blocked = np.float32(blocked + np.float32(data[sy, sx]))
        if blocked >= np.float32(1.0):
            return 0.0
    return float(clamp01(1.0 - float(blocked)))


# ---------------------------------------------------------------------------
# Amanatides-Woo DDA walks (real coordinates)
# ---------------------------------------------------------------------------

def _dda_setup(rc: np.float32, d: np.float32, resolution: np.float32):
    """Per-axis DDA initialization (polycheck.py:297-333), float32 arithmetic."""
    if is_zero_f32(d):
        return 0, np.float32(np.finfo(np.float32).max), np.float32(np.finfo(np.float32).max)
    if d > 0:
        step = 1
        t_max = np.float32((np.float32(np.floor(rc)) + np.float32(1.0) - rc) * resolution / d)
        t_delta = np.float32(resolution / d)
    else:
        step = -1
        t_max = np.float32((rc - np.float32(np.floor(rc))) * resolution / (-d))
        t_delta = np.float32(resolution / (-d))
    return step, t_max, t_delta


def line_real_observation(data, height, width, origin_x, origin_y, resolution,
                          src_x, src_y, end_x, end_y, max_range=0.0) -> float:
    """World-coordinate transmittance via Amanatides-Woo traversal.

    Float32 mirror of polycheck.py:249-372 (paper: Amanatides & Woo, "A Fast
    Voxel Traversal Algorithm for Ray Tracing", Eurographics '87).  The
    observation accumulator is float32 (``auto observation = 1.0f``);
    termination when min(t_max_x, t_max_y) > segment length; endpoint cell
    excluded; leaving the grid mid-walk forces 0.
    """
    f = np.float32
    origin_x, origin_y = f(origin_x), f(origin_y)
    resolution = f(resolution)
    src_x, src_y, end_x, end_y = f(src_x), f(src_y), f(end_x), f(end_y)
    dx = f(end_x - src_x)
    dy = f(end_y - src_y)
    magnitude = f(np.sqrt(f(dx * dx + dy * dy)))
    if max_range > 0.0 and magnitude > f(max_range):
        return 0.0
    if is_zero_f32(magnitude):
        scx = int(np.floor(f((src_x - origin_x) / resolution)))
        scy = int(np.floor(f((src_y - origin_y) / resolution)))
        if scx < 0 or scx >= width or scy < 0 or scy >= height:
            return 0.0
        return 1.0
    dx = f(dx / magnitude)
    dy = f(dy / magnitude)
    rx = f((src_x - origin_x) / resolution)
    sx = int(np.floor(rx))
    ry = f((src_y - origin_y) / resolution)
    sy = int(np.floor(ry))
    if sx < 0 or sx >= width or sy < 0 or sy >= height:
        return 0.0
    ex = int(np.floor(f((end_x - origin_x) / resolution)))
    ey = int(np.floor(f((end_y - origin_y) / resolution)))
    if sx == ex and sy == ey:
        return 1.0
    step_x, t_max_x, t_delta_x = _dda_setup(rx, dx, resolution)
    step_y, t_max_y, t_delta_y = _dda_setup(ry, dy, resolution)
    observation = f(1.0)
    while True:
        if min(t_max_x, t_max_y) > magnitude:
            break
        if t_max_x < t_max_y:
            sx += step_x
            t_max_x = f(t_max_x + t_delta_x)
        else:
            sy += step_y
            t_max_y = f(t_max_y + t_delta_y)
        if sx == ex and sy == ey:
            break
        if sx < 0 or sx >= width or sy < 0 or sy >= height:
            observation = f(0.0)
            break
        observation = f(observation * f(np.float32(1.0) - np.float32(data[sy, sx])))
        if is_zero_f32(observation):
            observation = f(0.0)
            break
    return float(observation)


def line_real_observation_sum(data, height, width, origin_x, origin_y, resolution,
                              src_x, src_y, end_x, end_y, max_range=0.0) -> float:
    """Sum-blocking DDA walk (polycheck.py:492-602).

    Unlike the product variant this also rejects out-of-grid *end* cells
    up front, accumulates in float32, and early-outs at blocked >= 1.
    """
    f = np.float32
    origin_x, origin_y = f(origin_x), f(origin_y)
    resolution = f(resolution)
    src_x, src_y, end_x, end_y = f(src_x), f(src_y), f(end_x), f(end_y)
    dx = f(end_x - src_x)
    dy = f(end_y - src_y)
    magnitude = f(np.sqrt(f(dx * dx + dy * dy)))
    if max_range > 0.0 and magnitude > f(max_range):
        return 0.0
    if is_zero_f32(magnitude):
        scx = int(np.floor(f((src_x - origin_x) / resolution)))
        scy = int(np.floor(f((src_y - origin_y) / resolution)))
        if scx < 0 or scx >= width or scy < 0 or scy >= height:
            return 0.0
        return 1.0
    dx = f(dx / magnitude)
    dy = f(dy / magnitude)
    rx = f((src_x - origin_x) / resolution)
    sx = int(np.floor(rx))
    ry = f((src_y - origin_y) / resolution)
    sy = int(np.floor(ry))
    if sx < 0 or sx >= width or sy < 0 or sy >= height:
        return 0.0
    ex = int(np.floor(f((end_x - origin_x) / resolution)))
    ey = int(np.floor(f((end_y - origin_y) / resolution)))
    if ex < 0 or ex >= width or ey < 0 or ey >= height:
        return 0.0
    if sx == ex and sy == ey:
        return 1.0
    step_x, t_max_x, t_delta_x = _dda_setup(rx, dx, resolution)
    step_y, t_max_y, t_delta_y = _dda_setup(ry, dy, resolution)
    blocked = f(0.0)
    while True:
        if min(t_max_x, t_max_y) > magnitude:
            break
        if t_max_x < t_max_y:
            sx += step_x
            t_max_x = f(t_max_x + t_delta_x)
        else:
            sy += step_y
            t_max_y = f(t_max_y + t_delta_y)
        if sx == ex and sy == ey:
            break
        if sx < 0 or sx >= width or sy < 0 or sy >= height:
            return 0.0
        blocked = f(blocked + np.float32(data[sy, sx]))
        if blocked >= f(1.0):
            return 0.0
    return float(clamp01(1.0 - float(blocked)))


# ---------------------------------------------------------------------------
# sensor gating, coverage masks, combine
# ---------------------------------------------------------------------------

def in_sensor_fov(sx, sy, tx, ty, sensor_range, direction, fov) -> bool:
    """Range + field-of-view gate, float32 (polycheck.py:157-179)."""
    f = np.float32
    dx = f(f(tx) - f(sx))
    dy = f(f(ty) - f(sy))
    distance = f(np.sqrt(f(dx * dx + dy * dy)))
    if sensor_range > 0.0 and distance > f(sensor_range):
        return False
    if 0.0 < fov < (TWO_PI - 1e-6):
        if is_zero_f32(dx) and is_zero_f32(dy):
            return True
        bearing = np.float32(np.arctan2(dy, dx))
        # wrap explicitly in float64: under NumPy 1.x the f32 scalar promoted
        # to f64 implicitly (value-based promotion); NEP 50 (NumPy >= 2) keeps
        # it f32, silently diverging from the batch twin at FOV boundaries —
        # pin the dtype so both regimes wrap identically
        angle_delta = np.float32(np.abs(wrap_to_pi(
            np.float64(np.float32(bearing - np.float32(direction))))))
        if angle_delta > np.float32(0.5 * fov):
            return False
    return True


def sensor_coverage_mask(height, width, sensors, origin=None, resolution=None) -> np.ndarray:
    """(M, H, W) boolean coverage mask.

    Grid regime (origin is None): targets are integer cell coordinates and the
    sensor position is epsilon-rounded — polycheck.py:1072-1104.
    Real regime: targets are cell centers ``origin + (idx + 0.5) * res`` —
    polycheck.py:1107-1145.  Tolerances (range +1e-6, fov half-angle +1e-6,
    dist <= 1e-8 always in-fov) match the reference.
    """
    sensors = np.asarray(sensors, dtype=np.float32)
    yy, xx = np.meshgrid(np.arange(height, dtype=np.float32),
                         np.arange(width, dtype=np.float32), indexing="ij")
    real = origin is not None
    if real:
        tx = float(origin[0]) + (xx + 0.5) * float(resolution)
        ty = float(origin[1]) + (yy + 0.5) * float(resolution)
    mask = np.zeros((len(sensors), height, width), dtype=bool)
    for i, (sx, sy, rng, direction, fov) in enumerate(sensors):
        if rng <= 0.0:
            if real:
                cx = int(np.floor((float(sx) - float(origin[0])) / float(resolution)))
                cy = int(np.floor((float(sy) - float(origin[1])) / float(resolution)))
            else:
                cx, cy = epsilon_round(float(sx)), epsilon_round(float(sy))
            if 0 <= cx < width and 0 <= cy < height:
                mask[i, cy, cx] = True
            continue
        if real:
            dx, dy = tx - float(sx), ty - float(sy)
        else:
            dx = xx - float(epsilon_round(float(sx)))
            dy = yy - float(epsilon_round(float(sy)))
        dist = np.sqrt(dx * dx + dy * dy)
        covered = dist <= float(rng) + 1e-6
        if 0.0 < float(fov) < (TWO_PI - 1e-6):
            delta = np.abs(wrap_to_pi(np.arctan2(dy, dx) - float(direction)))
            covered &= (dist <= 1e-8) | (delta <= 0.5 * float(fov) + 1e-6)
        mask[i] = covered
    return mask


def combine_sensor_observations(per_sensor: np.ndarray, coverage: np.ndarray,
                                combine: str = "union") -> np.ndarray:
    """Fuse per-sensor clear probabilities (polycheck.py:1148-1161).

    union:   1 - prod_m(1 - p_m), out-of-coverage p -> 0
    product: prod_m(p_m) over covering sensors only; 0 where nothing covers
    """
    if combine == "union":
        eff = np.where(coverage, per_sensor, 0.0)
        out = 1.0 - np.prod(1.0 - eff, axis=0)
    elif combine == "product":
        eff = np.where(coverage, per_sensor, 1.0)
        out = np.where(np.any(coverage, axis=0), np.prod(eff, axis=0), 0.0)
    else:
        raise ValueError("combine must be 'union' or 'product'")
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def sensor_cell_observation(data, sensor, ex, ey, origin=None, resolution=None) -> float:
    """Clear probability of one (sensor, cell) pair — the per-pair kernel the
    crossJoin pipeline applies (polycheck.py:711-795 per-thread body)."""
    height, width = data.shape
    sx, sy, rng, direction, fov = (float(v) for v in sensor)
    real = origin is not None
    if real:
        target_x = float(origin[0]) + (ex + 0.5) * float(resolution)
        target_y = float(origin[1]) + (ey + 0.5) * float(resolution)
        scx = int(np.floor((sx - float(origin[0])) / float(resolution)))
        scy = int(np.floor((sy - float(origin[1])) / float(resolution)))
        if rng <= 0.0:
            return 1.0 if (ex == scx and ey == scy) else 0.0
        if not in_sensor_fov(sx, sy, target_x, target_y, rng, direction, fov):
            return 0.0
        return line_real_observation_sum(data, height, width, origin[0], origin[1],
                                         resolution, sx, sy, target_x, target_y, rng)
    sxi, syi = epsilon_round(sx), epsilon_round(sy)
    if rng <= 0.0:
        return 1.0 if (ex == sxi and ey == syi) else 0.0
    if not in_sensor_fov(float(sxi), float(syi), float(ex), float(ey), rng, direction, fov):
        return 0.0
    return line_observation_sum(data, sxi, syi, ex, ey)


# ---------------------------------------------------------------------------
# faux laser scan
# ---------------------------------------------------------------------------

def line_range(csr_vertices, csr_offsets, sx, sy, angle, max_range, resolution):
    """March one ray; return (distance-at-first-hit | -1.0, hit polygon id | INT32_MAX).

    Mirrors polycheck.py:604-630: float32 position accumulators, C-double
    increments and distance, PIP test against every polygon at each step.
    """
    # CUDA: float overloads of cos/sin; increments are float32.
    angle = np.float32(angle)
    x_inc = np.float32(np.cos(angle) * np.float32(resolution))
    y_inc = np.float32(np.sin(angle) * np.float32(resolution))
    ex = np.float32(sx)
    ey = np.float32(sy)
    dist = 0.0
    num_polygons = len(csr_offsets) - 1
    while dist < max_range:
        ex = np.float32(ex + x_inc)
        ey = np.float32(ey + y_inc)
        pt = np.array([[ex, ey]], dtype=np.float32)
        for p in range(num_polygons):
            lo, hi = csr_offsets[p], csr_offsets[p + 1]
            if contains(csr_vertices[lo:hi], pt)[0] > 0:
                return float(dist), p
        dist += float(np.float32(resolution))
    return -1.0, 0x7FFFFFFF


def faux_scan(polygons, origin, angle_start, angle_inc, num_rays, max_range, resolution):
    """All rays of a simulated scan. Returns (ranges (R,) float32, hits (R,) int32).

    The reference PyCUDA path returns only ranges (polycheck.py:1387-1390) while
    Warp returns both (poly_warp.py:795); per SURVEY.md §2.1 quirks we always
    return the 2-tuple.
    """
    ranges = np.full(num_rays, -1.0, dtype=np.float32)
    hits = np.full(num_rays, 0x7FFFFFFF, dtype=np.int32)
    if not len(polygons):
        return ranges, hits
    verts, offsets = pack_polygons_csr(polygons)
    for i in range(num_rays):
        angle = np.float32(np.float32(angle_start) + np.float32(i) * np.float32(angle_inc))
        r, h = line_range(verts, offsets, origin[0], origin[1], angle, max_range, resolution)
        ranges[i] = r
        hits[i] = h
    return ranges, hits
