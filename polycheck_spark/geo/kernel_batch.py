"""Lockstep-vectorized Bresenham walks: many rays advance together.

The scalar kernels in geo/kernel.py are the semantic anchor (one ray at a
time, exactly the reference control flow).  At scale a sensors x cells cross
join produces millions of rays per Arrow batch, and a Python-level loop over
rays caps throughput at ~10^5 rays/s/core.  These batch versions advance ALL
rays one Bresenham step per NumPy pass (masked), so the per-step cost is a
handful of vector ops over the active rays — the same parallelization the
reference gets from one-thread-per-ray on the GPU (polycheck.py:711-750),
re-expressed as SIMD-over-rays.

Exactness: state transitions replicate the scalar kernels branch for branch
(including early-break order); tests/test_kernel_batch.py asserts equality
against the scalar versions over randomized grids and endpoints.
"""

from __future__ import annotations

import numpy as np

from polycheck_spark.geo.kernel import contains

FLT_EPSILON = np.float32(1.1920928955078125e-07)


def line_observation_sum_batch(data: np.ndarray, sx, sy, ex, ey) -> np.ndarray:
    """Vectorized twin of kernel.line_observation_sum (sum-blocking walk,
    destination excluded, float32 accumulation, bounds-checked)."""
    data = np.asarray(data, dtype=np.float32)
    height, width = data.shape
    flat = data.ravel()
    sx = np.asarray(sx, dtype=np.int64).copy()
    sy = np.asarray(sy, dtype=np.int64).copy()
    ex = np.asarray(ex, dtype=np.int64)
    ey = np.asarray(ey, dtype=np.int64)
    n = len(sx)
    out = np.zeros(n, dtype=np.float32)
    blocked = np.zeros(n, dtype=np.float32)

    oob = (sx < 0) | (sx >= width) | (sy < 0) | (sy >= height) \
        | (ex < 0) | (ex >= width) | (ey < 0) | (ey >= height)
    same = (sx == ex) & (sy == ey)
    out[same & ~oob] = 1.0

    active = ~(oob | same)
    if not active.any():
        return out

    dx = np.abs(sx - ex)
    dy = -np.abs(sy - ey)
    step_x = np.where(sx < ex, 1, -1)
    step_y = np.where(sy < ey, 1, -1)
    error = dx + dy

    idx = np.flatnonzero(active)
    # compact state for active rays only
    asx, asy = sx[idx], sy[idx]
    aex, aey = ex[idx], ey[idx]
    adx, ady = dx[idx], dy[idx]
    astx, asty = step_x[idx], step_y[idx]
    aerr = error[idx]
    ablk = blocked[idx]

    def finish(mask, values):
        nonlocal idx, asx, asy, aex, aey, adx, ady, astx, asty, aerr, ablk
        out[idx[mask]] = values
        keep = ~mask
        idx = idx[keep]
        asx, asy = asx[keep], asy[keep]
        aex, aey = aex[keep], aey[keep]
        adx, ady = adx[keep], ady[keep]
        astx, asty = astx[keep], asty[keep]
        aerr = aerr[keep]
        ablk = ablk[keep]

    while len(idx):
        # arrival before stepping
        arr = (asx == aex) & (asy == aey)
        if arr.any():
            finish(arr, np.minimum(np.float32(1.0),
                                   np.maximum(np.float32(0.0),
                                              np.float32(1.0) - ablk[arr])))
            if not len(idx):
                break
        e2 = 2 * aerr
        c1 = e2 >= ady
        # break: c1 and already at target column
        b1 = c1 & (asx == aex)
        if b1.any():
            finish(b1, np.minimum(np.float32(1.0),
                                  np.maximum(np.float32(0.0),
                                             np.float32(1.0) - ablk[b1])))
            if not len(idx):
                break
            e2 = e2[~b1]
            c1 = c1[~b1]
        m1 = c1
        aerr[m1] += ady[m1]
        asx[m1] += astx[m1]
        c2 = e2 <= adx
        b2 = c2 & (asy == aey)
        if b2.any():
            finish(b2, np.minimum(np.float32(1.0),
                                  np.maximum(np.float32(0.0),
                                             np.float32(1.0) - ablk[b2])))
            if not len(idx):
                break
            c2 = c2[~b2]
        m2 = c2
        aerr[m2] += adx[m2]
        asy[m2] += asty[m2]

        # arrival right after the move: destination excluded from the sum
        arr2 = (asx == aex) & (asy == aey)
        if arr2.any():
            finish(arr2, np.minimum(np.float32(1.0),
                                    np.maximum(np.float32(0.0),
                                               np.float32(1.0) - ablk[arr2])))
            if not len(idx):
                break
        oob2 = (asx < 0) | (asx >= width) | (asy < 0) | (asy >= height)
        if oob2.any():
            finish(oob2, np.float32(0.0))
            if not len(idx):
                break
        ablk = np.float32(ablk + flat[asy * width + asx])
        full = ablk >= np.float32(1.0)
        if full.any():
            finish(full, np.float32(0.0))
    return out


_F32_MAX = np.float32(np.finfo(np.float32).max)


def _dda_state(src_x, src_y, end_x, end_y, origin_x, origin_y, resolution,
               max_range, height, width, check_end_cell: bool):
    """Vectorized Amanatides-Woo setup, float32-exact to kernel._dda_setup.

    Returns (out, done, state...) where ``done`` rays already have their final
    value in ``out`` (range-reject, zero-magnitude, out-of-grid starts/ends,
    same-cell) and the rest carry live traversal state.
    """
    f = np.float32
    src_x = np.asarray(src_x, f)
    src_y = np.asarray(src_y, f)
    end_x = np.asarray(end_x, f)
    end_y = np.asarray(end_y, f)
    res = f(resolution)
    ox, oy = f(origin_x), f(origin_y)
    n = len(src_x)
    out = np.zeros(n, dtype=f)
    done = np.zeros(n, dtype=bool)

    dx = (end_x - src_x).astype(f)
    dy = (end_y - src_y).astype(f)
    magnitude = np.sqrt((dx * dx + dy * dy).astype(f)).astype(f)
    mr = np.broadcast_to(np.asarray(max_range, np.float64), (n,))
    rej = (mr > 0.0) & (magnitude > mr.astype(f))
    done |= rej  # out stays 0
    zero_mag = (~done) & (np.abs(magnitude) <= FLT_EPSILON)
    if zero_mag.any():
        scx = np.floor(((src_x - ox) / res).astype(f)).astype(np.int64)
        scy = np.floor(((src_y - oy) / res).astype(f)).astype(np.int64)
        inside = (scx >= 0) & (scx < width) & (scy >= 0) & (scy < height)
        out[zero_mag & inside] = 1.0
        done |= zero_mag

    with np.errstate(divide="ignore", invalid="ignore"):
        ndx = (dx / magnitude).astype(f)
        ndy = (dy / magnitude).astype(f)
    rx = ((src_x - ox) / res).astype(f)
    ry = ((src_y - oy) / res).astype(f)
    sx = np.floor(rx).astype(np.int64)
    sy = np.floor(ry).astype(np.int64)
    oob = (sx < 0) | (sx >= width) | (sy < 0) | (sy >= height)
    done |= (~done) & oob

    ex = np.floor(((end_x - ox) / res).astype(f)).astype(np.int64)
    ey = np.floor(((end_y - oy) / res).astype(f)).astype(np.int64)
    if check_end_cell:
        eoob = (ex < 0) | (ex >= width) | (ey < 0) | (ey >= height)
        done |= (~done) & eoob
    same = (~done) & (sx == ex) & (sy == ey)
    out[same] = 1.0
    done |= same

    def axis(d, rc):
        zero = np.abs(d) <= FLT_EPSILON
        pos = d > 0
        step = np.where(zero, 0, np.where(pos, 1, -1)).astype(np.int64)
        frac_pos = ((np.floor(rc).astype(f) + f(1.0) - rc).astype(f) * res).astype(f)
        frac_neg = ((rc - np.floor(rc).astype(f)).astype(f) * res).astype(f)
        with np.errstate(divide="ignore", invalid="ignore"):
            t_max = np.where(zero, _F32_MAX,
                             np.where(pos, (frac_pos / d).astype(f),
                                      (frac_neg / (-d).astype(f)).astype(f))).astype(f)
            t_delta = np.where(zero, _F32_MAX,
                               np.where(pos, (res / d).astype(f),
                                        (res / (-d).astype(f)).astype(f))).astype(f)
        return step, t_max, t_delta

    step_x, t_max_x, t_delta_x = axis(ndx, rx)
    step_y, t_max_y, t_delta_y = axis(ndy, ry)
    return (out, done, sx, sy, ex, ey, magnitude,
            step_x, t_max_x, t_delta_x, step_y, t_max_y, t_delta_y)


def _dda_walk(data, state, mode: str):
    """Shared lockstep DDA loop; mode 'product' (float32 transmittance) or
    'sum' (float32 blocking sum, early-out at >= 1)."""
    f = np.float32
    height, width = data.shape
    flat = np.asarray(data, f).ravel()
    (out, done, sx, sy, ex, ey, mag,
     stx, tmx, tdx, sty, tmy, tdy) = state
    idx = np.flatnonzero(~done)
    sx, sy = sx[idx].copy(), sy[idx].copy()
    ex, ey = ex[idx], ey[idx]
    mag = mag[idx]
    stx, sty = stx[idx], sty[idx]
    tmx, tmy = tmx[idx].copy(), tmy[idx].copy()
    tdx, tdy = tdx[idx], tdy[idx]
    acc = np.ones(len(idx), f) if mode == "product" else np.zeros(len(idx), f)

    def finish(mask, values):
        nonlocal idx, sx, sy, ex, ey, mag, stx, sty, tmx, tmy, tdx, tdy, acc
        out[idx[mask]] = values
        keep = ~mask
        idx = idx[keep]
        sx, sy, ex, ey = sx[keep], sy[keep], ex[keep], ey[keep]
        mag = mag[keep]
        stx, sty = stx[keep], sty[keep]
        tmx, tmy = tmx[keep], tmy[keep]
        tdx, tdy = tdx[keep], tdy[keep]
        acc = acc[keep]

    while len(idx):
        over = np.minimum(tmx, tmy) > mag
        if over.any():
            vals = acc[over] if mode == "product" else \
                np.minimum(f(1.0), np.maximum(f(0.0), f(1.0) - acc[over]))
            finish(over, vals)
            if not len(idx):
                break
        move_x = tmx < tmy
        sx[move_x] += stx[move_x]
        tmx[move_x] = (tmx[move_x] + tdx[move_x]).astype(f)
        my = ~move_x
        sy[my] += sty[my]
        tmy[my] = (tmy[my] + tdy[my]).astype(f)

        arr = (sx == ex) & (sy == ey)
        if arr.any():
            vals = acc[arr] if mode == "product" else \
                np.minimum(f(1.0), np.maximum(f(0.0), f(1.0) - acc[arr]))
            finish(arr, vals)
            if not len(idx):
                break
        oob = (sx < 0) | (sx >= width) | (sy < 0) | (sy >= height)
        if oob.any():
            finish(oob, f(0.0))
            if not len(idx):
                break
        if mode == "product":
            acc = (acc * (f(1.0) - flat[sy * width + sx])).astype(f)
            dead = np.abs(acc) <= FLT_EPSILON
        else:
            acc = (acc + flat[sy * width + sx]).astype(f)
            dead = acc >= f(1.0)
        if dead.any():
            finish(dead, f(0.0))
    return out


def line_real_observation_batch(data, origin_x, origin_y, resolution,
                                src_x, src_y, end_x, end_y, max_range=0.0) -> np.ndarray:
    """Vectorized twin of kernel.line_real_observation (DDA transmittance)."""
    h, w = np.asarray(data).shape
    state = _dda_state(src_x, src_y, end_x, end_y, origin_x, origin_y,
                       resolution, max_range, h, w, check_end_cell=False)
    return _dda_walk(data, state, "product")


def line_real_observation_sum_batch(data, origin_x, origin_y, resolution,
                                    src_x, src_y, end_x, end_y, max_range=0.0) -> np.ndarray:
    """Vectorized twin of kernel.line_real_observation_sum (DDA sum-blocking)."""
    h, w = np.asarray(data).shape
    state = _dda_state(src_x, src_y, end_x, end_y, origin_x, origin_y,
                       resolution, max_range, h, w, check_end_cell=True)
    return _dda_walk(data, state, "sum")


def sensor_cell_observation_real_batch(data, x, y, rng, drn, fov, ex, ey,
                                       origin, resolution) -> np.ndarray:
    """Vectorized per-(sensor, cell) clear probability, real regime — batch
    twin of kernel.sensor_cell_observation with origin/resolution set."""
    f = np.float32
    height, width = np.asarray(data).shape
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    rng = np.asarray(rng, np.float64)
    ex = np.asarray(ex, np.int64)
    ey = np.asarray(ey, np.int64)
    ox, oy = float(origin[0]), float(origin[1])
    res = float(resolution)
    out = np.zeros(len(x), dtype=f)

    # target = cell center, float64 like the scalar twin (consumers cast f32)
    tx = ox + (ex + 0.5) * res
    ty = oy + (ey + 0.5) * res
    scx = np.floor((x - ox) / res).astype(np.int64)
    scy = np.floor((y - oy) / res).astype(np.int64)

    zero_range = rng <= 0.0
    own = (ex == scx) & (ey == scy)
    out[zero_range & own] = 1.0

    live = ~zero_range
    gate = np.zeros(len(x), dtype=bool)
    if live.any():
        gate[live] = in_sensor_fov_batch(
            x[live], y[live], tx[live], ty[live], rng[live],
            np.asarray(drn)[live], np.asarray(fov)[live])
    walk = live & gate
    if walk.any():
        out[walk] = line_real_observation_sum_batch(
            data, ox, oy, res, x[walk], y[walk], tx[walk], ty[walk], rng[walk])
    return out


def in_sensor_fov_batch(sx, sy, tx, ty, rng, drn, fov) -> np.ndarray:
    """Vectorized twin of kernel.in_sensor_fov (polycheck.py:157-179).

    rng/drn/fov arrive as float64 (the sensor-table columns); every cast to
    float32 happens exactly where the scalar kernel casts, so boundary cells
    (|delta| == fov/2, dist == range) classify identically.
    """
    f = np.float32
    sx, sy = np.asarray(sx, f), np.asarray(sy, f)
    tx, ty = np.asarray(tx, f), np.asarray(ty, f)
    rng = np.asarray(rng, np.float64)
    drn = np.asarray(drn, np.float64)
    fov = np.asarray(fov, np.float64)
    dx = (tx - sx).astype(f)
    dy = (ty - sy).astype(f)
    dist = np.sqrt((dx * dx + dy * dy).astype(f)).astype(f)
    ok = ~((rng > 0.0) & (dist > rng.astype(f)))
    has_fov = (fov > 0.0) & (fov < (2.0 * np.pi - 1e-6))  # float64, as scalar
    at_origin = (np.abs(dx) <= FLT_EPSILON) & (np.abs(dy) <= FLT_EPSILON)
    bearing = np.arctan2(dy, dx).astype(f)
    # the wrap runs in float64 (scalar f32 + python float promotes to f64 in
    # the reference-parity scalar kernel; f32 ARRAYS would stay f32 — force it)
    ang = (bearing - drn.astype(f)).astype(f).astype(np.float64)
    wrapped = (ang + np.pi) % (2.0 * np.pi) - np.pi
    delta = np.abs(wrapped).astype(f)
    fov_ok = (~has_fov) | at_origin | (delta <= (0.5 * fov).astype(f))
    return ok & fov_ok


def sensor_cell_observation_grid_batch(data, scx, scy, ex, ey, rng, drn, fov) -> np.ndarray:
    """Vectorized per-(sensor, cell) clear probability, grid regime —
    the batch twin of kernel.sensor_cell_observation with origin=None
    (zero-range own-cell rule, exact float32 FOV gate, sum-blocking walk)."""
    scx = np.asarray(scx, np.int64)
    scy = np.asarray(scy, np.int64)
    ex = np.asarray(ex, np.int64)
    ey = np.asarray(ey, np.int64)
    rng = np.asarray(rng, np.float64)
    out = np.zeros(len(scx), dtype=np.float32)

    zero_range = rng <= 0.0
    own = (ex == scx) & (ey == scy)
    out[zero_range & own] = 1.0

    live = ~zero_range
    gate = np.zeros(len(scx), dtype=bool)
    if live.any():
        gate[live] = in_sensor_fov_batch(
            scx[live].astype(np.float32), scy[live].astype(np.float32),
            ex[live].astype(np.float32), ey[live].astype(np.float32),
            rng[live], np.asarray(drn)[live], np.asarray(fov)[live])
    walk = live & gate
    if walk.any():
        out[walk] = line_observation_sum_batch(
            data, scx[walk], scy[walk], ex[walk], ey[walk])
    return out


def line_observation_batch(data: np.ndarray, sx, sy, ex, ey,
                           max_range: int = 0) -> np.ndarray:
    """Vectorized twin of kernel.line_observation (transmittance product,
    double accumulator, step-count max_range, no bounds checks)."""
    data = np.asarray(data, dtype=np.float32)
    height, width = data.shape
    flat = data.ravel().astype(np.float64)
    sx = np.asarray(sx, dtype=np.int64).copy()
    sy = np.asarray(sy, dtype=np.int64).copy()
    ex = np.asarray(ex, dtype=np.int64)
    ey = np.asarray(ey, dtype=np.int64)
    n = len(sx)
    out = np.zeros(n, dtype=np.float64)
    same = (sx == ex) & (sy == ey)
    out[same] = 1.0

    idx = np.flatnonzero(~same)
    asx, asy = sx[idx], sy[idx]
    aex, aey = ex[idx], ey[idx]
    adx = np.abs(asx - aex)
    ady = -np.abs(asy - aey)
    astx = np.where(asx < aex, 1, -1)
    asty = np.where(asy < aey, 1, -1)
    aerr = adx + ady
    aobs = np.ones(len(idx), dtype=np.float64)
    steps = np.zeros(len(idx), dtype=np.int64)
    eps2 = float(FLT_EPSILON) * 2.0

    def finish(mask, values):
        nonlocal idx, asx, asy, aex, aey, adx, ady, astx, asty, aerr, aobs, steps
        out[idx[mask]] = values
        keep = ~mask
        idx = idx[keep]
        asx, asy = asx[keep], asy[keep]
        aex, aey = aex[keep], aey[keep]
        adx, ady = adx[keep], ady[keep]
        astx, asty = astx[keep], asty[keep]
        aerr = aerr[keep]
        aobs = aobs[keep]
        steps = steps[keep]

    while len(idx):
        arr = (asx == aex) & (asy == aey)
        if arr.any():
            finish(arr, aobs[arr])
            if not len(idx):
                break
        e2 = 2 * aerr
        c1 = e2 >= ady
        b1 = c1 & (asx == aex)
        if b1.any():
            finish(b1, aobs[b1])
            if not len(idx):
                break
            e2 = e2[~b1]
            c1 = c1[~b1]
        aerr[c1] += ady[c1]
        asx[c1] += astx[c1]
        c2 = e2 <= adx
        b2 = c2 & (asy == aey)
        if b2.any():
            finish(b2, aobs[b2])
            if not len(idx):
                break
            c2 = c2[~b2]
        aerr[c2] += adx[c2]
        asy[c2] += asty[c2]

        arr2 = (asx == aex) & (asy == aey)
        if arr2.any():
            finish(arr2, aobs[arr2])
            if not len(idx):
                break
        steps += 1
        if max_range > 0:
            over = steps > max_range
            if over.any():
                finish(over, 0.0)
                if not len(idx):
                    break
        aobs *= 1.0 - flat[asy * width + asx]
        dead = aobs < eps2
        if dead.any():
            finish(dead, 0.0)
    return out.astype(np.float32)


def line_range_batch(csr_vertices, csr_offsets, sx, sy, angles,
                     max_range, resolution):
    """Vectorized twin of kernel.line_range: all rays of a faux scan march one
    float32 step per NumPy pass (polycheck.py:604-630 semantics).

    Per step, each still-active ray's position is tested against every polygon
    in CSR order — the FIRST containing polygon wins, exactly like the scalar
    kernel's inner loop.  ``dist`` is the same scalar double sequence for all
    rays (they share ``resolution``/``max_range``), so rays stay in lockstep
    and a hit finishes the ray with the float32 of the current dist.

    Args:
        sx/sy: scalar origin (or per-ray arrays).
        angles: (N,) per-ray angles; cast to float32 like the scalar kernel.

    Returns:
        (ranges (N,) float32, hits (N,) int32) — misses are (-1.0, INT32_MAX).
    """
    f = np.float32
    angles = np.asarray(angles, f)
    n = len(angles)
    out_r = np.full(n, -1.0, dtype=f)
    out_h = np.full(n, 0x7FFFFFFF, dtype=np.int32)
    num_polygons = len(csr_offsets) - 1
    if n == 0 or num_polygons == 0:
        return out_r, out_h
    res32 = f(resolution)
    x_inc = (np.cos(angles) * res32).astype(f)
    y_inc = (np.sin(angles) * res32).astype(f)
    ax = np.broadcast_to(np.asarray(sx, f), (n,)).astype(f).copy()
    ay = np.broadcast_to(np.asarray(sy, f), (n,)).astype(f).copy()
    idx = np.arange(n)
    axi, ayi = x_inc, y_inc
    dist = 0.0  # C double, shared across rays (scalar kernel parity)
    res_d = float(res32)
    # Exact Y-slab gate: every winding crossing needs an edge with
    # min(v1y,v2y) <= py < max(v1y,v2y), so py outside [ymin, ymax) has
    # wn == 0 identically — pruning it cannot change any result.
    slabs = []
    for p in range(num_polygons):
        ys = csr_vertices[csr_offsets[p]:csr_offsets[p + 1], 1]
        slabs.append((ys.min() if len(ys) else f(0), ys.max() if len(ys) else f(0)))
    while dist < max_range and len(idx):
        ax = (ax + axi).astype(f)
        ay = (ay + ayi).astype(f)
        pts = np.stack([ax, ay], axis=1)
        hit_p = np.full(len(idx), 0x7FFFFFFF, dtype=np.int32)
        undecided = np.ones(len(idx), dtype=bool)
        for p in range(num_polygons):
            ymin, ymax = slabs[p]
            sub = np.flatnonzero(undecided & (ay >= ymin) & (ay < ymax))
            if not len(sub):
                continue
            lo, hi = csr_offsets[p], csr_offsets[p + 1]
            c = contains(csr_vertices[lo:hi], pts[sub]) > 0
            hits = sub[c]
            hit_p[hits] = p
            undecided[hits] = False
        hm = hit_p != 0x7FFFFFFF
        if hm.any():
            out_r[idx[hm]] = f(dist)
            out_h[idx[hm]] = hit_p[hm]
            keep = ~hm
            idx = idx[keep]
            ax, ay = ax[keep], ay[keep]
            axi, ayi = axi[keep], ayi[keep]
        dist += res_d
    return out_r, out_h
