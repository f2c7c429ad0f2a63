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
