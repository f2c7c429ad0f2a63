"""DuckDB recursive-CTE oracles for the iterative ray-walk operators (O2-O9).

These reproduce, in pure SQL, the float32/double control flow of the scalar
kernels in :mod:`polycheck_spark.geo.kernel` so the driver's DuckDB
differential can value-check the walk pipelines instead of rows-only:

* Bresenham transmittance walk (product, double acc) — kernel.line_observation
  (reference /root/reference/polycheck/polycheck.py:375-432)
* Bresenham sum-blocking walk (float32 acc)          — kernel.line_observation_sum
  (reference polycheck.py:434-490)
* Amanatides-Woo DDA walks (product/sum, float32)    — kernel.line_real_observation[_sum]
  (reference polycheck.py:249-372, 492-602)
* faux laser-scan march + winding PIP                — kernel.line_range
  (reference polycheck.py:604-630)
* sensor gate + union/product combine                — kernel.in_sensor_fov,
  combine_sensor_observations (reference polycheck.py:157-179, 1148-1161)

Exactness model (why CAST-per-op reproduces float32 bit-for-bit):

* +, -, * on float32-exact operands are EXACT in float64 (24-bit significands
  fit 53 bits), so ``CAST(a <op> b AS FLOAT)`` is the correctly-rounded
  float32 op — identical to NumPy float32 arithmetic.
* / and SQRT round twice (correct double, then to float32).  A divergence
  from single-rounded float32 needs the exact result within ~2^-29 ulp of a
  float32 boundary; the fixed golden instances are verified divergence-free
  by tools/selfcheck.py and the pytest goldens.
* Transcendentals (cos/sin of scan angles, atan2 bearings) are NOT
  recomputed in SQL.  Scan increments are precomputed with NumPy float32 and
  embedded as literals (like the PIP oracle embeds polygon vertices); the
  oracle then verifies the march, PIP tests, and accumulation.  FOV bearings
  use double atan2 — query instances must keep every pair >1e-5 rad away
  from the fov/2 boundary (the golden instances use full-circle FOV).
"""

from __future__ import annotations

import math

import numpy as np

FLT_EPS = 1.1920928955078125e-07      # FLT_EPSILON
EPS2 = 2.0 * FLT_EPS                  # product-walk early-exit threshold
FLT_MAX = 3.4028234663852886e+38
PI = repr(math.pi)
TWO_PI = repr(2.0 * math.pi)


def f32(x) -> float:
    """Exact float64 value of float32(x) — safe to embed as a SQL literal."""
    return float(np.float32(x))


def _lit(v) -> str:
    """Exact SQL literal: 17-digit scientific notation parses directly as
    DOUBLE (correctly rounded).  Bare decimal literals parse as DECIMAL first
    and the DECIMAL->DOUBLE cast double-rounds (verified off-by-one-ulp on
    e.g. 0.09778197854757309), so floats must NEVER be embedded via repr."""
    return f"{v:.17e}" if isinstance(v, float) else repr(v)


def _vals(rows) -> str:
    return ", ".join("(" + ", ".join(_lit(v) for v in r) + ")" for r in rows)


def grid_values(grid) -> str:
    """(H, W) float32 grid -> VALUES list of (row, col, occ) with exact
    float64-of-float32 occupancies."""
    g = np.asarray(grid, dtype=np.float32)
    h, w = g.shape
    return _vals((r, c, float(g[r, c])) for r in range(h) for c in range(w))


# ---------------------------------------------------------------------------
# winding-number PIP as float32-exact SQL (kernel.contains twin)
# ---------------------------------------------------------------------------

def winding_wn_sql(px: str, py: str, polygon) -> str:
    """Winding-number expression for point (px, py) columns vs a fixed
    polygon, every op float32-rounded exactly like kernel.contains."""
    poly = np.asarray(polygon, dtype=np.float32).reshape(-1, 2)
    terms = []
    for i in range(len(poly)):
        v1x, v1y = (float(v) for v in poly[i])
        v2x, v2y = (float(v) for v in poly[(i + 1) % len(poly)])
        # kernel: side = f32(f32(f32(py-v1y)*f32(v2x-v1x)) - f32(f32(px-v1x)*f32(v2y-v1y)))
        dxe = f32(np.float32(v2x) - np.float32(v1x))
        dye = f32(np.float32(v2y) - np.float32(v1y))
        side = (f"CAST(CAST(CAST(({py}) - {_lit(v1y)} AS FLOAT) * {_lit(dxe)} AS FLOAT)"
                f" - CAST(CAST(({px}) - {_lit(v1x)} AS FLOAT) * {_lit(dye)} AS FLOAT) AS FLOAT)")
        if v1y <= v2y:
            terms.append(f"CASE WHEN ({py}) >= {_lit(v1y)} AND ({py}) < {_lit(v2y)} "
                         f"AND {side} > 0 THEN 1 ELSE 0 END")
        else:
            terms.append(f"CASE WHEN ({py}) >= {_lit(v2y)} AND ({py}) < {_lit(v1y)} "
                         f"AND {side} < 0 THEN -1 ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def scan_hit_sql(px: str, py: str, polygons) -> str:
    """First-containing-polygon id (kernel.line_range inner loop order),
    INT32_MAX when none contains the point."""
    cases = "".join(
        f" WHEN {winding_wn_sql(px, py, poly)} <> 0 THEN {p}"
        for p, poly in enumerate(polygons))
    return f"(CASE{cases} ELSE 2147483647 END)"


def faux_scan_oracle_sql(polygons, origin, angle_start, angle_inc,
                         num_rays: int, max_range: float, resolution: float) -> str:
    """Full oracle for operators.scan.faux_scan_df: (ray_id, range, hit_polygon).

    Per-ray float32 step increments are precomputed with NumPy (float32 cos/sin
    are not SQL-expressible) and embedded; march positions, PIP tests and the
    double dist accumulator run in SQL exactly as kernel.line_range does.
    """
    f = np.float32
    ids = np.arange(num_rays, dtype=np.int64)
    angles = (f(angle_start) + ids.astype(f) * f(angle_inc)).astype(f)
    x_inc = (np.cos(angles) * f(resolution)).astype(f)
    y_inc = (np.sin(angles) * f(resolution)).astype(f)
    rays = _vals((int(i), float(xi), float(yi))
                 for i, xi, yi in zip(ids, x_inc, y_inc))
    if not len(polygons) or max_range <= 0:
        return (f"SELECT i AS ray_id, CAST(-1.0 AS FLOAT) AS \"range\", "
                f"2147483647 AS hit_polygon FROM range({num_rays}) t(i) ORDER BY 1")
    oxf, oyf = f32(origin[0]), f32(origin[1])
    res_d = float(f(resolution))  # double increment added to dist each step
    hit0 = scan_hit_sql("px", "py", polygons)
    return f"""
WITH RECURSIVE rays(ray_id, x_inc, y_inc) AS (VALUES {rays}),
march AS (
  SELECT ray_id, x_inc, y_inc,
         CAST({_lit(oxf)} + x_inc AS FLOAT) AS px,
         CAST({_lit(oyf)} + y_inc AS FLOAT) AS py,
         CAST(0.0 AS DOUBLE) AS dist
  FROM rays
  UNION ALL
  SELECT ray_id, x_inc, y_inc,
         CAST(px + x_inc AS FLOAT), CAST(py + y_inc AS FLOAT),
         dist + {_lit(res_d)}
  FROM march
  WHERE {hit0} = 2147483647 AND dist + {_lit(res_d)} < {_lit(max_range)}
),
hits AS (
  SELECT ray_id, dist, {hit0} AS hit FROM march WHERE {hit0} <> 2147483647
)
SELECT r.ray_id,
       CAST(COALESCE(h.dist, -1.0) AS FLOAT) AS "range",
       CAST(COALESCE(h.hit, 2147483647) AS INT) AS hit_polygon
FROM rays r LEFT JOIN hits h USING (ray_id)
ORDER BY r.ray_id"""


# ---------------------------------------------------------------------------
# Bresenham walks (integer grid) as a recursive CTE
# ---------------------------------------------------------------------------

def _bresenham_walk_cte(grid_shape, mode: str, max_range: int = 0) -> str:
    """Recursive CTE text computing ``walk`` over a ``pairs(pair_id, sx, sy,
    ex, ey)`` CTE and a ``grid(row, col, occ)`` CTE.

    mode 'product': kernel.line_observation — double accumulator, early exit
    below 2*FLT_EPSILON, optional step-count max_range, no bounds checks.
    mode 'sum': kernel.line_observation_sum — float32 accumulator, bounds
    checks (start/end and mid-walk), early out at blocked >= 1.

    Finished rows carry ``done = TRUE`` and the final double ``val``
    (consumers cast to FLOAT exactly where the Spark pipeline does).
    """
    h, w = grid_shape
    if mode == "product":
        init_done = "(sx = ex AND sy = ey)"
        init_val = "CASE WHEN sx = ex AND sy = ey THEN 1.0 ELSE NULL END"
        over = (f"steps + 1 > {int(max_range)}" if max_range > 0 else "FALSE")
        acc_next = "acc * (1.0 - COALESCE(occ, 0.0))"
        dead = f"({over}) OR ({acc_next}) < {_lit(EPS2)}"
        break_val = "acc"
    elif mode == "sum":
        oob = (f"sx < 0 OR sx >= {w} OR sy < 0 OR sy >= {h} "
               f"OR ex < 0 OR ex >= {w} OR ey < 0 OR ey >= {h}")
        init_done = f"({oob}) OR (sx = ex AND sy = ey)"
        init_val = (f"CASE WHEN {oob} THEN 0.0 "
                    f"WHEN sx = ex AND sy = ey THEN 1.0 ELSE NULL END")
        acc_next = "CAST(acc + occ AS FLOAT)"          # occ NULL (oob) -> NULL
        dead = f"occ IS NULL OR ({acc_next}) >= 1.0"
        break_val = "LEAST(1.0, GREATEST(0.0, 1.0 - acc))"
    else:
        raise ValueError("mode must be 'product' or 'sum'")
    return f"""
walk AS (
  SELECT pair_id, ex, ey,
         ABS(sx - ex) AS dxp, -ABS(sy - ey) AS dyp,
         CASE WHEN sx < ex THEN 1 ELSE -1 END AS stx,
         CASE WHEN sy < ey THEN 1 ELSE -1 END AS sty,
         sx AS cx, sy AS cy,
         ABS(sx - ex) - ABS(sy - ey) AS err,
         CAST({"1.0" if mode == "product" else "0.0"} AS DOUBLE) AS acc,
         0 AS steps,
         {init_done} AS done,
         CAST({init_val} AS DOUBLE) AS val
  FROM pairs
  UNION ALL
  SELECT pair_id, ex, ey, dxp, dyp, stx, sty,
         cx2 AS cx, cy2 AS cy, err2 AS err,
         CASE WHEN clean_break THEN acc ELSE {acc_next} END AS acc,
         steps + 1 AS steps,
         (clean_break OR {dead}) AS done,
         CASE WHEN clean_break THEN {break_val}
              WHEN {dead} THEN 0.0 ELSE NULL END AS val
  FROM (
    SELECT t.*, (SELECT g.occ FROM grid g WHERE g.row = t.cy2 AND g.col = t.cx2) AS occ
    FROM (
      SELECT pair_id, ex, ey, dxp, dyp, stx, sty, acc, steps,
             2 * err AS e2,
             (2 * err >= dyp) AS cond_x,
             ((2 * err >= dyp) AND cx = ex) AS brk1,
             CASE WHEN NOT brk1 AND cond_x THEN cx + stx ELSE cx END AS cx2,
             CASE WHEN NOT brk1 AND cond_x THEN err + dyp ELSE err END AS err1,
             (e2 <= dxp) AS cond_y,
             (NOT brk1 AND cond_y AND cy = ey) AS brk2,
             CASE WHEN NOT brk1 AND NOT brk2 AND cond_y THEN cy + sty ELSE cy END AS cy2,
             CASE WHEN NOT brk1 AND NOT brk2 AND cond_y THEN err1 + dxp ELSE err1 END AS err2,
             (brk1 OR brk2 OR (cx2 = ex AND cy2 = ey)) AS clean_break
      FROM walk WHERE NOT done
    ) t
  ) s
)"""


def bresenham_oracle_sql(grid, pairs, mode: str = "product",
                         max_range: int = 0) -> str:
    """Standalone oracle: (sx, sy, ex, ey, vis) for explicit integer pairs."""
    g = np.asarray(grid, dtype=np.float32)
    pv = _vals((i, int(a), int(b), int(c), int(d))
               for i, (a, b, c, d) in enumerate(pairs))
    return f"""
WITH RECURSIVE pairs(pair_id, sx, sy, ex, ey) AS (VALUES {pv}),
grid(row, col, occ) AS (VALUES {grid_values(g)}),
{_bresenham_walk_cte(g.shape, mode, max_range)}
SELECT p.sx, p.sy, p.ex, p.ey, CAST(w.val AS FLOAT) AS vis
FROM pairs p JOIN (SELECT pair_id, val FROM walk WHERE done) w USING (pair_id)
ORDER BY p.sx, p.sy, p.ex, p.ey"""


# ---------------------------------------------------------------------------
# Amanatides-Woo DDA walks (real coordinates) as a recursive CTE
# ---------------------------------------------------------------------------

def _dda_walk_cte(grid_shape, origin, resolution, mode: str) -> str:
    """Recursive CTE computing ``walk`` over ``pairs(pair_id, sxw, syw, exw,
    eyw, mr)`` (float32-exact world coords + per-pair max_range) and
    ``grid(row, col, occ)``.

    Float32 twin of kernel.line_real_observation (mode 'product') /
    kernel.line_real_observation_sum (mode 'sum'): every arithmetic step is
    CAST(... AS FLOAT) exactly where the kernel rounds to float32.
    """
    h, w = grid_shape
    oxf, oyf, resf = f32(origin[0]), f32(origin[1]), f32(resolution)
    # max_range is a per-pair column ``mr`` (sensor pipelines have one range
    # per sensor); kernel: rej = (mr > 0) & (magnitude > f32(mr))
    rej = "(mr > 0.0 AND mag > CAST(mr AS FLOAT))"
    if mode == "product":
        acc_next = "CAST(acc * CAST(1.0 - occ AS FLOAT) AS FLOAT)"
        dead = f"ABS({acc_next}) <= {_lit(FLT_EPS)}"
        break_val = "acc"
        end_oob_done = "FALSE"
    elif mode == "sum":
        acc_next = "CAST(acc + occ AS FLOAT)"
        dead = f"occ IS NULL OR ({acc_next}) >= 1.0"
        break_val = "LEAST(1.0, GREATEST(0.0, 1.0 - acc))"
        end_oob_done = f"(exc < 0 OR exc >= {w} OR eyc < 0 OR eyc >= {h})"
    else:
        raise ValueError("mode must be 'product' or 'sum'")

    # per-axis setup (kernel._dda_setup), emitted twice via a template
    def axis(nd, rc):
        zero = f"ABS({nd}) <= {_lit(FLT_EPS)}"
        pos_tmax = (f"CAST(CAST(CAST(FLOOR({rc}) + 1.0 AS FLOAT) - {rc} AS FLOAT)"
                    f" * {_lit(resf)} AS FLOAT) / {nd}")
        neg_tmax = (f"CAST(CAST({rc} - FLOOR({rc}) AS FLOAT)"
                    f" * {_lit(resf)} AS FLOAT) / (-({nd}))")
        step = f"CASE WHEN {zero} THEN 0 WHEN {nd} > 0 THEN 1 ELSE -1 END"
        tmax = (f"CASE WHEN {zero} THEN {_lit(FLT_MAX)} "
                f"WHEN {nd} > 0 THEN CAST({pos_tmax} AS FLOAT) "
                f"ELSE CAST({neg_tmax} AS FLOAT) END")
        tdelta = (f"CASE WHEN {zero} THEN {_lit(FLT_MAX)} "
                  f"WHEN {nd} > 0 THEN CAST({_lit(resf)} / {nd} AS FLOAT) "
                  f"ELSE CAST({_lit(resf)} / (-({nd})) AS FLOAT) END")
        return step, tmax, tdelta

    stx_e, tmx_e, tdx_e = axis("ndx", "rx")
    sty_e, tmy_e, tdy_e = axis("ndy", "ry")
    return f"""
init AS (
  SELECT pair_id, mr,
         CAST(FLOOR(CAST(CAST(exw - {_lit(oxf)} AS FLOAT) / {_lit(resf)} AS FLOAT)) AS INT) AS exc,
         CAST(FLOOR(CAST(CAST(eyw - {_lit(oyf)} AS FLOAT) / {_lit(resf)} AS FLOAT)) AS INT) AS eyc,
         CAST(FLOOR(rx) AS INT) AS cx, CAST(FLOOR(ry) AS INT) AS cy,
         mag, rx, ry, ndx, ndy
  FROM (
    SELECT pair_id, mr, exw, eyw,
           CAST(CAST(sxw - {_lit(oxf)} AS FLOAT) / {_lit(resf)} AS FLOAT) AS rx,
           CAST(CAST(syw - {_lit(oyf)} AS FLOAT) / {_lit(resf)} AS FLOAT) AS ry,
           mag,
           CAST(dx / mag AS FLOAT) AS ndx,
           CAST(dy / mag AS FLOAT) AS ndy
    FROM (
      SELECT pair_id, mr, sxw, syw, exw, eyw, dx, dy,
             CAST(SQRT(CAST(CAST(dx*dx AS FLOAT) + CAST(dy*dy AS FLOAT) AS FLOAT)) AS FLOAT) AS mag
      FROM (SELECT pair_id, mr, sxw, syw, exw, eyw,
                   CAST(exw - sxw AS FLOAT) AS dx,
                   CAST(eyw - syw AS FLOAT) AS dy
            FROM pairs) a
    ) b
  ) c
),
walk AS (
  SELECT pair_id, exc, eyc, mag, cx, cy,
         {stx_e} AS stx, {sty_e} AS sty,
         {tmx_e} AS tmx, {tmy_e} AS tmy,
         {tdx_e} AS tdx, {tdy_e} AS tdy,
         CAST({"1.0" if mode == "product" else "0.0"} AS DOUBLE) AS acc,
         (done0) AS done, CAST(val0 AS DOUBLE) AS val
  FROM (
    SELECT i.*,
           ({rej}) AS is_rej,
           (ABS(mag) <= {_lit(FLT_EPS)}) AS zmag,
           (cx < 0 OR cx >= {w} OR cy < 0 OR cy >= {h}) AS soob,
           {end_oob_done} AS eoob,
           (is_rej OR zmag OR soob OR eoob OR (cx = exc AND cy = eyc)) AS done0,
           CASE WHEN is_rej THEN 0.0
                WHEN zmag THEN CASE WHEN soob THEN 0.0 ELSE 1.0 END
                WHEN soob THEN 0.0
                WHEN eoob THEN 0.0
                WHEN cx = exc AND cy = eyc THEN 1.0 ELSE NULL END AS val0
    FROM init i
  ) d
  UNION ALL
  SELECT pair_id, exc, eyc, mag, cx2 AS cx, cy2 AS cy, stx, sty,
         tmx2 AS tmx, tmy2 AS tmy, tdx, tdy,
         CASE WHEN clean_break THEN acc ELSE {acc_next} END AS acc,
         (clean_break OR oob2 OR {dead}) AS done,
         CASE WHEN clean_break THEN {break_val}
              WHEN oob2 OR {dead} THEN 0.0 ELSE NULL END AS val
  FROM (
    SELECT t.*,
           (cx2 < 0 OR cx2 >= {w} OR cy2 < 0 OR cy2 >= {h}) AS oob2,
           (SELECT g.occ FROM grid g WHERE g.row = t.cy2 AND g.col = t.cx2) AS occ
    FROM (
      SELECT pair_id, exc, eyc, mag, stx, sty, tdx, tdy, acc,
             (LEAST(tmx, tmy) > mag) AS over,
             (tmx < tmy) AS move_x,
             CASE WHEN over THEN cx WHEN move_x THEN cx + stx ELSE cx END AS cx2,
             CASE WHEN over OR move_x THEN cy ELSE cy + sty END AS cy2,
             CASE WHEN NOT over AND move_x THEN CAST(tmx + tdx AS FLOAT) ELSE tmx END AS tmx2,
             CASE WHEN NOT over AND NOT move_x THEN CAST(tmy + tdy AS FLOAT) ELSE tmy END AS tmy2,
             (over OR (cx2 = exc AND cy2 = eyc)) AS clean_break
      FROM walk WHERE NOT done
    ) t
  ) s
)"""


def dda_oracle_sql(grid, origin, resolution, pairs, mode: str = "product",
                   max_range: float = 0.0) -> str:
    """Standalone oracle: (sx, sy, ex, ey, vis) for world-coordinate pairs.

    Pair coordinates must be float32-exact doubles (the Spark query feeds the
    same values), so embedding them as literals is lossless.
    """
    g = np.asarray(grid, dtype=np.float32)
    pv = _vals((i, float(a), float(b), float(c), float(d), float(max_range))
               for i, (a, b, c, d) in enumerate(pairs))
    return f"""
WITH RECURSIVE pairs(pair_id, sxw, syw, exw, eyw, mr) AS (VALUES {pv}),
grid(row, col, occ) AS (VALUES {grid_values(g)}),
{_dda_walk_cte(g.shape, origin, resolution, mode)}
SELECT p.sxw AS sx, p.syw AS sy, p.exw AS ex, p.eyw AS ey, CAST(w.val AS FLOAT) AS vis
FROM pairs p JOIN (SELECT pair_id, val FROM walk WHERE done) w USING (pair_id)
ORDER BY sx, sy, ex, ey"""


# ---------------------------------------------------------------------------
# sensor pipelines (O5/O6 + O8/O9): epsilon-round, FOV gate, coverage, combine
# ---------------------------------------------------------------------------

def _eps_round_sql(x: str) -> str:
    """kernel.epsilon_round twin: round-half-even if within 2e-6, else C
    truncation (reference polycheck.py:1065-1069)."""
    rint = (f"CASE WHEN ({x}) - FLOOR({x}) = 0.5 THEN "
            f"CASE WHEN CAST(FLOOR({x}) AS BIGINT) % 2 = 0 THEN FLOOR({x}) "
            f"ELSE FLOOR({x}) + 1.0 END ELSE FLOOR(({x}) + 0.5) END")
    return (f"CASE WHEN ABS(({x}) - ({rint})) < {_lit(2e-6)} THEN CAST({rint} AS INT) "
            f"ELSE CAST(TRUNC({x}) AS INT) END")


def _fov_gate_sql(gdx: str, gdy: str, bearing: str | None = None) -> str:
    """kernel.in_sensor_fov twin over float32-exact gdx/gdy exprs and sensor
    columns (rng, drn, fov).

    ``bearing``: float32-exact bearing expression. The grid regime passes a
    lookup over precomputed NumPy float32 atan2 values (NumPy's f32 atan2 is
    NOT the double-rounded result — measured divergent on 39% of integer
    offsets — so live SQL trig cannot match it). When None, double atan2
    cast to float32 is used, which is only safe for full-circle-FOV
    instances (the real-regime caveat in the module docstring)."""
    d2 = (f"CAST(CAST(({gdx})*({gdx}) AS FLOAT) "
          f"+ CAST(({gdy})*({gdy}) AS FLOAT) AS FLOAT)")
    gdist = f"CAST(SQRT({d2}) AS FLOAT)"
    range_ok = f"NOT (rng > 0.0 AND {gdist} > CAST(rng AS FLOAT))"
    has_fov = f"(fov > 0.0 AND fov < {_lit(2.0 * math.pi - 1e-6)})"
    at_origin = (f"(ABS({gdx}) <= {_lit(FLT_EPS)} "
                 f"AND ABS({gdy}) <= {_lit(FLT_EPS)})")
    if bearing is None:
        bearing = f"CAST(ATAN2({gdy}, {gdx}) AS FLOAT)"
    ang = (f"CAST(CAST(({bearing}) "
           f"- CAST(drn AS FLOAT) AS FLOAT) AS DOUBLE)")
    wrapped = (f"((({ang}) + {PI}) % {TWO_PI} + {TWO_PI}) % {TWO_PI} - {PI}")
    delta = f"CAST(ABS({wrapped}) AS FLOAT)"
    fov_ok = (f"(NOT {has_fov} OR {at_origin} "
              f"OR {delta} <= CAST(0.5 * fov AS FLOAT))")
    return f"({range_ok} AND {fov_ok})"


def _covered_sql(dxc: str, dyc: str, own: str) -> str:
    """operators.visibility coverage-mask Column twin (double math, +1e-6
    tolerances — reference polycheck.py:1085-1101)."""
    dist = f"SQRT(({dxc})*({dxc}) + ({dyc})*({dyc}))"
    in_range = f"({dist} <= rng + {_lit(1e-6)})"
    has_fov = f"(fov > 0.0 AND fov < {_lit(2.0 * math.pi - 1e-6)})"
    delta = (f"ABS(((ATAN2({dyc}, {dxc}) - drn + {PI}) % {TWO_PI} + {TWO_PI}) "
             f"% {TWO_PI} - {PI})")
    in_fov = (f"(NOT {has_fov} OR {dist} <= {_lit(1e-8)} "
              f"OR {delta} <= fov / 2 + {_lit(1e-6)})")
    return (f"CASE WHEN rng <= 0.0 THEN ({own}) "
            f"ELSE ({in_range} AND {in_fov}) END")


def _combine_sql(combine: str) -> str:
    """Log-space union/product combine, formula-identical to the Spark
    aggregation in operators.visibility.sensor_visibility_df (O8)."""
    if combine == "union":
        eff = "CASE WHEN covered THEN CAST(p AS DOUBLE) ELSE 0.0 END"
        return (f"1.0 - CASE WHEN MAX(CASE WHEN 1.0 - ({eff}) <= 0.0 THEN 1 ELSE 0 END) = 1 "
                f"THEN 0.0 ELSE EXP(SUM(LN(CASE WHEN 1.0 - ({eff}) > 0.0 "
                f"THEN 1.0 - ({eff}) ELSE 1.0 END))) END")
    if combine == "product":
        eff = "CASE WHEN covered THEN CAST(p AS DOUBLE) ELSE 1.0 END"
        return (f"CASE WHEN MAX(CASE WHEN covered THEN 1 ELSE 0 END) = 0 THEN 0.0 "
                f"WHEN MAX(CASE WHEN ({eff}) <= 0.0 THEN 1 ELSE 0 END) = 1 THEN 0.0 "
                f"ELSE EXP(SUM(LN(CASE WHEN ({eff}) > 0.0 THEN ({eff}) ELSE 1.0 END))) END")
    raise ValueError("combine must be 'union' or 'product'")


def sensor_grid_oracle_sql(grid, sensors, combine: str = "union") -> str:
    """Oracle for sensor_visibility_df (grid regime): (ex, ey, p) combined map.

    ``sensors``: rows of (sensor_id, x, y, range, direction, fov) — the same
    values the Spark query's sensors DataFrame carries.
    """
    g = np.clip(np.asarray(grid, dtype=np.float32), 0.0, 1.0)
    h, w = g.shape
    sv = _vals((int(s[0]), float(s[1]), float(s[2]), float(s[3]),
                float(s[4]), float(s[5])) for s in sensors)
    # exact float32 bearings for every (cell - sensor-cell) integer offset,
    # precomputed with the SAME NumPy f32 atan2 the kernel uses (f32 atan2
    # is not SQL-reproducible) — enables real FOV-gated instances
    from polycheck_spark.geo.kernel import epsilon_round
    offs = set()
    for s_row in sensors:
        scx, scy = epsilon_round(float(s_row[1])), epsilon_round(float(s_row[2]))
        for ey in range(h):
            for ex in range(w):
                offs.add((ex - scx, ey - scy))
    brg = _vals((dx, dy, float(np.arctan2(np.float32(dy), np.float32(dx))))
                for dx, dy in sorted(offs))
    bearing = ("(SELECT b FROM brg WHERE brg.bdx = ex - scx "
               "AND brg.bdy = ey - scy)")
    gate = _fov_gate_sql("CAST(ex - scx AS DOUBLE)", "CAST(ey - scy AS DOUBLE)",
                         bearing)
    covered = _covered_sql("CAST(ex AS DOUBLE) - scx", "CAST(ey AS DOUBLE) - scy",
                           "ex = scx AND ey = scy")
    return f"""
WITH RECURSIVE brg(bdx, bdy, b) AS (VALUES {brg}),
sensors(sensor_id, x, y, rng, drn, fov) AS (VALUES {sv}),
grid(row, col, occ) AS (VALUES {grid_values(g)}),
spairs AS (
  SELECT sensor_id * {h * w} + g.row * {w} + g.col AS pair_id,
         sensor_id, g.col AS ex, g.row AS ey, x, y, rng, drn, fov,
         {_eps_round_sql("x")} AS scx, {_eps_round_sql("y")} AS scy
  FROM sensors CROSS JOIN grid g
),
pairs AS (SELECT pair_id, scx AS sx, scy AS sy, ex, ey FROM spairs),
{_bresenham_walk_cte((h, w), "sum")},
scored AS (
  SELECT s.ex, s.ey,
         CAST(CASE WHEN rng <= 0.0 THEN CASE WHEN ex = scx AND ey = scy THEN 1.0 ELSE 0.0 END
              WHEN {gate} THEN w.val ELSE 0.0 END AS FLOAT) AS p,
         {covered} AS covered
  FROM spairs s JOIN (SELECT pair_id, val FROM walk WHERE done) w USING (pair_id)
)
SELECT ex, ey, CAST(LEAST(1.0, GREATEST(0.0, {_combine_sql(combine)})) AS FLOAT) AS p
FROM scored GROUP BY ex, ey ORDER BY ey, ex"""


def sensor_real_oracle_sql(grid, sensors, origin, resolution,
                           combine: str = "union") -> str:
    """Oracle for sensor_visibility_df (real regime, O6): (ex, ey, p).

    Full-circle sensors only: the gate below falls back to a double ATAN2
    cast to float32, which matches the kernel's NumPy float32 atan2 ONLY
    when the FOV test is vacuous (fov >= 2*pi).  A partial-FOV real-regime
    oracle needs a precomputed float32 bearing lookup like
    :func:`sensor_grid_oracle_sql`; fail loudly instead of silently
    diverging."""
    for s in sensors:
        if float(s[5]) < 2.0 * math.pi - 1e-6:
            raise ValueError(
                f"sensor_real_oracle_sql requires full-circle FOV "
                f"(fov >= 2*pi) — sensor {s[0]} has fov={s[5]!r}; use a "
                f"bearing-lookup oracle for partial-FOV real instances")
    g = np.clip(np.asarray(grid, dtype=np.float32), 0.0, 1.0)
    h, w = g.shape
    ox, oy, res = float(origin[0]), float(origin[1]), float(resolution)
    sv = _vals((int(s[0]), float(s[1]), float(s[2]), float(s[3]),
                float(s[4]), float(s[5])) for s in sensors)
    gate = _fov_gate_sql("CAST(CAST(tx AS FLOAT) - CAST(x AS FLOAT) AS FLOAT)",
                         "CAST(CAST(ty AS FLOAT) - CAST(y AS FLOAT) AS FLOAT)")
    covered = _covered_sql("tx - x", "ty - y", "ex = scx AND ey = scy")
    return f"""
WITH RECURSIVE sensors(sensor_id, x, y, rng, drn, fov) AS (VALUES {sv}),
grid(row, col, occ) AS (VALUES {grid_values(g)}),
spairs AS (
  SELECT sensor_id * {h * w} + g.row * {w} + g.col AS pair_id,
         sensor_id, g.col AS ex, g.row AS ey, x, y, rng, drn, fov,
         CAST(FLOOR((x - {_lit(ox)}) / {_lit(res)}) AS INT) AS scx,
         CAST(FLOOR((y - {_lit(oy)}) / {_lit(res)}) AS INT) AS scy,
         {_lit(ox)} + (CAST(g.col AS DOUBLE) + 0.5) * {_lit(res)} AS tx,
         {_lit(oy)} + (CAST(g.row AS DOUBLE) + 0.5) * {_lit(res)} AS ty
  FROM sensors CROSS JOIN grid g
),
pairs AS (SELECT pair_id, x AS sxw, y AS syw, tx AS exw, ty AS eyw, rng AS mr FROM spairs),
{_dda_walk_cte((h, w), origin, resolution, "sum")},
scored AS (
  SELECT s.ex, s.ey,
         CAST(CASE WHEN rng <= 0.0 THEN CASE WHEN ex = scx AND ey = scy THEN 1.0 ELSE 0.0 END
              WHEN {gate} THEN w.val ELSE 0.0 END AS FLOAT) AS p,
         {covered} AS covered
  FROM spairs s JOIN (SELECT pair_id, val FROM walk WHERE done) w USING (pair_id)
)
SELECT ex, ey, CAST(LEAST(1.0, GREATEST(0.0, {_combine_sql(combine)})) AS FLOAT) AS p
FROM scored GROUP BY ex, ey ORDER BY ey, ex"""
