"""Bird's-eye-view LIDAR splat synthesis.

The reference pipeline is: CARLA ray-casts a 32-channel LIDAR on the GPU,
ships ~10k points/frame over RPC, then numpy histograms them into a
200x200x2 BEV image (/root/reference/oatomobile/utils/carla.py:165-233:
2 px/m, 50 m range, clip 5 pts/pixel, split at z = -2.5 m relative to the
sensor at z = 2.5 m).  The learned models only ever consume the *histogram*
— so here the histogram is synthesised directly from scene geometry on
device, skipping both the ray-cast and the transfer:

  - channel 0 ("below", ground returns): a *static, rotation-invariant*
    ring image — each beam channel with negative elevation paints a circle
    of radius ``z / tan(|elev|)``; its expected per-pixel hit count depends
    only on range.  Pixels occupied by obstacles lose their ground return.
  - channel 1 ("above", obstacle returns): pixels covered by vehicle boxes,
    pedestrians or buildings, weighted by the expected number of beam hits
    on a vertical surface at that range (~1/r^2, saturating at 5/pixel
    within ~18 m exactly like near surfaces saturate the reference's
    histogram clip).

Reference LIDAR config: simulators/carla/defaults.py:118-135 (200k pts/s,
20 Hz rotation, FOV +10..-30 deg, z=2.5).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Reference splat parameters (utils/carla.py:165-233).
PIXELS_PER_METER = 2
HIST_MAX_PER_PIXEL = 5
METERS_MAX = 50
BEV_SIZE = METERS_MAX * 2 * PIXELS_PER_METER  # 200
# The reference's bins: np.linspace(-50, 51, 201) -> bin width 101/200.
BIN_WIDTH = (2 * METERS_MAX + 1) / BEV_SIZE  # 0.505 m
BIN_LOW = -float(METERS_MAX)

# Reference LIDAR sensor config (defaults.py:118-135).
LIDAR_Z = 2.5
LIDAR_CHANNELS = 32
LIDAR_PPS = 200_000
LIDAR_ROT_HZ = 20
LIDAR_UPPER_FOV = 10.0
LIDAR_LOWER_FOV = -30.0

# Points per channel per rotation.
_PTS_PER_CHANNEL = LIDAR_PPS // (LIDAR_ROT_HZ * LIDAR_CHANNELS)  # 312

# Sidewalk clear margin beyond the road edge (maps/builder.py SIDEWALK) —
# ground returns extend this far past the corridor before walls occlude.
_SIDEWALK = 2.0

# How many BEV NPC boxes are rasterised (nearest-first); vehicles beyond
# the 50 m range never contribute.  Sized from measurement: the densest
# benchmark configuration (100 NPCs in Town02, the smallest town) peaks
# at 21 vehicles inside the 50 m window over a 600-step rollout
# (tests/test_sensors_extra.py::test_bev_vehicle_budget_covers_dense_town);
# 24 covers it with headroom.  16 was measured insufficient (p99 17.2).
MAX_BEV_VEHICLES = 24
MAX_BEV_PEDESTRIANS = 16
# Static geometry rect budgets (nearest-first by point-to-rect distance).
# Sized from per-town measurement (tests/test_maps.py budget tests) with
# headroom for curved-geometry chord decompositions.
# Hard ceilings; the effective per-scene counts are the smaller measured
# per-town budgets on WorldParams (wall_budget/road_budget).
MAX_BEV_WALLS = 32
MAX_BEV_ROADS = 24


def _pixel_centers() -> np.ndarray:
  """[200] world-offsets of pixel centers along one axis (hero frame)."""
  return BIN_LOW + (np.arange(BEV_SIZE) + 0.5) * BIN_WIDTH


@functools.lru_cache(maxsize=1)
def ground_ring_image() -> np.ndarray:
  """Static expected ground-return histogram [200, 200] in [0, 1].

  Channel elevations span [upper, lower] FOV; every channel with negative
  elevation paints a circle of ground hits of radius z/tan(|e|); the hits
  are histogrammed exactly like the reference splat and clipped at 5/pixel.
  """
  elev = np.linspace(LIDAR_UPPER_FOV, LIDAR_LOWER_FOV, LIDAR_CHANNELS)
  hist = np.zeros((BEV_SIZE, BEV_SIZE), dtype=np.float64)
  edges = BIN_LOW + np.arange(BEV_SIZE + 1) * BIN_WIDTH
  for e in elev:
    if e >= -0.5:
      continue
    r = LIDAR_Z / np.tan(np.deg2rad(-e))
    if r > METERS_MAX * 1.45:  # entirely out of range (diag margin)
      continue
    theta = np.linspace(0.0, 2 * np.pi, _PTS_PER_CHANNEL, endpoint=False)
    xs = r * np.cos(theta)
    ys = r * np.sin(theta)
    h, _, _ = np.histogram2d(xs, ys, bins=(edges, edges))
    hist += h
  hist = np.minimum(hist, HIST_MAX_PER_PIXEL) / HIST_MAX_PER_PIXEL
  return hist.astype(np.float32)


def _expected_obstacle_hits(r: jnp.ndarray) -> jnp.ndarray:
  """Expected LIDAR hits per pixel on a ~1.5 m tall vertical surface at
  range r: azimuthal density * number of channels intersecting the surface.
  """
  r = jnp.maximum(r, 1.0)
  # Points per pixel per channel: bin width over azimuthal spacing.
  az = _PTS_PER_CHANNEL * BIN_WIDTH / (2 * jnp.pi * r)
  # Channels hitting a surface between z=0 and z=1.6 (sensor at 2.5 m):
  # vertical angular span ~ atan(2.5/r) - atan(0.9/r), channel spacing
  # 40 deg / 32.
  span = jnp.arctan2(LIDAR_Z, r) - jnp.arctan2(LIDAR_Z - 1.6, r)
  channels = span / jnp.deg2rad(
      (LIDAR_UPPER_FOV - LIDAR_LOWER_FOV) / LIDAR_CHANNELS)
  return az * jnp.maximum(channels, 1.0)


def _hero_frame_grid(hero_xy: jnp.ndarray,
                     hero_yaw: jnp.ndarray) -> jnp.ndarray:
  """[200, 200, 2] world coordinates of every BEV pixel center."""
  c = jnp.asarray(_pixel_centers(), dtype=jnp.float32)
  lx = c[:, None]          # forward offsets  (rows)
  ly = c[None, :]          # lateral offsets  (cols)
  cos_y, sin_y = jnp.cos(hero_yaw), jnp.sin(hero_yaw)
  wx = hero_xy[0] + cos_y * lx - sin_y * ly
  wy = hero_xy[1] + sin_y * lx + cos_y * ly
  return jnp.stack([wx, wy], axis=-1)


def _boxes_occupancy(local_centers_uv, yaw_rel, half_lw, alive) -> jnp.ndarray:
  """Occupancy of K oriented boxes over the BEV grid.

  Args:
    local_centers_uv: [K, 2] box centers in hero frame.
    yaw_rel: [K] box yaw minus hero yaw.
    half_lw: [K, 2] (half_length, half_width).
    alive: [K] bool.

  Returns:
    [200, 200] bool.
  """
  c = jnp.asarray(_pixel_centers(), dtype=jnp.float32)
  px = c[:, None, None]   # [200, 1, 1] forward
  py = c[None, :, None]   # [1, 200, 1] lateral
  cos_r, sin_r = jnp.cos(yaw_rel), jnp.sin(yaw_rel)
  # Half-plane form (centers folded into per-box constants — see
  # rects_occupancy): two FMA chains per pixel-box test.
  bx = local_centers_uv[:, 0]
  by = local_centers_uv[:, 1]
  cu = cos_r * bx + sin_r * by
  cv = -sin_r * bx + cos_r * by
  u = cos_r * px + sin_r * py - cu
  v = cos_r * py - sin_r * px - cv
  inside = ((jnp.abs(u) <= half_lw[None, None, :, 0]) &
            (jnp.abs(v) <= half_lw[None, None, :, 1]) & alive[None, None, :])
  return jnp.any(inside, axis=-1)


def _nearest_k(xy_rel: jnp.ndarray, alive: jnp.ndarray, k: int):
  """Indices of the k nearest alive actors (padded with argmax-dist)."""
  d = jnp.linalg.norm(xy_rel, axis=-1)
  d = jnp.where(alive, d, jnp.inf)
  k = min(k, d.shape[0])
  _, idx = jax.lax.top_k(-d, k)
  return idx


def rect_distance(rects: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
  """Point-to-ORIENTED-rect distance for every rect [R, 6]."""
  dx = point[0] - rects[:, 0]
  dy = point[1] - rects[:, 1]
  u = rects[:, 4] * dx + rects[:, 5] * dy
  v = -rects[:, 5] * dx + rects[:, 4] * dy
  du = jnp.maximum(jnp.abs(u) - rects[:, 2], 0.0)
  dv = jnp.maximum(jnp.abs(v) - rects[:, 3], 0.0)
  return jnp.sqrt(du * du + dv * dv)


def nearest_rects(rects: jnp.ndarray, point: jnp.ndarray, k: int,
                  max_range: float = METERS_MAX * 1.5) -> jnp.ndarray:
  """[k, 6] oriented rects (cx, cy, hx, hy, cos, sin) nearest to ``point``
  by point-to-rect distance (so 40 m chords right next to the hero are
  selected even though their centers are far).  Selections beyond
  ``max_range`` are pushed out so padded slots never rasterise."""
  d = rect_distance(rects, point)
  k = min(k, rects.shape[0])
  neg_d, idx = jax.lax.top_k(-d, k)
  sel = rects[idx]
  valid = (-neg_d) <= max_range
  pushed = jnp.concatenate([
      jnp.full_like(sel[:, :2], -1e6),
      jnp.zeros_like(sel[:, 2:4]),
      jnp.ones_like(sel[:, 4:5]),
      jnp.zeros_like(sel[:, 5:6]),
  ], axis=-1)
  return jnp.where(valid[:, None], sel, pushed)


def rects_occupancy(grid_world: jnp.ndarray, rects: jnp.ndarray,
                    inflate: float = 0.0) -> jnp.ndarray:
  """[H, W] bool: grid points inside any oriented rect (elementwise — no
  gathers, TPU-friendly).  ``inflate`` grows every rect's half-extents
  (e.g. by the sidewalk margin).

  The test is written in half-plane form — ``u = cr*x + sr*y - cu`` with
  the center folded into a per-rect constant — so the per-pixel work is
  two FMA chains + two range checks (the dominant VPU cost of the BEV
  splat at 40k pixels x ~40 rects x 1024 scenes per step)."""
  cr = rects[None, None, :, 4]
  sr = rects[None, None, :, 5]
  cu = cr * rects[None, None, :, 0] + sr * rects[None, None, :, 1]
  cv = -sr * rects[None, None, :, 0] + cr * rects[None, None, :, 1]
  x = grid_world[..., 0, None]
  y = grid_world[..., 1, None]
  u = cr * x + sr * y - cu
  v = cr * y - sr * x - cv
  inside = ((jnp.abs(u) <= rects[None, None, :, 2] + inflate) &
            (jnp.abs(v) <= rects[None, None, :, 3] + inflate))
  return jnp.any(inside, axis=-1)


def rect_column_intervals(rects: jnp.ndarray,
                          origin_xy: jnp.ndarray,
                          cos_y: jnp.ndarray,
                          sin_y: jnp.ndarray,
                          inflate: float = 0.0):
  """Per-(BEV row, rect) column intervals covering each oriented rect.

  The interval form of the dense half-plane test (`rects_occupancy`):
  along one BEV row, both |u| <= hx and |v| <= hy are linear in the
  column offset, so their conjunction is a single column interval
  [lo, hi] — computed once per (row, rect) at [H, R] cost, leaving the
  per-pixel work at one subtract + abs + compare instead of the dense
  test's two rotated FMA chains (~11 VPU ops -> ~4).  At 40k pixels x
  ~96 rects x 1024 scenes per step the dense test was the measured
  VPU-speed-of-light wall of the whole simulator (PARITY.md round 2);
  this cuts its op count ~2.7x algorithmically.

  Returns (mid, half): [H, R] interval centers/half-widths in column
  offset units; empty intervals have half < 0.
  """
  ci = jnp.asarray(_pixel_centers(), dtype=jnp.float32)   # [H]
  cr, sr = rects[:, 4], rects[:, 5]
  dx = origin_xy[0] - rects[:, 0]
  dy = origin_xy[1] - rects[:, 1]
  a = cr * dx + sr * dy                  # u of the hero origin
  b = -sr * dx + cr * dy                 # v of the hero origin
  au = cr * cos_y + sr * sin_y           # row direction . u-axis
  bu = -cr * sin_y + sr * cos_y          # column direction . u-axis
  av = -sr * cos_y + cr * sin_y
  bv = sr * sin_y + cr * cos_y
  hx = rects[:, 2] + inflate
  hy = rects[:, 3] + inflate

  big = jnp.float32(1e9)

  def axis_interval(base, B, h):
    """Column interval where |base + cj * B| <= h (per row x rect)."""
    degenerate = jnp.abs(B) < 1e-6
    Bsafe = jnp.where(degenerate, 1.0, B)
    l1 = (-h[None, :] - base) / Bsafe[None, :]
    l2 = (h[None, :] - base) / Bsafe[None, :]
    lo = jnp.minimum(l1, l2)
    hi = jnp.maximum(l1, l2)
    inside = jnp.abs(base) <= h[None, :]
    lo = jnp.where(degenerate[None, :], jnp.where(inside, -big, big), lo)
    hi = jnp.where(degenerate[None, :], jnp.where(inside, big, -big), hi)
    # h < 0 marks masked-out (dead-actor) rects: force empty — the sort
    # above would otherwise fabricate a non-empty interval.
    empty = (h < 0.0)[None, :]
    return jnp.where(empty, big, lo), jnp.where(empty, -big, hi)

  base_u = a[None, :] + ci[:, None] * au[None, :]
  base_v = b[None, :] + ci[:, None] * av[None, :]
  lo_u, hi_u = axis_interval(base_u, bu, hx)
  lo_v, hi_v = axis_interval(base_v, bv, hy)
  lo = jnp.maximum(lo_u, lo_v)
  hi = jnp.minimum(hi_u, hi_v)
  return 0.5 * (lo + hi), 0.5 * (hi - lo)


def intervals_occupancy(mid: jnp.ndarray, half: jnp.ndarray) -> jnp.ndarray:
  """[H, W] bool from per-(row, rect) column intervals [H, R]."""
  cj = jnp.asarray(_pixel_centers(), dtype=jnp.float32)
  inside = jnp.abs(cj[None, :, None] - mid[:, None, :]) <= half[:, None, :]
  return jnp.any(inside, axis=-1)


# Row-block culling (see `intervals_occupancy_blocked`): rows per block and
# the per-block rect budget.  10-row blocks = 5 m of forward extent; the
# budget is sized from measurement over dense-traffic rollouts (Town02,
# 100 vehicles, 300 autopilot steps): peak nonempty rects in any block by
# block size {8: 11, 10: 11, 20: 16, 25: 17, 40: 18, 50: 24} — 10-row
# blocks peak at 11, 14 covers it with headroom
# (tests/test_sensors_extra.py::test_blocked_splat_budget_covers_dense_town
# re-measures the peak and locks it under the budget).
BLOCK_ROWS = 10
BLOCK_BUDGET = 14


def intervals_occupancy_blocked(mid: jnp.ndarray, half: jnp.ndarray,
                                block_rows: int = BLOCK_ROWS,
                                budget: int = BLOCK_BUDGET) -> jnp.ndarray:
  """Row-block-culled `intervals_occupancy`.

  The per-pixel cost of the interval test is W x R per row; but a rect's
  column interval is nonempty only on the rows its footprint crosses —
  for 2-5 m boxes that is a handful of the 200 rows, and even 40 m wall
  chords cross at most a diagonal band.  Splitting the rows into
  ``H / block_rows`` blocks and keeping, per block, only the ``budget``
  rects with the widest interval anywhere in the block cuts the pixel
  work from W x R to W x budget (R = 48 merged occupied rects ->
  16: 3x fewer VPU ops) for one cheap [blocks, R] reduce + top_k + two
  [blocks, rows, budget] gathers.

  Exact (vs `intervals_occupancy`) whenever no block has more than
  ``budget`` rects with a nonempty interval; beyond that, narrowest
  intervals drop first.  Budget validated over dense-traffic rollouts by
  tests/test_sensors_extra.py.
  """
  H, R = mid.shape
  budget = min(budget, R)
  nb = H // block_rows
  assert nb * block_rows == H, (H, block_rows)
  mid_b = mid.reshape(nb, block_rows, R)
  half_b = half.reshape(nb, block_rows, R)
  # Relevance of rect r to block b: widest interval on any row (empty
  # intervals have half < 0).
  score = jnp.max(half_b, axis=1)                      # [nb, R]
  _, idx = jax.lax.top_k(score, budget)                # [nb, budget]
  # Selection as a one-hot matmul, not take_along_axis: the gather would
  # serialise on the VPU while the [R, budget] one-hot contraction rides
  # the MXU for free.
  onehot = (idx[:, None, :] == jnp.arange(R)[None, :, None]).astype(
      mid.dtype)                                       # [nb, R, budget]
  sel_mid = jnp.einsum("nbr,nrk->nkb", mid_b, onehot)  # [nb, budget, rows]
  sel_half = jnp.einsum("nbr,nrk->nkb", half_b, onehot)
  cj = jnp.asarray(_pixel_centers(), dtype=jnp.float32)
  # Keep W minor so the lane dimension is 200-wide, not budget-wide.
  inside = (jnp.abs(cj[None, None, None, :] - sel_mid[:, :, :, None])
            <= sel_half[:, :, :, None])                # [nb, budget, rows, W]
  return jnp.any(inside, axis=1).reshape(H, -1)


def rects_occupancy_interval(rects: jnp.ndarray,
                             origin_xy: jnp.ndarray,
                             hero_yaw: jnp.ndarray,
                             inflate: float = 0.0) -> jnp.ndarray:
  """Interval-form equivalent of `rects_occupancy` (world-frame rects,
  hero-frame BEV grid).  Agrees with the dense test everywhere except
  pixels whose coordinate lands within float rounding of a rect edge
  (tests/test_sensors_extra.py bounds the disagreement)."""
  mid, half = rect_column_intervals(rects, origin_xy, jnp.cos(hero_yaw),
                                    jnp.sin(hero_yaw), inflate)
  return intervals_occupancy(mid, half)


def _box_intervals(local_centers_uv, yaw_rel, half_lw, alive):
  """Column intervals [H, K] of hero-frame boxes (origin = 0, identity
  hero axes)."""
  cr, sr = jnp.cos(yaw_rel), jnp.sin(yaw_rel)
  # Dead boxes become empty intervals via negative half-extents.
  half_lw = jnp.where(alive[:, None], half_lw, -1.0)
  rects = jnp.concatenate([local_centers_uv, half_lw,
                           cr[:, None], sr[:, None]], axis=-1)
  return rect_column_intervals(rects, jnp.zeros(2, rects.dtype),
                               jnp.float32(1.0), jnp.float32(0.0))


def _boxes_occupancy_interval(local_centers_uv, yaw_rel, half_lw,
                              alive) -> jnp.ndarray:
  """Interval-form `_boxes_occupancy`: boxes already in hero frame, so
  origin = 0 and hero axes are the identity."""
  mid, half = _box_intervals(local_centers_uv, yaw_rel, half_lw, alive)
  return intervals_occupancy(mid, half)


def splat_lidar(params, state, *,
                max_vehicles: int = MAX_BEV_VEHICLES,
                max_pedestrians: int = MAX_BEV_PEDESTRIANS,
                method: str = "interval") -> jnp.ndarray:
  """Synthesises the [200, 200, 2] BEV LIDAR histogram for one scene.

  Output layout matches carla_lidar_measurement_to_ndarray: axis 0 along
  the car's forward axis, axis 1 lateral, channel 0 = below (ground),
  channel 1 = above (obstacles); values in [0, 1] (clipped counts / 5).

  ``max_vehicles``/``max_pedestrians``: static actor rasterisation
  budgets (nearest-first).  The defaults are validated against the
  unbudgeted splat on a 100-vehicle scene in
  tests/test_sensors_extra.py::test_bev_vehicle_budget_vs_unbudgeted.

  ``method``: "interval" (default: ~2.7x fewer VPU ops than dense — see
  `rect_column_intervals`), "blocked" (interval + row-block culling of
  the merged wall/vehicle/pedestrian set, `intervals_occupancy_blocked`
  — measured SLOWER at the bench scale and declined as default: 147k
  vs 165k steps/s @1024 Town01 envs, the per-block top_k/selection
  overhead exceeds the compares it saves at R=32 merged rects) or
  "dense" (the reference half-plane form the Pallas kernel mirrors
  bit-exactly).  All agree except at pixels within float rounding of a
  rect edge, and "blocked" additionally requires the per-block budget to
  cover the scene (validated in tests/test_sensors_extra.py).
  """
  hero_xy, hero_yaw = state.hero_xy, state.hero_yaw
  blocked = method == "blocked"
  interval = method == "interval" or blocked
  if not interval:
    grid_world = _hero_frame_grid(hero_xy, hero_yaw)

  # -- Building walls: the only static surfaces a LIDAR returns from.
  # Rect tests, not raster gathers: 40k random 1-element HBM loads per
  # scene per step would serialise on TPU.
  wall_sel = nearest_rects(params.map["wall_rects"], hero_xy,
                           min(MAX_BEV_WALLS, params.wall_budget),
                           max_range=METERS_MAX * 1.04)
  # Ground returns exist only on/near the road corridors (road + sidewalk);
  # beyond the walls everything is occluded building interior.  Inflating
  # the corridor chords by the sidewalk margin reproduces exactly the old
  # "solid block interior" complement, but works for curved geometry.
  road_sel = nearest_rects(params.map["road_rects"], hero_xy,
                           min(MAX_BEV_ROADS, params.road_budget))
  cos_y, sin_y = jnp.cos(hero_yaw), jnp.sin(hero_yaw)
  if interval:
    # All "occupied" sources (walls + vehicles + pedestrians) contribute
    # column intervals to ONE merged [H, R] set so the blocked method
    # culls across categories in a single pass.
    ivals = [rect_column_intervals(wall_sel, hero_xy, cos_y, sin_y)]
    open_ground = rects_occupancy_interval(road_sel, hero_xy, hero_yaw,
                                           inflate=_SIDEWALK)
  else:
    buildings = rects_occupancy(grid_world, wall_sel)
    open_ground = rects_occupancy(grid_world, road_sel, inflate=_SIDEWALK)
    occupied = buildings

  # -- Vehicle boxes (nearest MAX_BEV_VEHICLES only). ----------------------
  if state.num_npcs > 0:
    rel = state.npc_xy - hero_xy[None, :]
    sel = _nearest_k(rel, state.npc_alive, max_vehicles)
    rel_sel = rel[sel]
    # Rotate into hero frame.
    u = cos_y * rel_sel[:, 0] + sin_y * rel_sel[:, 1]
    v = -sin_y * rel_sel[:, 0] + cos_y * rel_sel[:, 1]
    centers = jnp.stack([u, v], axis=-1)
    yaw_rel = state.npc_yaw[sel] - hero_yaw
    half = jnp.stack([
        jnp.full(sel.shape, params.vehicle.length / 2.0),
        jnp.full(sel.shape, params.vehicle.width / 2.0)
    ], axis=-1)
    in_range = jnp.linalg.norm(rel_sel, axis=-1) < (METERS_MAX * 1.5)
    alive = state.npc_alive[sel] & in_range
    if interval:
      ivals.append(_box_intervals(centers, yaw_rel, half, alive))
    else:
      occupied = occupied | _boxes_occupancy(centers, yaw_rel, half, alive)

  if state.num_pedestrians > 0:
    rel = state.ped_xy - hero_xy[None, :]
    sel = _nearest_k(rel, state.ped_alive, max_pedestrians)
    rel_sel = rel[sel]
    u = cos_y * rel_sel[:, 0] + sin_y * rel_sel[:, 1]
    v = -sin_y * rel_sel[:, 0] + cos_y * rel_sel[:, 1]
    centers = jnp.stack([u, v], axis=-1)
    half = jnp.full((sel.shape[0], 2), 0.35)
    if interval:
      ivals.append(_box_intervals(centers, jnp.zeros_like(u), half,
                                  state.ped_alive[sel]))
    else:
      occupied = occupied | _boxes_occupancy(centers, jnp.zeros_like(u),
                                             half, state.ped_alive[sel])

  if interval:
    mid = jnp.concatenate([m for m, _ in ivals], axis=-1)
    half = jnp.concatenate([h for _, h in ivals], axis=-1)
    occ_fn = intervals_occupancy_blocked if blocked else intervals_occupancy
    occupied = occ_fn(mid, half)

  # -- Range-dependent expected hit counts. --------------------------------
  c = jnp.asarray(_pixel_centers(), dtype=jnp.float32)
  rng = jnp.sqrt(c[:, None]**2 + c[None, :]**2)
  above_counts = jnp.minimum(_expected_obstacle_hits(rng),
                             float(HIST_MAX_PER_PIXEL))
  in_range = rng <= METERS_MAX
  above = jnp.where(occupied & in_range,
                    above_counts / HIST_MAX_PER_PIXEL, 0.0)

  ground = jnp.asarray(ground_ring_image())
  below = jnp.where(occupied | ~open_ground, 0.0, ground)

  return jnp.stack([below, above], axis=-1).astype(jnp.float32)
