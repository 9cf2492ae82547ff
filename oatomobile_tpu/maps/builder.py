"""Procedural town builder: grid street networks -> TownMap arrays.

Replaces CARLA's OpenDrive towns with deterministic, procedurally generated
road networks that expose the same *structural* interface the reference
consumes: a directed lane-waypoint graph with ~2 m spacing and junction
connectors (``waypoint.next()`` semantics of the CARLA map API), spawn
points, traffic lights, and road/lane rasters (semantics of
/root/reference/oatomobile/utils/graphics.py:430-711).

Conventions (CARLA-compatible observables):
  - x forward / y right, yaw in radians here (degrees only at sensor edge),
  - right-hand traffic: the lane for heading ``u`` is offset ``+half_lane``
    along ``right(u) = (-u_y, u_x) … `` for CARLA's left-handed frame the
    right vector of heading (cos y, sin y) is (-sin y, cos y).
"""

import hashlib
from typing import Dict, List, Sequence, Tuple

import numpy as np

from oatomobile_tpu.maps.assets import MAX_NEXT, TownMap

# Geometry constants.
LANE_WIDTH = 3.5          # meters, CARLA town default
LANE_OFFSET = LANE_WIDTH / 2.0
JUNCTION_HALF = 8.0       # junction box half-size, meters
WAYPOINT_SPACING = 2.0    # meters between consecutive lane waypoints
SPAWN_SPACING = 12.0      # meters between spawn points along lanes
SPEED_LIMIT_MPS = 30.0 / 3.6  # 30 km/h, CARLA town default
TL_GREEN = 10.0           # seconds
TL_YELLOW = 3.0
RASTER_PPM = 2.0          # raster pixels per meter
SIDEWALK = 2.0            # meters of clear margin beyond road edge

# Headings: unit vectors and derived right vectors.
HEADINGS = ("px", "py", "mx", "my")  # +x, +y, -x, -y
UNIT = {
    "px": np.array([1.0, 0.0]),
    "py": np.array([0.0, 1.0]),
    "mx": np.array([-1.0, 0.0]),
    "my": np.array([0.0, -1.0]),
}
YAW = {"px": 0.0, "py": np.pi / 2, "mx": np.pi, "my": -np.pi / 2}


def _right(u: np.ndarray) -> np.ndarray:
  """Right-hand vector of heading u in the x-forward/y-right frame."""
  return np.array([-u[1], u[0]])


def _turn(h: str, direction: str) -> str:
  """Heading after a turn: right = +90deg yaw, left = -90deg."""
  order = ["px", "py", "mx", "my"]  # +90deg yaw each step
  i = order.index(h)
  if direction == "right":
    return order[(i + 1) % 4]
  if direction == "left":
    return order[(i - 1) % 4]
  return h


class _GraphAccumulator:
  """Collects waypoints and edges while building lanes and connectors."""

  def __init__(self):
    self.xy: List[np.ndarray] = []
    self.yaw: List[float] = []
    self.road_id: List[int] = []
    self.lane_id: List[int] = []
    self.is_junction: List[bool] = []
    self.edges: List[Tuple[int, int]] = []

  def add_polyline(self, points: np.ndarray, yaws: np.ndarray, road_id: int,
                   lane_id: int, junction: bool) -> Tuple[int, int]:
    """Adds a chained sequence of waypoints; returns (first_id, last_id)."""
    base = len(self.xy)
    n = len(points)
    for k in range(n):
      self.xy.append(points[k])
      self.yaw.append(float(yaws[k]))
      self.road_id.append(road_id)
      self.lane_id.append(lane_id)
      self.is_junction.append(junction)
      if k > 0:
        self.edges.append((base + k - 1, base + k))
    return base, base + n - 1

  def connect(self, src: int, dst: int) -> None:
    self.edges.append((src, dst))


def _sample_segment(p0: np.ndarray, p1: np.ndarray,
                    spacing: float) -> Tuple[np.ndarray, np.ndarray]:
  """Evenly spaced points along a straight segment, including endpoints."""
  length = float(np.linalg.norm(p1 - p0))
  n = max(int(round(length / spacing)), 1) + 1
  t = np.linspace(0.0, 1.0, n)[:, None]
  pts = p0[None] * (1 - t) + p1[None] * t
  yaw = np.full(n, np.arctan2(*(p1 - p0)[::-1]))
  return pts, yaw


def _sample_bezier(p0: np.ndarray, c: np.ndarray, p1: np.ndarray,
                   spacing: float) -> Tuple[np.ndarray, np.ndarray]:
  """Quadratic bezier sampled ~uniformly in arc length, with tangents."""
  # Dense parameter sampling, then arc-length resample.
  t = np.linspace(0.0, 1.0, 64)[:, None]
  dense = ((1 - t)**2 * p0[None] + 2 * (1 - t) * t * c[None] + t**2 * p1[None])
  seglen = np.linalg.norm(np.diff(dense, axis=0), axis=1)
  arclen = np.concatenate([[0.0], np.cumsum(seglen)])
  total = arclen[-1]
  n = max(int(round(total / spacing)), 2) + 1
  targets = np.linspace(0.0, total, n)
  ts = np.interp(targets, arclen, t[:, 0])[:, None]
  pts = ((1 - ts)**2 * p0[None] + 2 * (1 - ts) * ts * c[None] +
         ts**2 * p1[None])
  tangents = (2 * (1 - ts) * (c[None] - p0[None]) + 2 * ts *
              (p1[None] - c[None]))
  yaw = np.arctan2(tangents[:, 1], tangents[:, 0])
  return pts, yaw


def build_grid_town(name: str, xs: Sequence[float],
                    ys: Sequence[float]) -> TownMap:
  """Builds a TownMap for a rectangular grid of two-lane streets.

  Vertical streets at ``xs`` (traffic along y), horizontal streets at ``ys``
  (traffic along x).  Every interior crossing is a 4-way junction; boundary
  crossings are T- or L-junctions.  Traffic lights at alternating interior
  junctions.
  """
  xs = np.asarray(sorted(xs), dtype=np.float64)
  ys = np.asarray(sorted(ys), dtype=np.float64)
  acc = _GraphAccumulator()

  # ---- 1. Lane segments between junctions ----------------------------
  # departures[(i, j, h)] -> first wp id of the segment leaving junction
  # (i, j) with heading h; approaches[(i, j, h)] -> last wp id of the
  # segment arriving at junction (i, j) with heading h.
  departures: Dict[Tuple[int, int, str], int] = {}
  approaches: Dict[Tuple[int, int, str], int] = {}
  segment_wps: List[Tuple[int, int]] = []  # (first, last) of non-junction

  def add_lane(p_start, p_end, road_id, lane_id, key_from, key_to):
    pts, yaw = _sample_segment(np.asarray(p_start), np.asarray(p_end),
                               WAYPOINT_SPACING)
    first, last = acc.add_polyline(pts, yaw, road_id, lane_id, False)
    departures[key_from] = first
    approaches[key_to] = last
    segment_wps.append((first, last))

  # Horizontal streets (road ids 0..len(ys)-1).
  for j, y0 in enumerate(ys):
    for i in range(len(xs) - 1):
      xa, xb = xs[i] + JUNCTION_HALF, xs[i + 1] - JUNCTION_HALF
      # Eastbound (+x) lane at y0 + LANE_OFFSET.
      add_lane((xa, y0 + LANE_OFFSET), (xb, y0 + LANE_OFFSET), j, 1,
               (i, j, "px"), (i + 1, j, "px"))
      # Westbound (-x) lane at y0 - LANE_OFFSET.
      add_lane((xb, y0 - LANE_OFFSET), (xa, y0 - LANE_OFFSET), j, -1,
               (i + 1, j, "mx"), (i, j, "mx"))

  # Vertical streets (road ids len(ys)..len(ys)+len(xs)-1).
  for i, x0 in enumerate(xs):
    road = len(ys) + i
    for j in range(len(ys) - 1):
      ya, yb = ys[j] + JUNCTION_HALF, ys[j + 1] - JUNCTION_HALF
      # +y lane at x0 - LANE_OFFSET (right of +y heading is -x).
      add_lane((x0 - LANE_OFFSET, ya), (x0 - LANE_OFFSET, yb), road, 1,
               (i, j, "py"), (i, j + 1, "py"))
      # -y lane at x0 + LANE_OFFSET.
      add_lane((x0 + LANE_OFFSET, yb), (x0 + LANE_OFFSET, ya), road, -1,
               (i, j + 1, "my"), (i, j, "my"))

  # ---- 2. Junction connectors ----------------------------------------
  junction_road_base = len(ys) + len(xs)
  tl_xy: List[np.ndarray] = []
  tl_group: List[int] = []
  tl_offset: List[float] = []
  # wp id -> tl id assignments, filled after we know approach segments.
  tl_approach: List[Tuple[int, int]] = []  # (approach_last_wp, tl_id)

  def _det_hash(*vals) -> float:
    """Deterministic [0,1) hash for per-junction variety."""
    h = hashlib.md5("_".join(map(str, vals)).encode()).digest()
    return int.from_bytes(h[:4], "little") / 2**32

  for i, x0 in enumerate(xs):
    for j, y0 in enumerate(ys):
      center = np.array([x0, y0])
      jid = i * len(ys) + j
      road_id = junction_road_base + jid
      incoming = [h for h in HEADINGS if (i, j, h) in approaches]
      outgoing = [h for h in HEADINGS if (i, j, h) in departures]
      is_4way = len(incoming) == 4 and len(outgoing) == 4

      for h_in in incoming:
        u_in = UNIT[h_in]
        p_in = center - JUNCTION_HALF * u_in + LANE_OFFSET * _right(u_in)
        src = approaches[(i, j, h_in)]
        for turn in ("straight", "right", "left"):
          h_out = _turn(h_in, turn)
          if h_out not in outgoing:
            continue
          u_out = UNIT[h_out]
          p_out = (center + JUNCTION_HALF * u_out +
                   LANE_OFFSET * _right(u_out))
          if turn == "straight":
            pts, yaw = _sample_segment(p_in, p_out, WAYPOINT_SPACING)
          else:
            # Control point: intersection of entry/exit tangent lines.
            ctrl = (p_in + u_in * abs(np.dot(p_out - p_in, u_in)))
            pts, yaw = _sample_bezier(p_in, ctrl, p_out, WAYPOINT_SPACING)
          # Interior points only: the approach's last wp and the departure's
          # first wp already exist, so a connector contributes pts[1:-1].
          interior_pts, interior_yaw = pts[1:-1], yaw[1:-1]
          dst = departures[(i, j, h_out)]
          if len(interior_pts) == 0:
            acc.connect(src, dst)
          else:
            first, last = acc.add_polyline(interior_pts, interior_yaw,
                                           road_id, 0, True)
            acc.connect(src, first)
            acc.connect(last, dst)

      # Traffic lights at every other interior 4-way junction.
      if is_4way and (i + j) % 2 == 0:
        offset = float(_det_hash(name, i, j) * 2 * (TL_GREEN + TL_YELLOW))
        for h_in in incoming:
          u_in = UNIT[h_in]
          # Light pole on the right side of the stop line.
          pole = (center - JUNCTION_HALF * u_in +
                  (LANE_OFFSET + LANE_WIDTH) * _right(u_in))
          tl_id = len(tl_xy)
          tl_xy.append(pole)
          tl_group.append(0 if h_in in ("px", "mx") else 1)
          tl_offset.append(offset)
          tl_approach.append((approaches[(i, j, h_in)], tl_id))

  # ---- 3. Finalise graph arrays ---------------------------------------
  W = len(acc.xy)
  wp_xy = np.asarray(acc.xy, dtype=np.float32)
  wp_yaw = np.asarray(acc.yaw, dtype=np.float32)
  wp_road_id = np.asarray(acc.road_id, dtype=np.int32)
  wp_lane_id = np.asarray(acc.lane_id, dtype=np.int32)
  wp_is_junction = np.asarray(acc.is_junction)

  wp_next = np.full((W, MAX_NEXT), -1, dtype=np.int32)
  wp_num_next = np.zeros(W, dtype=np.int32)
  for src, dst in acc.edges:
    k = wp_num_next[src]
    if k < MAX_NEXT:
      wp_next[src, k] = dst
      wp_num_next[src] = k + 1
  # Terminal waypoints (shouldn't exist in a closed grid) self-loop so that
  # in-graph gathers never read -1.
  terminal = wp_num_next == 0
  wp_next[terminal, 0] = np.nonzero(terminal)[0]
  wp_num_next[terminal] = 1
  # Pad unused successor slots with the primary successor (safe gathers).
  for k in range(1, MAX_NEXT):
    unset = wp_next[:, k] < 0
    wp_next[unset, k] = wp_next[unset, 0]

  wp_speed_limit = np.full(W, SPEED_LIMIT_MPS, dtype=np.float32)

  # Traffic light governance: the last ~5 m of each governed approach.
  wp_tl = np.full(W, -1, dtype=np.int32)
  governed_span = int(round(5.0 / WAYPOINT_SPACING)) + 1
  approach_first = {last: first for first, last in segment_wps}
  for last_wp, tl_id in tl_approach:
    first_wp = approach_first[last_wp]
    start = max(first_wp, last_wp - governed_span + 1)
    wp_tl[start:last_wp + 1] = tl_id

  # ---- 4. Spawn points -------------------------------------------------
  spawn: List[int] = []
  stride = int(round(SPAWN_SPACING / WAYPOINT_SPACING))
  margin = 3  # waypoints away from segment ends
  for first, last in segment_wps:
    ids = list(range(first + margin, last - margin + 1, stride))
    spawn.extend(ids)
  spawn_arr = np.asarray(spawn, dtype=np.int32)
  # Deterministic shuffle so benchmark (origin, destination) index pairs
  # land far apart, like CARLA's unordered spawn point list.
  rng = np.random.RandomState(
      int.from_bytes(hashlib.md5(name.encode()).digest()[:4], "little"))
  rng.shuffle(spawn_arr)

  # ---- 5. Rasters ------------------------------------------------------
  pad = 20.0
  x_min, x_max = xs[0] - pad, xs[-1] + pad
  y_min, y_max = ys[0] - pad, ys[-1] + pad
  H = int(round((x_max - x_min) * RASTER_PPM)) + 1
  Wd = int(round((y_max - y_min) * RASTER_PPM)) + 1
  gx = x_min + np.arange(H) / RASTER_PPM
  gy = y_min + np.arange(Wd) / RASTER_PPM
  GX, GY = np.meshgrid(gx, gy, indexing="ij")

  road = np.zeros((H, Wd), dtype=bool)
  lane = np.zeros((H, Wd), dtype=bool)
  near_road_dist = np.full((H, Wd), np.inf, dtype=np.float32)

  half_road = LANE_WIDTH  # two lanes -> road half-width.
  for y0 in ys:
    inside_x = (GX >= xs[0] - half_road) & (GX <= xs[-1] + half_road)
    d = np.abs(GY - y0)
    road |= (d <= half_road) & inside_x
    near_road_dist = np.where(inside_x, np.minimum(near_road_dist,
                                                   d - half_road),
                              near_road_dist)
    # Lane markings: center line + outer edges (not inside junctions).
    lane |= (((d <= 0.15) | (np.abs(d - half_road) <= 0.25)) & inside_x)
  for x0 in xs:
    inside_y = (GY >= ys[0] - half_road) & (GY <= ys[-1] + half_road)
    d = np.abs(GX - x0)
    road |= (d <= half_road) & inside_y
    near_road_dist = np.where(inside_y, np.minimum(near_road_dist,
                                                   d - half_road),
                              near_road_dist)
    lane |= (((d <= 0.15) | (np.abs(d - half_road) <= 0.25)) & inside_y)
  # No markings inside junction boxes.
  for x0 in xs:
    for y0 in ys:
      in_junction = ((np.abs(GX - x0) <= JUNCTION_HALF) &
                     (np.abs(GY - y0) <= JUNCTION_HALF))
      lane &= ~in_junction
  lane &= road

  obstacle = near_road_dist > SIDEWALK  # buildings beyond the sidewalk
  # Street-facing building walls: the only static surfaces a LIDAR sees
  # (interiors are occluded).  Used by the BEV splat; collisions use the
  # solid mask.
  wall = obstacle & (near_road_dist <= SIDEWALK + 1.5)

  # ---- 5b. Static geometry as rectangles (TPU hot path) -----------------
  # Per-pixel raster gathers are pathological on TPU (40k random 1-element
  # HBM loads per scene per step); the same geometry as a handful of
  # axis-aligned rectangles turns the BEV splat and static-collision tests
  # into pure elementwise box tests.  Rect format: (cx, cy, hx, hy).
  clear = half_road + SIDEWALK        # obstacle-free corridor half-width
  wall_thick = 1.5
  wall_rects: List[np.ndarray] = []
  for j, y0 in enumerate(ys):          # walls along horizontal streets
    for i in range(len(xs) - 1):
      xa, xb = xs[i] + clear, xs[i + 1] - clear
      if xb <= xa:
        continue
      cx, hx = (xa + xb) / 2, (xb - xa) / 2
      for side in (+1, -1):
        cy = y0 + side * (clear + wall_thick / 2)
        wall_rects.append(np.array([cx, cy, hx, wall_thick / 2]))
  for i, x0 in enumerate(xs):          # walls along vertical streets
    for j in range(len(ys) - 1):
      ya, yb = ys[j] + clear, ys[j + 1] - clear
      if yb <= ya:
        continue
      cy, hy = (ya + yb) / 2, (yb - ya) / 2
      for side in (+1, -1):
        cx = x0 + side * (clear + wall_thick / 2)
        wall_rects.append(np.array([cx, cy, wall_thick / 2, hy]))

  road_rects: List[np.ndarray] = []    # drivable street corridors
  for y0 in ys:
    road_rects.append(
        np.array([(xs[0] + xs[-1]) / 2, y0,
                  (xs[-1] - xs[0]) / 2 + half_road, half_road]))
  for x0 in xs:
    road_rects.append(
        np.array([x0, (ys[0] + ys[-1]) / 2, half_road,
                  (ys[-1] - ys[0]) / 2 + half_road]))

  block_rects: List[np.ndarray] = []   # solid obstacle regions
  xs_ext = np.concatenate([[xs[0] - 2 * pad - 100], xs,
                           [xs[-1] + 2 * pad + 100]])
  ys_ext = np.concatenate([[ys[0] - 2 * pad - 100], ys,
                           [ys[-1] + 2 * pad + 100]])
  for i in range(len(xs_ext) - 1):
    for j in range(len(ys_ext) - 1):
      xa, xb = xs_ext[i] + clear, xs_ext[i + 1] - clear
      ya, yb = ys_ext[j] + clear, ys_ext[j + 1] - clear
      if xb <= xa or yb <= ya:
        continue
      block_rects.append(
          np.array([(xa + xb) / 2, (ya + yb) / 2, (xb - xa) / 2,
                    (yb - ya) / 2]))

  # Nearest-waypoint raster (localisation gather).
  from scipy.spatial import cKDTree
  tree = cKDTree(wp_xy)
  cells = np.stack([GX.ravel(), GY.ravel()], axis=-1)
  _, idx = tree.query(cells, workers=1)
  nearest = idx.astype(np.int32).reshape(H, Wd)

  return TownMap(
      name=name,
      lane_width=LANE_WIDTH,
      wp_xy=wp_xy,
      wp_yaw=wp_yaw,
      wp_next=wp_next,
      wp_num_next=wp_num_next,
      wp_road_id=wp_road_id,
      wp_lane_id=wp_lane_id,
      wp_is_junction=wp_is_junction,
      wp_speed_limit=wp_speed_limit,
      wp_tl=wp_tl,
      spawn_wp=spawn_arr,
      tl_xy=(np.asarray(tl_xy, dtype=np.float32)
             if tl_xy else np.zeros((0, 2), dtype=np.float32)),
      tl_group=np.asarray(tl_group, dtype=np.int32),
      tl_offset=np.asarray(tl_offset, dtype=np.float32),
      raster_origin=np.array([x_min, y_min], dtype=np.float32),
      raster_ppm=RASTER_PPM,
      road_mask=road,
      lane_mask=lane,
      obstacle_mask=obstacle,
      wall_mask=wall,
      nearest_wp=nearest,
      wall_rects=np.asarray(wall_rects, dtype=np.float32),
      block_rects=np.asarray(block_rects, dtype=np.float32),
      road_rects=np.asarray(road_rects, dtype=np.float32),
  )
