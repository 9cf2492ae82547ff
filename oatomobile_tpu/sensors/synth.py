"""On-device observation synthesis.

Every sensor of the reference's zoo (/root/reference/oatomobile/simulators/
carla/simulator.py:441-1592) becomes a pure function of ``(params, state)``
here — no server round-trips, no queues, no frame matching.  The dict
returned by :func:`synthesize` mirrors the reference observation keys and
shapes exactly (see each function's citation).
"""

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from oatomobile_tpu.ops import bev
from oatomobile_tpu.sensors import cameras
from oatomobile_tpu.sim import traffic
from oatomobile_tpu.sim.types import SceneState, WorldParams

# Observation keys synthesised on device (order-independent).
STATE_SENSORS = (
    "control",
    "location",
    "rotation",
    "velocity",
    "acceleration",
    "orientation",
    "angular_velocity",
    "speed_limit",
    "is_at_traffic_light",
    "traffic_light_state",
    "collision",
    "lane_invasion",
    "goal",
)

NUM_GOALS = 10          # defaults.py:139 GOAL_SENSOR_CONFIG["num_goals"]
GOAL_SPACING_M = 2.0    # defaults.py:140 sampling_radius


def hero_yaw_deg(state: SceneState) -> jnp.ndarray:
  return jnp.rad2deg(state.hero_yaw)


def location(state: SceneState) -> jnp.ndarray:
  """[3] world location (z = 0 plane).  simulator.py:495-546."""
  return jnp.concatenate([state.hero_xy, jnp.zeros(1)])


def rotation(state: SceneState) -> jnp.ndarray:
  """[3] (pitch, yaw, roll) in degrees.  simulator.py:549-600."""
  return jnp.stack(
      [jnp.float32(0.0), hero_yaw_deg(state), jnp.float32(0.0)])


def velocity(state: SceneState) -> jnp.ndarray:
  """[3] world-frame velocity m/s.  simulator.py:603-654."""
  return jnp.concatenate([state.hero_vel, jnp.zeros(1)])


def acceleration(state: SceneState) -> jnp.ndarray:
  """[3] world-frame acceleration m/s^2.  simulator.py:657-708."""
  return jnp.concatenate([state.hero_accel, jnp.zeros(1)])


def orientation(state: SceneState) -> jnp.ndarray:
  """[3] forward unit vector.  simulator.py:711-762."""
  return jnp.stack([
      jnp.cos(state.hero_yaw),
      jnp.sin(state.hero_yaw),
      jnp.float32(0.0)
  ])


def angular_velocity(state: SceneState) -> jnp.ndarray:
  """[3] angular velocity, deg/s about z (CARLA convention).
  simulator.py:765-816."""
  return jnp.stack([
      jnp.float32(0.0),
      jnp.float32(0.0),
      jnp.rad2deg(state.hero_yaw_rate)
  ])


def speed_limit(params: WorldParams, state: SceneState) -> jnp.ndarray:
  """[] speed limit in km/h.  simulator.py:819-873."""
  return params.map["wp_speed_limit"][state.hero_wp] * 3.6


def traffic_light_observables(params: WorldParams, state: SceneState):
  """(is_at_traffic_light [], traffic_light_state []) int32.
  simulator.py:876-971; state codes follow carla.TrafficLightState."""
  tl_states = traffic.traffic_light_states(params, state.time)
  governed, tl_state = traffic.light_for_waypoint(params, state.hero_wp,
                                                  tl_states)
  return governed.astype(jnp.int32), tl_state.astype(jnp.int32)


def goal(params: WorldParams, state: SceneState) -> jnp.ndarray:
  """[NUM_GOALS, 3] next route waypoints in ego frame.

  The reference GoalSensor re-runs A* every 5 steps and walks 10 waypoints
  at 2 m spacing (simulator.py:1275-1315).  Route hops here are already
  ~2 m, so the goals are the next 10 route entries, transformed to ego
  coordinates every step (fresher than the reference's cached plan).
  """
  offsets = jnp.arange(NUM_GOALS)
  idx = jnp.clip(state.route_pos + offsets, 0, state.route_len - 1)
  pts = params.map["wp_xy"][state.route[idx]]
  rel = pts - state.hero_xy[None, :]
  cos_y, sin_y = jnp.cos(state.hero_yaw), jnp.sin(state.hero_yaw)
  x = cos_y * rel[:, 0] + sin_y * rel[:, 1]
  y = -sin_y * rel[:, 0] + cos_y * rel[:, 1]
  return jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)


def lidar(params: WorldParams, state: SceneState) -> jnp.ndarray:
  """[200, 200, 2] BEV LIDAR splat (see ops/bev.py)."""
  return bev.splat_lidar(params, state)


def synthesize(params: WorldParams,
               state: SceneState,
               keys: Sequence[str] = STATE_SENSORS) -> Dict[str, jnp.ndarray]:
  """Synthesises the observation dict for the requested sensor keys."""
  out: Dict[str, jnp.ndarray] = {}
  for key in keys:
    if key == "control":
      out[key] = state.hero_control
    elif key == "location":
      out[key] = location(state)
    elif key == "rotation":
      out[key] = rotation(state)
    elif key == "velocity":
      out[key] = velocity(state)
    elif key == "acceleration":
      out[key] = acceleration(state)
    elif key == "orientation":
      out[key] = orientation(state)
    elif key == "angular_velocity":
      out[key] = angular_velocity(state)
    elif key == "speed_limit":
      out[key] = speed_limit(params, state)
    elif key == "is_at_traffic_light":
      out[key] = traffic_light_observables(params, state)[0]
    elif key == "traffic_light_state":
      out[key] = traffic_light_observables(params, state)[1]
    elif key == "collision":
      out[key] = state.collision
    elif key == "lane_invasion":
      out[key] = state.lane_invasion
    elif key == "red_light_invasion":
      out[key] = state.red_light_invasion
    elif key == "goal":
      out[key] = goal(params, state)
    elif key == "lidar":
      out[key] = lidar(params, state)
    elif key == "actors_tracker":
      out[key] = actors_tracker(state)
    elif key == "bird_view_camera_rgb":
      out[key] = bird_view_rgb(params, state)
    elif key == "bird_view_camera_cityscapes":
      out[key] = bird_view_cityscapes(params, state)
    elif key == "game_state":
      out[key] = game_state(params, state)
    elif key in ("front_camera_rgb", "rear_camera_rgb", "left_camera_rgb",
                 "right_camera_rgb"):
      offset = {"front_camera_rgb": 0.0, "rear_camera_rgb": 180.0,
                "left_camera_rgb": 270.0, "right_camera_rgb": 90.0}[key]
      out[key] = cameras.camera_rgb(params, state, offset)
    else:
      raise KeyError("Unknown on-device sensor {!r}".format(key))
  return out


def actors_tracker(state: SceneState) -> jnp.ndarray:
  """[K+P, 4] (x, y, z, alive) poses of all non-hero actors.

  The reference returns a dict keyed by actor id (simulator.py:1142-1213);
  a fixed-capacity array with an alive column is the XLA-native encoding.
  """
  rows = []
  if state.num_npcs > 0:
    rows.append(
        jnp.concatenate([
            state.npc_xy,
            jnp.zeros((state.num_npcs, 1)),
            state.npc_alive[:, None].astype(jnp.float32)
        ], axis=-1))
  if state.num_pedestrians > 0:
    rows.append(
        jnp.concatenate([
            state.ped_xy,
            jnp.zeros((state.num_pedestrians, 1)),
            state.ped_alive[:, None].astype(jnp.float32)
        ], axis=-1))
  if not rows:
    return jnp.zeros((0, 4), jnp.float32)
  return jnp.concatenate(rows, axis=0)


# --- Bird-view cameras ------------------------------------------------------
# CityScapes palette entries used by CARLA semantic segmentation (the
# reference decodes them at utils/carla.py:147-162):
_CS_ROAD = np.asarray([128, 64, 128], np.float32) / 255.0
_CS_ROADLINE = np.asarray([157, 234, 50], np.float32) / 255.0
_CS_BUILDING = np.asarray([70, 70, 70], np.float32) / 255.0
_CS_VEHICLE = np.asarray([0, 0, 142], np.float32) / 255.0
_CS_PEDESTRIAN = np.asarray([220, 20, 60], np.float32) / 255.0
_CS_GROUND = np.asarray([81, 0, 81], np.float32) / 255.0

_RGB_ROAD = np.asarray([60, 60, 60], np.float32) / 255.0
_RGB_LINE = np.asarray([200, 200, 200], np.float32) / 255.0
_RGB_BUILDING = np.asarray([120, 100, 90], np.float32) / 255.0
_RGB_VEHICLE = np.asarray([30, 60, 140], np.float32) / 255.0
_RGB_PED = np.asarray([200, 60, 60], np.float32) / 255.0
_RGB_GROUND = np.asarray([90, 120, 80], np.float32) / 255.0
_RGB_HERO = np.asarray([200, 30, 30], np.float32) / 255.0

BIRD_VIEW_SIZE = 200      # defaults.py:97-101 (200x200, z=25 camera)
BIRD_VIEW_METERS = 25.0   # ~half-width covered at fov 90, z=25


def _bird_view_classes(params: WorldParams, state: SceneState) -> jnp.ndarray:
  """[200, 200] int class image around the hero (axis conventions as
  lidar): 0 ground, 1 road, 2 roadline, 3 building, 4 vehicle, 5 ped,
  6 hero."""
  size = BIRD_VIEW_SIZE
  half = BIRD_VIEW_METERS
  c = jnp.linspace(-half + half / size, half - half / size, size)
  lx = c[:, None] * jnp.ones((1, size))
  ly = c[None, :] * jnp.ones((size, 1))
  cos_y, sin_y = jnp.cos(state.hero_yaw), jnp.sin(state.hero_yaw)
  wx = state.hero_xy[0] + cos_y * lx - sin_y * ly
  wy = state.hero_xy[1] + sin_y * lx + cos_y * ly

  origin = params.map["raster_origin"]
  ppm = params.map["raster_ppm"]
  H, W = params.map["road_mask"].shape
  ix = jnp.clip(jnp.round((wx - origin[0]) * ppm).astype(jnp.int32), 0, H - 1)
  iy = jnp.clip(jnp.round((wy - origin[1]) * ppm).astype(jnp.int32), 0, W - 1)
  road = params.map["road_mask"][ix, iy]
  line = params.map["lane_mask"][ix, iy]
  building = params.map["obstacle_mask"][ix, iy]

  cls = jnp.zeros((size, size), jnp.int32)
  cls = jnp.where(road, 1, cls)
  cls = jnp.where(line, 2, cls)
  cls = jnp.where(building, 3, cls)

  def boxes_cls(xy, yaw, alive, half_lw, code, cls):
    rel = xy - state.hero_xy[None, :]
    u = cos_y * rel[:, 0] + sin_y * rel[:, 1]
    v = -sin_y * rel[:, 0] + cos_y * rel[:, 1]
    du = lx[:, :, None] - u[None, None, :]
    dv = ly[:, :, None] - v[None, None, :]
    yr = yaw - state.hero_yaw
    cr, sr = jnp.cos(yr), jnp.sin(yr)
    bu = cr * du + sr * dv
    bv = -sr * du + cr * dv
    inside = ((jnp.abs(bu) <= half_lw[:, 0]) & (jnp.abs(bv) <= half_lw[:, 1])
              & alive[None, None, :])
    return jnp.where(jnp.any(inside, -1), code, cls)

  if state.num_npcs > 0:
    half_lw = jnp.stack([
        jnp.full((state.num_npcs,), params.vehicle.length / 2),
        jnp.full((state.num_npcs,), params.vehicle.width / 2)
    ], -1)
    cls = boxes_cls(state.npc_xy, state.npc_yaw, state.npc_alive, half_lw, 4,
                    cls)
  if state.num_pedestrians > 0:
    half_lw = jnp.full((state.num_pedestrians, 2), 0.35)
    cls = boxes_cls(state.ped_xy, state.ped_yaw, state.ped_alive, half_lw, 5,
                    cls)

  # Hero box at the center.
  hero_inside = ((jnp.abs(lx) <= params.vehicle.length / 2) &
                 (jnp.abs(ly) <= params.vehicle.width / 2))
  cls = jnp.where(hero_inside, 6, cls)
  return cls


def bird_view_cityscapes(params: WorldParams,
                         state: SceneState) -> jnp.ndarray:
  """[200, 200, 3] float RGB, CityScapes palette (reference sensor
  'bird_view_camera_cityscapes', simulator.py:321-343)."""
  cls = _bird_view_classes(params, state)
  palette = jnp.stack([
      _CS_GROUND, _CS_ROAD, _CS_ROADLINE, _CS_BUILDING, _CS_VEHICLE,
      _CS_PEDESTRIAN, _CS_VEHICLE
  ])
  return palette[cls]


def bird_view_rgb(params: WorldParams, state: SceneState) -> jnp.ndarray:
  """[200, 200, 3] float RGB pseudo-render ('bird_view_camera_rgb',
  simulator.py:299-318)."""
  cls = _bird_view_classes(params, state)
  palette = jnp.stack([
      _RGB_GROUND, _RGB_ROAD, _RGB_LINE, _RGB_BUILDING, _RGB_VEHICLE,
      _RGB_PED, _RGB_HERO
  ])
  return palette[cls]


GAME_STATE_SIZE = 320        # hero-centric window (64 m at 5 px/m)
GAME_STATE_PPM = 5.0         # defaults GAME_STATE_CONFIG pixels_per_meter


def game_state(params: WorldParams, state: SceneState) -> jnp.ndarray:
  """[320, 320, 8] binary masks: road, lane boundaries, vehicles,
  pedestrians, green/yellow/red lights, hero.

  Parity: GameStateSensor (simulator.py:1475-1592).  Deliberate deviation:
  the reference rasterises the *entire town* through pygame every step
  (thousands of pixels per side); this synthesises a hero-centric 64 m
  window — the only part any consumer ever crops — axis-aligned to the
  world (like the reference's full-map masks).
  """
  from oatomobile_tpu.sim import traffic as traffic_mod

  size = GAME_STATE_SIZE
  half = size / (2.0 * GAME_STATE_PPM)
  c = jnp.linspace(-half + half / size, half - half / size, size)
  wx = state.hero_xy[0] + c[:, None] * jnp.ones((1, size))
  wy = state.hero_xy[1] + c[None, :] * jnp.ones((size, 1))

  origin = params.map["raster_origin"]
  ppm = params.map["raster_ppm"]
  H, W = params.map["road_mask"].shape
  ix = jnp.clip(jnp.round((wx - origin[0]) * ppm).astype(jnp.int32), 0, H - 1)
  iy = jnp.clip(jnp.round((wy - origin[1]) * ppm).astype(jnp.int32), 0, W - 1)
  road = params.map["road_mask"][ix, iy]
  lanes = params.map["lane_mask"][ix, iy]

  def boxes_mask(xy, yaw, alive, half_lw):
    rel_u = wx[:, :, None] - xy[None, None, :, 0]
    rel_v = wy[:, :, None] - xy[None, None, :, 1]
    cr, sr = jnp.cos(yaw), jnp.sin(yaw)
    bu = cr * rel_u + sr * rel_v
    bv = -sr * rel_u + cr * rel_v
    inside = ((jnp.abs(bu) <= half_lw[:, 0]) &
              (jnp.abs(bv) <= half_lw[:, 1]) & alive[None, None, :])
    return jnp.any(inside, axis=-1)

  zeros = jnp.zeros((size, size), bool)
  vehicles = zeros
  if state.num_npcs > 0:
    half_lw = jnp.stack([
        jnp.full((state.num_npcs,), params.vehicle.length / 2),
        jnp.full((state.num_npcs,), params.vehicle.width / 2)
    ], -1)
    vehicles = boxes_mask(state.npc_xy, state.npc_yaw, state.npc_alive,
                          half_lw)
  pedestrians = zeros
  if state.num_pedestrians > 0:
    half_lw = jnp.full((state.num_pedestrians, 2), 0.35)
    pedestrians = boxes_mask(state.ped_xy, state.ped_yaw, state.ped_alive,
                             half_lw)

  # Traffic lights as 2x2 m splats, split by current phase.
  tl_xy = params.map["tl_xy"]
  green = yellow = red = zeros
  if tl_xy.shape[0] > 0:
    tl_states = traffic_mod.traffic_light_states(params, state.time)
    du = jnp.abs(wx[:, :, None] - tl_xy[None, None, :, 0])
    dv = jnp.abs(wy[:, :, None] - tl_xy[None, None, :, 1])
    near = (du <= 1.0) & (dv <= 1.0)
    green = jnp.any(near & (tl_states == traffic_mod.TL_GREEN), axis=-1)
    yellow = jnp.any(near & (tl_states == traffic_mod.TL_YELLOW_STATE),
                     axis=-1)
    red = jnp.any(near & (tl_states == traffic_mod.TL_RED), axis=-1)

  # Hero box (oriented).
  rel_u = wx - state.hero_xy[0]
  rel_v = wy - state.hero_xy[1]
  cr, sr = jnp.cos(state.hero_yaw), jnp.sin(state.hero_yaw)
  hu = cr * rel_u + sr * rel_v
  hv = -sr * rel_u + cr * rel_v
  hero = ((jnp.abs(hu) <= params.vehicle.length / 2) &
          (jnp.abs(hv) <= params.vehicle.width / 2))

  return jnp.stack(
      [road, lanes, vehicles, pedestrians, green, yellow, red, hero],
      axis=-1).astype(jnp.int32)


def full_town_game_state(params: WorldParams,
                         state: SceneState) -> jnp.ndarray:
  """[H, W, 8] binary masks over the ENTIRE town raster grid.

  Full parity with the reference GameStateSensor, which rasterises the
  whole town per step (simulator.py:1475-1592 via graphics.py:941-1062):
  channels road, lane boundaries, vehicles, pedestrians, green/yellow/
  red lights, hero, on the town's static raster grid
  (params.map["road_mask"] resolution, raster_ppm px/m).

  This is the parity-complete variant of :func:`game_state` (which
  serves the hot path with a hero-centric 64 m window — the only region
  any in-repo consumer ever crops).  Whole-town rasters are ~2k px per
  side; synthesise on demand, not per step per scene.
  """
  from oatomobile_tpu.sim import traffic as traffic_mod

  road = params.map["road_mask"]
  lanes = params.map["lane_mask"]
  H, W = road.shape
  origin = params.map["raster_origin"]
  ppm = params.map["raster_ppm"]
  wx = origin[0] + jnp.arange(H, dtype=jnp.float32)[:, None] / ppm \
      * jnp.ones((1, W))
  wy = origin[1] + jnp.arange(W, dtype=jnp.float32)[None, :] / ppm \
      * jnp.ones((H, 1))

  def boxes_mask(xy, yaw, alive, half_lw):
    rel_u = wx[:, :, None] - xy[None, None, :, 0]
    rel_v = wy[:, :, None] - xy[None, None, :, 1]
    cr, sr = jnp.cos(yaw), jnp.sin(yaw)
    bu = cr * rel_u + sr * rel_v
    bv = -sr * rel_u + cr * rel_v
    inside = ((jnp.abs(bu) <= half_lw[:, 0]) &
              (jnp.abs(bv) <= half_lw[:, 1]) & alive[None, None, :])
    return jnp.any(inside, axis=-1)

  zeros = jnp.zeros((H, W), bool)
  vehicles = zeros
  if state.num_npcs > 0:
    half_lw = jnp.stack([
        jnp.full((state.num_npcs,), params.vehicle.length / 2),
        jnp.full((state.num_npcs,), params.vehicle.width / 2)
    ], -1)
    vehicles = boxes_mask(state.npc_xy, state.npc_yaw, state.npc_alive,
                          half_lw)
  pedestrians = zeros
  if state.num_pedestrians > 0:
    half_lw = jnp.full((state.num_pedestrians, 2), 0.35)
    pedestrians = boxes_mask(state.ped_xy, state.ped_yaw, state.ped_alive,
                             half_lw)

  tl_xy = params.map["tl_xy"]
  green = yellow = red = zeros
  if tl_xy.shape[0] > 0:
    tl_states = traffic_mod.traffic_light_states(params, state.time)
    du = jnp.abs(wx[:, :, None] - tl_xy[None, None, :, 0])
    dv = jnp.abs(wy[:, :, None] - tl_xy[None, None, :, 1])
    near = (du <= 1.0) & (dv <= 1.0)
    green = jnp.any(near & (tl_states == traffic_mod.TL_GREEN), axis=-1)
    yellow = jnp.any(near & (tl_states == traffic_mod.TL_YELLOW_STATE),
                     axis=-1)
    red = jnp.any(near & (tl_states == traffic_mod.TL_RED), axis=-1)

  rel_u = wx - state.hero_xy[0]
  rel_v = wy - state.hero_xy[1]
  cr, sr = jnp.cos(state.hero_yaw), jnp.sin(state.hero_yaw)
  hu = cr * rel_u + sr * rel_v
  hv = -sr * rel_u + cr * rel_v
  hero = ((jnp.abs(hu) <= params.vehicle.length / 2) &
          (jnp.abs(hv) <= params.vehicle.width / 2))

  return jnp.stack(
      [road, lanes, vehicles, pedestrians, green, yellow, red, hero],
      axis=-1).astype(jnp.int32)
