"""The world step: one pure function, compiled once.

This subsumes the reference's entire hot loop — ``hero.apply_control`` +
``world.tick()`` + frame-synced sensor polling (/root/reference/oatomobile/
simulators/carla/simulator.py:1751-1782) — as

    world_step(params, state, action) -> state'

with no RPC, no queues and no Python in the loop.  Scan it over time, vmap
it over scenes, shard it over chips.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from oatomobile_tpu.maps import plan_route
from oatomobile_tpu.maps.assets import TownMap
from oatomobile_tpu.sim import dynamics, events, traffic
from oatomobile_tpu.sim.types import (PIDState, SceneState, VehicleSpec,
                                      WorldParams)

# Route progress search window: how many route points ahead are examined
# when updating progress each step (static for XLA).
ROUTE_WINDOW = 8
DEFAULT_ROUTE_CAPACITY = 2048


def make_params(town: TownMap,
                fps: int = 20,
                npc_target_speed: float = 30.0 / 3.6) -> WorldParams:
  """Builds device-side world parameters for a town."""
  return WorldParams(
      map=town.device_arrays(),
      vehicle=VehicleSpec(),
      dt=jnp.float32(1.0 / fps),
      npc_target_speed=jnp.float32(npc_target_speed),
      # 10 s green: swept 10/15/20 on the full BusyTown family (10
      # eps/task) -- 15 s lifted two saturated-corridor tasks in a
      # 2-task probe but cost the FAMILY 9 pp (74.5% -> 65.5%): heroes
      # caught at the longer reds time out more than the discharge
      # gain buys.  10 s is the measured optimum.
      tl_green=jnp.float32(10.0),
      tl_yellow=jnp.float32(3.0),
      proximity_vehicle_threshold=jnp.float32(10.0),
      proximity_tlight_threshold=jnp.float32(5.0),
      wall_budget=int(town.wall_budget),
      road_budget=int(town.road_budget),
  )


def nearest_waypoint_ongraph(params: WorldParams,
                             xy: jnp.ndarray) -> jnp.ndarray:
  """O(1) localisation: nearest waypoint id via the precomputed raster."""
  origin = params.map["raster_origin"]
  ppm = params.map["raster_ppm"]
  grid = params.map["nearest_wp"]
  H, W = grid.shape
  idx = jnp.round((xy - origin) * ppm).astype(jnp.int32)
  ix = jnp.clip(idx[..., 0], 0, H - 1)
  iy = jnp.clip(idx[..., 1], 0, W - 1)
  return grid[ix, iy]


def _advance_route(params: WorldParams, state: SceneState,
                   new_xy: jnp.ndarray) -> jnp.ndarray:
  """Monotonically advances route progress to the closest point within a
  fixed look-ahead window (replaces the reference's A* replans)."""
  offsets = jnp.arange(ROUTE_WINDOW)
  idx = jnp.clip(state.route_pos + offsets, 0, state.route_len - 1)
  pts = params.map["wp_xy"][state.route[idx]]
  d = jnp.linalg.norm(pts - new_xy[None, :], axis=-1)
  return jnp.clip(state.route_pos + jnp.argmin(d).astype(jnp.int32), 0,
                  state.route_len - 1)


def world_step(params: WorldParams, state: SceneState,
               action: jnp.ndarray) -> SceneState:
  """Advances one scene by one tick.

  Args:
    params: static world configuration.
    state: scene state.
    action: [3] (throttle, steer, brake), the CARLAEnv action space
      (/root/reference/oatomobile/envs/carla.py:96-118).
  """
  rng, rng_npc, rng_ped = jax.random.split(state.rng, 3)

  # --- Hero dynamics ----------------------------------------------------
  throttle, steer, brake = action[0], action[1], action[2]
  new_xy, new_yaw, new_speed = dynamics.bicycle_step(
      state.hero_xy, state.hero_yaw, state.hero_speed, throttle, steer,
      brake, params.vehicle, params.dt)

  # Derived measurements (CARLA get_velocity/get_acceleration observables).
  new_vel = (new_xy - state.hero_xy) / params.dt
  new_accel = (new_vel - state.hero_vel) / params.dt
  new_yaw_rate = (new_yaw - state.hero_yaw) / params.dt

  # --- Traffic ------------------------------------------------------------
  tl_states = traffic.traffic_light_states(params, state.time)
  state_mid = traffic.npc_step(params, state, tl_states, rng_npc)
  state_mid = traffic.pedestrian_step(params, state_mid, rng_ped)

  # --- Localisation + route progress --------------------------------------
  new_wp = nearest_waypoint_ongraph(params, new_xy)
  new_route_pos = _advance_route(params, state_mid, new_xy)

  # --- Events ---------------------------------------------------------------
  impulse = events.detect_collision(params, state_mid, new_xy, new_yaw,
                                    new_speed)
  invasion, off_lane = events.detect_lane_invasion(params, state_mid, new_xy,
                                                   new_wp)

  # Red-light invasion: entering the junction straight off a red-governed
  # approach (implements the sensor the reference stubbed out,
  # simulator.py:1409-1472).
  governed, tl_code = traffic.light_for_waypoint(params, new_wp, tl_states)
  at_red = governed & (tl_code == traffic.TL_RED)
  in_junction = params.map["wp_is_junction"][new_wp]
  ran_red = (state.at_red_prev & in_junction & ~governed).astype(jnp.int32)

  return state_mid.replace(
      hero_xy=new_xy,
      hero_yaw=new_yaw,
      hero_speed=new_speed,
      hero_vel=new_vel,
      hero_accel=new_accel,
      hero_yaw_rate=new_yaw_rate,
      hero_control=jnp.stack([throttle, steer, brake]),
      hero_wp=new_wp,
      route_pos=new_route_pos,
      time=state.time + params.dt,
      step=state.step + 1,
      collision=impulse,
      lane_invasion=invasion,
      off_lane_prev=off_lane,
      red_light_invasion=ran_red,
      at_red_prev=at_red,
      rng=rng,
  )


# ---------------------------------------------------------------------------
# Scene initialisation (host side, numpy; one-time per episode)
# ---------------------------------------------------------------------------


def init_scene(
    town: TownMap,
    *,
    spawn_point: Optional[int] = None,
    destination: Optional[int] = None,
    num_vehicles: int = 0,
    num_pedestrians: int = 0,
    route_capacity: int = DEFAULT_ROUTE_CAPACITY,
    rng: Optional[np.random.RandomState] = None,
    jax_seed: int = 0,
) -> SceneState:
  """Builds the initial `SceneState` for one scene (host-side numpy).

  Mirrors the reference reset: hero at a spawn point
  (utils/carla.py:458-512), destination for the nav task, ``num_vehicles``
  NPCs at random spawn points with autopilot, pedestrians on sidewalks.
  """
  rng = rng or np.random.RandomState(jax_seed)

  sp = int(rng.randint(town.num_spawn_points)
           if spawn_point is None else spawn_point)
  dp = int(rng.randint(town.num_spawn_points)
           if destination is None else destination)
  hero_loc, hero_rot = town.spawn_transform(sp)
  dest_loc, _ = town.spawn_transform(dp)

  route, route_len = plan_route(town, hero_loc[:2], dest_loc[:2],
                                route_capacity)

  # NPC spawn: random distinct spawn points, excluding the hero's.
  K = int(num_vehicles)
  npc_xy = np.zeros((K, 2), np.float32)
  npc_yaw = np.zeros((K,), np.float32)
  npc_wp = np.zeros((K,), np.int32)
  if K > 0:
    candidates = [
        i for i in range(town.num_spawn_points) if i != sp % town.num_spawn_points
    ]
    picks = rng.choice(candidates, size=min(K, len(candidates)),
                       replace=False)
    for k, pick in enumerate(picks):
      wp = int(town.spawn_wp[pick])
      npc_xy[k] = town.wp_xy[wp]
      npc_yaw[k] = town.wp_yaw[wp]
      npc_wp[k] = town.wp_next[wp, 0]
  npc_alive = np.arange(K) < (len(picks) if K > 0 else 0)

  # Pedestrians: on the sidewalk band (near roads, off the roadway).
  P = int(num_pedestrians)
  ped_xy = np.zeros((P, 2), np.float32)
  ped_yaw = np.zeros((P,), np.float32)
  if P > 0:
    # Rejection-sample raster cells that are neither road nor obstacle.
    free = np.nonzero(~town.road_mask & ~town.obstacle_mask)
    sel = rng.randint(len(free[0]), size=P)
    ped_xy[:, 0] = town.raster_origin[0] + free[0][sel] / town.raster_ppm
    ped_xy[:, 1] = town.raster_origin[1] + free[1][sel] / town.raster_ppm
    ped_yaw[:] = rng.uniform(-np.pi, np.pi, size=P)
  ped_alive = np.ones((P,), bool)

  hero_wp = int(town.spawn_wp[sp % town.num_spawn_points])

  return SceneState(
      hero_xy=jnp.asarray(hero_loc[:2]),
      hero_yaw=jnp.deg2rad(jnp.float32(hero_rot[1])),
      hero_speed=jnp.float32(0.0),
      hero_vel=jnp.zeros(2, jnp.float32),
      hero_accel=jnp.zeros(2, jnp.float32),
      hero_yaw_rate=jnp.float32(0.0),
      hero_control=jnp.zeros(3, jnp.float32),
      hero_wp=jnp.int32(hero_wp),
      route=jnp.asarray(route),
      route_len=jnp.int32(route_len),
      route_pos=jnp.int32(0),
      destination_xy=jnp.asarray(dest_loc[:2]),
      npc_xy=jnp.asarray(npc_xy),
      npc_yaw=jnp.asarray(npc_yaw),
      npc_speed=jnp.zeros((K,), jnp.float32),
      npc_wp=jnp.asarray(npc_wp),
      npc_alive=jnp.asarray(npc_alive),
      ped_xy=jnp.asarray(ped_xy),
      ped_yaw=jnp.asarray(ped_yaw),
      ped_alive=jnp.asarray(ped_alive),
      time=jnp.float32(0.0),
      step=jnp.int32(0),
      collision=jnp.float32(0.0),
      lane_invasion=jnp.int32(0),
      off_lane_prev=jnp.asarray(False),
      red_light_invasion=jnp.int32(0),
      at_red_prev=jnp.asarray(False),
      hero_wait=jnp.int32(0),
      npc_wait=jnp.zeros((K,), jnp.int32),
      npc_stall=jnp.zeros((K,), jnp.int32),
      pid_lat=PIDState.zero(),
      pid_lon=PIDState.zero(),
      rng=jax.random.PRNGKey(jax_seed),
  )


def init_scene_batch(
    town: TownMap,
    batch_size: int,
    *,
    num_vehicles=0,
    num_pedestrians=0,
    route_capacity: int = DEFAULT_ROUTE_CAPACITY,
    seed: int = 0,
    spawn_points: Optional[np.ndarray] = None,
    destinations: Optional[np.ndarray] = None,
) -> SceneState:
  """Vectorised initialisation of a whole scene batch.

  All routes are planned in one native BFS call
  (oatomobile_tpu/native/route_planner.cc); everything else is vectorised
  numpy — batch init is O(ms) even at 1024 scenes, so every scene gets a
  *unique* (origin, destination, traffic) draw.

  ``num_vehicles`` / ``num_pedestrians`` may be per-scene arrays [B]: actor
  arrays are padded to the batch max and alive-masked down per scene, so
  heterogeneous task configs (benchmark suites) keep their own traffic
  density inside one batch.
  """
  from oatomobile_tpu.maps.routing import plan_route_batch

  rng = np.random.RandomState(seed)
  B = int(batch_size)
  S = town.num_spawn_points

  nv = np.broadcast_to(np.asarray(num_vehicles, np.int32), (B,))
  npd = np.broadcast_to(np.asarray(num_pedestrians, np.int32), (B,))

  sp = (rng.randint(S, size=B) if spawn_points is None
        else np.asarray(spawn_points) % S)
  dp = (rng.randint(S, size=B) if destinations is None
        else np.asarray(destinations) % S)

  origin_wps = town.spawn_wp[sp]
  dest_wps = town.spawn_wp[dp]
  routes, lengths = plan_route_batch(town, origin_wps, dest_wps,
                                     route_capacity)

  hero_xy = town.wp_xy[origin_wps]
  hero_yaw = town.wp_yaw[origin_wps]
  dest_xy = town.wp_xy[dest_wps]

  # NPCs: per-scene distinct spawn indices, excluding the hero's.
  K = int(nv.max()) if B else 0
  npc_xy = np.zeros((B, K, 2), np.float32)
  npc_yaw = np.zeros((B, K), np.float32)
  npc_wp = np.zeros((B, K), np.int32)
  npc_alive = np.zeros((B, K), bool)
  if K > 0:
    # Exclude NPC-restricted roads (e.g. the Town03 hairpin pass) and the
    # hero's spawn from NPC placement.
    npc_ok_spawn = (town.wp_npc_ok[town.spawn_wp]
                    if town.wp_npc_ok is not None else np.ones(S, bool))
    scores = rng.rand(B, S) + np.where(npc_ok_spawn, 0.0, 10.0)[None, :]
    order = np.argsort(scores, axis=1)[:, :K + 1]
    keep = order != sp[:, None]
    picks = np.empty((B, K), dtype=np.int64)
    for b in range(B):  # tiny loop over B, vector ops inside
      picks[b] = order[b][keep[b]][:K]
    wp = town.spawn_wp[picks]
    npc_xy[:] = town.wp_xy[wp]
    npc_yaw[:] = town.wp_yaw[wp]
    npc_wp[:] = town.wp_next[wp, 0]
    # Alive-mask down to each scene's own vehicle count.
    npc_alive[:] = np.arange(K)[None, :] < nv[:, None]

  P = int(npd.max()) if B else 0
  ped_xy = np.zeros((B, P, 2), np.float32)
  ped_yaw = np.zeros((B, P), np.float32)
  ped_alive = np.zeros((B, P), bool)
  if P > 0:
    free = np.nonzero(~town.road_mask & ~town.obstacle_mask)
    sel = rng.randint(len(free[0]), size=(B, P))
    ped_xy[..., 0] = town.raster_origin[0] + free[0][sel] / town.raster_ppm
    ped_xy[..., 1] = town.raster_origin[1] + free[1][sel] / town.raster_ppm
    ped_yaw[:] = rng.uniform(-np.pi, np.pi, size=(B, P))
    ped_alive[:] = np.arange(P)[None, :] < npd[:, None]

  keys = jax.vmap(jax.random.PRNGKey)(
      jnp.arange(seed, seed + B, dtype=jnp.uint32))

  zeros_b = jnp.zeros((B,), jnp.float32)
  return SceneState(
      hero_xy=jnp.asarray(hero_xy),
      hero_yaw=jnp.asarray(hero_yaw),
      hero_speed=zeros_b,
      hero_vel=jnp.zeros((B, 2), jnp.float32),
      hero_accel=jnp.zeros((B, 2), jnp.float32),
      hero_yaw_rate=zeros_b,
      hero_control=jnp.zeros((B, 3), jnp.float32),
      hero_wp=jnp.asarray(origin_wps, jnp.int32),
      route=jnp.asarray(routes),
      route_len=jnp.asarray(lengths, jnp.int32),
      route_pos=jnp.zeros((B,), jnp.int32),
      destination_xy=jnp.asarray(dest_xy),
      npc_xy=jnp.asarray(npc_xy),
      npc_yaw=jnp.asarray(npc_yaw),
      npc_speed=jnp.zeros((B, K), jnp.float32),
      npc_wp=jnp.asarray(npc_wp),
      npc_alive=jnp.asarray(npc_alive),
      ped_xy=jnp.asarray(ped_xy),
      ped_yaw=jnp.asarray(ped_yaw),
      ped_alive=jnp.asarray(ped_alive),
      time=zeros_b,
      step=jnp.zeros((B,), jnp.int32),
      collision=zeros_b,
      lane_invasion=jnp.zeros((B,), jnp.int32),
      off_lane_prev=jnp.zeros((B,), bool),
      red_light_invasion=jnp.zeros((B,), jnp.int32),
      at_red_prev=jnp.zeros((B,), bool),
      hero_wait=jnp.zeros((B,), jnp.int32),
      npc_wait=jnp.zeros((B, K), jnp.int32),
      npc_stall=jnp.zeros((B, K), jnp.int32),
      pid_lat=PIDState.zero_batch(B),
      pid_lon=PIDState.zero_batch(B),
      rng=keys,
  )


def stack_scenes(scenes) -> SceneState:
  """Stacks per-scene states into a batched SceneState (leading axis)."""
  return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *scenes)


@functools.partial(jax.jit, static_argnames=())
def batched_world_step(params: WorldParams, states: SceneState,
                       actions: jnp.ndarray) -> SceneState:
  """vmap of `world_step` over the scene axis (shared params)."""
  return jax.vmap(world_step, in_axes=(None, 0, 0))(params, states, actions)


def rollout(params: WorldParams, state: SceneState, actions: jnp.ndarray,
            policy=None) -> Tuple[SceneState, SceneState]:
  """`lax.scan` of the step over time.

  Args:
    actions: [T, ...] open-loop actions, or None with a `policy` closure
      `(params, state) -> action` for closed-loop rollouts.

  Returns:
    (final_state, stacked per-step states).
  """

  def body(carry, action_t):
    if policy is not None:
      action_t, carry = policy(params, carry)
    new_state = world_step(params, carry, action_t)
    return new_state, new_state

  return jax.lax.scan(body, state, actions)
