"""Traffic: signal phases, background-vehicle policy, pedestrians.

Replaces CARLA's server-side traffic manager (``actor.set_autopilot(True)``
at /root/reference/oatomobile/utils/carla.py:293) and walker AI with fully
vectorised in-graph policies: every NPC follows the lane-waypoint graph with
pure-pursuit steering, proportional speed control, car-following and
red-light compliance — all as gathers + elementwise math over the fixed
capacity ``[K]`` axis.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from oatomobile_tpu.sim.types import SceneState, WorldParams
from oatomobile_tpu.sim import dynamics

# CARLA TrafficLightState integer codes (observable via the reference's
# `traffic_light_state` sensor, simulator.py:925-971):
TL_RED, TL_YELLOW_STATE, TL_GREEN, TL_OFF, TL_UNKNOWN = 0, 1, 2, 3, 4


def traffic_light_states(params: WorldParams,
                         time: jnp.ndarray) -> jnp.ndarray:
  """Returns the CARLA-coded state of every light at ``time``: [L] i32.

  Two phase groups alternate: group 0 runs green->yellow while group 1 is
  red, then they swap.  Per-junction offsets stagger the cycles.
  """
  g, y = params.tl_green, params.tl_yellow
  half = g + y
  cycle = 2.0 * half
  tl_offset = params.map["tl_offset"]
  tl_group = params.map["tl_group"]
  phase = jnp.mod(time + tl_offset + tl_group.astype(jnp.float32) * half,
                  cycle)
  return jnp.where(phase < g, TL_GREEN,
                   jnp.where(phase < half, TL_YELLOW_STATE, TL_RED))


def light_for_waypoint(params: WorldParams, wp: jnp.ndarray,
                       tl_states: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                        jnp.ndarray]:
  """(is_governed, state) for the light governing waypoint ``wp``.

  State is TL_UNKNOWN where no light governs the waypoint.
  """
  tl_id = params.map["wp_tl"][wp]
  governed = tl_id >= 0
  num_lights = tl_states.shape[0]
  if num_lights == 0:
    return jnp.zeros_like(governed), jnp.full_like(tl_id, TL_UNKNOWN)
  state = tl_states[jnp.clip(tl_id, 0, num_lights - 1)]
  return governed, jnp.where(governed, state, TL_UNKNOWN)


def _advance_waypoint(params: WorldParams, xy: jnp.ndarray, wp: jnp.ndarray,
                      u: jnp.ndarray) -> jnp.ndarray:
  """Advances an NPC's target waypoint once it is reached; ``u`` in [0,1)
  picks among junction successors (random turn choice)."""
  wp_xy = params.map["wp_xy"][wp]
  reached = jnp.linalg.norm(wp_xy - xy, axis=-1) < 3.0
  num_next = params.map["wp_num_next"][wp]
  pick = jnp.minimum((u * num_next.astype(jnp.float32)).astype(jnp.int32),
                     num_next - 1)
  nxt = jnp.take_along_axis(params.map["wp_next"][wp], pick[..., None],
                            axis=-1)[..., 0]
  return jnp.where(reached, nxt, wp)


def npc_step(params: WorldParams, state: SceneState,
             tl_states: jnp.ndarray, rng: jnp.ndarray) -> SceneState:
  """Advances all background vehicles one tick."""
  K = state.num_npcs
  if K == 0:
    return state
  xy, yaw, speed = state.npc_xy, state.npc_yaw, state.npc_speed
  alive = state.npc_alive

  # 1. Waypoint target management (random turns at junctions).
  u = jax.random.uniform(rng, (K,))
  wp = _advance_waypoint(params, xy, state.npc_wp, u)
  target = params.map["wp_xy"][wp]

  # 2. Pure-pursuit steering towards the target waypoint.
  to_t = target - xy
  desired = jnp.arctan2(to_t[..., 1], to_t[..., 0])
  err = jnp.arctan2(jnp.sin(desired - yaw), jnp.cos(desired - yaw))
  steer = jnp.clip(1.5 * err, -1.0, 1.0)

  # 3. Speed: limit, curvature slowdown, car-following, red lights, hero.
  # Heterogeneous drivers: each NPC slot gets a fixed speed factor in
  # [0.75, 1.25] (deterministic golden-ratio stride — no extra state), so
  # traffic is a mix of slow and pushy vehicles instead of a uniform
  # platoon (the reference's CARLA traffic manager randomises per-vehicle
  # target speeds server-side).
  factor = 0.75 + 0.5 * jnp.mod(jnp.arange(K, dtype=jnp.float32) * 0.618034,
                                1.0)
  target_speed = jnp.minimum(params.npc_target_speed * factor,
                             params.map["wp_speed_limit"][wp])
  target_speed = target_speed * jnp.clip(1.0 - jnp.abs(err), 0.3, 1.0)

  # Car-following + intercept prediction: stop for any alive vehicle (or
  # the hero) that is in a lane-wide forward corridor NOW or will be in
  # ~1 s under constant velocity (catches crossing traffic at junctions,
  # which a position-only check sees too late).  All-pairs, NPC frame.
  other_xy = jnp.concatenate([xy, state.hero_xy[None]], axis=0)  # [K+1, 2]
  heading = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
  other_vel = jnp.concatenate([
      speed[:, None] * heading,
      state.hero_vel[None, :] if state.hero_vel.ndim == 1 else
      state.hero_vel[None],
  ], axis=0)
  self_vel = speed[:, None] * heading
  rel = other_xy[None, :, :] - xy[:, None, :]                    # [K, K+1, 2]
  rel_vel = other_vel[None, :, :] - self_vel[:, None, :]
  cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)
  other_alive = jnp.concatenate([alive, jnp.ones((1,), bool)], axis=0)
  not_self = ~jnp.eye(K, K + 1, dtype=bool)

  def in_corridor(r):
    fwd = cos_y[:, None] * r[..., 0] + sin_y[:, None] * r[..., 1]
    lat = -sin_y[:, None] * r[..., 0] + cos_y[:, None] * r[..., 1]
    return ((fwd > 0.5) & (fwd < params.proximity_vehicle_threshold) &
            (jnp.abs(lat) < 2.0))

  blocked_by = (in_corridor(rel) | in_corridor(rel + rel_vel * 1.0))
  blocked = jnp.any(blocked_by & other_alive[None, :] & not_self, axis=-1)

  governed, tl_state = light_for_waypoint(params, wp, tl_states)
  red = governed & (tl_state != TL_GREEN)

  target_speed = jnp.where(blocked | red, 0.0, target_speed)

  # 4. Proportional accel -> pseudo throttle/brake -> bicycle step.
  accel_cmd = jnp.clip(1.2 * (target_speed - speed), -params.vehicle.max_brake,
                       params.vehicle.max_accel)
  throttle = jnp.clip(accel_cmd / params.vehicle.max_accel, 0.0, 1.0)
  brake = jnp.clip(-accel_cmd / params.vehicle.max_brake, 0.0, 1.0)
  new_xy, new_yaw, new_speed = dynamics.bicycle_step(
      xy, yaw, speed, throttle, steer, brake, params.vehicle, params.dt)

  # Dead NPCs stay frozen.
  new_xy = jnp.where(alive[:, None], new_xy, xy)
  new_yaw = jnp.where(alive, new_yaw, yaw)
  new_speed = jnp.where(alive, new_speed, 0.0)
  return state.replace(npc_xy=new_xy, npc_yaw=new_yaw, npc_speed=new_speed,
                       npc_wp=wp)


def pedestrian_step(params: WorldParams, state: SceneState,
                    rng: jnp.ndarray) -> SceneState:
  """Random-walk pedestrians constrained near the sidewalk band."""
  P = state.num_pedestrians
  if P == 0:
    return state
  speed = 1.4  # m/s walking speed
  turn = jax.random.normal(rng, (P,)) * 0.3
  new_yaw = state.ped_yaw + turn
  heading = jnp.stack([jnp.cos(new_yaw), jnp.sin(new_yaw)], axis=-1)
  cand = state.ped_xy + params.dt * speed * heading
  # Reject moves into buildings: sample the obstacle raster and bounce.
  origin = params.map["raster_origin"]
  ppm = params.map["raster_ppm"]
  H, W = params.map["obstacle_mask"].shape
  idx = jnp.round((cand - origin) * ppm).astype(jnp.int32)
  ix = jnp.clip(idx[..., 0], 0, H - 1)
  iy = jnp.clip(idx[..., 1], 0, W - 1)
  hit = params.map["obstacle_mask"][ix, iy]
  new_xy = jnp.where(hit[:, None], state.ped_xy, cand)
  new_yaw = jnp.where(hit, new_yaw + jnp.pi, new_yaw)
  alive = state.ped_alive
  new_xy = jnp.where(alive[:, None], new_xy, state.ped_xy)
  return state.replace(ped_xy=new_xy, ped_yaw=new_yaw)
