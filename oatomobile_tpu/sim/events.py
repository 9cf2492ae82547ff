"""Analytic event detection: collisions and lane invasions.

Replaces CARLA's server-side `sensor.other.collision` and
`sensor.other.lane_invasion` (/root/reference/oatomobile/utils/
carla.py:408-455, consumed at simulators/carla/simulator.py:974-1139) with
exact geometric tests against the world state — no callbacks, no queues, no
frame-timeout fallback to *random observations* (the reference's silent
corruption hazard at simulator.py:154-158 is gone by construction).
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from oatomobile_tpu.sim.types import SceneState, WorldParams


def _obb_axes(yaw: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
  fwd = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
  right = jnp.stack([-jnp.sin(yaw), jnp.cos(yaw)], axis=-1)
  return fwd, right


def obb_overlap(xy_a, yaw_a, half_a, xy_b, yaw_b, half_b) -> jnp.ndarray:
  """Separating-axis test for oriented rectangles.

  All args broadcast; ``half_* = (half_length, half_width)``.
  Returns boolean overlap.
  """
  fa, ra = _obb_axes(yaw_a)
  fb, rb = _obb_axes(yaw_b)
  delta = xy_b - xy_a

  def project(axis):
    # Radius of each box projected on `axis` + center distance.
    r_a = (half_a[..., 0] * jnp.abs(jnp.sum(axis * fa, -1)) +
           half_a[..., 1] * jnp.abs(jnp.sum(axis * ra, -1)))
    r_b = (half_b[..., 0] * jnp.abs(jnp.sum(axis * fb, -1)) +
           half_b[..., 1] * jnp.abs(jnp.sum(axis * rb, -1)))
    dist = jnp.abs(jnp.sum(axis * delta, -1))
    return dist <= r_a + r_b

  return project(fa) & project(ra) & project(fb) & project(rb)


def _sample_mask(params: WorldParams, mask_name: str,
                 xy: jnp.ndarray) -> jnp.ndarray:
  """Samples a boolean map raster at world positions ``[..., 2]``."""
  origin = params.map["raster_origin"]
  ppm = params.map["raster_ppm"]
  mask = params.map[mask_name]
  H, W = mask.shape
  idx = jnp.round((xy - origin) * ppm).astype(jnp.int32)
  ix = jnp.clip(idx[..., 0], 0, H - 1)
  iy = jnp.clip(idx[..., 1], 0, W - 1)
  return mask[ix, iy]


def hero_corners(params: WorldParams, xy: jnp.ndarray,
                 yaw: jnp.ndarray) -> jnp.ndarray:
  """[4, 2] world positions of the hero bounding-box corners."""
  hl = params.vehicle.length / 2.0
  hw = params.vehicle.width / 2.0
  fwd, right = _obb_axes(yaw)
  signs = jnp.asarray([[1, 1], [1, -1], [-1, 1], [-1, -1]], jnp.float32)
  return (xy[None, :] + signs[:, 0:1] * hl * fwd[None, :] +
          signs[:, 1:2] * hw * right[None, :])


def detect_collision(params: WorldParams, state: SceneState,
                     new_xy: jnp.ndarray, new_yaw: jnp.ndarray,
                     new_speed: jnp.ndarray) -> jnp.ndarray:
  """Collision impulse intensity for the hero this step (0 when none).

  Checks: (a) OBB overlap with alive NPC vehicles, (b) pedestrian circles,
  (c) static obstacles (buildings) at the hero's corners.
  """
  half_hero = jnp.stack([params.vehicle.length / 2.0,
                         params.vehicle.width / 2.0])
  impulse = jnp.float32(0.0)

  if state.num_npcs > 0:
    overlap = obb_overlap(
        new_xy[None, :], new_yaw[None], half_hero[None, :],
        state.npc_xy, state.npc_yaw,
        jnp.broadcast_to(half_hero, (state.num_npcs, 2)))
    overlap = overlap & state.npc_alive
    rel_speed = jnp.abs(new_speed - state.npc_speed) + new_speed
    impulse = jnp.maximum(
        impulse, jnp.max(jnp.where(overlap, 400.0 * (rel_speed + 1.0), 0.0)))

  if state.num_pedestrians > 0:
    # Point-in-expanded-box (pedestrian radius 0.35 m).
    fwd, right = _obb_axes(new_yaw)
    rel = state.ped_xy - new_xy[None, :]
    du = jnp.abs(rel @ fwd)
    dv = jnp.abs(rel @ right)
    hit = ((du <= half_hero[0] + 0.35) & (dv <= half_hero[1] + 0.35) &
           state.ped_alive)
    impulse = jnp.maximum(
        impulse, jnp.max(jnp.where(hit, 400.0 * (new_speed + 1.0), 0.0)))

  # Static collision: a hero corner OUTSIDE every nearby road corridor
  # (inflated by the sidewalk margin) has hit the buildings that line the
  # streets.  Gather-free oriented-rect tests against the nearest corridor
  # chords — the exact complement of the old solid-block-interior test,
  # but valid for curved geometry (maps/builder.py road_rects).
  from oatomobile_tpu.ops import bev as bev_ops
  corners = hero_corners(params, new_xy, new_yaw)
  roads = bev_ops.nearest_rects(params.map["road_rects"], new_xy,
                                min(12, params.road_budget),
                                max_range=100.0)
  dx = corners[:, 0, None] - roads[None, :, 0]
  dy = corners[:, 1, None] - roads[None, :, 1]
  u = roads[None, :, 4] * dx + roads[None, :, 5] * dy
  v = -roads[None, :, 5] * dx + roads[None, :, 4] * dy
  sidewalk = jnp.float32(2.0)  # maps/builder.py SIDEWALK
  inside = ((jnp.abs(u) <= roads[None, :, 2] + sidewalk) &
            (jnp.abs(v) <= roads[None, :, 3] + sidewalk))
  static_hit = jnp.any(~jnp.any(inside, axis=-1))
  impulse = jnp.maximum(
      impulse, jnp.where(static_hit, 400.0 * (new_speed + 1.0), 0.0))
  return impulse


def lateral_lane_offset(params: WorldParams, xy: jnp.ndarray,
                        wp: jnp.ndarray) -> jnp.ndarray:
  """Signed lateral offset of ``xy`` from the centerline at waypoint ``wp``."""
  wp_xy = params.map["wp_xy"][wp]
  wp_yaw = params.map["wp_yaw"][wp]
  rel = xy - wp_xy
  return -jnp.sin(wp_yaw) * rel[..., 0] + jnp.cos(wp_yaw) * rel[..., 1]


def detect_lane_invasion(params: WorldParams, state: SceneState,
                         new_xy: jnp.ndarray,
                         new_wp: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                       jnp.ndarray]:
  """Lane-invasion *event* (fires on crossing, like CARLA's sensor).

  A crossing is detected when the hero's lateral offset from its lane
  centerline exceeds half the lane width, transitioning from inside.
  Junction interiors have no markings -> no invasions there.

  Returns:
    (count_this_step, new_off_lane_flag).
  """
  lat = jnp.abs(lateral_lane_offset(params, new_xy, new_wp))
  in_junction = params.map["wp_is_junction"][new_wp]
  outside = (lat > params.map["lane_width"] / 2.0 + 0.1) & ~in_junction
  fired = outside & ~state.off_lane_prev
  return fired.astype(jnp.int32), outside
