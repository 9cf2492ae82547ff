"""Decompose the hero's stopped time on CoRL2017 FullTown tasks into its
causes: red light, hard stop (crossing mover / intercept), queue-follow
envelope, box hold, end-of-route — by re-running the autopilot's hazard
tests against the rollout states.
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oatomobile_tpu.benchmarks.corl2017.benchmark import _TASKS
from oatomobile_tpu.maps import load_town
from oatomobile_tpu.sim import (autopilot_policy, init_scene_batch,
                                make_params, world_step)
from oatomobile_tpu.sim import traffic
from oatomobile_tpu.sim.autopilot import _red_light_hazard


def hero_stop_causes(params, state):
  """Mirrors autopilot_policy's hazard decomposition for one scene."""
  tl_states = traffic.traffic_light_states(params, state.time)
  red = _red_light_hazard(params, state, tl_states)

  # Re-derive the vehicle-hazard internals (keep in sync with autopilot).
  rel = state.npc_xy - state.hero_xy[None, :]
  dist = jnp.linalg.norm(rel, axis=-1)
  cos_y, sin_y = jnp.cos(state.hero_yaw), jnp.sin(state.hero_yaw)
  fwd = cos_y * rel[..., 0] + sin_y * rel[..., 1]
  moving = state.npc_speed > 0.5
  path_idx = jnp.clip(state.route_pos + jnp.arange(1, 8), 0,
                      state.route_len - 1)
  path_xy = params.map["wp_xy"][state.route[path_idx]]
  rel_p = path_xy[None, :, :] - state.npc_xy[:, None, :]
  cn, sn = jnp.cos(state.npc_yaw), jnp.sin(state.npc_yaw)
  px = cn[:, None] * rel_p[..., 0] + sn[:, None] * rel_p[..., 1]
  py = -sn[:, None] * rel_p[..., 0] + cn[:, None] * rel_p[..., 1]
  dxp = jnp.maximum(jnp.abs(px) - params.vehicle.length / 2.0, 0.0)
  dyp = jnp.maximum(jnp.abs(py) - params.vehicle.width / 2.0, 0.0)
  on_my_path = jnp.any(jnp.hypot(dxp, dyp) < 1.6, axis=-1) & (fwd > -1.0)
  hero_road = params.map["wp_road_id"][state.hero_wp]
  hero_lane = params.map["wp_lane_id"][state.hero_wp]
  same = ((params.map["wp_road_id"][state.npc_wp] == hero_road) &
          (params.map["wp_lane_id"][state.npc_wp] == hero_lane))
  lane_rule = same & (fwd > 0.0) & (dist <
                                    params.proximity_vehicle_threshold)
  blocking = (lane_rule | on_my_path) & state.npc_alive
  same_dir_npc = jnp.cos(state.npc_yaw - state.hero_yaw) > 0.5
  npc_vel = state.npc_speed[:, None] * jnp.stack(
      [jnp.cos(state.npc_yaw), jnp.sin(state.npc_yaw)], axis=-1)
  rel_fut = rel + (npc_vel - state.hero_vel[None, :]) * 1.0
  fwd_f = cos_y * rel_fut[..., 0] + sin_y * rel_fut[..., 1]
  lat = -sin_y * rel[..., 0] + cos_y * rel[..., 1]
  lat_f = -sin_y * rel_fut[..., 0] + cos_y * rel_fut[..., 1]
  intercept = ((fwd_f > -1.0) & (fwd_f < 8.0) & (jnp.abs(lat_f) < 2.5) &
               moving)
  oncoming = jnp.cos(state.npc_yaw - state.hero_yaw) < -0.5
  oncoming_passer = (oncoming & moving & (jnp.abs(lat) > 1.2) &
                     (jnp.abs(lat_f) > 1.0))
  follow_target = (blocking & ~moving) | (blocking & moving & same_dir_npc)
  d_q = jnp.min(jnp.where(follow_target, dist, 1e9))
  queue_stop = (state.hero_speed * state.hero_speed >
                2.0 * 2.0 * jnp.maximum(d_q - 6.0, 0.0)) | (d_q < 6.0)
  box_hold = (~params.map["wp_is_junction"][state.hero_wp] &
              jnp.any(params.map["wp_is_junction"][state.route[path_idx]]) &
              jnp.any(blocking & ~moving))
  hard = jnp.any((blocking & moving & ~same_dir_npc) |
                 (intercept & ~oncoming_passer & state.npc_alive))
  at_end = state.route_pos >= state.route_len - 3
  # Follow target's own speed when queueing (is the leader moving?)
  leader_moving = jnp.any(follow_target & moving & (dist < d_q + 0.5))
  return {
      "red": red, "hard": hard, "queue": queue_stop, "box": box_hold,
      "at_end": at_end, "leader_moving": leader_moving & queue_stop,
  }


def rollout(params, states, num_steps):
  B = states.hero_xy.shape[0]
  keys = ("red", "hard", "queue", "box", "at_end", "leader_moving")

  def body(carry, _):
    state, m = carry
    actions, state = jax.vmap(lambda s: autopilot_policy(params, s))(state)
    new_state = jax.vmap(world_step, in_axes=(None, 0, 0))(params, state,
                                                           actions)
    arrived = jnp.linalg.norm(
        new_state.hero_xy - new_state.destination_xy, axis=-1) < 7.5
    active = m["active"] & ~arrived & ~(new_state.collision > 0)
    causes = jax.vmap(lambda s: hero_stop_causes(params, s))(new_state)
    stopped = (new_state.hero_speed < 0.3) & active
    upd = {k: m[k] + (stopped & causes[k]).astype(jnp.int32) for k in keys}
    upd["stopped"] = m["stopped"] + stopped.astype(jnp.int32)
    upd["moving_speed"] = m["moving_speed"] + jnp.where(
        ~stopped & active, new_state.hero_speed, 0.0)
    upd["moving_steps"] = m["moving_steps"] + (~stopped & active).astype(
        jnp.int32)
    upd["active"] = active
    return (new_state, upd), None

  m0 = {k: jnp.zeros(B, jnp.int32) for k in keys}
  m0["stopped"] = jnp.zeros(B, jnp.int32)
  m0["moving_speed"] = jnp.zeros(B, jnp.float32)
  m0["moving_steps"] = jnp.zeros(B, jnp.int32)
  m0["active"] = jnp.ones(B, bool)
  (final, m), _ = jax.lax.scan(body, (states, m0), None, length=num_steps)
  return final, m


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--town", default="Town02")
  ap.add_argument("--scenes", type=int, default=32)
  ap.add_argument("--horizon", type=int, default=1500)
  args = ap.parse_args()

  tasks = {t: c for t, c in _TASKS.items() if c["town"] == args.town}
  ids = sorted(tasks)[:args.scenes]
  configs = [tasks[t] for t in ids]
  B = len(ids)
  town = load_town(args.town)
  params = make_params(town)
  states = init_scene_batch(
      town, B,
      num_vehicles=np.asarray([int(c.get("num_vehicles", 0))
                               for c in configs]),
      num_pedestrians=np.asarray([int(c.get("num_pedestrians", 0))
                                  for c in configs]),
      route_capacity=2048, seed=0,
      spawn_points=np.asarray([c["origin"] for c in configs]),
      destinations=np.asarray([c["destination"] for c in configs]),
  )
  run = jax.jit(lambda p, s: rollout(p, s, args.horizon))
  final, m = jax.device_get(run(params, states))

  stopped = np.asarray(m["stopped"]).astype(float)
  tot = max(stopped.sum(), 1.0)
  print(f"{args.town} x {B} scenes: hero stopped "
        f"{stopped.sum() / (B * args.horizon):5.1%} of all steps")
  for k in ("red", "hard", "queue", "box", "at_end", "leader_moving"):
    v = np.asarray(m[k]).astype(float).sum()
    print(f"  {k:14s}: {v / tot:5.1%} of stopped steps")
  ms = np.asarray(m["moving_speed"]).sum()
  mst = max(np.asarray(m["moving_steps"]).sum(), 1)
  print(f"  mean speed while moving: {ms / mst:.2f} m/s")


if __name__ == "__main__":
  main()
