"""Failure taxonomy for learned agents (VERDICT r3 item 2).

Re-runs a trained policy (dim / rip_wcm / cil) on a benchmark suite and
classifies every episode's outcome at the step it happens:

  - success / collision / timeout
  - collision kind: NPC vehicle vs pedestrian vs static geometry
    (re-applies the three branches of sim/events.py detect_collision
    against the post-step state)
  - hero speed at impact, junction-or-not at impact, route progress
  - for timeouts: route progress at horizon and the fraction of steps
    spent standing still (speed < 0.3 m/s)

Usage:
  python scripts/diag_learned_failures.py --policy rip_wcm \
      --suite corl2017 --town Town01 --episodes 2 [--ckpt-root /root/r4/exp]
"""

import argparse
import collections
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oatomobile_tpu.maps import load_town
from oatomobile_tpu.ops import bev as bev_ops
from oatomobile_tpu.sim import (autopilot_policy, init_scene_batch,
                                make_params, world_step)
from oatomobile_tpu.sim.events import _obb_axes, obb_overlap


def collision_kind(params, state):
  """(npc_hit, ped_hit, static_hit) booleans for one scene state."""
  half_hero = jnp.stack([params.vehicle.length / 2.0,
                         params.vehicle.width / 2.0])
  xy, yaw = state.hero_xy, state.hero_yaw

  npc_hit = jnp.bool_(False)
  if state.num_npcs > 0:
    overlap = obb_overlap(
        xy[None, :], yaw[None], half_hero[None, :],
        state.npc_xy, state.npc_yaw,
        jnp.broadcast_to(half_hero, (state.num_npcs, 2)))
    npc_hit = jnp.any(overlap & state.npc_alive)

  ped_hit = jnp.bool_(False)
  if state.num_pedestrians > 0:
    fwd, right = _obb_axes(yaw)
    rel = state.ped_xy - xy[None, :]
    du = jnp.abs(rel @ fwd)
    dv = jnp.abs(rel @ right)
    ped_hit = jnp.any((du <= half_hero[0] + 0.35) &
                      (dv <= half_hero[1] + 0.35) & state.ped_alive)

  from oatomobile_tpu.sim.events import hero_corners
  corners = hero_corners(params, xy, yaw)
  roads = bev_ops.nearest_rects(params.map["road_rects"], xy,
                                min(12, params.road_budget),
                                max_range=100.0)
  dx = corners[:, 0, None] - roads[None, :, 0]
  dy = corners[:, 1, None] - roads[None, :, 1]
  u = roads[None, :, 4] * dx + roads[None, :, 5] * dy
  v = -roads[None, :, 5] * dx + roads[None, :, 4] * dy
  inside = ((jnp.abs(u) <= roads[None, :, 2] + 2.0) &
            (jnp.abs(v) <= roads[None, :, 3] + 2.0))
  static_hit = jnp.any(~jnp.any(inside, axis=-1))
  return npc_hit, ped_hit, static_hit


def taxonomy_rollout(params, states, policy, num_steps):
  """Scan recording first-failure forensics per scene."""
  B = states.hero_xy.shape[0]

  def body(carry, _):
    state, m = carry
    active = m["active"]
    actions, state = policy(params, state)
    frozen = jnp.asarray([0.0, 0.0, 1.0])
    actions = jnp.where(active[:, None], actions, frozen[None, :])
    new_state = jax.vmap(world_step, in_axes=(None, 0, 0))(params, state,
                                                           actions)
    collided = (new_state.collision > 0.0) & active
    arrived = (jnp.linalg.norm(
        new_state.hero_xy - new_state.destination_xy, axis=-1) < 7.5) & active

    npc, ped, sta = jax.vmap(lambda s: collision_kind(params, s))(new_state)
    first = collided & (m["fail_step"] < 0)
    progress = new_state.route_pos / jnp.maximum(new_state.route_len, 1)
    in_junc = params.map["wp_is_junction"][new_state.hero_wp]

    m = {
        "active": active & ~collided & ~arrived,
        "success": m["success"] | arrived,
        "collided": m["collided"] | collided,
        "fail_step": jnp.where(first, m["steps"], m["fail_step"]),
        "impact_speed": jnp.where(first, state.hero_speed,
                                  m["impact_speed"]),
        "impact_npc": jnp.where(first, npc, m["impact_npc"]),
        "impact_ped": jnp.where(first, ped, m["impact_ped"]),
        "impact_static": jnp.where(first, sta & ~npc & ~ped,
                                   m["impact_static"]),
        "impact_junction": jnp.where(first, in_junc, m["impact_junction"]),
        "impact_progress": jnp.where(first, progress, m["impact_progress"]),
        "final_progress": jnp.where(active, progress, m["final_progress"]),
        "stalled": m["stalled"] + ((new_state.hero_speed < 0.3) &
                                   active).astype(jnp.int32),
        "steps": m["steps"] + active.astype(jnp.int32),
    }
    return (new_state, m), None

  m0 = {
      "active": jnp.ones(B, bool),
      "success": jnp.zeros(B, bool),
      "collided": jnp.zeros(B, bool),
      "fail_step": jnp.full(B, -1, jnp.int32),
      "impact_speed": jnp.zeros(B, jnp.float32),
      "impact_npc": jnp.zeros(B, bool),
      "impact_ped": jnp.zeros(B, bool),
      "impact_static": jnp.zeros(B, bool),
      "impact_junction": jnp.zeros(B, bool),
      "impact_progress": jnp.zeros(B, jnp.float32),
      "final_progress": jnp.zeros(B, jnp.float32),
      "stalled": jnp.zeros(B, jnp.int32),
      "steps": jnp.zeros(B, jnp.int32),
  }
  (_, m), _ = jax.lax.scan(body, (states, m0), None, length=num_steps)
  return m


def build_policy(name, ckpt_root, bridge):
  if name == "autopilot":
    return lambda p, s: jax.vmap(lambda x: autopilot_policy(p, x))(s)
  from oatomobile_tpu.baselines.learned.cil.policy import make_cil_policy
  from oatomobile_tpu.baselines.learned.dim.policy import make_dim_policy
  from oatomobile_tpu.baselines.learned.rip.policy import make_rip_policy
  from oatomobile_tpu.baselines.learned.rip.train import unstack_params
  from oatomobile_tpu.models.cil import BehaviouralModel
  from oatomobile_tpu.models.dim import ImitativeModel
  from oatomobile_tpu.utils.checkpoint import Checkpointer

  if name == "cil":
    model = BehaviouralModel(output_shape=(40, 2))
    ctx = dict(visual_features=jnp.zeros((1, 100, 100, 2)),
               velocity=jnp.zeros((1, 3)),
               is_at_traffic_light=jnp.zeros((1, 1)),
               traffic_light_state=jnp.zeros((1, 1)),
               mode=jnp.zeros((1, 1)))
    template = model.init(jax.random.PRNGKey(0), **ctx)
    params = Checkpointer(os.path.join(ckpt_root, "cil",
                                       "ckpts")).load_named(
                                           "best", jax.device_get(template))
    return make_cil_policy(model, params, **bridge)

  model = ImitativeModel(output_shape=(4, 2))
  ctx = dict(visual_features=jnp.zeros((1, 100, 100, 2)),
             velocity=jnp.zeros((1, 3)),
             is_at_traffic_light=jnp.zeros((1, 1)),
             traffic_light_state=jnp.zeros((1, 1)))
  one = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2)),
                   method=model.log_prob, **ctx)
  K = 4
  template = jax.tree.map(lambda x: jnp.stack([x] * K, 0), one)
  stacked = Checkpointer(os.path.join(ckpt_root, "rip", "ckpts"),
                         prefix="ensemble").load_named(
                             "best", jax.device_get(template))
  if name == "dim":
    return make_dim_policy(model, unstack_params(stacked, 0),
                           num_plan_steps=20, **bridge)
  algo = name.split("_", 1)[1].upper()
  return make_rip_policy(model, stacked, algorithm=algo,
                         num_plan_steps=20, **bridge)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--policy", default="rip_wcm")
  ap.add_argument("--suite", default="corl2017",
                  choices=["corl2017", "carnovel"])
  ap.add_argument("--town", default="Town01")
  ap.add_argument("--episodes", type=int, default=2)
  ap.add_argument("--horizon", type=int, default=1500)
  ap.add_argument("--ckpt-root", default=os.environ.get("RUN_OUT",
                                                        "/root/r4/exp"))
  ap.add_argument("--max-tasks", type=int, default=0)
  ap.add_argument("--out", default="")
  ap.add_argument("--bridge", default='{"use_brake": true, '
                  '"curvature_slowdown": true, "speed_gain": 1.2}')
  args = ap.parse_args()

  if args.suite == "corl2017":
    from oatomobile_tpu.benchmarks.corl2017.benchmark import _TASKS
  else:
    from oatomobile_tpu.benchmarks.carnovel.benchmark import _TASKS
  tasks = {t: c for t, c in sorted(_TASKS.items())
           if args.town in ("all", c["town"])}
  if args.max_tasks:
    tasks = dict(list(tasks.items())[:args.max_tasks])

  bridge = json.loads(args.bridge)
  policy = build_policy(args.policy, args.ckpt_root, bridge)

  by_town = collections.defaultdict(list)
  for t, c in tasks.items():
    by_town[c["town"]].append((t, c))

  rows = []
  for town_name, group in sorted(by_town.items()):
    town = load_town(town_name)
    params = make_params(town)
    ids = [t for t, _ in group]
    configs = [c for _, c in group]
    T, E = len(group), args.episodes
    states = init_scene_batch(
        town, T * E,
        num_vehicles=np.tile(np.asarray(
            [int(c.get("num_vehicles", 0)) for c in configs]), E),
        num_pedestrians=np.tile(np.asarray(
            [int(c.get("num_pedestrians", 0)) for c in configs]), E),
        route_capacity=2048, seed=7,
        spawn_points=np.tile(np.asarray([c["origin"] for c in configs]), E),
        destinations=np.tile(np.asarray(
            [c["destination"] for c in configs]), E))
    run = jax.jit(lambda p, s: taxonomy_rollout(p, s, policy, args.horizon))
    m = jax.device_get(run(params, states))
    for e in range(E):
      for i, task_id in enumerate(ids):
        j = e * T + i
        rows.append({k: np.asarray(v)[j].item() for k, v in m.items()
                     if k != "active"} | {"task": task_id, "episode": e})

  n = len(rows)
  succ = [r for r in rows if r["success"]]
  coll = [r for r in rows if r["collided"]]
  tout = [r for r in rows if not r["success"] and not r["collided"]]
  print(f"{args.policy} on {args.suite}/{args.town}: {n} episodes")
  print(f"  success {len(succ)/n:6.1%}   collision {len(coll)/n:6.1%}   "
        f"timeout {len(tout)/n:6.1%}")
  if coll:
    kinds = collections.Counter(
        "npc" if r["impact_npc"] else
        "pedestrian" if r["impact_ped"] else
        "static" if r["impact_static"] else "resolved-away" for r in coll)
    print("  collision kinds:", dict(kinds))
    print(f"  at junction: {np.mean([r['impact_junction'] for r in coll]):.1%}"
          f" | mean impact speed {np.mean([r['impact_speed'] for r in coll]):.2f} m/s"
          f" | mean route progress {np.mean([r['impact_progress'] for r in coll]):.1%}"
          f" | median fail step {int(np.median([r['fail_step'] for r in coll]))}")
    slow = [r for r in coll if r["impact_speed"] < 1.0]
    print(f"  collisions while hero nearly stopped (<1 m/s): "
          f"{len(slow)/len(coll):.1%}  (rear-ended / rammed while queueing)")
  if tout:
    print(f"  timeouts: mean final progress "
          f"{np.mean([r['final_progress'] for r in tout]):.1%} | mean stall "
          f"fraction {np.mean([r['stalled']/max(r['steps'],1) for r in tout]):.1%}")
  if args.out:
    with open(args.out, "w") as fp:
      json.dump(rows, fp, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
  main()
