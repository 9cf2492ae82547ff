"""Diagnose CoRL2017 Town02 timeouts: where do timed-out episodes spend
their 1500 steps, and how far along their route do they die?

Runs every Town02 task x E episodes with the in-graph autopilot and
reports, per outcome class: route-progress fraction, fraction of steps
spent (near-)stopped, distance remaining, and the NPC network's stalled
fraction at episode end.
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

from oatomobile_tpu.benchmarks.corl2017.benchmark import _TASKS
from oatomobile_tpu.maps import load_town
from oatomobile_tpu.sim import (autopilot_policy, init_scene_batch,
                                make_params, world_step)


def rollout(params, states, num_steps):
  def body(carry, _):
    state, m = carry
    active = m["active"]
    actions, state = jax.vmap(
        lambda s: autopilot_policy(params, s))(state)
    frozen = jnp.asarray([0.0, 0.0, 1.0])
    actions = jnp.where(active[:, None], actions, frozen[None, :])
    new_state = jax.vmap(world_step, in_axes=(None, 0, 0))(params, state,
                                                           actions)
    collided = (new_state.collision > 0.0) & active
    arrived = (jnp.linalg.norm(
        new_state.hero_xy - new_state.destination_xy, axis=-1) < 7.5) & active
    stopped = (new_state.hero_speed < 0.3) & active
    m = {
        "steps": m["steps"] + active.astype(jnp.int32),
        "stopped_steps": m["stopped_steps"] + stopped.astype(jnp.int32),
        "collided": m["collided"] | collided,
        "success": m["success"] | arrived,
        "active": active & ~collided & ~arrived,
        "route_pos": jnp.where(active, new_state.route_pos, m["route_pos"]),
    }
    return (new_state, m), None

  B = states.hero_xy.shape[0]
  m0 = {
      "steps": jnp.zeros(B, jnp.int32),
      "stopped_steps": jnp.zeros(B, jnp.int32),
      "collided": jnp.zeros(B, bool),
      "success": jnp.zeros(B, bool),
      "active": jnp.ones(B, bool),
      "route_pos": states.route_pos,
  }
  (final, m), _ = jax.lax.scan(body, (states, m0), None, length=num_steps)
  return final, m


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--town", default="Town02")
  ap.add_argument("--episodes", type=int, default=3)
  ap.add_argument("--horizon", type=int, default=1500)
  ap.add_argument("--out", default=None)
  args = ap.parse_args()

  tasks = {t: c for t, c in _TASKS.items() if c["town"] == args.town}
  ids = sorted(tasks)
  configs = [tasks[t] for t in ids]
  T, E = len(ids), args.episodes
  town = load_town(args.town)
  params = make_params(town)
  states = init_scene_batch(
      town, T * E,
      num_vehicles=np.tile(np.asarray(
          [int(c.get("num_vehicles", 0)) for c in configs]), E),
      num_pedestrians=np.tile(np.asarray(
          [int(c.get("num_pedestrians", 0)) for c in configs]), E),
      route_capacity=2048,
      seed=0,
      spawn_points=np.tile(np.asarray([c["origin"] for c in configs]), E),
      destinations=np.tile(np.asarray(
          [c["destination"] for c in configs]), E),
  )
  run = jax.jit(lambda p, s: rollout(p, s, args.horizon))
  final, m = jax.device_get(run(params, states))

  route_len = np.asarray(final.route_len)
  progress = np.asarray(m["route_pos"]) / np.maximum(route_len, 1)
  dist_left = np.linalg.norm(
      np.asarray(final.hero_xy) - np.asarray(final.destination_xy), axis=-1)
  stalled_npc = float(np.mean(
      (np.asarray(final.npc_speed) < 0.3) & np.asarray(final.npc_alive)))

  outcome = np.where(np.asarray(m["success"]), "success",
                     np.where(np.asarray(m["collided"]), "collision",
                              "timeout"))
  stopped_frac = np.asarray(m["stopped_steps"]) / np.maximum(
      np.asarray(m["steps"]), 1)

  print(f"{args.town}: {T} tasks x {E} episodes")
  for cls in ("success", "collision", "timeout"):
    sel = outcome == cls
    n = int(sel.sum())
    if n == 0:
      print(f"  {cls:9s}: 0")
      continue
    print(f"  {cls:9s}: {n:4d} ({n/len(outcome):5.1%})  "
          f"progress {np.mean(progress[sel]):5.1%}  "
          f"stopped-frac {np.mean(stopped_frac[sel]):5.1%}  "
          f"dist-left {np.mean(dist_left[sel]):6.1f} m")
  print(f"  NPC stalled fraction at t={args.horizon}: {stalled_npc:5.1%}")

  # Timeout detail: bucket timed-out episodes by stopped fraction and by
  # progress, and list the worst tasks.
  sel = outcome == "timeout"
  if sel.sum():
    per_task = collections.Counter()
    for e in range(E):
      for i, tid in enumerate(ids):
        if sel[e * T + i]:
          per_task[tid] += 1
    worst = per_task.most_common(15)
    print("  worst timeout tasks:", worst)
    hi_stop = sel & (stopped_frac > 0.5)
    print(f"  timeouts mostly-parked (>50% steps stopped): "
          f"{int(hi_stop.sum())}/{int(sel.sum())}")
    slow = sel & (stopped_frac <= 0.5)
    if slow.sum():
      print(f"  timeouts while moving: n={int(slow.sum())} "
            f"mean progress {np.mean(progress[slow]):5.1%} "
            f"mean dist-left {np.mean(dist_left[slow]):6.1f} m")
  if args.out:
    rows = [{
        "task": ids[j % T], "episode": j // T,
        "outcome": str(outcome[j]), "progress": float(progress[j]),
        "stopped_frac": float(stopped_frac[j]),
        "dist_left": float(dist_left[j]),
        "steps": int(np.asarray(m["steps"])[j]),
    } for j in range(T * E)]
    with open(args.out, "w") as fp:
      json.dump(rows, fp, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
  main()
