"""Classify the expert's CARNOVEL Hills collisions (Town03, 100 vehicles).

For every collision episode, snapshots the geometry at the collision
step — nearest-NPC position in the hero frame, relative heading, hero
speed, junction membership, local route bend — and buckets the crashes
into rear-end / sideswipe (same-dir) / T-bone (crossing) / head-on.
Run with --platform cpu while the TPU is busy.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--episodes", type=int, default=10)
  ap.add_argument("--horizon", type=int, default=1500)
  ap.add_argument("--family", default="Hills")
  ap.add_argument("--platform", default=None)
  args = ap.parse_args()

  import jax
  if args.platform:
    jax.config.update("jax_platforms", args.platform)
  import jax.numpy as jnp

  from oatomobile_tpu.benchmarks.carnovel.benchmark import _TASKS
  from oatomobile_tpu.maps import load_town
  from oatomobile_tpu.sim import (autopilot_policy, init_scene_batch,
                                  make_params, world_step)

  tasks = {t: c for t, c in sorted(_TASKS.items())
           if t.startswith(args.family)}
  ids = sorted(tasks)
  configs = [tasks[t] for t in ids]
  towns = {c["town"] for c in configs}
  assert len(towns) == 1, towns
  town = load_town(towns.pop())
  params = make_params(town)
  T, E = len(ids), args.episodes

  states = init_scene_batch(
      town, T * E,
      num_vehicles=np.tile(
          np.asarray([int(c.get("num_vehicles", 0)) for c in configs]), E),
      num_pedestrians=np.tile(
          np.asarray([int(c.get("num_pedestrians", 0)) for c in configs]),
          E),
      route_capacity=2048,
      seed=7,
      spawn_points=np.tile(np.asarray([c["origin"] for c in configs]), E),
      destinations=np.tile(
          np.asarray([c["destination"] for c in configs]), E),
  )

  def snapshot(state):
    """Geometry of the closest alive NPC, in the hero frame."""
    rel = state.npc_xy - state.hero_xy[None, :]
    dist = jnp.where(state.npc_alive, jnp.linalg.norm(rel, axis=-1), 1e9)
    j = jnp.argmin(dist)
    cos_y, sin_y = jnp.cos(state.hero_yaw), jnp.sin(state.hero_yaw)
    fwd = cos_y * rel[j, 0] + sin_y * rel[j, 1]
    lat = -sin_y * rel[j, 0] + cos_y * rel[j, 1]
    rel_yaw = jnp.arctan2(jnp.sin(state.npc_yaw[j] - state.hero_yaw),
                          jnp.cos(state.npc_yaw[j] - state.hero_yaw))
    return {
        "fwd": fwd, "lat": lat, "rel_yaw": rel_yaw, "npc_dist": dist[j],
        "hero_speed": state.hero_speed, "npc_speed": state.npc_speed[j],
        "at_junction": params.map["wp_is_junction"][state.hero_wp],
        "bend": params.map["wp_bend"][state.hero_wp],
        "progress": state.route_pos / jnp.maximum(state.route_len, 1),
        "asserting": state.hero_wait > 120,
    }

  def rollout(states, num_steps):
    def body(carry, _):
      state, m = carry
      active = m["active"]
      pre = state  # geometry JUST BEFORE the colliding step
      actions, state = jax.vmap(
          lambda s: autopilot_policy(params, s))(state)
      frozen = jnp.asarray([0.0, 0.0, 1.0])
      actions = jnp.where(active[:, None], actions, frozen[None, :])
      new_state = jax.vmap(world_step, in_axes=(None, 0, 0))(
          params, state, actions)
      collided = (new_state.collision > 0.0) & active
      arrived = (jnp.linalg.norm(
          new_state.hero_xy - new_state.destination_xy,
          axis=-1) < 7.5) & active
      snap = jax.vmap(snapshot)(pre)
      first = collided & ~m["collided"]
      crash = {k: jnp.where(first, snap[k], m["crash"][k])
               for k in snap}
      m = {
          "steps": m["steps"] + active.astype(jnp.int32),
          "collided": m["collided"] | collided,
          "success": m["success"] | arrived,
          "active": active & ~collided & ~arrived,
          "crash": crash,
      }
      return (new_state, m), None

    B = states.hero_xy.shape[0]
    zero_snap = jax.vmap(snapshot)(states)
    m0 = {
        "steps": jnp.zeros(B, jnp.int32),
        "collided": jnp.zeros(B, bool),
        "success": jnp.zeros(B, bool),
        "active": jnp.ones(B, bool),
        "crash": jax.tree.map(jnp.zeros_like, zero_snap),
    }
    (final, m), _ = jax.lax.scan(body, (states, m0), None, length=num_steps)
    return final, m

  run = jax.jit(lambda s: rollout(s, args.horizon))
  final, m = jax.device_get(run(states))

  coll = np.asarray(m["collided"])
  succ = np.asarray(m["success"])
  n = len(coll)
  print(f"{args.family}: {T} tasks x {E} eps = {n}  "
        f"success {succ.mean():.1%}  collision {coll.mean():.1%}  "
        f"timeout {1 - succ.mean() - coll.mean():.1%}")

  c = {k: np.asarray(v)[coll] for k, v in m["crash"].items()}
  rel_yaw = np.abs(c["rel_yaw"])
  same_dir = rel_yaw < np.pi / 4
  head_on = rel_yaw > 3 * np.pi / 4
  crossing = ~same_dir & ~head_on
  behind = c["fwd"] < -1.0
  side = np.abs(c["lat"]) > 1.0

  classes = {
      "rear-end (same-dir, ahead, centered)":
          same_dir & ~behind & ~side,
      "sideswipe same-dir (lat>1)": same_dir & side,
      "hit-from-behind (npc behind hero)": behind,
      "T-bone / crossing": crossing & ~behind,
      "head-on": head_on & ~behind & ~side,
      "head-on offset (side)": head_on & ~behind & side,
  }
  print(f"\ncollisions: {coll.sum()}")
  for name, sel in classes.items():
    k = int(sel.sum())
    if not k:
      continue
    print(f"  {name:38s}: {k:3d} ({k / max(coll.sum(), 1):5.1%})  "
          f"hero_v {c['hero_speed'][sel].mean():4.1f}  "
          f"npc_v {c['npc_speed'][sel].mean():4.1f}  "
          f"junction {c['at_junction'][sel].mean():4.1%}  "
          f"bend {c['bend'][sel].mean():5.2f}  "
          f"asserting {c['asserting'][sel].mean():4.1%}  "
          f"progress {c['progress'][sel].mean():5.1%}")

  # Per-task breakdown.
  task_ids = np.tile(np.arange(T), E)
  print()
  for i, tid in enumerate(ids):
    sel = task_ids == i
    print(f"  {tid:20s} succ {succ[sel].mean():5.1%} "
          f"coll {coll[sel].mean():5.1%}")


if __name__ == "__main__":
  main()
