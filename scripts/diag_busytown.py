"""Decompose CARNOVEL BusyTown timeouts: per-outcome stopped-time causes
using the autopilot's OWN hazard tests (imported, not mirrored), plus a
gridlock census of the NPC network around the hero.
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
  ap.add_argument("--family", default="BusyTown")
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
  from oatomobile_tpu.sim import traffic
  from oatomobile_tpu.sim.autopilot import (_red_light_hazard,
                                            _vehicle_hazard)

  tasks = {t: c for t, c in sorted(_TASKS.items())
           if t.startswith(args.family)}
  ids = sorted(tasks)
  configs = [tasks[t] for t in ids]
  town = load_town(configs[0]["town"])
  params = make_params(town)
  T, E = len(ids), args.episodes

  states = init_scene_batch(
      town, T * E,
      num_vehicles=np.tile(
          np.asarray([int(c.get("num_vehicles", 0)) for c in configs]), E),
      num_pedestrians=np.tile(
          np.asarray([int(c.get("num_pedestrians", 0)) for c in configs]),
          E),
      route_capacity=2048, seed=7,
      spawn_points=np.tile(np.asarray([c["origin"] for c in configs]), E),
      destinations=np.tile(
          np.asarray([c["destination"] for c in configs]), E),
  )

  def causes(state):
    tls = traffic.traffic_light_states(params, state.time)
    mover, graded, static, conflict, evade, near = _vehicle_hazard(
        params, state)
    red = _red_light_hazard(params, state, tls)
    asserting = state.hero_wait > 120
    return {
        "red": red,
        "mover": mover & ~asserting,
        "assert_creep": asserting & mover,
        "static": static,
        "near_stalled": jnp.sum(
            (jnp.linalg.norm(state.npc_xy - state.hero_xy[None], axis=-1)
             < 25.0) & state.npc_alive & (state.npc_speed < 0.3)),
    }

  keys = ("red", "mover", "assert_creep", "static")

  def rollout(states, num_steps):
    def body(carry, _):
      state, m = carry
      active = m["active"]
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
      c = jax.vmap(causes)(new_state)
      stopped = (new_state.hero_speed < 0.3) & active
      m = {
          **{k: m[k] + (stopped & c[k]).astype(jnp.int32) for k in keys},
          "stopped": m["stopped"] + stopped.astype(jnp.int32),
          "near_stalled": m["near_stalled"] + jnp.where(
              stopped, c["near_stalled"], 0),
          "collided": m["collided"] | collided,
          "success": m["success"] | arrived,
          "active": active & ~collided & ~arrived,
          "route_pos": jnp.where(active, new_state.route_pos,
                                 m["route_pos"]),
      }
      return (new_state, m), None

    B = states.hero_xy.shape[0]
    m0 = {
        **{k: jnp.zeros(B, jnp.int32) for k in keys},
        "stopped": jnp.zeros(B, jnp.int32),
        "near_stalled": jnp.zeros(B, jnp.int32),
        "collided": jnp.zeros(B, bool),
        "success": jnp.zeros(B, bool),
        "active": jnp.ones(B, bool),
        "route_pos": states.route_pos,
    }
    (final, m), _ = jax.lax.scan(body, (states, m0), None,
                                 length=num_steps)
    return final, m

  run = jax.jit(lambda s: rollout(s, args.horizon))
  final, m = jax.device_get(run(states))

  coll = np.asarray(m["collided"])
  succ = np.asarray(m["success"])
  outcome = np.where(succ, "success", np.where(coll, "collision",
                                               "timeout"))
  n = len(coll)
  print(f"{args.family}: {T} tasks x {E} eps = {n}  "
        f"success {succ.mean():.1%}  coll {coll.mean():.1%}  "
        f"timeout {(outcome == 'timeout').mean():.1%}")

  route_len = np.asarray(final.route_len).astype(float)
  progress = np.asarray(m["route_pos"]) / np.maximum(route_len, 1)
  stopped = np.asarray(m["stopped"]).astype(float)
  for cls in ("success", "timeout"):
    sel = outcome == cls
    if not sel.sum():
      continue
    tot = max(stopped[sel].sum(), 1.0)
    print(f"\n{cls} ({sel.sum()}): stopped-frac "
          f"{stopped[sel].mean() / args.horizon:5.1%}  "
          f"progress {progress[sel].mean():5.1%}")
    for k in keys:
      v = np.asarray(m[k]).astype(float)[sel].sum()
      print(f"  {k:13s}: {v / tot:5.1%} of stopped steps")
    ns = np.asarray(m["near_stalled"]).astype(float)[sel].sum()
    print(f"  stalled NPCs within 25 m while stopped (mean): "
          f"{ns / tot:.1f}")

  task_ids = np.tile(np.arange(T), E)
  print()
  for i, tid in enumerate(ids):
    sel = task_ids == i
    to = (outcome[sel] == "timeout").mean()
    print(f"  {tid:22s} succ {succ[sel].mean():5.1%} timeout {to:5.1%} "
          f"progress {progress[sel].mean():5.1%}")


if __name__ == "__main__":
  main()
