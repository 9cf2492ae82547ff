"""Census of NPC stalls on Town02@100 vehicles: are stalled NPCs churning
(queues that drain) or permanent knots (gridlock), and where do they sit?

Tracks per-NPC consecutive-stall streaks through the rollout and reports
the streak distribution, junction occupancy of long-stallers, and the
red-light share.  Also correlates hero stopped-time with proximity to a
long-stalled NPC.
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


def rollout(params, states, num_steps):
  K = states.npc_xy.shape[1]
  B = states.hero_xy.shape[0]

  def body(carry, _):
    state, m = carry
    actions, state = jax.vmap(lambda s: autopilot_policy(params, s))(state)
    new_state = jax.vmap(world_step, in_axes=(None, 0, 0))(params, state,
                                                           actions)
    stalled = (new_state.npc_speed < 0.3) & new_state.npc_alive
    streak = jnp.where(stalled, m["streak"] + 1, 0)
    # Red-light share of stalls.
    tl = jax.vmap(lambda s: traffic.traffic_light_states(params, s.time))(
        new_state)
    governed = params.map["wp_tl"][new_state.npc_wp] >= 0
    tlid = jnp.clip(params.map["wp_tl"][new_state.npc_wp], 0,
                    tl.shape[1] - 1)
    at_red = governed & (jnp.take_along_axis(tl, tlid, axis=1) !=
                         traffic.TL_GREEN)
    hero_stopped = new_state.hero_speed < 0.3
    # Hero near a long-stalled NPC (>15 s = 300 steps)?
    long_stall = m["streak"] > 300
    d_hero = jnp.linalg.norm(new_state.npc_xy - new_state.hero_xy[:, None],
                             axis=-1)
    near_knot = jnp.any(long_stall & (d_hero < 25.0) & new_state.npc_alive,
                        axis=-1)
    m = {
        "streak": streak,
        "max_streak": jnp.maximum(m["max_streak"], streak),
        "stall_steps": m["stall_steps"] + stalled.astype(jnp.int32),
        "red_stall_steps": m["red_stall_steps"] +
            (stalled & at_red).astype(jnp.int32),
        "hero_stopped": m["hero_stopped"] + hero_stopped.astype(jnp.int32),
        "hero_stopped_near_knot": m["hero_stopped_near_knot"] +
            (hero_stopped & near_knot).astype(jnp.int32),
    }
    return (new_state, m), None

  m0 = {
      "streak": jnp.zeros((B, K), jnp.int32),
      "max_streak": jnp.zeros((B, K), jnp.int32),
      "stall_steps": jnp.zeros((B, K), jnp.int32),
      "red_stall_steps": jnp.zeros((B, K), jnp.int32),
      "hero_stopped": jnp.zeros(B, jnp.int32),
      "hero_stopped_near_knot": jnp.zeros(B, jnp.int32),
  }
  (final, m), _ = jax.lax.scan(body, (states, m0), None, length=num_steps)
  return final, m


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--town", default="Town02")
  ap.add_argument("--scenes", type=int, default=32)
  ap.add_argument("--horizon", type=int, default=1500)
  args = ap.parse_args()

  tasks = {t: c for t, c in _TASKS.items()
           if c["town"] == args.town and "FullTown" in t}
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

  alive = np.asarray(final.npc_alive)
  streak = np.asarray(m["streak"])[alive]
  max_streak = np.asarray(m["max_streak"])[alive]
  stall = np.asarray(m["stall_steps"])[alive]
  red = np.asarray(m["red_stall_steps"])[alive]
  H = args.horizon

  print(f"{args.town} FullTown x {B} scenes, horizon {H}")
  print(f"  alive NPCs: {alive.sum()} / {alive.size}")
  print(f"  mean stall fraction: {stall.mean() / H:5.1%} "
        f"(red-light share of stalled steps: {red.sum() / max(stall.sum(), 1):5.1%})")
  print(f"  stalled RIGHT NOW (end): {(streak > 0).mean():5.1%}")
  for thr in (100, 300, 600, 1000, 1400):
    frac_now = (streak > thr).mean()
    frac_ever = (max_streak > thr).mean()
    print(f"  streak > {thr:4d} steps ({thr/20:4.0f}s): now {frac_now:5.1%}  ever {frac_ever:5.1%}")
  # Location of permanent stallers.
  perm = np.asarray(m["streak"]) > 600
  at_j = np.asarray(params.map["wp_is_junction"])[np.asarray(final.npc_wp)]
  if perm[alive].sum():
    print(f"  permanent (>30s now) stallers at junction-wp: "
          f"{(perm & at_j & alive).sum() / max((perm & alive).sum(), 1):5.1%}")
  hs = np.asarray(m["hero_stopped"]).astype(float)
  hk = np.asarray(m["hero_stopped_near_knot"]).astype(float)
  print(f"  hero stopped steps: mean {hs.mean() / H:5.1%}; "
        f"of those, near a >15s-stalled NPC: {hk.sum() / max(hs.sum(), 1):5.1%}")


if __name__ == "__main__":
  main()
