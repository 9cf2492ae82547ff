"""Batched benchmark evaluation: every task is one scene of a vmapped
rollout.

The reference evaluates benchmark tasks sequentially — one CARLA server,
one env, one episode at a time (core/benchmark.py:101-102 even apologises:
"could be run on parallel too").  Here a whole suite evaluates as a few
device computations: tasks are grouped by town, each group becomes one
`BatchedEnv`-style scene batch (origin/destination from the task configs),
and one `lax.scan` rollout produces every episode's metrics at once.

CARNOVEL: 27 tasks x 1500 steps -> 3 device calls (Towns 03/04/05).
"""

import json
import os
from typing import Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from oatomobile_tpu.maps import load_town
from oatomobile_tpu.sim import (autopilot_policy, init_scene_batch,
                                make_params, world_step)

HORIZON = 1500  # carnovel/benchmark.py:70


def _episode_metrics_rollout(params, states, policy, num_steps: int,
                             proximity: float = 7.5):
  """Rollout WITHOUT auto-reset, accumulating per-scene episode metrics
  with CARNOVEL semantics: terminate on collision or arrival; frozen
  after termination."""

  def body(carry, _):
    state, m = carry
    active = m["active"]
    actions, state = policy(params, state)
    # Frozen scenes apply full brake.
    frozen_action = jnp.asarray([0.0, 0.0, 1.0])
    actions = jnp.where(active[:, None], actions, frozen_action[None, :])
    new_state = jax.vmap(world_step, in_axes=(None, 0, 0))(params, state,
                                                           actions)
    collided = (new_state.collision > 0.0) & active
    dist_step = jnp.linalg.norm(new_state.hero_xy - state.hero_xy, axis=-1)
    arrived = (jnp.linalg.norm(new_state.hero_xy - new_state.destination_xy,
                               axis=-1) < proximity) & active
    m = {
        "steps": m["steps"] + active.astype(jnp.int32),
        "collisions": m["collisions"] + collided.astype(jnp.int32),
        "lane_invasions": m["lane_invasions"] +
                          jnp.where(active, new_state.lane_invasion, 0),
        "distance": m["distance"] + jnp.where(active, dist_step, 0.0),
        "returns": m["returns"] + jnp.where(arrived, 1.0, 0.0) +
                   jnp.where(collided, -1.0, 0.0),
        "success": m["success"] | arrived,
        "active": active & ~collided & ~arrived,
    }
    return (new_state, m), None

  B = states.hero_xy.shape[0]
  metrics0 = {
      "steps": jnp.zeros(B, jnp.int32),
      "collisions": jnp.zeros(B, jnp.int32),
      "lane_invasions": jnp.zeros(B, jnp.int32),
      "distance": jnp.zeros(B, jnp.float32),
      "returns": jnp.zeros(B, jnp.float32),
      "success": jnp.zeros(B, bool),
      "active": jnp.ones(B, bool),
  }
  (final, metrics), _ = jax.lax.scan(body, (states, metrics0), None,
                                     length=num_steps)
  return final, metrics


def evaluate_batched(
    tasks: Mapping[str, Mapping],
    policy_fn: Optional[Callable] = None,
    log_dir: Optional[str] = None,
    horizon: int = HORIZON,
    noise: float = 0.0,
) -> Dict[str, Dict[str, float]]:
  """Evaluates every task of a benchmark in town-grouped batches.

  Args:
    tasks: task_id -> config dict (town/origin/destination/num_vehicles...)
      — e.g. the `_TASKS` of carnovel/corl2017, or `bench.tasks` configs.
    policy_fn: optional `(params, states) -> (actions, states)` batched
      policy; defaults to the in-graph autopilot.
    log_dir: when given, writes per-task metrics.csv like
      Benchmark.evaluate plus a summary.json.

  Returns:
    task_id -> metric dict.
  """
  by_town: Dict[str, list] = {}
  for task_id, config in tasks.items():
    by_town.setdefault(config["town"], []).append((task_id, config))

  results: Dict[str, Dict[str, float]] = {}
  for town_name, group in sorted(by_town.items()):
    town = load_town(town_name)
    params = make_params(town)
    ids = [t for t, _ in group]
    configs = [c for _, c in group]
    # Actor arrays pad to the group max but alive-mask down per task: each
    # task is evaluated with its OWN configured traffic density.
    states = init_scene_batch(
        town,
        len(group),
        num_vehicles=np.asarray(
            [int(c.get("num_vehicles", 0)) for c in configs]),
        num_pedestrians=np.asarray(
            [int(c.get("num_pedestrians", 0)) for c in configs]),
        route_capacity=2048,
        seed=0,
        spawn_points=np.asarray([c["origin"] for c in configs]),
        destinations=np.asarray([c["destination"] for c in configs]),
    )
    if policy_fn is None:
      def policy(params, state_batch):
        return jax.vmap(lambda s: autopilot_policy(params, s,
                                                   noise=noise))(state_batch)
    else:
      policy = policy_fn

    run = jax.jit(lambda p, s: _episode_metrics_rollout(p, s, policy,
                                                        horizon))
    _, metrics = run(params, states)
    metrics = jax.device_get(metrics)
    for i, task_id in enumerate(ids):
      results[task_id] = {
          "steps": int(metrics["steps"][i]),
          "collisions": int(metrics["collisions"][i]),
          "lane_invasions": int(metrics["lane_invasions"][i]),
          "distance": float(metrics["distance"][i]),
          "returns": float(metrics["returns"][i]),
          "success": bool(metrics["success"][i]),
      }

  if log_dir is not None:
    os.makedirs(log_dir, exist_ok=True)
    for task_id, row in results.items():
      task_dir = os.path.join(log_dir, task_id)
      os.makedirs(task_dir, exist_ok=True)
      keys = list(row.keys())
      with open(os.path.join(task_dir, "metrics.csv"), "w") as fp:
        fp.write(",".join(keys) + "\n")
        fp.write(",".join(str(row[k]) for k in keys) + "\n")
    summary = {
        "num_tasks": len(results),
        "success_rate": float(np.mean([r["success"] for r in
                                       results.values()])),
        "collision_rate": float(np.mean([r["collisions"] > 0 for r in
                                         results.values()])),
        "mean_distance": float(np.mean([r["distance"] for r in
                                        results.values()])),
    }
    with open(os.path.join(log_dir, "summary.json"), "w") as fp:
      json.dump({"summary": summary, "tasks": results}, fp, indent=2)
  return results
