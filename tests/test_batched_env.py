"""Tests for BatchedEnv auto-reset/rollout-cache semantics, per-scene
traffic counts, and the batched benchmark evaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oatomobile_tpu.envs.batched import BatchedEnv
from oatomobile_tpu.maps import load_town
from oatomobile_tpu.sim import init_scene_batch


@pytest.fixture(scope="module")
def env():
  return BatchedEnv("Town01", batch_size=4, max_episode_steps=10, seed=3)


def test_auto_reset_rng_streams_chain(env):
  # Episodes ending at a fixed step count (the 10-step horizon, no policy
  # variation) must still get DIFFERENT rng keys on each reset: folding
  # from the initial key would replay one episode forever.
  brake = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (4, 1))
  seen = []
  for _ in range(25):
    env.step(brake)
    seen.append(np.asarray(env.state.rng))
  # Collect the distinct keys of scene 0 across two horizon wraps.
  keys0 = {tuple(k[0]) for k in seen}
  assert len(keys0) >= 3


def test_rollout_cache_single_entry_per_policy():
  env = BatchedEnv("Town01", batch_size=4, max_episode_steps=1000, seed=3)

  def brake_policy(params, states):
    return jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (4, 1)), states

  env.rollout(4, policy=brake_policy)
  n0 = len(env._rollout_cache)
  env.rollout(4, policy=brake_policy)
  assert len(env._rollout_cache) == n0  # same policy: cache hit

  start = np.asarray(env.state.hero_xy).copy()
  del brake_policy  # cache still holds a strong ref -> id can't recycle

  def throttle_policy(params, states):
    return jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (4, 1)), states

  env.rollout(60, policy=throttle_policy)
  assert len(env._rollout_cache) == n0 + 1
  moved = np.linalg.norm(np.asarray(env.state.hero_xy) - start, axis=-1)
  assert (moved > 1.0).any()  # the NEW policy ran, not a stale compile


def test_init_scene_batch_per_scene_actor_counts():
  town = load_town("Town01")
  states = init_scene_batch(town, 3, num_vehicles=np.asarray([0, 5, 12]),
                            num_pedestrians=np.asarray([2, 0, 7]), seed=0)
  assert states.npc_xy.shape[1] == 12  # padded to the max
  np.testing.assert_array_equal(
      np.asarray(states.npc_alive).sum(axis=1), [0, 5, 12])
  np.testing.assert_array_equal(
      np.asarray(states.ped_alive).sum(axis=1), [2, 0, 7])


def test_evaluate_batched_respects_per_task_traffic():
  from oatomobile_tpu.benchmarks.batched_eval import evaluate_batched
  tasks = {
      "empty-v0": dict(town="Town01", origin=3, destination=40,
                       num_vehicles=0, num_pedestrians=0),
      "busy-v0": dict(town="Town01", origin=3, destination=40,
                      num_vehicles=100, num_pedestrians=0),
  }
  results = evaluate_batched(tasks, horizon=600)
  assert set(results) == {"empty-v0", "busy-v0"}
  # Identical route; only the traffic differs. The busy scene must behave
  # differently (hero yields/queues or collides) — identical metrics would
  # mean the group max was applied to both.
  assert (results["empty-v0"]["distance"] != results["busy-v0"]["distance"]
          or results["empty-v0"]["steps"] != results["busy-v0"]["steps"])


def test_packed_quantization_allowlist(tmp_path):
  from oatomobile_tpu.datasets.carla import _save_packed_arrays
  stacked = {
      # Trajectory that happens to land in [0,1]: must stay float32.
      "player_future": np.random.rand(4, 8, 2).astype(np.float32) * 0.5,
      "lidar": np.random.randint(0, 6, (4, 20, 20, 2)).astype(np.float32) / 5,
  }
  quantized = _save_packed_arrays(str(tmp_path), stacked)
  assert quantized == ["lidar"]
  assert np.load(tmp_path / "player_future.npy").dtype == np.float32
  assert np.load(tmp_path / "lidar.npy").dtype == np.uint8


def test_cil_policy_drives_batched():
  """In-graph CIL policy (untrained): compiles, drives, produces finite
  actions, and the mode labels respond to goal geometry."""
  from oatomobile_tpu.baselines.learned.cil.policy import (
      make_cil_policy, mode_from_goal_jnp)
  from oatomobile_tpu.models.cil import BehaviouralModel

  goal = jnp.zeros((3, 10, 2))
  goal = goal.at[0, -1].set(jnp.asarray([10.0, 0.0]))   # ahead -> FORWARD
  goal = goal.at[1, -1].set(jnp.asarray([5.0, 8.0]))    # right -> 3
  goal = goal.at[2, -1].set(jnp.asarray([1.0, 0.0]))    # near -> STOP
  np.testing.assert_array_equal(np.asarray(mode_from_goal_jnp(goal)),
                                [0.0, 3.0, 1.0])

  model = BehaviouralModel(output_shape=(40, 2))
  ctx = dict(visual_features=jnp.zeros((1, 100, 100, 2)),
             velocity=jnp.zeros((1, 3)),
             is_at_traffic_light=jnp.zeros((1, 1)),
             traffic_light_state=jnp.zeros((1, 1)),
             mode=jnp.zeros((1, 1)))
  params = model.init(jax.random.PRNGKey(0), **ctx)
  policy = make_cil_policy(model, params)
  env2 = BatchedEnv("Town01", batch_size=2, seed=7, auto_reset=False,
                    sensors=("location",))
  env2.reset()
  _, _, stats = env2.rollout(10, policy=policy, collect=())
  assert np.isfinite(np.asarray(stats["distance"])).all()
