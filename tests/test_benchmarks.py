"""Tests for the CARNOVEL / CoRL2017 benchmark suites."""

import os

import numpy as np
import pytest

from oatomobile_tpu.benchmarks import carnovel, corl2017
from oatomobile_tpu.core.agent import Agent


class _Throttle(Agent):

  def act(self, observations):
    return {"throttle": 0.5, "steer": 0.0, "brake": 0.0}


def test_task_counts():
  assert len(carnovel.tasks) == 27
  assert len(corl2017.tasks) == 150


def test_task_families():
  families = {"AbnormalTurns", "BusyTown", "Hills", "Roundabouts"}
  for task_id in carnovel.tasks:
    assert any(task_id.startswith(f) for f in families), task_id
  for task_id in corl2017.tasks:
    assert task_id.startswith("Town01") or task_id.startswith("Town02")


def test_metrics_sets():
  assert {m.uuid for m in carnovel.metrics} == {
      "steps", "collisions", "lane_invasions", "distance", "returns"
  }
  assert {m.uuid for m in corl2017.metrics} == {
      "steps", "collisions", "lane_invasions"
  }


def test_load_unknown_task_raises():
  with pytest.raises(ValueError):
    carnovel.load("NotATask-v0")


@pytest.mark.slow
def test_evaluate_single_corl_task(tmp_path):
  # End-to-end: load one Town02 task, run a few steps, CSV appears.
  task_id = sorted(t for t in corl2017.tasks if t.startswith("Town02"))[0]

  class MiniCORL(type(corl2017)):

    @property
    def tasks(self):
      return {task_id: corl2017.tasks[task_id]}

    def load(self, tid, **kwargs):
      from oatomobile_tpu.core.rl import FiniteHorizonWrapper
      env = self.tasks[tid]()
      return FiniteHorizonWrapper(env, max_episode_steps=5)

  MiniCORL().evaluate(_Throttle, log_dir=str(tmp_path))
  csv_path = os.path.join(str(tmp_path), task_id, "metrics.csv")
  assert os.path.exists(csv_path)
  header, row = open(csv_path).read().strip().split("\n")
  assert "collisions" in header


def test_summarize_per_family_and_timeouts():
  from oatomobile_tpu.benchmarks.batched_eval import summarize, task_family

  assert task_family("AbnormalTurns5-v0") == "AbnormalTurns"
  assert task_family("Town01_Turn22-v0") == "Town01_Turn"
  results = {
      "Hills0-v0": {"episodes": [
          {"success": True, "collisions": 0, "distance": 100.0},
          {"success": False, "collisions": 1, "distance": 20.0},
      ]},
      "Hills1-v0": {"episodes": [
          {"success": False, "collisions": 0, "distance": 300.0},  # timeout
          {"success": True, "collisions": 0, "distance": 120.0},
      ]},
      "Roundabouts0-v0": {"success": False, "collisions": 2,
                          "distance": 10.0},
  }
  s = summarize(results)
  assert s["num_tasks"] == 3
  assert s["episodes"] == 5
  assert abs(s["success_rate"] - 2 / 5) < 1e-9
  assert abs(s["collision_rate"] - 2 / 5) < 1e-9
  assert abs(s["timeout_rate"] - 1 / 5) < 1e-9
  fam = s["per_family"]
  assert set(fam) == {"Hills", "Roundabouts"}
  assert fam["Hills"]["episodes"] == 4
  assert abs(fam["Hills"]["timeout_rate"] - 0.25) < 1e-9
  assert fam["Roundabouts"]["collision_rate"] == 1.0
  assert 0.0 < s["success_ci95"] < 1.0


def test_evaluate_batched_multi_episode(tmp_path):
  # Replicated episodes run inside one rollout; per-task rows carry the
  # per-episode list and summary.json gains CIs + per-family rates.
  import json
  from oatomobile_tpu.benchmarks.batched_eval import evaluate_batched

  tasks = {
      "Town02_Straight0-v0": {"town": "Town02", "origin": 10,
                              "destination": 40, "num_vehicles": 2,
                              "num_pedestrians": 0},
  }
  out = str(tmp_path / "eval")
  results = evaluate_batched(tasks, horizon=20, num_episodes=3, seed=5,
                             log_dir=out)
  row = results["Town02_Straight0-v0"]
  assert len(row["episodes"]) == 3
  summary = json.load(open(os.path.join(out, "summary.json")))["summary"]
  assert summary["episodes"] == 3
  assert "per_family" in summary and "success_ci95" in summary


def test_evaluate_batched_learned_rip_all_aggregators(tmp_path):
  """Locks the learned-agent eval protocol (VERDICT r4 item 7): a RIP
  policy — random-init stacked ensemble, each of the three aggregators —
  driven through `evaluate_batched` must yield the exact summary schema
  + per-family decomposition the sweep scripts and results publishers
  consume, so table-generation can't silently drift from the tested
  path."""
  import json
  import jax
  import jax.numpy as jnp
  from oatomobile_tpu.baselines.learned.rip.policy import make_rip_policy
  from oatomobile_tpu.benchmarks.batched_eval import evaluate_batched
  from oatomobile_tpu.models.dim import ImitativeModel

  K = 2
  model = ImitativeModel(output_shape=(4, 2))
  ctx = dict(visual_features=jnp.zeros((1, 100, 100, 2)),
             velocity=jnp.zeros((1, 3)),
             is_at_traffic_light=jnp.zeros((1, 1)),
             traffic_light_state=jnp.zeros((1, 1)))
  one = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2)),
                   method=model.log_prob, **ctx)
  stacked = jax.tree.map(lambda x: jnp.stack([x] * K, 0), one)

  tasks = {
      "Town02_Straight0-v0": {"town": "Town02", "origin": 10,
                              "destination": 40, "num_vehicles": 2,
                              "num_pedestrians": 0},
      "Town02_Turn0-v0": {"town": "Town02", "origin": 5,
                          "destination": 60, "num_vehicles": 2,
                          "num_pedestrians": 0},
  }
  for algorithm in ("WCM", "MA", "BCM"):
    policy = make_rip_policy(model, stacked, algorithm=algorithm,
                             num_plan_steps=2)
    out = str(tmp_path / "eval_{}".format(algorithm))
    results = evaluate_batched(tasks, policy_fn=policy, horizon=8,
                               num_episodes=2, seed=3, log_dir=out)
    assert set(results) == set(tasks)
    for row in results.values():
      assert len(row["episodes"]) == 2
    summary = json.load(open(os.path.join(out, "summary.json")))["summary"]
    for key in ("success_rate", "success_ci95", "collision_rate",
                "timeout_rate", "episodes", "per_family"):
      assert key in summary, (algorithm, key)
    assert summary["episodes"] == 4
    assert set(summary["per_family"]) == {"Town02_Straight", "Town02_Turn"}
    for fam in summary["per_family"].values():
      assert fam["episodes"] == 2
      for rate in ("success_rate", "collision_rate", "timeout_rate"):
        assert 0.0 <= fam[rate] <= 1.0
