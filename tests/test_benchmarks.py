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
