"""End-to-end tests for the CARLAEnv gym layer over the TPU simulator."""

import numpy as np
import pytest

from oatomobile_tpu.core.loop import EnvironmentLoop
from oatomobile_tpu.core.rl import (FiniteHorizonWrapper, ReturnsMetric,
                                    StepsMetric)
from oatomobile_tpu.envs import (CARLAEnv, CARLANavEnv, CollisionsMetric,
                                 DistanceMetric, LaneInvasionsMetric,
                                 TerminateOnCollisionWrapper)
from oatomobile_tpu.simulators.tpu.simulator import CARLAAction


@pytest.fixture(scope="module")
def env():
  env = CARLAEnv(town="Town02", sensors=("goal", "velocity"),
                 spawn_point=3, destination=40)
  yield env
  env.close()


def test_mandatory_sensors_present(env):
  obs = env.reset()
  for key in ("collision", "lane_invasion", "location", "rotation",
              "control", "predictions", "goal", "velocity"):
    assert key in obs, key


def test_observation_space_matches_observations(env):
  obs = env.reset()
  space = env.observation_space
  for key in ("location", "rotation", "control", "goal"):
    assert tuple(space[key].shape) == np.asarray(obs[key]).shape


def test_action_space_dict(env):
  space = env.action_space
  sample = space.sample()
  assert set(sample.keys()) == {"throttle", "steer", "brake"}
  obs, reward, done, info = env.step(sample)
  assert reward == 0.0 and done is False


def test_step_accepts_carla_action(env):
  env.reset()
  obs, _, _, _ = env.step(CARLAAction(throttle=0.5))
  assert obs["control"][0] == pytest.approx(0.5)


def test_vehicle_moves_forward(env):
  obs0 = env.reset()
  for _ in range(30):
    obs, _, _, _ = env.step({"throttle": 0.8})
  dist = np.linalg.norm(obs["location"] - obs0["location"])
  assert dist > 1.0
  speed = np.linalg.norm(obs["velocity"])
  assert speed > 1.0


def test_goal_points_ahead(env):
  obs = env.reset()
  goal = obs["goal"]
  assert goal.shape == (10, 3)
  # Goals are route points ahead in ego frame: x >= 0 near spawn.
  assert goal[1:, 0].mean() > 0.0


def test_nav_env_reward_and_done():
  env = CARLANavEnv(town="Town02", origin=3, destination=40,
                    sensors=("goal",))
  env = FiniteHorizonWrapper(env, max_episode_steps=20)
  obs = env.reset()
  _, reward, done, _ = env.step({"throttle": 0.5})
  assert reward in (0.0, 1.0)
  env.close()


def test_environment_loop_with_carla_metrics():
  from oatomobile_tpu.core.agent import Agent

  class Throttle(Agent):

    def act(self, observations):
      return {"throttle": 0.6, "steer": 0.0, "brake": 0.0}

  env = CARLAEnv(town="Town02", spawn_point=3, destination=40,
                 sensors=("goal",))
  env = TerminateOnCollisionWrapper(
      FiniteHorizonWrapper(env, max_episode_steps=25))
  metrics = [
      StepsMetric(),
      ReturnsMetric(),
      CollisionsMetric(),
      LaneInvasionsMetric(),
      DistanceMetric()
  ]
  results = EnvironmentLoop(Throttle, env, metrics=metrics).run()
  assert results["steps"] <= 25
  assert results["distance"] > 0.0
  assert results["collisions"] == 0


def test_render_returns_rgb(env):
  env.reset()
  frame = env.render(mode="rgb_array")
  assert frame.shape == (200, 200, 3)
  assert frame.dtype == np.uint8


def test_render_human_dashboard(env, tmp_path):
  env.reset()
  env.step({"throttle": 0.5})
  frame = env.render(mode="human")
  # Three square panels side by side + HUD strip underneath.
  assert frame.dtype == np.uint8
  assert frame.shape[1] == 3 * 240
  assert frame.shape[0] > 240  # HUD strip adds rows
  assert frame.max() > 0

  # MonitorWrapper records the dashboard and flushes on close.
  from oatomobile_tpu.core.rl import MonitorWrapper
  out = str(tmp_path / "dash.gif")
  wrapped = MonitorWrapper(
      CARLAEnv(town="Town02", sensors=("velocity",), spawn_point=3,
               destination=40),
      output_fname=out, render_mode="human", record_every=2)
  wrapped.reset()
  for _ in range(4):
    wrapped.step({"throttle": 0.5})
  wrapped.close()
  import imageio.v2 as imageio
  frames = imageio.mimread(out)
  assert len(frames) == 3  # 5 render calls, every 2nd kept
  assert frames[0].shape[1] == 3 * 240


def test_predictions_write_back(env):
  env.reset()
  plan = np.ones((4, 2), dtype=np.float32)
  env.simulator.sensor_suite.get("predictions").predictions = plan
  obs, _, _, _ = env.step({"throttle": 0.0})
  np.testing.assert_array_equal(obs["predictions"], plan)


def test_live_view_wrapper_headless_degrades_gracefully():
  # --live on a headless host must not fail: frames are dropped after a
  # single warning (reference parity: pygame window, graphics.py:41-73).
  import matplotlib
  matplotlib.use("Agg", force=True)
  from oatomobile_tpu.core.rl import LiveViewWrapper
  from oatomobile_tpu.envs.carla import CARLAEnv

  env = LiveViewWrapper(CARLAEnv(town="Town02", sensors=("velocity",)))
  env.reset()
  obs, reward, done, info = env.step(
      {"throttle": 0.5, "steer": 0.0, "brake": 0.0})
  assert "velocity" in obs
  assert env._viewer._dead  # headless -> viewer disabled, not crashed
  env.close()
