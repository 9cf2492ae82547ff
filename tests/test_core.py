"""Tests for the core API layer (registry, spaces, rl, loop, episode)."""

import numpy as np
import pytest

import oatomobile_tpu
from oatomobile_tpu.core.registry import registry
from oatomobile_tpu.core.rl import (Env, FiniteHorizonWrapper, ReturnsMetric,
                                    StepsMetric, Wrapper)
from oatomobile_tpu.core.simulator import (Observations, Sensor, SensorSuite,
                                           Simulator)
from oatomobile_tpu.core.loop import EnvironmentLoop
from oatomobile_tpu.core.agent import Agent
from oatomobile_tpu.core.dataset import Episode, tokens
from oatomobile_tpu.utils import spaces


class _CounterSensor(Sensor):

  def __init__(self):
    self._count = 0
    super().__init__()

  def _get_uuid(self, *args, **kwargs):
    return "counter"

  def _get_sensor_type(self, *args, **kwargs):
    return None

  @property
  def observation_space(self):
    return spaces.Box(low=-np.inf, high=np.inf, shape=(1,), dtype=np.float32)

  def get_observation(self, *args, **kwargs):
    self._count += 1
    return np.asarray([self._count], dtype=np.float32)


class _FakeSimulator(Simulator):

  def __init__(self, **kwargs):
    self._suite = SensorSuite([_CounterSensor()])

  @property
  def sensor_suite(self):
    return self._suite

  def action_space(self):
    return spaces.Box(low=-1.0, high=1.0, shape=(2,), dtype=np.float32)

  def seed(self, seed):
    pass

  def reset(self):
    return self._suite.get_observations()

  def step(self, action):
    return self._suite.get_observations()

  def render(self, mode="rgb_array", *args, **kwargs):
    return np.zeros((4, 4, 3), dtype=np.uint8)

  def close(self):
    pass


class _NullAgent(Agent):

  def act(self, observations):
    return np.zeros((2,), dtype=np.float32)


def test_public_api_names():
  for name in oatomobile_tpu.__all__:
    assert hasattr(oatomobile_tpu, name), name


def test_env_step_contract():
  env = Env(sim_fn=_FakeSimulator)
  obs = env.reset()
  assert "counter" in obs
  obs, reward, done, info = env.step(np.zeros(2))
  assert reward == 0.0 and done is False and isinstance(info, dict)


def test_finite_horizon_wrapper_terminates():
  env = FiniteHorizonWrapper(Env(sim_fn=_FakeSimulator), max_episode_steps=3)
  env.reset()
  done = False
  steps = 0
  while not done:
    _, _, done, _ = env.step(np.zeros(2))
    steps += 1
  assert steps == 3


def test_environment_loop_with_metrics():
  env = FiniteHorizonWrapper(Env(sim_fn=_FakeSimulator), max_episode_steps=5)
  metrics = [StepsMetric(), ReturnsMetric()]
  results = EnvironmentLoop(_NullAgent, env, metrics=metrics).run()
  assert results["steps"] == 5
  assert results["returns"] == 0.0


def test_wrapper_delegation():
  env = FiniteHorizonWrapper(Env(sim_fn=_FakeSimulator), max_episode_steps=3)
  assert env.unwrapped is not env
  assert isinstance(env.observation_space, spaces.Dict)
  assert env.simulator is env.unwrapped.simulator


def test_registry_roundtrip():
  @registry.register_simulator(name="fake_sim_test")
  class _Registered(_FakeSimulator):
    pass

  assert registry.get_simulator("fake_sim_test") is _Registered
  assert registry.get_simulator("missing") is None


def test_episode_roundtrip(tmp_path):
  episode = Episode(str(tmp_path), next(tokens))
  for t in range(3):
    episode.append(location=np.asarray([t, 0.0, 0.0], dtype=np.float32))
  seq = episode.fetch()
  assert len(seq) == 3
  sample = episode.read_sample(seq[1], attr="location")
  np.testing.assert_allclose(sample, [1.0, 0.0, 0.0])


def test_episode_append_batch(tmp_path):
  episode = Episode(str(tmp_path), next(tokens))
  episode.append_batch({
      "location": np.arange(12, dtype=np.float32).reshape(4, 3),
      "speed": np.arange(4, dtype=np.float32),
  })
  seq = episode.fetch()
  assert len(seq) == 4
  np.testing.assert_allclose(
      episode.read_sample(seq[2], attr="location"), [6.0, 7.0, 8.0])


def test_spaces_sample_contains():
  box = spaces.Box(low=0.0, high=1.0, shape=(3,))
  assert box.contains(box.sample())
  disc = spaces.Discrete(4)
  assert disc.contains(disc.sample())
  dct = spaces.Dict(a=box, b=disc)
  assert dct.contains(dct.sample())
