"""Tests for cameras, game_state, red-light sensor, and multi-town envs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oatomobile_tpu.maps import load_town
from oatomobile_tpu.sensors import cameras, synth
from oatomobile_tpu.sim import init_scene, make_params, world_step


@pytest.fixture(scope="module")
def scene():
  town = load_town("Town02")
  params = make_params(town)
  state = init_scene(town, spawn_point=3, destination=40, num_vehicles=4,
                     num_pedestrians=2, jax_seed=0)
  return params, state


def test_camera_shapes_and_classes(scene):
  params, state = scene
  cls = jax.jit(lambda p, s: cameras.camera_classes(p, s, 0.0))(params,
                                                                state)
  cls = np.asarray(cls)
  assert cls.shape == (cameras.IMAGE_H, cameras.IMAGE_W)
  # Sky at the top, something ground-ish at the bottom.
  assert (cls[0] == cameras.SKY).mean() > 0.5
  assert (cls[-1] != cameras.SKY).all()
  # Road visible straight ahead (the hero spawns on a lane).
  center_col = cls[:, cameras.IMAGE_W // 2]
  assert (center_col == cameras.ROAD).any()


def test_camera_rgb_range(scene):
  params, state = scene
  img = np.asarray(
      jax.jit(lambda p, s: cameras.camera_rgb(p, s, 0.0))(params, state))
  assert img.shape == (180, 320, 3)
  assert img.min() >= 0.0 and img.max() <= 1.0


def test_rear_camera_differs_from_front(scene):
  params, state = scene
  front = np.asarray(cameras.camera_classes(params, state, 0.0))
  rear = np.asarray(cameras.camera_classes(params, state, 180.0))
  assert (front != rear).mean() > 0.05


def test_game_state_channels(scene):
  params, state = scene
  gs = np.asarray(jax.jit(synth.game_state)(params, state))
  assert gs.shape == (synth.GAME_STATE_SIZE, synth.GAME_STATE_SIZE, 8)
  assert set(np.unique(gs)) <= {0, 1}
  road, lanes, vehicles, peds, green, yellow, red, hero = np.moveaxis(
      gs, -1, 0)
  assert road.any()       # hero is on a road
  assert hero.any()       # hero box at the center
  center = synth.GAME_STATE_SIZE // 2
  assert hero[center, center] == 1
  assert vehicles.sum() >= 0  # NPC boxes may be outside the 64 m window


def test_red_light_invasion_counts(scene):
  params, state = scene
  # Normal driving from spawn: no red-light invasion immediately.
  s = state
  step = jax.jit(world_step)
  for _ in range(5):
    s = step(params, s, jnp.asarray([0.5, 0.0, 0.0]))
  assert int(s.red_light_invasion) == 0


def test_multi_town_env_merges_batches():
  from oatomobile_tpu.envs.multi_town import MultiTownBatchedEnv
  env = MultiTownBatchedEnv(towns=("Town01", "Town02"), batch_size=4,
                            seed=1)
  obs = env.reset()
  assert obs["location"].shape[0] == 4
  obs, done = env.step(np.zeros((4, 3), np.float32))
  assert done.shape == (4,)
  finals, _, stats = env.rollout(5)
  assert len(finals) == 2
  assert stats["distance"].shape == (4,)
