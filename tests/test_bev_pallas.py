"""Pallas BEV kernel vs the XLA reference implementation."""

import jax
import numpy as np
import pytest

from oatomobile_tpu.maps import load_town
from oatomobile_tpu.ops import bev, bev_pallas
from oatomobile_tpu.sim import init_scene_batch, make_params


@pytest.mark.parametrize("num_vehicles,num_peds", [(0, 0), (6, 3)])
def test_pallas_matches_xla_reference(num_vehicles, num_peds):
  town = load_town("Town02")
  params = make_params(town)
  states = init_scene_batch(town, 3, num_vehicles=num_vehicles,
                            num_pedestrians=num_peds, seed=7)
  ref = jax.vmap(lambda s: bev.splat_lidar(params, s,
                                           method="dense"))(states)
  out = bev_pallas.splat_lidar_pallas(params, states, interpret=True)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pallas_after_motion():
  town = load_town("Town02")
  params = make_params(town)
  states = init_scene_batch(town, 2, num_vehicles=4, seed=9)
  # Advance the world so heroes are rotated/moved off spawn.
  from oatomobile_tpu.sim import world_step
  import jax.numpy as jnp
  step = jax.jit(jax.vmap(world_step, in_axes=(None, 0, 0)))
  actions = jnp.tile(jnp.asarray([0.8, 0.3, 0.0]), (2, 1))
  for _ in range(25):
    states = step(params, states, actions)
  ref = jax.vmap(lambda s: bev.splat_lidar(params, s,
                                           method="dense"))(states)
  out = bev_pallas.splat_lidar_pallas(params, states, interpret=True)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
