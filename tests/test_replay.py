"""Golden trajectory replay: determinism guard for the world model.

The SURVEY's test strategy calls for held-back trajectory replays
(SURVEY.md §4): drive a recorded control sequence through the simulator
and assert trajectory agreement.  The golden file pins the dynamics,
traffic, events and RNG semantics — any refactor that silently changes
simulation behaviour fails here.

Regenerate (after an *intentional* behaviour change) with:
  python tests/regen_golden.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from oatomobile_tpu.maps import load_town
from oatomobile_tpu.sim import init_scene, make_params, rollout

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "golden_replay_town02.npz")


def test_golden_replay_matches():
  golden = np.load(GOLDEN)
  town = load_town("Town02")
  params = make_params(town)
  state = init_scene(town, spawn_point=3, destination=40, num_vehicles=4,
                     jax_seed=123)
  final, traj = jax.jit(lambda p, s, a: rollout(p, s, a))(
      params, state, jnp.asarray(golden["actions"]))

  np.testing.assert_allclose(np.asarray(traj.hero_xy), golden["hero_xy"],
                             atol=1e-3)
  np.testing.assert_allclose(np.asarray(traj.hero_yaw), golden["hero_yaw"],
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(traj.hero_speed),
                             golden["hero_speed"], atol=1e-3)
  np.testing.assert_array_equal(np.asarray(traj.collision) > 0,
                                golden["collision"] > 0)
  np.testing.assert_array_equal(np.asarray(traj.lane_invasion),
                                golden["lane_invasion"])
  np.testing.assert_allclose(np.asarray(final.npc_xy),
                             golden["npc_xy_final"], atol=1e-3)


def test_replay_is_physically_sane():
  golden = np.load(GOLDEN)
  speed = golden["hero_speed"]
  xy = golden["hero_xy"]
  # Speed bounded by the drag-limited top speed; displacement per step
  # bounded by speed * dt.
  assert speed.max() < 30.0
  step_dist = np.linalg.norm(np.diff(xy, axis=0), axis=1)
  assert np.all(step_dist <= speed[1:] * 0.05 + 1e-4)
  # The braking window (steps 60-70 at full brake) decelerates.
  assert speed[69] < speed[60]
