"""Tests for the world step: events, lights, routes, vmap/scan equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oatomobile_tpu.maps import load_town
from oatomobile_tpu.sim import (autopilot_policy, init_scene, make_params,
                                stack_scenes, world_step)
from oatomobile_tpu.sim import traffic


@pytest.fixture(scope="module")
def town():
  return load_town("Town02")


@pytest.fixture(scope="module")
def params(town):
  return make_params(town)


def _autopilot_step(params, state, noise=0.0):
  action, state = autopilot_policy(params, state, noise=noise)
  return world_step(params, state, action)


def test_idle_scene_is_stable(town, params):
  state = init_scene(town, spawn_point=0, destination=10)
  step = jax.jit(world_step)
  s = state
  for _ in range(5):
    s = step(params, s, jnp.zeros(3))
  np.testing.assert_allclose(np.asarray(s.hero_xy), np.asarray(state.hero_xy),
                             atol=1e-4)
  assert float(s.collision) == 0.0
  assert int(s.lane_invasion) == 0
  assert int(s.step) == 5


def test_collision_with_npc_ahead(town, params):
  state = init_scene(town, spawn_point=0, destination=10, num_vehicles=1)
  # Teleport the NPC directly ahead of the hero, 4 m away, stopped.
  fwd = jnp.stack([jnp.cos(state.hero_yaw), jnp.sin(state.hero_yaw)])
  state = state.replace(
      npc_xy=(state.hero_xy + 4.0 * fwd)[None, :],
      npc_yaw=state.hero_yaw[None] if state.hero_yaw.ndim else
      jnp.asarray([state.hero_yaw]),
      npc_alive=jnp.asarray([True]),
      npc_speed=jnp.asarray([0.0]),
  )
  step = jax.jit(world_step)
  s = state
  collided = False
  for _ in range(60):
    # Full throttle straight ahead (NPC car-following also stops it, but the
    # hero rams it).
    s = step(params, s, jnp.asarray([1.0, 0.0, 0.0]))
    if float(s.collision) > 0:
      collided = True
      break
  assert collided


def test_lane_invasion_when_steering_off(town, params):
  state = init_scene(town, spawn_point=0, destination=10)
  step = jax.jit(world_step)
  s = state
  fired = 0
  for _ in range(80):
    s = step(params, s, jnp.asarray([0.8, 0.5, 0.0]))  # hard right
    fired += int(s.lane_invasion)
  assert fired >= 1


def test_traffic_light_cycle(params):
  if params.map["tl_xy"].shape[0] == 0:
    pytest.skip("no lights")
  # Over a full cycle, every light passes through green, yellow and red,
  # and the two groups are never green simultaneously at the same junction.
  times = np.arange(0.0, 26.0, 0.5)
  states = np.stack(
      [np.asarray(traffic.traffic_light_states(params, jnp.float32(t)))
       for t in times])
  for l in range(states.shape[1]):
    seen = set(states[:, l].tolist())
    assert {traffic.TL_GREEN, traffic.TL_YELLOW_STATE,
            traffic.TL_RED} <= seen
  group = np.asarray(params.map["tl_group"])
  offset = np.asarray(params.map["tl_offset"])
  # Same-junction lights share an offset; compare group 0 vs 1 lights with
  # identical offsets.
  for off in np.unique(offset):
    sel = offset == off
    g0 = states[:, sel & (group == 0)]
    g1 = states[:, sel & (group == 1)]
    if g0.size and g1.size:
      both_green = (g0[:, 0] == traffic.TL_GREEN) & (
          g1[:, 0] == traffic.TL_GREEN)
      assert not both_green.any()


def test_route_progress_monotonic(town, params):
  state = init_scene(town, spawn_point=3, destination=40, jax_seed=1)
  step = jax.jit(_autopilot_step)
  s = state
  prev = 0
  for _ in range(200):
    s = step(params, s)
    pos = int(s.route_pos)
    assert pos >= prev
    prev = pos
  assert prev > 5  # made progress


def test_autopilot_reaches_destination_vicinity(town, params):
  # Pick origin/destination on the same street a short hop apart.
  state = init_scene(town, spawn_point=3, destination=40, jax_seed=1)
  step = jax.jit(_autopilot_step)
  s = state
  d0 = float(jnp.linalg.norm(s.hero_xy - s.destination_xy))
  for _ in range(900):
    s = step(params, s)
  d1 = float(jnp.linalg.norm(s.hero_xy - s.destination_xy))
  assert float(s.collision) == 0.0
  assert d1 < d0 * 0.6  # clearly approaching


def test_vmap_batch_of_one_matches_single(town, params):
  state = init_scene(town, spawn_point=5, destination=20, jax_seed=7)
  action = jnp.asarray([0.7, 0.05, 0.0])

  single = jax.jit(world_step)(params, state, action)
  batched = jax.jit(jax.vmap(world_step, in_axes=(None, 0, 0)))(
      params, stack_scenes([state]), action[None])
  np.testing.assert_allclose(np.asarray(batched.hero_xy[0]),
                             np.asarray(single.hero_xy), atol=1e-5)
  np.testing.assert_allclose(np.asarray(batched.hero_speed[0]),
                             np.asarray(single.hero_speed), atol=1e-5)


def test_scan_rollout_matches_python_loop(town, params):
  from oatomobile_tpu.sim import rollout
  state = init_scene(town, spawn_point=5, destination=20, jax_seed=3)
  T = 10
  actions = jnp.tile(jnp.asarray([0.5, 0.0, 0.0]), (T, 1))

  final_scan, _ = jax.jit(lambda p, s, a: rollout(p, s, a))(params, state,
                                                            actions)
  s = state
  step = jax.jit(world_step)
  for t in range(T):
    s = step(params, s, actions[t])
  np.testing.assert_allclose(np.asarray(final_scan.hero_xy),
                             np.asarray(s.hero_xy), atol=1e-5)
  assert int(final_scan.step) == int(s.step) == T


def test_determinism_same_seed(town, params):
  a = init_scene(town, spawn_point=2, destination=30, num_vehicles=4,
                 jax_seed=11)
  b = init_scene(town, spawn_point=2, destination=30, num_vehicles=4,
                 jax_seed=11)
  step = jax.jit(_autopilot_step)
  for _ in range(30):
    a = step(params, a)
    b = step(params, b)
  np.testing.assert_array_equal(np.asarray(a.hero_xy), np.asarray(b.hero_xy))
  np.testing.assert_array_equal(np.asarray(a.npc_xy), np.asarray(b.npc_xy))
