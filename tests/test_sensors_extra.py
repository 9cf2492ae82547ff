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


def test_bev_vehicle_budget_covers_dense_town():
  """The nearest-first vehicle budget must be lossless at the densest
  benchmark configuration: 100 NPCs in Town02 (the smallest town).
  Measured over a 600-step rollout: max 21 vehicles inside the 50 m BEV
  window (p99 17.2) — hence MAX_BEV_VEHICLES = 24.  Reference semantics:
  the numpy histogram splats every point (utils/carla.py:165-233)."""
  from oatomobile_tpu.envs.batched import BatchedEnv
  from oatomobile_tpu.ops import bev

  env = BatchedEnv(town="Town02", batch_size=8, sensors=("location",),
                   num_vehicles=100, seed=13, auto_reset=False)
  env.reset()
  st, _, _ = env.rollout(150, collect=())
  d = np.linalg.norm(
      np.asarray(st.npc_xy) - np.asarray(st.hero_xy)[:, None, :], axis=-1)
  in_range = ((d < bev.METERS_MAX) & np.asarray(st.npc_alive)).sum(-1)
  assert in_range.max() <= bev.MAX_BEV_VEHICLES

  # Budgeted splat == unbudgeted splat on these states (bit-exact).
  budgeted = jax.jit(jax.vmap(
      lambda s: bev.splat_lidar(env.params, s)))(st)
  unbudgeted = jax.jit(jax.vmap(
      lambda s: bev.splat_lidar(env.params, s, max_vehicles=100)))(st)
  np.testing.assert_array_equal(np.asarray(budgeted),
                                np.asarray(unbudgeted))


def test_bev_vehicle_budget_adversarial_bound():
  """Quantifies the budget's worst case: 100 vehicles packed into a 45 m
  disc (never reached by benchmark traffic — see the dense-town test).
  At budget 24 the error is bounded and affects <4% of pixels; recorded
  so budget changes are a conscious decision."""
  from oatomobile_tpu.envs.batched import BatchedEnv
  from oatomobile_tpu.ops import bev

  env = BatchedEnv(town="Town02", batch_size=1, sensors=("location",),
                   num_vehicles=100, seed=0, auto_reset=False)
  env.reset()
  st, _, _ = env.rollout(1, collect=())
  one = jax.tree.map(lambda x: x[0], st)
  rng = np.random.RandomState(0)
  ang = rng.uniform(0, 2 * np.pi, 100)
  rad = np.sqrt(rng.uniform(0.04, 1, 100)) * 45
  xy = np.asarray(one.hero_xy)[None, :] + np.stack(
      [rad * np.cos(ang), rad * np.sin(ang)], -1)
  one = one.replace(npc_xy=jnp.asarray(xy, jnp.float32),
                    npc_alive=jnp.ones(100, bool),
                    npc_yaw=jnp.asarray(
                        rng.uniform(-np.pi, np.pi, 100), jnp.float32))
  budgeted = np.asarray(bev.splat_lidar(env.params, one))
  # The no-budget reference uses the exact interval method: with 100
  # boxes stacked into one block, the blocked method's own culling would
  # make the reference approximate too.
  unbudgeted = np.asarray(
      bev.splat_lidar(env.params, one, max_vehicles=100,
                      method="interval"))
  diff = np.abs(budgeted - unbudgeted)
  assert (diff > 1e-6).mean() < 0.04
  # The error is one-sided: the budget can only *miss* obstacles
  # (dropped boxes), never hallucinate them in the above channel.
  assert (budgeted[..., 1] <= unbudgeted[..., 1] + 1e-6).all()


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


def test_interval_splat_matches_dense():
  # The interval-form splat (default hot path) must agree with the dense
  # half-plane reference except at pixels within float rounding of a
  # rect edge (< 0.01% of pixels on real scenes).
  import jax
  from oatomobile_tpu.maps import load_town
  from oatomobile_tpu.ops import bev
  from oatomobile_tpu.sim import init_scene_batch, make_params, world_step
  import jax.numpy as jnp

  for town_name, nv, npd in (("Town02", 8, 4), ("Town03", 12, 0)):
    town = load_town(town_name)
    params = make_params(town)
    states = init_scene_batch(town, 4, num_vehicles=nv,
                              num_pedestrians=npd, seed=11)
    step = jax.jit(jax.vmap(world_step, in_axes=(None, 0, 0)))
    actions = jnp.tile(jnp.asarray([0.7, 0.2, 0.0]), (4, 1))
    for _ in range(20):
      states = step(params, states, actions)
    dense = jax.vmap(
        lambda s: bev.splat_lidar(params, s, method="dense"))(states)
    for method in ("interval", "blocked"):
      fast = jax.vmap(
          lambda s: bev.splat_lidar(params, s, method=method))(states)
      diff = np.asarray(fast != dense).mean()
      assert diff < 1e-4, (town_name, method, diff)


def test_blocked_splat_budget_covers_dense_town():
  # The row-block budget (bev.BLOCK_BUDGET) must cover the peak number of
  # rects with a nonempty column interval in any 25-row block, measured
  # on the densest benchmark-like configuration (Town02, 100 vehicles)
  # over a rollout — otherwise the blocked method drops occupancy.
  import jax
  import jax.numpy as jnp
  from oatomobile_tpu.maps import load_town
  from oatomobile_tpu.ops import bev
  from oatomobile_tpu.sim import (autopilot_policy, init_scene_batch,
                                  make_params, world_step)

  town = load_town("Town02")
  params = make_params(town)
  states = init_scene_batch(town, 8, num_vehicles=100, seed=5)

  def peak_nonempty(state):
    wall_sel = bev.nearest_rects(
        params.map["wall_rects"], state.hero_xy,
        min(bev.MAX_BEV_WALLS, params.wall_budget),
        max_range=bev.METERS_MAX * 1.04)
    cos_y, sin_y = jnp.cos(state.hero_yaw), jnp.sin(state.hero_yaw)
    mid, half = bev.rect_column_intervals(wall_sel, state.hero_xy,
                                          cos_y, sin_y)
    rel = state.npc_xy - state.hero_xy[None, :]
    sel = bev._nearest_k(rel, state.npc_alive, bev.MAX_BEV_VEHICLES)
    rel_sel = rel[sel]
    u = cos_y * rel_sel[:, 0] + sin_y * rel_sel[:, 1]
    v = -sin_y * rel_sel[:, 0] + cos_y * rel_sel[:, 1]
    half_lw = jnp.stack([
        jnp.full(sel.shape, params.vehicle.length / 2.0),
        jnp.full(sel.shape, params.vehicle.width / 2.0)], axis=-1)
    in_range = jnp.linalg.norm(rel_sel, axis=-1) < (bev.METERS_MAX * 1.5)
    bm, bh = bev._box_intervals(jnp.stack([u, v], -1),
                                state.npc_yaw[sel] - state.hero_yaw,
                                half_lw, state.npc_alive[sel] & in_range)
    half_all = jnp.concatenate([half, bh], -1)   # [H, R]
    nonempty = (half_all >= 0.0).reshape(
        half_all.shape[0] // bev.BLOCK_ROWS, bev.BLOCK_ROWS, -1)
    return jnp.max(jnp.sum(jnp.any(nonempty, axis=1), axis=-1))

  def policy(s):
    return autopilot_policy(params, s, noise=0.0)

  step = jax.jit(jax.vmap(
      lambda s: world_step(params, s, policy(s)[0])))
  peak = 0
  for t in range(120):
    states = step(states)
    if t % 10 == 0:
      peak = max(peak, int(jnp.max(jax.vmap(peak_nonempty)(states))))
  assert peak <= bev.BLOCK_BUDGET, peak


def test_full_town_game_state_matches_window_crop():
  # The whole-town masks (reference GameStateSensor parity) must agree
  # with the hero-centric window where they overlap.
  import jax
  import jax.numpy as jnp
  from oatomobile_tpu.maps import load_town
  from oatomobile_tpu.sensors import synth
  from oatomobile_tpu.sim import init_scene, make_params

  town = load_town("Town02")
  params = make_params(town)
  state = init_scene(town, spawn_point=5, destination=60, num_vehicles=6,
                     jax_seed=3)
  full = np.asarray(jax.jit(synth.full_town_game_state)(params, state))
  assert full.shape == town.road_mask.shape + (8,)
  # Hero channel: exactly one box, centered at the hero.
  assert full[..., 7].sum() > 0
  ij = np.argwhere(full[..., 7])
  center = ij.mean(0) / town.raster_ppm + town.raster_origin
  np.testing.assert_allclose(center, np.asarray(state.hero_xy), atol=1.0)
  # Vehicle channel nonzero and disjoint from hero center pixel.
  assert full[..., 2].sum() > 0
  # Road mask channel is the static raster itself.
  np.testing.assert_array_equal(full[..., 0].astype(bool), town.road_mask)
