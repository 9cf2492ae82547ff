"""Parallelism semantics: sharded == unsharded, checkpoint round trips.

SURVEY.md §4's parallelism test prescriptions: vmap(1)==single (covered in
test_world.py), pjit on 1 device == N devices with the same seeds, and
checkpoint save/restore round trips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from oatomobile_tpu.parallel import dp, mesh as mesh_lib


def _toy_setup():
  """NOTE: update steps donate the TrainState buffers; every TrainState
  must be created from a fresh params pytree (hence the factory)."""

  def loss_fn(params, batch, rng):
    del rng
    pred = batch["x"] @ params["w"] + params["b"]
    return jnp.mean((pred - batch["y"])**2)

  def make_params():
    return {
        "w": jnp.ones((8, 4)) * 0.1,
        "b": jnp.zeros((4,)),
    }

  tx = optax.adam(1e-2)
  rng = np.random.RandomState(0)
  batch = {
      "x": jnp.asarray(rng.randn(16, 8), jnp.float32),
      "y": jnp.asarray(rng.randn(16, 4), jnp.float32),
  }
  return loss_fn, make_params, tx, batch


def test_dp_sharded_matches_single_device():
  loss_fn, make_params, tx, batch = _toy_setup()

  # Single-device reference.
  update1 = dp.make_update_fn(loss_fn, tx, mesh=None)
  state1 = dp.TrainState.create(make_params(), tx, jax.random.PRNGKey(0))
  for _ in range(5):
    state1, loss1 = update1(state1, batch)

  # 8-device dp mesh.
  mesh = mesh_lib.make_mesh()
  assert mesh.devices.size == 8
  update8 = dp.make_update_fn(loss_fn, tx, mesh=mesh)
  state8 = dp.TrainState.create(make_params(), tx, jax.random.PRNGKey(0))
  state8 = dp.replicate_state(mesh, state8)
  for _ in range(5):
    state8, loss8 = update8(state8, batch)

  np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(state1.params["w"]),
                             np.asarray(state8.params["w"]), atol=1e-5)


def test_batched_env_mesh_matches_unsharded():
  from oatomobile_tpu.envs.batched import BatchedEnv
  mesh = mesh_lib.make_mesh()
  a = BatchedEnv("Town02", batch_size=8, num_vehicles=2, seed=3)
  b = BatchedEnv("Town02", batch_size=8, num_vehicles=2, seed=3, mesh=mesh)
  fa, _, sa = a.rollout(10)
  fb, _, sb = b.rollout(10)
  np.testing.assert_allclose(np.asarray(fa.hero_xy), np.asarray(fb.hero_xy),
                             atol=1e-5)
  np.testing.assert_allclose(np.asarray(sa["distance"]),
                             np.asarray(sb["distance"]), atol=1e-5)


def test_train_state_checkpoint_roundtrip(tmp_path):
  from oatomobile_tpu.utils.checkpoint import Checkpointer
  loss_fn, make_params, tx, batch = _toy_setup()
  update = dp.make_update_fn(loss_fn, tx, mesh=None)
  state = dp.TrainState.create(make_params(), tx, jax.random.PRNGKey(1))
  for _ in range(3):
    state, _ = update(state, batch)

  ckpt = Checkpointer(str(tmp_path), prefix="train_state")
  ckpt.save(3, jax.device_get(state))
  template = dp.TrainState.create(make_params(), tx, jax.random.PRNGKey(1))
  restored = ckpt.load(3, jax.device_get(template))
  assert int(restored.step) == 3
  np.testing.assert_allclose(np.asarray(restored.params["w"]),
                             np.asarray(state.params["w"]))
  # Continue training from the restored state: identical next step.
  state_next, loss_a = update(state, batch)
  restored_next, loss_b = update(restored, batch)
  np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)


def test_batched_env_mesh_matches_unsharded_256():
  # VERDICT r2 item 4: the dp-sharded *env* must agree with the
  # unsharded one at production-like scene counts, not just batch 8.
  from oatomobile_tpu.envs.batched import BatchedEnv
  mesh = mesh_lib.make_mesh()
  a = BatchedEnv("Town02", batch_size=256, num_vehicles=4, seed=11)
  b = BatchedEnv("Town02", batch_size=256, num_vehicles=4, seed=11,
                 mesh=mesh)
  fa, _, sa = a.rollout(12)
  fb, _, sb = b.rollout(12)
  np.testing.assert_allclose(np.asarray(fa.hero_xy), np.asarray(fb.hero_xy),
                             atol=1e-5)
  np.testing.assert_allclose(np.asarray(sa["distance"]),
                             np.asarray(sb["distance"]), atol=1e-5)
  assert np.asarray(sa["distance"]).sum() > 0.0


def test_ensemble_mp_sharded_matches_unsharded():
  # VERDICT r3 item 6: the stacked-ensemble layout (K over mp, batch over
  # dp) must reproduce the single-device update exactly.  Toy stacked
  # model; the production RIP trainer is covered end-to-end by
  # test_pipeline.py::test_rip_mp_sharded_matches_unsharded.
  K = 4
  rng = np.random.RandomState(1)
  batch = {
      "x": jnp.asarray(rng.randn(16, 8), jnp.float32),
      "y": jnp.asarray(rng.randn(16, 4), jnp.float32),
  }

  def make_stacked():
    return {
        "w": jnp.full((K, 8, 4), 0.1, jnp.float32),
        "b": jnp.zeros((K, 4)),
    }

  def loss_fn(stacked, batch):
    def member(p):
      pred = batch["x"] @ p["w"] + p["b"]
      return jnp.mean((pred - batch["y"])**2)

    return jnp.mean(jax.vmap(member)(stacked))

  tx = optax.adam(1e-2)

  @jax.jit
  def update(stacked, opt_state, batch):
    loss, grads = jax.value_and_grad(loss_fn)(stacked, batch)
    updates, opt_state = tx.update(grads, opt_state, stacked)
    return optax.apply_updates(stacked, updates), opt_state, loss

  # Unsharded reference.
  s1 = make_stacked()
  o1 = tx.init(s1)
  for _ in range(5):
    s1, o1, l1 = update(s1, o1, batch)

  # (dp=2, mp=4) mesh: ensemble over mp, batch over dp.
  mesh = mesh_lib.ensemble_mesh(K)
  assert mesh.shape["mp"] == 4 and mesh.shape["dp"] == 2
  s8 = mesh_lib.shard_ensemble(mesh, make_stacked(), K)
  o8 = mesh_lib.shard_ensemble(mesh, tx.init(s8), K)
  sharded_batch = mesh_lib.shard_batch(mesh, batch)
  for _ in range(5):
    s8, o8, l8 = update(s8, o8, sharded_batch)

  # Params stayed mp-sharded through the update.
  w_sharding = s8["w"].sharding
  assert w_sharding.spec[0] == mesh_lib.MODEL_AXIS
  np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(s1["w"]), np.asarray(s8["w"]),
                             atol=1e-5)


def test_dryrun_multichip_full_pipeline(capsys):
  # The graft dryrun runs rollout -> in-graph collect -> sharded ensemble
  # train step; assert all three phases execute and report layouts.
  import __graft_entry__ as graft
  graft.dryrun_multichip(8)
  out = capsys.readouterr().out
  assert "rollout: scenes=" in out
  assert "collect: windows=" in out
  assert "train: params sharding=" in out
  assert "dryrun_multichip OK" in out
