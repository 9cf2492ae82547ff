"""Tests for MLP / MobileNetV2 / AutoregressiveFlow / DIM / CIL models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oatomobile_tpu.models import (MLP, AutoregressiveFlow, BehaviouralModel,
                                   ImitativeModel, MobileNetV2)


@pytest.fixture(scope="module")
def rng():
  return jax.random.PRNGKey(0)


def test_mlp_shapes(rng):
  mlp = MLP(output_sizes=(64, 64, 64), activate_final=True)
  params = mlp.init(rng, jnp.zeros((2, 133)))
  out = mlp.apply(params, jnp.zeros((2, 133)))
  assert out.shape == (2, 64)
  assert (np.asarray(out) >= 0).all()  # final ReLU applied


def test_mobilenet_v2_shapes(rng):
  net = MobileNetV2(num_classes=128)
  x = jnp.zeros((2, 100, 100, 2))
  params = net.init(rng, x)
  out = net.apply(params, x)
  assert out.shape == (2, 128)
  n_params = sum(p.size for p in jax.tree.leaves(params))
  # torchvision mobilenet_v2(num_classes=128) ~ 2.4M params; ours should be
  # in the same ballpark.
  assert 1.5e6 < n_params < 4e6


def test_flow_forward_inverse_identity(rng):
  flow = AutoregressiveFlow(output_shape=(4, 2))
  z = jax.random.normal(jax.random.PRNGKey(1), (3, 64))
  x = jax.random.normal(jax.random.PRNGKey(2), (3, 4, 2))
  params = flow.init(rng, z, jax.random.PRNGKey(3))

  y, logdet_f = flow.apply(params, x, z, method=flow._forward)
  x_rec, log_prob, logdet_i = flow.apply(params, y, z, method=flow._inverse)
  np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
  np.testing.assert_allclose(np.asarray(logdet_f), np.asarray(logdet_i),
                             atol=1e-4)


def test_flow_logabsdet_matches_autodiff_jacobian(rng):
  flow = AutoregressiveFlow(output_shape=(4, 2))
  z = jax.random.normal(jax.random.PRNGKey(1), (1, 64))
  x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 2))
  params = flow.init(rng, z, jax.random.PRNGKey(3))

  def f(flat_x):
    y, _ = flow.apply(params, flat_x.reshape(1, 4, 2), z,
                      method=flow._forward)
    return y.reshape(-1)

  J = jax.jacfwd(f)(x.reshape(-1))
  _, slogdet = jnp.linalg.slogdet(J)
  _, logdet = flow.apply(params, x, z, method=flow._forward)
  np.testing.assert_allclose(float(slogdet), float(logdet[0]), atol=1e-3)


def test_flow_log_prob_is_normalised_gaussianly(rng):
  # x ~ N(0, I) pushed through the flow must have
  # log p(y) = log N(x) - logabsdet when inverted.
  flow = AutoregressiveFlow(output_shape=(4, 2))
  z = jax.random.normal(jax.random.PRNGKey(1), (5, 64))
  params = flow.init(rng, z, jax.random.PRNGKey(3))
  x = jax.random.normal(jax.random.PRNGKey(4), (5, 4, 2))
  y, _ = flow.apply(params, x, z, method=flow._forward)
  x_rec, log_prob, _ = flow.apply(params, y, z, method=flow._inverse)
  expected = -0.5 * np.sum(np.asarray(x_rec)**2, axis=(1, 2)) - \
      0.5 * 8 * np.log(2 * np.pi)
  np.testing.assert_allclose(np.asarray(log_prob), expected, atol=1e-4)


def _dim_context(batch=2):
  return dict(
      visual_features=jnp.zeros((batch, 100, 100, 2)),
      velocity=jnp.zeros((batch, 3)),
      is_at_traffic_light=jnp.zeros((batch, 1)),
      traffic_light_state=jnp.zeros((batch, 1)),
  )


def test_dim_log_prob_and_plan(rng):
  model = ImitativeModel(output_shape=(4, 2))
  ctx = _dim_context()
  y = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 2))
  params = model.init(rng, y, method=model.log_prob, **ctx)

  lp = model.apply(params, y, method=model.log_prob, **ctx)
  assert lp.shape == (2,)

  goal = jnp.tile(jnp.asarray([[5.0, 0.0]]), (2, 10, 1))
  plan = jax.jit(lambda p: model.apply(p, num_steps=3, goal=goal, lr=0.1,
                                       method=model.plan, **ctx))(params)
  assert plan.shape == (2, 4, 2)
  assert np.isfinite(np.asarray(plan)).all()


def test_dim_transform_shapes():
  model = ImitativeModel(output_shape=(4, 2))
  sample = {
      "player_future": jnp.zeros((2, 80, 2)),
      "lidar": jnp.zeros((2, 200, 200, 2)),
  }
  out = model.transform(sample)
  assert out["player_future"].shape == (2, 4, 2)
  assert out["visual_features"].shape == (2, 100, 100, 2)
  assert "lidar" not in out


def test_cil_forward_and_transform(rng):
  model = BehaviouralModel(output_shape=(8, 2))
  ctx = dict(_dim_context(), mode=jnp.zeros((2, 1)))
  params = model.init(rng, **ctx)
  plan = model.apply(params, **ctx)
  assert plan.shape == (2, 8, 2)

  sample = model.transform({"mode": jnp.asarray([[1.0], [2.0]])})
  np.testing.assert_array_equal(np.asarray(sample["mode"]), [[0.0], [2.0]])


def test_dim_plan_improves_goal_reaching(rng):
  # With a strong goal term and enough steps, the plan endpoint moves
  # towards the goal relative to a 0-step plan.
  model = ImitativeModel(output_shape=(4, 2))
  ctx = _dim_context(batch=1)
  y = jnp.zeros((1, 4, 2))
  params = model.init(rng, y, method=model.log_prob, **ctx)
  goal = jnp.tile(jnp.asarray([[3.0, 1.0]]), (1, 10, 1))

  plan0 = model.apply(params, num_steps=1, goal=goal, lr=0.0,
                      method=model.plan, **ctx)
  planN = model.apply(params, num_steps=30, goal=goal, lr=0.2, epsilon=0.3,
                      method=model.plan, **ctx)
  d0 = np.linalg.norm(np.asarray(plan0)[0, -1] - np.asarray([3.0, 1.0]))
  dN = np.linalg.norm(np.asarray(planN)[0, -1] - np.asarray([3.0, 1.0]))
  assert dN < d0


def test_dim_plan_is_per_scene_independent(rng):
  # Batched planning must equal per-scene planning: scene b's plan depends
  # only on scene b's context/goal (the reference's batch-mean objective is
  # only correct at B=1).
  model = ImitativeModel(output_shape=(4, 2))
  ctx = _dim_context(batch=2)
  ctx["velocity"] = jnp.asarray([[1.0, 0.0, 0.0], [4.0, 0.0, 0.0]])
  y = jnp.zeros((2, 4, 2))
  params = model.init(rng, y, method=model.log_prob, **ctx)
  goal = jnp.stack([
      jnp.tile(jnp.asarray([[6.0, 2.0]]), (10, 1)),
      jnp.tile(jnp.asarray([[-3.0, -5.0]]), (10, 1)),
  ])

  batched = model.apply(params, num_steps=8, goal=goal, lr=0.1, epsilon=0.5,
                        method=model.plan, **ctx)
  for b in range(2):
    ctx_b = {k: v[b:b + 1] for k, v in ctx.items()}
    single = model.apply(params, num_steps=8, goal=goal[b:b + 1], lr=0.1,
                         epsilon=0.5, method=model.plan, **ctx_b)
    np.testing.assert_allclose(np.asarray(batched[b]),
                               np.asarray(single[0]), atol=1e-4)
  # The two scenes got genuinely different plans.
  assert np.abs(np.asarray(batched[0]) - np.asarray(batched[1])).max() > 0.5


def test_dim_plan_untrained_model_tracks_best_iterate(rng):
  # loss_best starts at +inf, so even an untrained flow (whose losses may
  # all exceed the reference's 1000.0 init) returns an optimised plan, not
  # the untouched zeros-init decode.
  model = ImitativeModel(output_shape=(4, 2))
  ctx = _dim_context(batch=1)
  y = jnp.zeros((1, 4, 2))
  params = model.init(rng, y, method=model.log_prob, **ctx)
  # Far goal with tiny epsilon: the goal term dominates and every loss is
  # astronomically positive (>> 1000) for an untrained model.
  goal = jnp.tile(jnp.asarray([[400.0, 0.0]]), (1, 10, 1))
  plan0 = model.apply(params, num_steps=1, goal=goal, lr=0.0, epsilon=1e-3,
                      method=model.plan, **ctx)
  planN = model.apply(params, num_steps=40, goal=goal, lr=0.5, epsilon=1e-3,
                      method=model.plan, **ctx)
  d0 = np.linalg.norm(np.asarray(plan0)[0, -1] - np.asarray([400.0, 0.0]))
  dN = np.linalg.norm(np.asarray(planN)[0, -1] - np.asarray([400.0, 0.0]))
  assert dN < d0  # best-tracking engaged despite losses > 1000


def test_rip_plan_is_per_scene_independent(rng):
  from oatomobile_tpu.baselines.learned.rip.agent import (rip_plan,
                                                          stack_ensemble)
  model = ImitativeModel(output_shape=(4, 2))
  ctx = _dim_context(batch=2)
  ctx["velocity"] = jnp.asarray([[2.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
  y = jnp.zeros((2, 4, 2))
  params_list = [
      model.init(jax.random.PRNGKey(s), y, method=model.log_prob, **ctx)
      for s in (0, 1, 2)
  ]
  stacked = stack_ensemble(params_list)
  goal = jnp.stack([
      jnp.tile(jnp.asarray([[5.0, 1.0]]), (10, 1)),
      jnp.tile(jnp.asarray([[-4.0, 3.0]]), (10, 1)),
  ])

  for algorithm in ("WCM", "MA", "BCM"):
    batched = rip_plan(model, stacked, goal, ctx, algorithm=algorithm,
                       num_steps=6, lr=0.1, epsilon=0.5)
    for b in range(2):
      ctx_b = {k: v[b:b + 1] for k, v in ctx.items()}
      single = rip_plan(model, stacked, goal[b:b + 1], ctx_b,
                        algorithm=algorithm, num_steps=6, lr=0.1,
                        epsilon=0.5)
      np.testing.assert_allclose(np.asarray(batched[b]),
                                 np.asarray(single[0]), atol=1e-4,
                                 err_msg=algorithm)


def test_plan_from_z_matches_plan_and_bf16_encoder_close():
  import jax
  import jax.numpy as jnp
  from oatomobile_tpu.models.dim import ImitativeModel

  model = ImitativeModel(output_shape=(4, 2))
  rng = jax.random.PRNGKey(3)
  B = 3
  ctx = dict(
      visual_features=jax.random.uniform(rng, (B, 100, 100, 2)),
      velocity=jnp.ones((B, 3)),
      is_at_traffic_light=jnp.zeros((B, 1)),
      traffic_light_state=jnp.zeros((B, 1)))
  y0 = jnp.zeros((B, 4, 2))
  params = model.init(rng, y0, method=model.log_prob, **ctx)
  goal = jnp.tile(jnp.asarray([[5.0, 0.0]]), (B, 1))[:, None, :]

  plan_a = model.apply(params, num_steps=5, goal=goal, method=model.plan,
                       **ctx)
  z = model.apply(params, method=model.params_z, **ctx)
  plan_b = model.apply(params, z, num_steps=5, goal=goal,
                       method=model.plan_from_z)
  np.testing.assert_allclose(np.asarray(plan_a), np.asarray(plan_b),
                             atol=1e-6)

  # bf16 encoder (the closed-loop policy's MXU path) must track f32 z.
  params16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
  ctx16 = {k: v.astype(jnp.bfloat16) for k, v in ctx.items()}
  z16 = model.apply(params16, method=model.params_z,
                    **ctx16).astype(jnp.float32)
  err = float(jnp.abs(z16 - z).max())
  scale = float(jnp.abs(z).max())
  assert err < 0.05 * max(scale, 1.0), (err, scale)
