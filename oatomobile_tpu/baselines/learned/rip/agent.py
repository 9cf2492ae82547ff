"""The robust imitative planning (RIP) agent.

Parity: /root/reference/oatomobile/baselines/torch/rip/agent.py:30-151
(`RIPAgent`): a K-model ensemble of ImitativeModels; a shared latent plan
is optimised under the aggregated imitation posteriors — WCM (min), BCM
(max) or MA (mean) — with 10 Adam steps at lr 1e-1.

The reference evaluates its K models in a sequential Python loop
(rip/agent.py:109-119); here the ensemble is a *stacked-parameter vmap
axis*: all K posteriors evaluate in one fused computation per optimisation
step — the ensemble-parallelism called for in SURVEY.md §2.3.
"""

import functools
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

import oatomobile_tpu
from oatomobile_tpu.baselines.base import SetPointAgent
from oatomobile_tpu.baselines.learned import common
from oatomobile_tpu.models.dim import ImitativeModel


def stack_ensemble(params_list: Sequence) -> dict:
  """Stacks K parameter pytrees along a new leading axis."""
  return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *params_list)


def rip_plan(model: ImitativeModel, stacked_params, goal, context, *,
             algorithm: str = "WCM", num_steps: int = 10, lr: float = 1e-1,
             epsilon: float = 1.0,
             encoder_dtype: str = "float32") -> jnp.ndarray:
  """Pure-function RIP planner (jittable, vmappable).

  Args:
    stacked_params: K-stacked ImitativeModel parameters.
    goal: [B, K_goals, 2] goals.
    context: model context dict.
    algorithm: "WCM" | "BCM" | "MA" (rip/agent.py:121-127).
    encoder_dtype: "bfloat16" runs the K context encoders (K MobileNetV2
      passes per step — the dominant closed-loop cost) on the MXU in
      bf16; z returns to f32 before the flow planner (see
      dim/policy.make_dim_policy).
  """
  batch_size = context["visual_features"].shape[0]

  # Contextual parameters per ensemble member: [K, B, H].
  if encoder_dtype == "bfloat16":
    enc_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                              stacked_params)
    enc_ctx = {k: v.astype(jnp.bfloat16) for k, v in context.items()}
  else:
    enc_params, enc_ctx = stacked_params, context
  zs = jax.vmap(
      lambda p: model.apply(p, method=model.params_z, **enc_ctx))(
          enc_params).astype(jnp.float32)
  z0 = jax.tree.map(lambda x: x[0], zs)
  params0 = jax.tree.map(lambda x: x[0], stacked_params)

  x0 = jnp.zeros((batch_size,) + tuple(model.output_shape))
  optimizer = optax.adam(lr)

  def posterior(params_k, z_k, y):
    """Per-scene posterior [B] under ensemble member k."""
    prior = model.apply(params_k, y, z_k,
                        method=model.imitation_prior_from_z)  # [B]
    gl = model.goal_likelihood(y, goal, epsilon=epsilon)  # [B]
    return prior + gl

  def loss_fn(x):
    """Per-scene aggregated negative posterior [B].

    The reference's min/max/mean over models (rip/agent.py:121-127) is
    taken *per scene* over the K axis — every scene gets its own
    worst/best-case-model objective, not one global scalar.  (Note the
    reference's naming quirk is preserved: WCM=min over the *negated*
    posteriors = the most optimistic bound of the loss; see PARITY.md.)
    """
    y = model.apply(params0, x, z0, method=model.decode)
    posteriors = jax.vmap(posterior, in_axes=(0, 0, None))(stacked_params,
                                                           zs, y)  # [K, B]
    if algorithm == "WCM":
      return jnp.min(-posteriors, axis=0)
    if algorithm == "BCM":
      return jnp.max(-posteriors, axis=0)
    return jnp.mean(-posteriors, axis=0)

  def step(carry, _):
    x, opt_state, x_best, loss_best = carry
    loss, pullback = jax.vjp(loss_fn, x)
    grads = pullback(jnp.ones_like(loss))[0]
    updates, opt_state = optimizer.update(grads, opt_state, x)
    new_x = optax.apply_updates(x, updates)
    better = loss < loss_best  # [B]
    x_best = jnp.where(better[:, None, None], x, x_best)
    loss_best = jnp.where(better, loss, loss_best)
    return (new_x, opt_state, x_best, loss_best), loss

  # +inf init (not the reference's 1000.0): the first evaluated plan always
  # becomes the incumbent — see models/dim.py `plan`.
  init = (x0, optimizer.init(x0), x0,
          jnp.full((batch_size,), jnp.inf, jnp.float32))
  (_, _, x_best, _), _ = jax.lax.scan(step, init, None, length=num_steps)
  return model.apply(params0, x_best, z0, method=model.decode)


class RIPAgent(SetPointAgent):
  """The robust imitative planning agent."""

  def __init__(self, environment: oatomobile_tpu.Env, *, algorithm: str,
               model: ImitativeModel, params_list: Sequence,
               **kwargs) -> None:
    """Args:
      algorithm: one of {"WCM", "MA", "BCM"}.
      model: the shared ImitativeModel module definition.
      params_list: K parameter pytrees (e.g. from K training seeds).
    """
    assert algorithm in ("WCM", "MA", "BCM")
    super().__init__(environment=environment, **kwargs)
    self._model = model
    self._algorithm = algorithm
    self._stacked = stack_ensemble(params_list)

    @functools.partial(jax.jit, static_argnames=("num_steps",))
    def _plan(stacked, goal, context, num_steps, lr, epsilon):
      return rip_plan(model, stacked, goal, context, algorithm=algorithm,
                      num_steps=num_steps, lr=lr, epsilon=epsilon)

    self._plan = _plan

  def __call__(self, observation: Mapping[str, np.ndarray],
               **kwargs) -> np.ndarray:
    obs = common.prepare_observation(observation)
    obs = {k: jnp.asarray(v) for k, v in obs.items()}
    obs = self._model.transform(obs)
    context = {
        k: obs[k]
        for k in ("visual_features", "velocity", "is_at_traffic_light",
                  "traffic_light_state") if k in obs
    }
    for key in ("is_at_traffic_light", "traffic_light_state"):
      if key in context and context[key].ndim == 1:
        context[key] = context[key][:, None]

    plan = self._plan(self._stacked, obs.get("goal"), context,
                      kwargs.get("num_steps", 10), kwargs.get("lr", 1e-1),
                      kwargs.get("epsilon", 1.0))
    plan = np.asarray(plan)[0]
    return common.interpolate_plan(plan)
