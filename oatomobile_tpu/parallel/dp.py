"""Data-parallel training utilities.

Training state + jitted update steps where the batch is sharded over the
mesh's ``dp`` axis and parameters are replicated; XLA inserts the gradient
all-reduce (psum over ICI) from the sharding constraints — the rebuild's
replacement for the reference's nonexistent distributed layer
(SURVEY.md §2.3: single-device torch, no DDP).
"""

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from oatomobile_tpu.parallel import mesh as mesh_lib


@struct.dataclass
class TrainState:
  """Pure-pytree training state (params, optimiser, step, rng)."""
  params: Any
  opt_state: Any
  step: jnp.ndarray
  rng: jnp.ndarray

  @classmethod
  def create(cls, params, optimizer: optax.GradientTransformation,
             rng: jax.Array) -> "TrainState":
    return cls(params=params, opt_state=optimizer.init(params),
               step=jnp.int32(0), rng=rng)


def make_update_fn(
    loss_fn: Callable[..., jnp.ndarray],
    optimizer: optax.GradientTransformation,
    mesh: Optional[Any] = None,
) -> Callable[[TrainState, Any], Tuple[TrainState, jnp.ndarray]]:
  """Builds a jitted `(state, batch) -> (state, loss)` update.

  Args:
    loss_fn: `(params, batch, rng) -> scalar loss`.
    mesh: optional Mesh; when given, callers should place batches with
      `mesh_lib.shard_batch(mesh, batch)` — the update then runs SPMD with
      gradients all-reduced across the dp axis automatically.
  """

  def update(state: TrainState, batch) -> Tuple[TrainState, jnp.ndarray]:
    rng, step_rng = jax.random.split(state.rng)
    loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, step_rng)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params=params, opt_state=opt_state,
                      step=state.step + 1, rng=rng), loss

  jitted = jax.jit(update, donate_argnums=(0,))

  if mesh is None:
    return jitted

  def sharded_update(state, batch):
    batch = mesh_lib.shard_batch(mesh, batch)
    return jitted(state, batch)

  return sharded_update


def replicate_state(mesh, state: TrainState) -> TrainState:
  return mesh_lib.replicate(mesh, state)
