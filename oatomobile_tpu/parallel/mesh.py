"""Device mesh + sharding helpers.

The reference has no parallelism at all (SURVEY.md §2.3: one process, one
env, one GPU, sequential evaluation).  This module is the rebuild's
replacement for that gap: a single `jax.sharding.Mesh` over all chips, with
the scene batch (and training batch) sharded along the ``dp`` axis and an
optional ``mp`` axis reserved for tensor/ensemble parallelism.  Collectives
are emitted by XLA from sharding constraints — no NCCL-style plumbing.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
MODEL_AXIS = "mp"


def make_mesh(n_data: Optional[int] = None,
              n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """Creates a (dp, mp) mesh over the available devices.

  With a single chip this degenerates gracefully to a 1x1 mesh — all
  sharding annotations become no-ops, so the same code runs everywhere.
  """
  devices = list(devices if devices is not None else jax.devices())
  if n_data is None:
    n_data = len(devices) // n_model
  grid = np.array(devices[:n_data * n_model]).reshape(n_data, n_model)
  return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
  """Sharding for arrays whose leading axis is the scene/batch axis."""
  return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
  """Places a pytree with leading batch axes onto the mesh, sharded on dp."""

  def put(x):
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1))) if x.ndim > 0 else P()
    return jax.device_put(x, NamedSharding(mesh, spec))

  return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
  """Replicates a pytree across the mesh."""
  sharding = NamedSharding(mesh, P())
  return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def ensemble_mesh(num_models: int,
                  devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """(dp, mp) mesh where ``mp`` is sized to divide the ensemble axis.

  Picks the largest divisor of ``num_models`` that also divides the
  device count, so stacked-parameter pytrees (leading axis K) shard
  evenly over ``mp`` while the batch shards over ``dp``.  One device →
  1×1 mesh (annotations become no-ops).
  """
  devices = list(devices if devices is not None else jax.devices())
  n_model = 1
  for cand in range(min(num_models, len(devices)), 0, -1):
    if num_models % cand == 0 and len(devices) % cand == 0:
      n_model = cand
      break
  return make_mesh(n_data=len(devices) // n_model, n_model=n_model,
                   devices=devices)


def shard_ensemble(mesh: Mesh, tree, num_models: int):
  """Places a stacked-ensemble pytree onto the mesh: leaves whose leading
  axis is the ensemble axis (size ``num_models``) shard over ``mp``;
  everything else (step counters, scalar optimiser state) replicates."""

  def put(x):
    if getattr(x, "ndim", 0) >= 1 and x.shape[0] == num_models:
      spec = P(MODEL_AXIS, *([None] * (x.ndim - 1)))
    else:
      spec = P()
    return jax.device_put(x, NamedSharding(mesh, spec))

  return jax.tree.map(put, tree)
