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
