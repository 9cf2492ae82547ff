"""Multi-layer perceptron.

Parity: /root/reference/oatomobile/torch/networks/mlp.py:25-72 (Linear+ReLU
stack, optional dropout and final activation), as a flax module.
"""

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
  """A simple multi-layer perceptron."""

  output_sizes: Sequence[int]
  activation_fn: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu
  dropout_rate: Optional[float] = None
  activate_final: bool = False

  @nn.compact
  def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
    for i, size in enumerate(self.output_sizes):
      x = nn.Dense(size, name="dense_{}".format(i))(x)
      is_last = i == len(self.output_sizes) - 1
      if not is_last or self.activate_final:
        x = self.activation_fn(x)
        if self.dropout_rate is not None and not is_last:
          x = nn.Dropout(rate=self.dropout_rate,
                         deterministic=not train)(x)
    return x
