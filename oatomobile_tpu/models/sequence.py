"""Autoregressive flow-based sequence generator.

Parity: /root/reference/oatomobile/torch/networks/sequence.py:28-216
(`AutoregressiveFlow`): a GRU-driven invertible affine autoregressive flow
over trajectories, with

    _forward: x (base) -> y (data),   y_t = (y_{t-1} + dloc_t) + scale_t*x_t
    _inverse: y (data) -> x (base),   x_t = (y_t - (y_{t-1} + dloc_t))/scale_t
    scale_t  = softplus(head(z_t)[2:]) + 1e-3
    logabsdet = sum_t sum_d log scale_td     (both directions)

The per-step Python loop of the reference (sequence.py:124-151, 184-201)
is unrolled over the T=4 decode steps inside one jitted computation
(setup()-bound flax submodules cannot be called from inside `lax.scan`;
at T=4 the unroll is also the faster XLA program) — differentiable in
both directions, vmap-able over batch and ensembles.
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from oatomobile_tpu.models.mlp import MLP


class AutoregressiveFlow(nn.Module):
  """An autoregressive flow-based sequence generator."""

  output_shape: Tuple[int, int] = (4, 2)  # (T, D)
  hidden_size: int = 64

  def setup(self):
    self._decoder = nn.GRUCell(features=self.hidden_size, name="gru")
    # Output head: predicts (dloc [D], raw_scale [D]).  The reference's
    # head MLP is [32, output_shape[0]] (sequence.py:59-65) — note
    # output_shape[0]=T=4 coincides with 2*D=4; the semantic size is 2*D.
    self._locscale = MLP(output_sizes=(32, 2 * self.output_shape[-1]),
                         name="locscale")

  def _step_params(self, z: jnp.ndarray,
                   y_tm1: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                jnp.ndarray]:
    """One GRU unroll: returns (new_z, dloc, scale)."""
    new_z, _ = self._decoder(z, y_tm1)
    dloc_scale = self._locscale(new_z)
    d = self.output_shape[-1]
    dloc = dloc_scale[..., :d]
    scale = nn.softplus(dloc_scale[..., d:]) + 1e-3
    return new_z, dloc, scale

  def __call__(self, z: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Stochastic generation: sample base noise, push forward.

    Parity: `forward` (sequence.py:76-93).
    """
    batch = z.shape[:-1]
    x = jax.random.normal(rng, batch + self.output_shape)
    y, _ = self._forward(x, z)
    return y

  def _forward(self, x: jnp.ndarray,
               z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transforms base samples to data samples.

    Args:
      x: [..., T, D] base samples.
      z: [..., H] context (initial GRU state).

    Returns:
      (y [..., T, D], logabsdet [...]).
    """
    T = self.output_shape[-2]
    d = self.output_shape[-1]
    y_0 = jnp.zeros(z.shape[:-1] + (d,), dtype=z.dtype)

    # setup()-bound submodules cannot be called from inside lax.scan
    # directly; unroll T steps (T is small: 4).
    y_tm1, zt = y_0, z
    ys, log_scales = [], []
    for t in range(T):
      zt, dloc, scale = self._step_params(zt, y_tm1)
      y_t = (y_tm1 + dloc) + scale * x[..., t, :]
      ys.append(y_t)
      log_scales.append(jnp.log(scale))
      y_tm1 = y_t
    y = jnp.stack(ys, axis=-2)
    logabsdet = jnp.sum(jnp.stack(log_scales, axis=-2), axis=(-2, -1))
    return y, logabsdet

  def _inverse(self, y: jnp.ndarray,
               z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                        jnp.ndarray]:
    """Transforms data samples to base samples.

    Returns:
      (x [..., T, D], log_prob [...], logabsdet [...]), where log_prob is
      the standard-normal density of x (sequence.py:207-208).
    """
    T = self.output_shape[-2]
    d = self.output_shape[-1]
    y_tm1 = jnp.zeros(z.shape[:-1] + (d,), dtype=z.dtype)

    zt = z
    xs, log_scales = [], []
    for t in range(T):
      zt, dloc, scale = self._step_params(zt, y_tm1)
      y_t = y[..., t, :]
      x_t = (y_t - (y_tm1 + dloc)) / scale
      xs.append(x_t)
      log_scales.append(jnp.log(scale))
      y_tm1 = y_t
    x = jnp.stack(xs, axis=-2)
    logabsdet = jnp.sum(jnp.stack(log_scales, axis=-2), axis=(-2, -1))

    D = T * d
    log_prob = (-0.5 * jnp.sum(x * x, axis=(-2, -1)) -
                0.5 * D * jnp.log(2.0 * jnp.pi))
    return x, log_prob, logabsdet
