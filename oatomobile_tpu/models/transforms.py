"""Preprocessing transforms shared by the models.

Parity: /root/reference/oatomobile/torch/transforms.py:23-49, in NHWC
layout (TPU-native) instead of torch's NCHW.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def downsample_target(player_future: jnp.ndarray,
                      num_timesteps_to_keep: int) -> jnp.ndarray:
  """Strided subsampling of the target sequence [..., T, D]
  (transforms.py:23-31)."""
  T = player_future.shape[-2]
  increments = T // num_timesteps_to_keep
  return player_future[..., ::increments, :][..., :num_timesteps_to_keep, :]


def downsample_visual_features(visual_features: jnp.ndarray,
                               output_shape: Tuple[int, int]) -> jnp.ndarray:
  """Bilinear resize of [..., H, W, C] images (transforms.py:34-44; torch
  used align_corners=True — jax.image.resize uses half-pixel centers, a
  sub-pixel difference irrelevant to the 200->100 BEV downsample)."""
  batch = visual_features.shape[:-3]
  C = visual_features.shape[-1]
  return jax.image.resize(
      visual_features, batch + tuple(output_shape) + (C,), method="bilinear")


def transpose_visual_features(visual_features: jnp.ndarray) -> jnp.ndarray:
  """Swaps the two spatial dims of [..., H, W, C] (transforms.py:47-49:
  torch swapped dims 2,3 of NCHW == H,W)."""
  return jnp.swapaxes(visual_features, -3, -2)
