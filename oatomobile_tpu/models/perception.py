"""Perception (e.g., LIDAR BEV) feature extractors.

Parity: /root/reference/oatomobile/torch/networks/perception.py:25-55 —
MobileNetV2 with the first conv swapped for ``in_channels=2`` and a
``num_classes``-dim output head.  Reimplemented from the architecture
definition (Sandler et al. 2018) in flax, NHWC layout (TPU-native).

Deliberate TPU-first deviation: GroupNorm instead of BatchNorm.  BatchNorm
needs mutable running statistics (a second variable collection threaded
through every jit/pjit boundary) and behaves badly with small per-device
batches under data parallelism; GroupNorm is stateless, numerically
equivalent at inference scale, and keeps the whole train step a pure
function.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# MobileNetV2 inverted-residual settings: (expansion t, channels c,
# repeats n, stride s) per the paper / torchvision implementation.
_INVERTED_RESIDUAL_SETTINGS: Sequence[Tuple[int, int, int, int]] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _norm(name: str):
  return nn.GroupNorm(num_groups=None, group_size=8, name=name)


class InvertedResidual(nn.Module):
  """MobileNetV2 inverted residual block (expand -> depthwise -> project)."""

  out_channels: int
  stride: int
  expand_ratio: int

  @nn.compact
  def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
    in_channels = x.shape[-1]
    hidden = in_channels * self.expand_ratio
    use_residual = self.stride == 1 and in_channels == self.out_channels
    h = x
    if self.expand_ratio != 1:
      h = nn.Conv(hidden, (1, 1), use_bias=False, name="expand")(h)
      h = _norm("expand_norm")(h)
      h = nn.relu6(h)
    h = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                padding="SAME", feature_group_count=hidden, use_bias=False,
                name="depthwise")(h)
    h = _norm("depthwise_norm")(h)
    h = nn.relu6(h)
    h = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="project")(h)
    h = _norm("project_norm")(h)
    if use_residual:
      h = x + h
    return h


class MobileNetV2(nn.Module):
  """MobileNetV2 feature extractor + classification head.

  Input: NHWC float images (any channel count — the reference hacks the
  first conv to 2 channels for the BEV input, perception.py:46-53).
  """

  num_classes: int = 128
  width_mult: float = 1.0

  @nn.compact
  def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
    def c(ch: int) -> int:
      # Channel rounding, snapped to multiples of 8 (hardware-friendly).
      v = max(8, int(ch * self.width_mult + 4) // 8 * 8)
      return v

    h = nn.Conv(c(32), (3, 3), strides=(2, 2), padding="SAME",
                use_bias=False, name="stem")(x)
    h = _norm("stem_norm")(h)
    h = nn.relu6(h)

    block = 0
    for t, ch, n, s in _INVERTED_RESIDUAL_SETTINGS:
      for i in range(n):
        h = InvertedResidual(
            out_channels=c(ch),
            stride=s if i == 0 else 1,
            expand_ratio=t,
            name="block_{}".format(block))(h)
        block += 1

    h = nn.Conv(c(1280), (1, 1), use_bias=False, name="head_conv")(h)
    h = _norm("head_norm")(h)
    h = nn.relu6(h)
    h = jnp.mean(h, axis=(-3, -2))  # global average pool
    return nn.Dense(self.num_classes, name="classifier")(h)
