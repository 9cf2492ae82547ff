"""The behavioural cloning model (conditional imitation learning).

Parity: /root/reference/oatomobile/baselines/torch/cil/model.py:31-165
(`BehaviouralModel`): MobileNetV2(2ch)->128 features, concat [velocity(3),
is_at_traffic_light(1), traffic_light_state(1), mode(1)], MLP[64,64,64]
(activate_final) -> GRUCell(input=2, hidden=64) autoregressive residual
decoder -> plan [T=40, 2].
"""

from typing import Mapping, Tuple

import flax.linen as nn
import jax.numpy as jnp

from oatomobile_tpu.models import transforms
from oatomobile_tpu.models.mlp import MLP
from oatomobile_tpu.models.perception import MobileNetV2


class BehaviouralModel(nn.Module):
  """Deterministic autoregressive plan decoder."""

  output_shape: Tuple[int, int] = (40, 2)
  input_size: Tuple[int, int] = (100, 100)

  def setup(self):
    self._encoder = MobileNetV2(num_classes=128, name="encoder")
    self._merger = MLP(output_sizes=(64, 64, 64), activate_final=True,
                       name="merger")
    self._decoder = nn.GRUCell(features=64, name="gru")
    self._output = nn.Dense(self.output_shape[-1], name="output")

  def __call__(self, **context: jnp.ndarray) -> jnp.ndarray:
    """Returns the expert plan [B, T, 2] (model.py:68-127)."""
    for key in ("visual_features", "velocity", "is_at_traffic_light",
                "traffic_light_state", "mode"):
      if key not in context:
        raise ValueError("Missing `{}` keyword argument.".format(key))

    features = self._encoder(context["visual_features"])
    z = jnp.concatenate([
        features,
        context["velocity"],
        context["is_at_traffic_light"],
        context["traffic_light_state"],
        context["mode"],
    ], axis=-1)
    z = self._merger(z)

    x = jnp.zeros(z.shape[:-1] + (self.output_shape[-1],), dtype=z.dtype)
    ys = []
    for _ in range(self.output_shape[0]):
      z, _ = self._decoder(z, x)
      dx = self._output(z)
      x = dx + x
      ys.append(x)
    return jnp.stack(ys, axis=-2)

  def transform(
      self, sample: Mapping[str, jnp.ndarray]) -> Mapping[str, jnp.ndarray]:
    """Prepares raw sample variables (model.py:129-165), NHWC layout.
    Removes the STOP command to avoid causal confusion with traffic
    lights (model.py:160-162)."""
    sample = dict(sample)
    if "player_future" in sample:
      sample["player_future"] = transforms.downsample_target(
          sample["player_future"],
          num_timesteps_to_keep=self.output_shape[-2])
    if "lidar" in sample:
      sample["visual_features"] = sample.pop("lidar")
    if "visual_features" in sample:
      sample["visual_features"] = transforms.transpose_visual_features(
          transforms.downsample_visual_features(
              sample["visual_features"],
              output_shape=tuple(self.input_size)))
    if "mode" in sample:
      mode = sample["mode"]
      sample["mode"] = jnp.where(mode == 1.0, 0.0, mode)
    return sample
