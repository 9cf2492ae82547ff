"""Neural network building blocks and baseline models (flax)."""

from oatomobile_tpu.models.cil import BehaviouralModel
from oatomobile_tpu.models.dim import ImitativeModel
from oatomobile_tpu.models.mlp import MLP
from oatomobile_tpu.models.perception import MobileNetV2
from oatomobile_tpu.models.sequence import AutoregressiveFlow
from oatomobile_tpu.models import transforms

__all__ = [
    "MLP",
    "MobileNetV2",
    "AutoregressiveFlow",
    "BehaviouralModel",
    "ImitativeModel",
    "transforms",
]
