"""The TPU-native simulator backend (CARLA-compatible API surface)."""

from oatomobile_tpu.simulators.tpu import defaults
from oatomobile_tpu.simulators.tpu.simulator import (CARLAAction,
                                                     TPUSimulator)

__all__ = ["CARLAAction", "TPUSimulator", "defaults"]
