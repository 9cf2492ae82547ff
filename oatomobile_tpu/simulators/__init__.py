"""Simulator backends."""

from oatomobile_tpu.simulators.tpu.simulator import (CARLAAction,
                                                     TPUSimulator)

__all__ = ["CARLAAction", "TPUSimulator"]
