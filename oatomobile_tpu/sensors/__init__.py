"""Sensor synthesis: state readouts, BEV, cameras, game state."""

from oatomobile_tpu.sensors import cameras, synth

__all__ = ["cameras", "synth"]
