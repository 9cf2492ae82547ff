"""Public API for `oatomobile_tpu.datasets`."""

from oatomobile_tpu.datasets.carla import CARLADataset

__all__ = ["CARLADataset"]
