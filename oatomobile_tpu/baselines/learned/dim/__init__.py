from oatomobile_tpu.baselines.learned.dim.agent import DIMAgent
from oatomobile_tpu.models.dim import ImitativeModel

__all__ = ["DIMAgent", "ImitativeModel"]
