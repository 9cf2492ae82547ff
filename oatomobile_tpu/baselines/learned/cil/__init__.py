from oatomobile_tpu.baselines.learned.cil.agent import CILAgent
from oatomobile_tpu.models.cil import BehaviouralModel

__all__ = ["CILAgent", "BehaviouralModel"]
