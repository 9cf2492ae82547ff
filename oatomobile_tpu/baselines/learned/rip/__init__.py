from oatomobile_tpu.baselines.learned.rip.agent import RIPAgent

__all__ = ["RIPAgent"]
