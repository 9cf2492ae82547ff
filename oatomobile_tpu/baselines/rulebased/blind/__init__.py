from oatomobile_tpu.baselines.rulebased.blind.agent import BlindAgent

__all__ = ["BlindAgent"]
