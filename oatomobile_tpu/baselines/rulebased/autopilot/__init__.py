from oatomobile_tpu.baselines.rulebased.autopilot.agent import AutopilotAgent

__all__ = ["AutopilotAgent"]
