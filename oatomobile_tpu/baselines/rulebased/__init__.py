"""Rule-based baseline agents."""

from oatomobile_tpu.baselines.rulebased.autopilot.agent import AutopilotAgent
from oatomobile_tpu.baselines.rulebased.blind.agent import BlindAgent

__all__ = ["AutopilotAgent", "BlindAgent"]
