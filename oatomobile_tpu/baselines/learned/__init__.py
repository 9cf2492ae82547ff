"""Learned baseline agents (flax/JAX — the reference's `baselines/torch`)."""

from oatomobile_tpu.baselines.learned.cil.agent import CILAgent
from oatomobile_tpu.baselines.learned.dim.agent import DIMAgent
from oatomobile_tpu.baselines.learned.rip.agent import RIPAgent

__all__ = ["CILAgent", "DIMAgent", "RIPAgent"]
