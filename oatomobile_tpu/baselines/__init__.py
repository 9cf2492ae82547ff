"""Baseline agents: rule-based and learned."""

from oatomobile_tpu.baselines.base import SetPointAgent

__all__ = ["SetPointAgent"]
