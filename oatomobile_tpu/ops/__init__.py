"""Compute ops: transforms, BEV synthesis (XLA + pallas backends)."""

from oatomobile_tpu.ops import bev, bev_pallas, transforms

__all__ = ["bev", "bev_pallas", "transforms"]
