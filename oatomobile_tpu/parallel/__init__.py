"""Parallelism: device meshes, sharding helpers, data-parallel training."""

from oatomobile_tpu.parallel import dp, mesh

__all__ = ["dp", "mesh"]
