"""Public API for `oatomobile_tpu.envs`.

Parity: /root/reference/oatomobile/envs/__init__.py.
"""

from oatomobile_tpu.envs.carla import (CARLAEnv, CARLANavEnv,
                                       CollisionsMetric, DistanceMetric,
                                       LaneInvasionsMetric,
                                       TerminateOnCollisionWrapper,
                                       TerminateOnLaneInvasionWrapper)

__all__ = [
    "CARLAEnv",
    "CARLANavEnv",
    "CollisionsMetric",
    "DistanceMetric",
    "LaneInvasionsMetric",
    "TerminateOnCollisionWrapper",
    "TerminateOnLaneInvasionWrapper",
]
