"""Public API for `oatomobile_tpu` — a TPU-native rebuild of OATomobile.

The external CARLA server of the reference is replaced by an XLA-compiled
world model: dynamics, traffic, sensors and benchmarks all run on-device,
vmapped over scenes and sharded over a `jax.sharding.Mesh`.

API parity: /root/reference/oatomobile/__init__.py:26-112 (same public
names, minus the CARLA path hacks which no longer exist).
"""

from oatomobile_tpu._metadata import __version__
from oatomobile_tpu.utils.platform import enable_compilation_cache as \
    _enable_compilation_cache

# Persistent XLA compilation cache: makes repeat runs start in seconds
# (critical under remote-compile TPU runtimes).  No-op if unsupported;
# opt out with OATOMOBILE_TPU_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("OATOMOBILE_TPU_NO_COMPILE_CACHE"):
  _enable_compilation_cache()
del _os
from oatomobile_tpu import types
from oatomobile_tpu.core.agent import Agent
from oatomobile_tpu.core.benchmark import Benchmark
from oatomobile_tpu.core.dataset import Dataset, Episode, tokens
from oatomobile_tpu.core.loop import EnvironmentLoop
from oatomobile_tpu.core.registry import registry
from oatomobile_tpu.core.rl import (Env, FiniteHorizonWrapper,
                                    LiveViewWrapper, Metric,
                                    MonitorWrapper, ReturnsMetric,
                                    SaveToDiskWrapper, StepsMetric, Transition,
                                    Wrapper)
from oatomobile_tpu.core.simulator import (Action, Observations, Sensor,
                                           SensorSuite, SensorTypes,
                                           Simulator)

__all__ = (
    "Agent",
    "Benchmark",
    "Dataset",
    "EnvironmentLoop",
    "Episode",
    "tokens",
    "registry",
    "Env",
    "Wrapper",
    "FiniteHorizonWrapper",
    "Metric",
    "LiveViewWrapper",
    "MonitorWrapper",
    "ReturnsMetric",
    "StepsMetric",
    "SaveToDiskWrapper",
    "Transition",
    "Action",
    "Observations",
    "Sensor",
    "SensorSuite",
    "SensorTypes",
    "Simulator",
)
