"""Acme-style loggers.

Parity with /root/reference/oatomobile/utils/loggers/ (Logger ABC, NoOp,
Terminal, CSV, WandB).  WandB is import-gated (the reference called
``wandb.init`` at *import* time — wandb.py:22 — which we deliberately fix).
"""

from oatomobile_tpu.utils.loggers.base import Logger, LoggingData, NoOpLogger
from oatomobile_tpu.utils.loggers.csv import CSVLogger
from oatomobile_tpu.utils.loggers.jsonl import JSONLLogger
from oatomobile_tpu.utils.loggers.terminal import TerminalLogger

__all__ = [
    "Logger",
    "LoggingData",
    "NoOpLogger",
    "CSVLogger",
    "JSONLLogger",
    "TerminalLogger",
    "WandBLogger",
]


def WandBLogger(*args, **kwargs):  # noqa: N802 (factory keeping the ref name)
  """Returns a wandb-backed logger; raises ImportError if wandb is absent."""
  from oatomobile_tpu.utils.loggers.wandb import WandBLogger as _WandBLogger
  return _WandBLogger(*args, **kwargs)
