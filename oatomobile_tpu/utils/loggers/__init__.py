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
    "TensorBoardLogger",
    "TerminalLogger",
    "WandBLogger",
]


def TensorBoardLogger(*args, **kwargs):  # noqa: N802 (lazy factory)
  """Returns a TensorBoard-backed logger (scalars + image summaries,
  reference torch/loggers.py:37-141); import-gated on tensorboard."""
  from oatomobile_tpu.utils.loggers.tensorboard import (
      TensorBoardLogger as _TBLogger)
  return _TBLogger(*args, **kwargs)


def WandBLogger(*args, **kwargs):  # noqa: N802 (factory keeping the ref name)
  """Returns a wandb-backed logger; raises ImportError if wandb is absent."""
  from oatomobile_tpu.utils.loggers.wandb import WandBLogger as _WandBLogger
  return _WandBLogger(*args, **kwargs)
