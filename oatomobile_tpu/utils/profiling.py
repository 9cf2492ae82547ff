"""Profiling and throughput accounting.

The reference had no profiling at all (SURVEY.md §5: tqdm bars only).
First-class here because throughput is the rebuild's value proposition:

  - `Meter`: steps/sec/chip counters with EMA smoothing;
  - `trace`: context manager around `jax.profiler` traces;
  - `timed`: wall-clock timing that *fetches* a scalar — under tunneled
    runtimes (axon) `block_until_ready` can return before execution
    finishes, so honest timing must pull a result to the host.
"""

import contextlib
import time
from typing import Any, Optional

import jax
import numpy as np


class Meter:
  """Throughput meter: call `update(n_steps)` after each device call."""

  def __init__(self, ema: float = 0.9) -> None:
    self._ema = ema
    self._rate = None
    self._last = None
    self.total_steps = 0

  def start(self) -> None:
    self._last = time.perf_counter()

  def update(self, n_steps: int) -> float:
    now = time.perf_counter()
    if self._last is None:
      self._last = now
      return 0.0
    dt = now - self._last
    self._last = now
    self.total_steps += n_steps
    rate = n_steps / max(dt, 1e-9)
    self._rate = rate if self._rate is None else (
        self._ema * self._rate + (1 - self._ema) * rate)
    return rate

  @property
  def steps_per_sec(self) -> float:
    return self._rate or 0.0

  @property
  def steps_per_sec_per_chip(self) -> float:
    return (self._rate or 0.0) / max(jax.device_count(), 1)


@contextlib.contextmanager
def trace(log_dir: str):
  """Wraps a block in a jax.profiler trace (view with TensorBoard or
  Perfetto)."""
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


def timed(computation, *args, fetch: Optional[Any] = None, **kwargs):
  """Runs `computation(*args, **kwargs)`, returns (result, seconds).

  Forces completion by fetching `fetch(result)` (default: the first leaf)
  to the host — see module docstring for why block_until_ready is not
  enough here.
  """
  t0 = time.perf_counter()
  result = computation(*args, **kwargs)
  probe = fetch(result) if fetch is not None else jax.tree.leaves(result)[0]
  np.asarray(jax.device_get(probe))
  return result, time.perf_counter() - t0
