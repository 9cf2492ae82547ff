"""Model/train-state checkpointing.

Parity: /root/reference/oatomobile/torch/savers.py:26-55 (`Checkpointer`
with ``model-{epoch}.pt`` files), extended the TPU-native way: full train
state (params, optimizer state, step, RNG) so training resumes exactly —
the reference saved weights only (SURVEY.md §5: no optimizer-state resume).
"""

import os
import re
from typing import Any, Optional

import flax.serialization
import jax


class Checkpointer:
  """Simple pytree save/load keyed by epoch."""

  def __init__(self, ckpt_dir: str, prefix: str = "model") -> None:
    self._ckpt_dir = ckpt_dir
    self._prefix = prefix
    os.makedirs(self._ckpt_dir, exist_ok=True)

  def _path(self, epoch: int) -> str:
    return os.path.join(self._ckpt_dir,
                        "{}-{}.flax".format(self._prefix, epoch))

  def save(self, epoch: int, state: Any) -> str:
    """Serialises `state` (any pytree: params or a full TrainState)."""
    path = self._path(epoch)
    data = flax.serialization.to_bytes(jax.device_get(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as fp:
      fp.write(data)
    os.replace(tmp, path)
    return path

  def load(self, epoch: int, target: Any) -> Any:
    """Restores into the structure of `target`."""
    with open(self._path(epoch), "rb") as fp:
      data = fp.read()
    return flax.serialization.from_bytes(target, data)

  def _named_path(self, name: str) -> str:
    return os.path.join(self._ckpt_dir,
                        "{}-{}.flax".format(self._prefix, name))

  def save_named(self, name: str, state: Any) -> str:
    """Saves under a symbolic name (e.g. ``model-best.flax``) — used for
    best-validation-loss checkpoint selection (the reference only saved
    by epoch, torch/savers.py:39-46)."""
    path = self._named_path(name)
    data = flax.serialization.to_bytes(jax.device_get(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as fp:
      fp.write(data)
    os.replace(tmp, path)
    return path

  def load_named(self, name: str, target: Any) -> Any:
    with open(self._named_path(name), "rb") as fp:
      data = fp.read()
    return flax.serialization.from_bytes(target, data)

  def has_named(self, name: str) -> bool:
    return os.path.exists(self._named_path(name))

  def latest_epoch(self) -> Optional[int]:
    pattern = re.compile(r"^{}-(\d+)\.flax$".format(re.escape(self._prefix)))
    epochs = []
    for fname in os.listdir(self._ckpt_dir):
      m = pattern.match(fname)
      if m:
        epochs.append(int(m.group(1)))
    return max(epochs) if epochs else None

  def restore_latest(self, target: Any) -> Any:
    epoch = self.latest_epoch()
    if epoch is None:
      return None
    return self.load(epoch, target)
