"""Unique token generation for episodes and samples.

Parity: /root/reference/oatomobile/utils/uuid.py:21-24.
"""

import uuid
from typing import Generator


def unique_token_generator() -> Generator[str, None, None]:
  """Yields random hex tokens, one per call to ``next``."""
  while True:
    yield uuid.uuid4().hex
