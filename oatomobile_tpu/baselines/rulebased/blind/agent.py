"""The blind agent: drives straight to the goals, ignoring perception.

Parity: /root/reference/oatomobile/baselines/rulebased/blind/agent.py:23-29
(plan := goal waypoints).
"""

import numpy as np

import oatomobile_tpu
from oatomobile_tpu.baselines.base import SetPointAgent


class BlindAgent(SetPointAgent):
  """Uses the goal sensor's waypoints directly as the plan."""

  def __call__(self, observation: oatomobile_tpu.Observations, *args,
               **kwargs) -> np.ndarray:
    return np.asarray(observation["goal"])
