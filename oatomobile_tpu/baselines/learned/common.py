"""Shared observation preparation for the learned agents.

Parity: the observation prep repeated in the reference agents
(/root/reference/oatomobile/baselines/torch/{cil,dim,rip}/agent.py):
batchify, goal -> 2D, LIDAR image handling, and the 4->40 plan
interpolation with appended z column.
"""

from typing import Mapping

import numpy as np

PLAYER_FUTURE_LENGTH = 40


def prepare_observation(
    observation: Mapping[str, np.ndarray]) -> Mapping[str, np.ndarray]:
  """Batchifies raw observations; goal trimmed to 2D; images stay NHWC
  (the torch agents transposed to CHW — our models are NHWC-native)."""
  out = {}
  for attr, value in observation.items():
    value = np.asarray(value) if isinstance(value, np.ndarray) else \
        np.atleast_1d(np.asarray(value, dtype=np.float32))
    out[attr] = value[None, ...].astype(np.float32)
  if "bird_view_camera_cityscapes" in out:
    out["overhead_features"] = out["bird_view_camera_cityscapes"]
  if "goal" in out:
    out["goal"] = out["goal"][..., :2]
  return out


def mode_from_goal(goal: np.ndarray, signed: bool = True) -> float:
  """Command label {0 FORWARD, 1 STOP, 2 LEFT, 3 RIGHT} from the goal
  endpoint geometry.

  The reference has two conflicting rules (datasets/carla.py:150-157 uses
  theta <= -15 for RIGHT — unreachable since arccos >= 0; cil/agent.py:67-74
  uses theta <= 15 — which also swallows FORWARD).  The ``signed`` variant
  resolves the bug with a signed angle; pass signed=False for the dataset
  rule.
  """
  x_t, y_t = goal[0, -1, :2]
  norm = float(np.linalg.norm([x_t, y_t]))
  if norm < 3:
    return 1.0  # STOP
  if signed:
    theta = float(np.degrees(np.arctan2(y_t, x_t)))
    if theta > 15:
      return 3.0  # RIGHT (+y is the right-hand side)
    if theta < -15:
      return 2.0  # LEFT
    return 0.0
  theta = float(np.degrees(np.arccos(x_t / (norm + 1e-3))))
  if theta > 15:
    return 2.0
  if theta <= -15:
    return 3.0
  return 0.0


def interpolate_plan(plan: np.ndarray,
                     length: int = PLAYER_FUTURE_LENGTH) -> np.ndarray:
  """Linear 1-D interpolation of a [T, 2] plan to [length-step, 3]
  (x, y, z=0), matching the agents' scipy.interp1d usage
  (e.g. dim/agent.py:75-84)."""
  T = plan.shape[0]
  increments = length // T
  time_index = np.arange(0, length, increments)[:T]
  dense_t = np.arange(0, time_index[-1])
  xy = np.stack(
      [np.interp(dense_t, time_index, plan[:, d]) for d in range(2)],
      axis=-1)
  z = np.zeros((xy.shape[0], 1))
  return np.concatenate([xy, z], axis=-1)
