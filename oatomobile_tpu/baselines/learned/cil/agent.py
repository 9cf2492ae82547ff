"""The conditional imitation learning agent.

Parity: /root/reference/oatomobile/baselines/torch/cil/agent.py:28-97
(`CILAgent`): observation prep + command (mode) from goal geometry ->
BehaviouralModel plan -> interpolate -> SetPointAgent PID tracking.
"""

from typing import Mapping

import jax
import numpy as np

import oatomobile_tpu
from oatomobile_tpu.baselines.base import SetPointAgent
from oatomobile_tpu.baselines.learned import common
from oatomobile_tpu.models.cil import BehaviouralModel


class CILAgent(SetPointAgent):
  """The conditional imitation learning agent."""

  def __init__(self, environment: oatomobile_tpu.Env, *,
               model: BehaviouralModel, params, **kwargs) -> None:
    super().__init__(environment=environment, **kwargs)
    self._model = model
    self._params = params

    @jax.jit
    def _forward(params, context):
      return model.apply(params, **context)

    self._forward = _forward

  def __call__(self, observation: Mapping[str, np.ndarray],
               **kwargs) -> np.ndarray:
    obs = common.prepare_observation(observation)
    # Command from the goal endpoint (reference cil/agent.py:64-78; the
    # signed-angle fix documented in common.mode_from_goal).
    obs["mode"] = np.atleast_2d(common.mode_from_goal(obs["goal"]))
    obs = {k: jax.numpy.asarray(v) for k, v in obs.items()}
    obs = self._model.transform(obs)
    context = {
        k: obs[k]
        for k in ("visual_features", "velocity", "is_at_traffic_light",
                  "traffic_light_state", "mode") if k in obs
    }
    for key in ("is_at_traffic_light", "traffic_light_state"):
      if key in context and context[key].ndim == 1:
        context[key] = context[key][:, None]

    plan = np.asarray(self._forward(self._params, context))[0]  # [T, 2]
    return common.interpolate_plan(plan)
