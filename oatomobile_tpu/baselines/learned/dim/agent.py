"""The deep imitative model agent.

Parity: /root/reference/oatomobile/baselines/torch/dim/agent.py:28-84
(`DIMAgent`): observation prep -> `model.plan(num_steps=20, lr=5e-2)` ->
interpolate the 4-step plan to 40 steps -> SetPointAgent PID tracking.
"""

import functools
from typing import Mapping

import jax
import numpy as np

import oatomobile_tpu
from oatomobile_tpu.baselines.base import SetPointAgent
from oatomobile_tpu.baselines.learned import common
from oatomobile_tpu.models.dim import ImitativeModel


class DIMAgent(SetPointAgent):
  """The deep imitative model agent."""

  def __init__(self, environment: oatomobile_tpu.Env, *,
               model: ImitativeModel, params, **kwargs) -> None:
    """Args:
      model: the ImitativeModel module definition.
      params: its flax parameters (the torch agent took a loaded nn.Module;
        in jax the module and its parameters are separate).
    """
    super().__init__(environment=environment, **kwargs)
    self._model = model
    self._params = params

    @functools.partial(jax.jit, static_argnames=("num_steps",))
    def _plan(params, goal, context, num_steps, lr, epsilon):
      return model.apply(params, num_steps=num_steps, goal=goal, lr=lr,
                         epsilon=epsilon, method=model.plan, **context)

    self._plan = _plan

  def __call__(self, observation: Mapping[str, np.ndarray],
               **kwargs) -> np.ndarray:
    obs = common.prepare_observation(observation)
    obs = {k: jax.numpy.asarray(v) for k, v in obs.items()}
    obs = self._model.transform(obs)
    context = {
        k: obs[k]
        for k in ("visual_features", "velocity", "is_at_traffic_light",
                  "traffic_light_state") if k in obs
    }
    # Scalars arrive as [1]; models expect [B, 1].
    for key in ("is_at_traffic_light", "traffic_light_state"):
      if key in context and context[key].ndim == 1:
        context[key] = context[key][:, None]

    plan = self._plan(self._params, obs.get("goal"), context,
                      kwargs.get("num_steps", 20), kwargs.get("lr", 5e-2),
                      kwargs.get("epsilon", 1.0))
    plan = np.asarray(plan)[0]  # [T, 2]
    return common.interpolate_plan(plan)
