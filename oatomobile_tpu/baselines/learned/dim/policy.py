"""Fully in-graph DIM driving policy for batched rollouts.

The reference's DIM closed loop crosses the host every step: sensor queues
-> numpy -> torch -> 20-step Adam plan -> scipy interpolation -> CARLA PID
(SURVEY.md §3.5).  Here the *entire* loop — BEV synthesis, encoder, flow,
inner-loop planning, setpoint PID — is one traced function usable as the
``policy`` of ``BatchedEnv.rollout``: thousands of DIM agents drive
closed-loop inside a single `lax.scan`.

Control bridge semantics: baselines/learned/bridge.py (SetPointAgent,
reference baselines/base.py:116-176, with measured brake + plan-curvature
improvements).
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from oatomobile_tpu.baselines.learned import bridge
from oatomobile_tpu.models.dim import ImitativeModel
from oatomobile_tpu.sensors import synth
from oatomobile_tpu.sim.types import SceneState, WorldParams

_OBS_KEYS = ("lidar", "velocity", "is_at_traffic_light",
             "traffic_light_state", "goal")


def make_dim_policy(model: ImitativeModel,
                    model_params,
                    *,
                    num_plan_steps: int = 20,
                    lr: float = 5e-2,
                    epsilon: float = 1.0,
                    setpoint_frac: float = 0.5,
                    use_brake: bool = True,
                    curvature_slowdown: bool = True,
                    warmup_floor: float = 20.0 / 3.6,
                    speed_gain: float = 1.0):
  """Returns `policy(world_params, states) -> (actions [B,3], states)`."""

  def policy(world_params: WorldParams,
             states: SceneState) -> Tuple[jnp.ndarray, SceneState]:
    obs = jax.vmap(
        lambda s: synth.synthesize(world_params, s, _OBS_KEYS))(states)

    sample = model.transform({"lidar": obs["lidar"]})
    context = dict(
        visual_features=sample["visual_features"],
        velocity=obs["velocity"],
        is_at_traffic_light=obs["is_at_traffic_light"][:, None].astype(
            jnp.float32),
        traffic_light_state=obs["traffic_light_state"][:, None].astype(
            jnp.float32),
    )
    goal = obs["goal"][..., :2]

    plan = model.apply(model_params, num_steps=num_plan_steps, goal=goal,
                       lr=lr, epsilon=epsilon, method=model.plan,
                       **context)  # [B, T, 2] ego frame

    return bridge.plan_to_action(
        world_params, states, plan, setpoint_frac=setpoint_frac,
        use_brake=use_brake, curvature_slowdown=curvature_slowdown,
        warmup_floor=warmup_floor, goal=goal, speed_gain=speed_gain)

  return policy
