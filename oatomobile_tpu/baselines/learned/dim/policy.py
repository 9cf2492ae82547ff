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
                    speed_gain: float = 1.0,
                    encoder_dtype: str = "float32"):
  """Returns `policy(world_params, states) -> (actions [B,3], states)`.

  ``encoder_dtype="bfloat16"`` runs the MobileNetV2 context encoder —
  the measured closed-loop bottleneck (58.3 ms of the step @B=1024 vs
  ~50 ms for the entire 20-step planner, PARITY.md) — in bf16 on the
  MXU, with the flow planner kept in f32 (its Adam inner loop
  differentiates through the flow; bf16 gradients there destabilise the
  plan).  z returns to f32 before planning.
  """
  cast_params = None
  if encoder_dtype == "bfloat16":
    cast_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                               model_params)

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

    if cast_params is not None:
      ctx16 = {k: v.astype(jnp.bfloat16) for k, v in context.items()}
      z = model.apply(cast_params, method=model.params_z,
                      **ctx16).astype(jnp.float32)
    else:
      z = model.apply(model_params, method=model.params_z, **context)
    plan = model.apply(model_params, z, num_steps=num_plan_steps,
                       goal=goal, lr=lr, epsilon=epsilon,
                       method=model.plan_from_z)  # [B, T, 2] ego frame

    red_held = ((obs["is_at_traffic_light"] > 0.5) &
                (obs["traffic_light_state"] < 1.5))  # red/yellow held
    return bridge.plan_to_action(
        world_params, states, plan, setpoint_frac=setpoint_frac,
        use_brake=use_brake, curvature_slowdown=curvature_slowdown,
        warmup_floor=warmup_floor, goal=goal, speed_gain=speed_gain,
        red_held=red_held, bev=obs["lidar"])

  return policy
